"""Learning-rate schedules as pure functions of the epoch.

Matches the reference's epoch-indexed lambdas (reference: base_trainer.py:
33-43, 141-159): SGDR warm-restart cosine with per-period halving, and a
multistep schedule. Being pure functions of the step, they checkpoint for
free (the reference deliberately does not checkpoint optimizer state).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def cosine_warm_restart(step, period=1000, peak=20, lr=1e-4, ratio=0.2):
    """SGDR (ICLR'17) with warmup after the first restart and 2^T decay."""
    step = jnp.asarray(step, jnp.float32)
    T = jnp.floor(step / period)
    decay = 2.0**T
    s = step - T * period
    warm = s / jnp.maximum(peak, 1)
    # guard degenerate configs where the warmup spans the whole period
    span = jnp.maximum(period - peak, 1)
    cos = (1 - ratio) * (jnp.cos((s - peak) / span * math.pi) * 0.5 + 0.5) + ratio
    mul = jnp.where((s <= peak) & (T > 0), warm, cos)
    return lr * mul / decay


def multistep(step, period=1000, lr=1e-4, milestone=(500, 900), gamma=(0.5, 0.1), decay_base=1.0):
    step = jnp.asarray(step, jnp.float32)
    decay = decay_base ** jnp.floor(step / period)
    s = step - jnp.floor(step / period) * period
    mul = jnp.ones_like(s)
    for m, g in zip(milestone, gamma):
        mul = jnp.where(s > m, g, mul)
    return lr * mul / decay


def build_lr_schedule(hyper: dict):
    """From a runfile ``hyper`` block (reference: base_trainer.py:33-43)."""
    num_epochs = hyper["stop_epoch"] - hyper.get("last_epoch", 0)
    step_size = hyper.get("step_size", 10)
    T = max(int(hyper.get("T", 1)), 1)
    name = hyper.get("lr_scheduler", "WarmupCosine").lower()
    lr = hyper["learning_rate"]
    if "cos" in name:
        return lambda e: cosine_warm_restart(
            e, period=max(num_epochs // T, 1), lr=lr, peak=step_size)
    if "multi" in name:
        return lambda e: multistep(
            e, period=max(num_epochs // T, 1), decay_base=1,
            milestone=(step_size, step_size * 9 // 5), gamma=(0.5, 0.1), lr=lr,
        )
    return lambda e: jnp.asarray(lr, jnp.float32)
