"""End-to-end on-device training demo: physics-synth denoising from scratch.

Trains UNetSeeInDark with the fused train step (on-device P-G-R noise
synthesis, SGDR schedule, fast s2d path) on procedurally-generated clean
scenes, and reports eval PSNR gain over the noisy input — the whole reference
training loop exercised on real hardware without external datasets.

Usage: python tools/demo_train.py [--steps 300] [--eval-every 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pnnp_tpu.models import UNetSeeInDark
from pnnp_tpu.ops import psnr
from pnnp_tpu.physics import generate_noisy, sample_params_max
from pnnp_tpu.train import (
    build_lr_schedule,
    create_train_state,
    make_raw_synth,
    make_train_step,
)


def synthetic_scenes(rng: np.random.Generator, n: int, p: int) -> np.ndarray:
    """Procedural low-light 'scenes': smooth gradients + blobs + edges."""
    yy, xx = np.mgrid[0:p, 0:p].astype(np.float32) / p
    out = np.empty((n, p, p, 4), np.float32)
    for i in range(n):
        base = rng.uniform(0.002, 0.05)
        g = base + rng.uniform(0, 0.1) * (
            np.sin(xx * rng.uniform(2, 9) + rng.uniform(0, 6))
            * np.cos(yy * rng.uniform(2, 9))
            * 0.5 + 0.5
        )
        for _ in range(6):
            cx, cy, r = rng.uniform(0, 1, 3)
            blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (0.02 * r + 0.002)))
            g = g + rng.uniform(0, 0.15) * blob
        wb = rng.uniform(0.6, 1.0, 4).astype(np.float32)
        out[i] = np.clip(g[..., None] * wb, 0, 1)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    a = ap.parse_args(argv)

    rng = np.random.default_rng(1997)
    model = UNetSeeInDark(nf=32)
    state = create_train_state(jax.random.key(0), model, jnp.zeros((1, a.patch, a.patch, 4)))
    lr_schedule = build_lr_schedule(
        {"lr_scheduler": "WarmupCosine", "learning_rate": 2e-4,
         "stop_epoch": a.steps, "last_epoch": 0, "step_size": 10, "T": 1}
    )
    synth = make_raw_synth("SonyA7S2", "prq", ori=False, clip=False)
    step = make_train_step(model, lr_schedule, synth, clip_mode=2, fast=True)

    # fixed eval pair
    eval_hr = jnp.asarray(synthetic_scenes(rng, 2, a.patch))
    p_eval = sample_params_max(jax.random.key(99), "SonyA7S2", n=2, ratio=200.0)
    eval_lr = generate_noisy(jax.random.key(100), eval_hr, p_eval, "prq")
    eval_lr = jnp.clip(eval_lr, -np.inf, 1.0)
    psnr_in = float(psnr(jnp.clip(eval_lr, 0, 1) * 255, eval_hr * 255))

    from pnnp_tpu.train import make_eval_step

    eval_step = make_eval_step(model, fast=True)

    key = jax.random.key(1)
    t0 = time.time()
    for it in range(1, a.steps + 1):
        batch = {"hr": jnp.asarray(synthetic_scenes(rng, a.batch, a.patch))}
        key, k = jax.random.split(key)
        state, m = step(state, batch, k, it)
        if it % a.eval_every == 0 or it == 1:
            dn = jnp.clip(eval_step(state, eval_lr), 0, 1)
            p_dn = float(psnr(dn * 255, eval_hr * 255))
            print(f"step {it:4d}: loss={float(m['loss']):.4f} "
                  f"eval PSNR {p_dn:.2f} dB (input {psnr_in:.2f} dB, "
                  f"gain {p_dn - psnr_in:+.2f}) "
                  f"[{(time.time() - t0) / it * 1e3:.0f} ms/step]")
    print("done")


if __name__ == "__main__":
    main()
