"""Bijector framework for noise-model normalizing flows (NHWC, flax.linen).

Each bijector is a linen module exposing
    ``forward_ldj(x, **ctx) -> (z, log_abs_det_J_inv)``   (x -> latent)
    ``inverse(z, **ctx) -> x``                            (latent -> noise)
with context ``ctx = {'clean': ..., 'iso': ...}``. The chain container sums
per-example log-dets. Mirrors the reference's bijector contract
(reference: archs/noise_flow.py:113-131) in functional JAX form.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def sum_except_batch(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x.reshape(x.shape[0], -1), axis=1)


class Bijector(nn.Module):
    """Marker base class; subclasses implement forward_ldj / inverse."""

    def forward_ldj(self, x, **ctx):  # pragma: no cover - interface
        raise NotImplementedError

    def inverse(self, z, **ctx):  # pragma: no cover - interface
        raise NotImplementedError
