"""Generalized Anscombe variance-stabilizing transform (reference: utils/isp_algos.py:4-18)."""

from __future__ import annotations

import jax.numpy as jnp


def vst(x, sigma, mu=0.0, gain=1.0, wp=1.0):
    """Forward VST: stabilizes Poisson-Gaussian noise to ~unit variance.

    Note the reference's quirk of multiplying by ``wp`` then using the
    *unscaled* ``x`` in the polynomial — preserved here for parity.
    """
    y = gain * x + (gain**2) * 3.0 / 8.0 + sigma**2 - gain * mu
    y = jnp.sqrt(jnp.maximum(y, 0.0))
    y = y / wp
    return (2.0 / gain) * y


def inverse_vst(x, sigma, gain=1.0, wp=1.0):
    """Algebraic (exact-mean) inverse of :func:`vst` at ``wp=1``.

    NOTE reference-exact quirk (isp_algos.py:13-18 vs :4-11): for wp != 1
    the forward never scales x into the wp domain while the inverse does,
    so the round trip is off by 1/wp — both reference variants are only
    ever used with wp=1."""
    x = x * wp
    y = (x / 2.0) ** 2 - 3.0 / 8.0 - sigma**2 / gain**2
    return y * gain / wp


def inverse_vst_batch(x, kmax, sig_gs, wp=1.0):
    """Batched inverse VST with per-image ``Kmax``/``sigGs`` params.

    Vectorized replacement for the reference's per-sample Python loop
    (reference: data_process/process.py:28-38). ``kmax``/``sig_gs`` have
    shape ``[N]``; ``x`` is ``[N, ...]``.
    """
    x = x * wp
    kmax = kmax.reshape((-1,) + (1,) * (x.ndim - 1))
    sig_gs = sig_gs.reshape((-1,) + (1,) * (x.ndim - 1))
    y = (x / 2.0) ** 2 - 3.0 / 8.0 - sig_gs**2 / kmax**2
    return y * kmax / wp
