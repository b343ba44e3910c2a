"""Pallas SSIM kernel parity vs the XLA/skimage-matching implementation.

Runs the kernel in interpret mode on the CPU backend (the conftest forces
CPU); on-TPU timing lives in tools/eval_fullres.py / STATUS.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jax.experimental.pallas as pl


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    import pnnp_tpu.kernels.ssim as mod

    monkeypatch.setattr(mod.pl, "pallas_call", interp)
    return mod


def _structured(shape, seed):
    """Inputs with strong spatial structure: iid-random frames statistically
    hide band-misalignment bugs (each band scores the same in expectation),
    so use a vertical gradient + per-channel scale + noise."""
    rng = np.random.default_rng(seed)
    H, W, C = shape
    grad = np.linspace(0, 200, H, dtype=np.float32)[:, None, None]
    chans = (np.arange(C, dtype=np.float32) + 1.0)[None, None, :] * 20.0
    x = np.clip(grad + chans + rng.uniform(0, 40, shape).astype(np.float32),
                0, 255)
    y = np.clip(x + rng.normal(0, 12, shape).astype(np.float32), 0, 255)
    return jnp.asarray(x), jnp.asarray(y)


@pytest.mark.parametrize("shape", [(70, 96, 4), (96, 131, 3), (201, 140, 4),
                                   (71, 96, 4)])
def test_ssim_kernel_matches_xla(interpret_pallas, shape):
    """Band alignment/masking must be exact for H % 8 != 0 (incl. the
    H % 8 == 7 coverage edge), odd W, and C in {3, 4}."""
    mod = interpret_pallas
    x, y = _structured(shape, 0)

    from pnnp_tpu.ops.metrics import ssim as ssim_xla

    ref = float(ssim_xla(x, y))
    got = float(mod.ssim_kernel(x, y))
    assert abs(ref - got) < 1e-4, (ref, got)


@pytest.mark.parametrize("shape", [(70, 96, 4), (96, 131, 3), (201, 140, 4), (71, 96, 4)])
def test_ssim_flat_kernel_matches_xla(interpret_pallas, shape):
    """The channel-INTERLEAVED flat variant (production layout: [H, W*C],
    lane rolls of C) must agree with the XLA path on the same frames."""
    mod = interpret_pallas
    x, y = _structured(shape, 3)

    from pnnp_tpu.ops.metrics import ssim as ssim_xla

    H, W, C = shape
    ref = float(ssim_xla(x, y))
    got = float(mod._ssim_flat_kernel(x.reshape(H, W * C),
                                      y.reshape(H, W * C), C))
    assert abs(ref - got) < 1e-4, (ref, got)


def test_ssim_fast_fallback_small_and_cpu():
    """Off-TPU (and tiny crops) ssim_fast must route to the XLA path and
    agree with it bit-for-bit."""
    from pnnp_tpu.kernels.ssim import ssim_fast
    from pnnp_tpu.ops.metrics import ssim as ssim_xla

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (32, 40, 4)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 255, (32, 40, 4)).astype(np.float32))
    assert float(ssim_fast(x, y)) == float(ssim_xla(x, y))
