"""Winograd kernel + serving-path parity (interpret mode on CPU).

The Pallas F(2x2,3x3) conv and the full unet_wino_forward_packed must equal
the direct conv / hybrid packed forward up to bf16-Winograd rounding.
On-TPU timing lives in tools/ + STATUS.md; adoption is measurement-gated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jax.experimental.pallas as pl


@pytest.fixture()
def interpret_pallas(monkeypatch):
    import pnnp_tpu.kernels.wino as mod

    orig = pl.pallas_call

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(mod.pl, "pallas_call", interp)
    return mod


def test_wino_conv_matches_direct(interpret_pallas):
    W = interpret_pallas
    h, w, C, D = 16, 24, 64, 128
    x = (jax.random.normal(jax.random.key(0), (h, w, C)) * 0.1).astype(jnp.bfloat16)
    k3 = jax.random.normal(jax.random.key(1), (3, 3, C, D)) * 0.05
    bias = jax.random.normal(jax.random.key(2), (D,)) * 0.01
    U = W.wino_filter(k3)

    got = W.wino_conv(x, U, bias, relu=True).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32), k3, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0] + bias
    ref = jnp.where(y >= 0, y, 0.2 * y)
    err = float(jnp.abs(ref - got).max())
    assert err < 0.02, err  # bf16 transform-domain rounding


def test_wino_chain_repad_split_exact(interpret_pallas):
    """Two chained convs staying in parity-split space == two direct convs
    (validates repad_split's parity bookkeeping)."""
    W = interpret_pallas
    h, w, C = 16, 24, 128
    x = (jax.random.normal(jax.random.key(0), (h, w, C)) * 0.1).astype(jnp.bfloat16)
    k3 = jax.random.normal(jax.random.key(1), (3, 3, C, C)) * 0.05
    bias = jnp.zeros((C,))
    U = W.wino_filter(k3)

    ye, yo = W.wino_conv_split(*W.pad_split(x), U, bias, relu=True)
    ye2, yo2 = W.wino_conv_split(*W.repad_split(ye, yo), U, bias, relu=True)
    got = W.interleave_cols(ye2, yo2).astype(jnp.float32)

    def direct(t):
        y = jax.lax.conv_general_dilated(
            t[None].astype(jnp.float32), k3, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        return jnp.where(y >= 0, y, 0.2 * y)

    ref = direct(direct(x))
    assert float(jnp.abs(ref - got).max()) < 0.05


@pytest.mark.slow
def test_unet_wino_forward_matches_hybrid(interpret_pallas):
    """Full packed Winograd serving forward == hybrid packed forward."""
    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import (
        s2d,
        transform_params_hybrid,
        transform_params_wino,
        unet_hybrid_forward_packed,
        unet_wino_forward_packed,
    )

    model = UNetSeeInDark(nf=8)
    x = jax.random.uniform(jax.random.key(0), (1, 32, 48, 4), jnp.float32)
    params = model.init(jax.random.key(1), x)["params"]
    g1 = s2d(x)

    ref = unet_hybrid_forward_packed(
        transform_params_hybrid(params), g1).astype(jnp.float32)
    got = unet_wino_forward_packed(
        transform_params_wino(params), g1).astype(jnp.float32)
    assert ref.shape == got.shape
    err = float(jnp.abs(ref - got).max())
    scale = float(jnp.abs(ref).max())
    assert err < 0.02 * max(scale, 1.0), (err, scale)
