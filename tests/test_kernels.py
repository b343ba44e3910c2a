"""Exactness of the Pallas fused s2d-chain kernels (interpret mode on CPU).

The fused decoder tail (kernels/s2d_chain.py) must equal the XLA hybrid
packed path bit-for-bit up to f32 accumulation order; TPU-compiled runs are
covered by the bench/serving path (tools/profile_ablate.py anchors).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnnp_tpu.models import UNetSeeInDark
from pnnp_tpu.models.unet_s2d import (
    s2d,
    transform_params_fused,
    transform_params_hybrid,
    unet_fused_forward_packed,
    unet_hybrid_forward_packed,
)


@pytest.fixture(scope="module")
def unet_params():
    model = UNetSeeInDark(nf=32)
    return model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]


@pytest.mark.parametrize(
    "H,W",
    [
        (64, 272),   # tile-divisible (th=32, tw=136)
        (80, 304),   # ragged last tiles in both dims
    ],
)
def test_fused_tail_matches_hybrid(unet_params, H, W, rng):
    x = jnp.asarray(rng.standard_normal((1, 2 * H, 2 * W, 4)).astype(np.float32)) * 0.3
    g1 = s2d(x)
    tp_h = transform_params_hybrid(unet_params, jnp.float32)
    tp_f = transform_params_fused(unet_params, jnp.float32)
    ref = unet_hybrid_forward_packed(tp_h, g1, dtype=jnp.float32)
    out = unet_fused_forward_packed(tp_f, g1, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_fused_tail_residual(unet_params, rng):
    x = jnp.asarray(rng.standard_normal((1, 128, 544, 4)).astype(np.float32)) * 0.3
    g1 = s2d(x)
    tp_h = transform_params_hybrid(unet_params, jnp.float32)
    tp_f = transform_params_fused(unet_params, jnp.float32)
    ref = unet_hybrid_forward_packed(tp_h, g1, res_x=g1, dtype=jnp.float32)
    out = unet_fused_forward_packed(
        tp_f, g1, res_x=g1, dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
