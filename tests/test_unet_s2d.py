"""Exactness of the space-to-depth UNet fast path vs the standard model."""

import jax
import jax.numpy as jnp
import numpy as np

from pnnp_tpu.models import UNetSeeInDark
from pnnp_tpu.models.unet_s2d import (
    s2d,
    d2s,
    unet_s2d_forward,
    _s2d_conv_pre,
    _transform_conv3_kernel,
    _group_max,
    _up_as_1x1,
)


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 3)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(d2s(s2d(x))), np.asarray(x))


def test_s2d_conv_matches_conv3x3(rng):
    C, D = 3, 5
    x = jnp.asarray(rng.standard_normal((1, 16, 12, C)).astype(np.float32))
    k3 = jnp.asarray(rng.standard_normal((3, 3, C, D)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((D,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, k3, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias
    ours = d2s(_s2d_conv_pre(s2d(x), _transform_conv3_kernel(k3),
                               jnp.tile(bias, 4)))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_group_max_matches_maxpool(rng):
    import flax.linen as nn

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    ours = _group_max(s2d(x))
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_up_as_1x1_matches_convtranspose(rng):
    import flax.linen as nn

    Cin, Cout = 6, 4
    x = jnp.asarray(rng.standard_normal((1, 5, 7, Cin)).astype(np.float32))
    kt = jnp.asarray(rng.standard_normal((2, 2, Cin, Cout)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((Cout,)).astype(np.float32))
    mod = nn.ConvTranspose(Cout, (2, 2), strides=(2, 2))
    ref = mod.apply({"params": {"kernel": kt, "bias": bias}}, x)
    ours = d2s(_up_as_1x1(x, kt, bias))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_full_unet_equivalence(rng):
    model = UNetSeeInDark(nf=4)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 4)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    params = jax.tree.map(lambda a: a * 5.0, params)  # amplify potential mismatches
    ref = model.apply(params, x)
    ours = unet_s2d_forward(params["params"], x, res=False, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-3, atol=2e-5)


def test_full_unet_equivalence_res(rng):
    model = UNetSeeInDark(nf=4, res=True)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 4)).astype(np.float32))
    params = model.init(jax.random.key(1), x)
    params = jax.tree.map(lambda a: a * 5.0, params)
    ref = model.apply(params, x)
    ours = unet_s2d_forward(params["params"], x, res=True, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-3, atol=2e-5)


def test_hybrid_forward_equivalence(rng):
    from pnnp_tpu.models.unet_s2d import transform_params_hybrid, unet_hybrid_forward

    model = UNetSeeInDark(nf=4)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 4)).astype(np.float32))
    params = model.init(jax.random.key(2), x)
    params = jax.tree.map(lambda a: a * 5.0, params)
    ref = model.apply(params, x)
    tp = transform_params_hybrid(params["params"], dtype=jnp.float32)
    ours = unet_hybrid_forward(tp, x, res=False, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-3, atol=2e-5)


def test_packed_forward_equivalence(rng):
    """Packed-I/O production path == standard model modulo the s2d packing."""
    from pnnp_tpu.models.unet_s2d import (
        transform_params_hybrid,
        unet_hybrid_forward_packed,
    )

    model = UNetSeeInDark(nf=4)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 4)).astype(np.float32))
    params = model.init(jax.random.key(3), x)
    params = jax.tree.map(lambda a: a * 5.0, params)
    ref = model.apply(params, x)
    tp = transform_params_hybrid(params["params"], dtype=jnp.float32)
    out_packed = unet_hybrid_forward_packed(tp, s2d(x), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(d2s(out_packed)), np.asarray(ref), rtol=1e-3, atol=2e-5
    )
