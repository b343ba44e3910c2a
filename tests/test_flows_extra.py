"""Extended flow layers: splines, ActNorm, Squeeze, Logit, conditionals."""

import jax
import jax.numpy as jnp
import numpy as np

from pnnp_tpu.models.flows import (
    ActNorm,
    actnorm_data_init,
    Squeeze,
    Logit,
    UniformDequantization,
    NoiseExtraction,
    ConditionalAffine,
    ConditionalLinear,
    SignalDependantNS,
    rational_quadratic_spline,
    unconstrained_rational_quadratic_spline,
)


def test_rq_spline_invertible():
    rng = np.random.default_rng(0)
    K = 8
    shape = (2, 16)
    w = jnp.asarray(rng.standard_normal(shape + (K,)), jnp.float32)
    h = jnp.asarray(rng.standard_normal(shape + (K,)), jnp.float32)
    d = jnp.asarray(rng.standard_normal(shape + (K - 1,)), jnp.float32)
    x = jnp.asarray(rng.uniform(-2, 2, shape), jnp.float32)
    y, ladj = unconstrained_rational_quadratic_spline(x, w, h, d, inverse=False)
    x2, ladj_inv = unconstrained_rational_quadratic_spline(y, w, h, d, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ladj), -np.asarray(ladj_inv), atol=2e-4)
    # outside tail bound: identity
    far = jnp.full(shape, 3.0)
    y_far, l_far = unconstrained_rational_quadratic_spline(far, w, h, d)
    np.testing.assert_allclose(np.asarray(y_far), 3.0)
    np.testing.assert_allclose(np.asarray(l_far), 0.0)


def test_rq_spline_ldj_matches_grad():
    rng = np.random.default_rng(1)
    K = 6
    w = jnp.asarray(rng.standard_normal((1, 1, K)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((1, 1, K)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((1, 1, K + 1)), jnp.float32)

    def f(x):
        y, _ = rational_quadratic_spline(x.reshape(1, 1), w, h, d)
        return y.reshape(())

    x0 = jnp.asarray(0.37)
    deriv = jax.grad(f)(x0)
    _, ladj = rational_quadratic_spline(x0.reshape(1, 1), w, h, d)
    np.testing.assert_allclose(float(ladj[0, 0]), float(jnp.log(deriv)), atol=1e-4)


def test_actnorm_data_init_and_roundtrip(rng):
    x = jnp.asarray(rng.normal(3.0, 2.5, (4, 8, 8, 4)).astype(np.float32))
    layer = ActNorm(features=4)
    v = layer.init(jax.random.key(0), x, method=layer.forward_ldj)
    v = {"params": actnorm_data_init(x)}
    z, ldj = layer.apply(v, x, method=layer.forward_ldj)
    assert abs(float(jnp.mean(z))) < 1e-4
    assert abs(float(jnp.std(z)) - 1.0) < 0.02
    back = layer.apply(v, z, method=layer.inverse)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4, atol=1e-5)
    # ldj consistency
    expected = 64 * np.sum(np.asarray(v["params"]["log_scale"]))
    np.testing.assert_allclose(np.asarray(ldj)[0], expected, rtol=1e-5)


def test_squeeze_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 3)).astype(np.float32))
    layer = Squeeze(factor=2)
    v = layer.init(jax.random.key(0), x, method=layer.forward_ldj)
    z, ldj = layer.apply(v, x, method=layer.forward_ldj)
    assert z.shape == (2, 4, 6, 12)
    back = layer.apply(v, z, method=layer.inverse)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_logit_roundtrip(rng):
    x = jnp.asarray(rng.uniform(0.05, 0.95, (2, 4, 4, 4)).astype(np.float32))
    layer = Logit()
    v = layer.init(jax.random.key(0), x, method=layer.forward_ldj)
    z, ldj = layer.apply(v, x, method=layer.forward_ldj)
    back = layer.apply(v, z, method=layer.inverse)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
    assert np.isfinite(np.asarray(ldj)).all()


def test_uniform_dequantization(rng):
    x = jnp.asarray(rng.integers(0, 256, (2, 4, 4, 1)).astype(np.float32))
    layer = UniformDequantization(num_bits=8)
    v = layer.init({"params": jax.random.key(0), "sample": jax.random.key(1)},
                   x, method=layer.forward_ldj)
    z, ldj = layer.apply(v, x, method=layer.forward_ldj,
                         rngs={"sample": jax.random.key(2)})
    assert float(jnp.min(z)) >= 0 and float(jnp.max(z)) <= 1
    back = layer.apply(v, z, method=layer.inverse)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    np.testing.assert_allclose(np.asarray(ldj), -8 * np.log(2) * 16, rtol=1e-5)


def test_noise_extraction():
    layer = NoiseExtraction()
    x = jnp.ones((1, 2, 2, 4)) * 5.0
    clean = jnp.ones((1, 2, 2, 4)) * 3.0
    v = layer.init(jax.random.key(0), x, clean=clean, method=layer.forward_ldj)
    z, ldj = layer.apply(v, x, clean=clean, method=layer.forward_ldj)
    np.testing.assert_allclose(np.asarray(z), 2.0)
    assert float(ldj[0]) == 0.0


def test_conditional_linear_roundtrip(rng):
    layer = ConditionalLinear(num_channels=4)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 4)).astype(np.float32))
    iso = jnp.full((2, 4, 4, 4), 800.0)
    cam = jnp.full((2, 4, 4, 4), 2.0)
    v = layer.init(jax.random.key(0), x, iso=iso, cam=cam, method=layer.forward_ldj)
    params = jax.tree.map(lambda a: a + 0.1, v["params"])
    z, _ = layer.apply({"params": params}, x, iso=iso, cam=cam, method=layer.forward_ldj)
    back = layer.apply({"params": params}, z, iso=iso, cam=cam, method=layer.inverse)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_signal_dependant_ns_invertible(rng):
    layer = SignalDependantNS(num_channels=4, num_bins=6, hidden=8)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 8, 8, 4)).astype(np.float32))
    clean = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 4)).astype(np.float32))
    v = layer.init(jax.random.key(0), x, clean=clean, method=layer.forward_ldj)
    # perturb params so the spline isn't identity
    v = jax.tree.map(lambda a: a + 0.05, v)
    z, ldj = layer.apply(v, x, clean=clean, method=layer.forward_ldj)
    back = layer.apply(v, z, clean=clean, method=layer.inverse)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=5e-5)
