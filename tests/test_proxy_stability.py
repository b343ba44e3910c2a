"""Regression: pw_iso proxy NLL training stays stable past ~200 steps.

Round-1 failure mode (STATUS.md r1 §3): the PWL-quantile head gave
heavy-tailed (Tukey-lambda) dark-frame samples outside the learned support
only an ad-hoc exponential falloff, so NLL training diverged past ~200 steps
(pixel NLL 3.3->6.3, sampled-vs-real KLD 0.05->2.1). The explicit Laplace
mixture tail (models/proxy.py) fixed it; this test trains well past the old
divergence point and asserts NLL and KLD stay sane.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnnp_tpu.models import PixelWiseISOProxy
from pnnp_tpu.ops.kld import kl_div_norm_device
from pnnp_tpu.physics import generate_noisy
from pnnp_tpu.physics import calibration as calib
from pnnp_tpu.train.state import (
    TrainState,
    apply_scaled_updates,
    make_adam_direction,
)

pytestmark = pytest.mark.slow

ISO = 1600
PATCH = 32


def _fixed_params(n, ratio=1.0):
    t = calib.ISO_TABLES["SonyA7S2"]
    i = int(np.where(t["iso"] == ISO)[0][0])
    rep = lambda v: jnp.full((n,), float(v))
    return dict(
        K=rep(t["Kmax"][i]), sigTL=rep(t["sigTL"][i]), sigR=rep(t["sigR"][i]),
        sigGs=rep(t["sigGs"][i]), bias=jnp.zeros((n, 4)), lam=rep(t["lam"][i]),
        q=rep(t["q"]), ratio=rep(ratio), wp=rep(t["wp"]), bl=rep(t["bl"]),
    )


def _dark_frames(key, n):
    return generate_noisy(key, jnp.zeros((n, PATCH, PATCH, 4)),
                          _fixed_params(n), "pgrq", ori=True)


def test_proxy_nll_training_survives_long_run():
    proxy = PixelWiseISOProxy(d=256, nf=16, nb=2)
    pvars = proxy.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, PATCH, PATCH, 4)), jnp.full((1,), float(ISO)),
    )
    state = TrainState.create(apply_fn=proxy.apply, params=pvars["params"],
                              tx=make_adam_direction())

    @jax.jit
    def step(state, noise):
        def loss_fn(params):
            nll, aux = proxy.apply({"params": params}, noise,
                                   jnp.full((noise.shape[0],), float(ISO)),
                                   mode="loss")
            return nll, aux
        (nll, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return apply_scaled_updates(state, grads, 5e-4), nll

    def kld_now(state, key):
        k1, k2 = jax.random.split(key)
        real = _dark_frames(k1, 4)
        fake = proxy.apply({"params": state.params},
                           jnp.zeros((4, PATCH, PATCH, 4)),
                           jnp.full((4,), float(ISO)),
                           rngs={"sample": k2}, mode="sample")
        span = 16383.0 - 512.0
        return float(kl_div_norm_device(real * span, fake * span,
                                        bl=512, wp=16383)["kl_sym"])

    key = jax.random.key(7)
    nll_hist, kld_hist = [], []
    for it in range(1, 451):
        key, k = jax.random.split(key)
        state, nll = step(state, _dark_frames(k, 8))
        if it in (50, 150, 300, 450):
            nll_hist.append(float(nll))
            kld_hist.append(kld_now(state, jax.random.key(it)))

    # no divergence past the old ~200-step blow-up point
    assert all(np.isfinite(nll_hist)), nll_hist
    assert nll_hist[-1] <= nll_hist[0] + 0.05, nll_hist
    assert kld_hist[-1] < 0.15, kld_hist
    assert max(kld_hist[1:]) < 0.3, kld_hist
