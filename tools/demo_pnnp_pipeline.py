"""Full PNNP pipeline demo, end-to-end on device, no external data.

Stage 1 — noise proxy: train ``pw_iso_2stage`` by maximum likelihood on
"real" dark frames (synthesized here from the physics engine with
Tukey-lambda read + row noise, which the proxy does NOT know analytically),
and report the sampled-vs-real KLD before/after (the reference's
noise-model quality metric).

Stage 2 — denoiser: plug the trained proxy into the Proxy_Dataset synthesis
stage (``make_proxy_synth``) and train UNetSeeInDark, reporting eval PSNR
gain — i.e. the reference's PNNP.yml flow (trainer_SID.py:463-472) with the
withheld proxy replaced by our re-design.

Usage: python tools/demo_pnnp_pipeline.py [--proxy-steps 200] [--unet-steps 100]
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

from pnnp_tpu.models import PixelWiseISOProxy, UNetSeeInDark
from pnnp_tpu.ops import psnr
from pnnp_tpu.ops.kld import kl_div_norm_device
from pnnp_tpu.physics import generate_noisy
from pnnp_tpu.physics import calibration as calib
from pnnp_tpu.train import (
    build_lr_schedule,
    create_train_state,
    make_eval_step,
    make_proxy_synth,
    make_train_step,
)
from pnnp_tpu.train.state import TrainState, make_adam_direction, apply_scaled_updates
from tools.demo_train import synthetic_scenes


def fixed_params(n, iso=1600, ratio=1.0):
    t = calib.ISO_TABLES["SonyA7S2"]
    i = int(np.where(t["iso"] == iso)[0][0])
    rep = lambda v: jnp.full((n,), float(v))
    return dict(
        K=rep(t["Kmax"][i]), sigTL=rep(t["sigTL"][i]), sigR=rep(t["sigR"][i]),
        sigGs=rep(t["sigGs"][i]), bias=jnp.zeros((n, 4)), lam=rep(t["lam"][i]),
        q=rep(t["q"]), ratio=rep(ratio), wp=rep(t["wp"]), bl=rep(t["bl"]),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--proxy-steps", type=int, default=200)
    ap.add_argument("--unet-steps", type=int, default=100)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    a = ap.parse_args(argv)
    iso = 1600

    # ---------------- stage 1: noise proxy ----------------
    proxy = PixelWiseISOProxy(d=256, nf=16, nb=2)
    clean0 = jnp.zeros((1, a.patch, a.patch, 4))
    pvars = proxy.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        clean0, jnp.full((1,), float(iso)),
    )
    pstate = TrainState.create(apply_fn=proxy.apply, params=pvars["params"],
                               tx=make_adam_direction())
    lr_s = build_lr_schedule({"lr_scheduler": "fixed", "learning_rate": 5e-4,
                              "stop_epoch": a.proxy_steps, "last_epoch": 0})

    def dark_frames(key, n):
        """'Real' dark noise: zeros + pgrq physics (TL read, row, quant)."""
        z = generate_noisy(key, jnp.zeros((n, a.patch, a.patch, 4)),
                           fixed_params(n, iso), "pgrq", ori=True)
        return z

    @jax.jit
    def proxy_step(state, noise, epoch):
        def loss_fn(params):
            nll, aux = proxy.apply({"params": params}, noise,
                                   jnp.full((noise.shape[0],), float(iso)),
                                   mode="loss")
            return nll, aux
        (nll, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = apply_scaled_updates(state, grads, lr_s(epoch))
        return state, nll

    def kld_now(state, key):
        k1, k2 = jax.random.split(key)
        real = dark_frames(k1, 4)
        fake = proxy.apply({"params": state.params},
                           jnp.zeros((4, a.patch, a.patch, 4)),
                           jnp.full((4,), float(iso)),
                           rngs={"sample": k2}, mode="sample")
        span = 16383.0 - 512.0
        return float(kl_div_norm_device(real * span, fake * span,
                                        bl=512, wp=16383)["kl_sym"])

    key = jax.random.key(7)
    kld0 = kld_now(pstate, jax.random.key(1234))
    t0 = time.time()
    for it in range(1, a.proxy_steps + 1):
        key, k = jax.random.split(key)
        pstate, nll = proxy_step(pstate, dark_frames(k, a.batch), it)
        if it % max(a.proxy_steps // 4, 1) == 0:
            print(f"[proxy] step {it}: nll/px={float(nll):.4f} "
                  f"kld_sym={kld_now(pstate, jax.random.key(it)):.4f} "
                  f"({(time.time() - t0) / it * 1e3:.0f} ms/step)")
    kld1 = kld_now(pstate, jax.random.key(4321))
    print(f"[proxy] KLD(sym) vs real dark frames: {kld0:.4f} -> {kld1:.4f}")

    # ---------------- stage 2: denoiser through the proxy ----------------
    pparams = pstate.params

    def sample_fn(rng_, clean, iso_):
        return proxy.apply({"params": pparams}, clean, iso_,
                           rngs={"sample": rng_}, mode="sample")

    synth = make_proxy_synth(sample_fn, ori=False, ratio_range=(100.0, 300.0))
    model = UNetSeeInDark(nf=32)
    state = create_train_state(jax.random.key(2), model,
                               jnp.zeros((1, a.patch, a.patch, 4)))
    lr_u = build_lr_schedule({"lr_scheduler": "WarmupCosine", "learning_rate": 2e-4,
                              "stop_epoch": a.unet_steps, "last_epoch": 0,
                              "step_size": 10, "T": 1})
    step = make_train_step(model, lr_u, synth, clip_mode=2, fast=True)
    eval_step = make_eval_step(model, fast=True)

    rng = np.random.default_rng(1997)
    eval_hr = jnp.asarray(synthetic_scenes(rng, 2, a.patch))
    eval_lr = generate_noisy(jax.random.key(100), eval_hr,
                             fixed_params(2, iso, ratio=200.0), "pgrq")
    psnr_in = float(psnr(jnp.clip(eval_lr, 0, 1) * 255, eval_hr * 255))

    t0 = time.time()
    for it in range(1, a.unet_steps + 1):
        batch = {"hr": jnp.asarray(synthetic_scenes(rng, a.batch, a.patch))}
        key, k = jax.random.split(key)
        state, m = step(state, batch, k, it)
        if it % max(a.unet_steps // 4, 1) == 0:
            dn = jnp.clip(eval_step(state, eval_lr), 0, 1)
            p_dn = float(psnr(dn * 255, eval_hr * 255))
            print(f"[unet]  step {it}: loss={float(m['loss']):.4f} "
                  f"eval PSNR {p_dn:.2f} dB (input {psnr_in:.2f}, "
                  f"gain {p_dn - psnr_in:+.2f}) "
                  f"({(time.time() - t0) / it * 1e3:.0f} ms/step)")
    print("done")


if __name__ == "__main__":
    main()
