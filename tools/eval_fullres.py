"""Full-resolution end-to-end eval exercise on the real TPU.

Runs the production eval pipeline — %16 reflect pad -> fast dense-s2d
UNetSeeInDark forward -> clip -> illuminance correct -> on-device PSNR/SSIM —
at BOTH real camera frame shapes (SonyA7S2 2848x4256, IMX686 3472x4624
mosaics; reference full-frame semantics trainer_SID.py:221-228), so no
first-compile surprise is left for real-data day. The IMX686 packed dims
(1736x2312) are %16-misaligned and exercise the pad/crop path.

Timing per CLAUDE.md: K frames chained inside one jit (lax.map) with a final
host readback — isolated timings through the axon tunnel lie.

Usage: python tools/eval_fullres.py  ->  one JSON line per shape.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pnnp_tpu.models import UNetSeeInDark
from pnnp_tpu.ops import illuminance_correct, psnr, ssim
from pnnp_tpu.train import create_train_state, make_eval_step

SHAPES = [("SonyA7S2", 2848, 4256), ("IMX686", 3472, 4624)]


def main():
    model = UNetSeeInDark(nf=32)
    state = create_train_state(jax.random.key(0), model,
                               jnp.zeros((1, 64, 64, 4)))
    eval_step = make_eval_step(model, fast=True)

    for cam, H, W in SHAPES:
        h, w = H // 2, W // 2
        K = 4
        key = jax.random.key(1)
        frames = jax.random.uniform(key, (K, 1, h, w, 4), jnp.float32,
                                    0.0, 0.3)
        hr = jax.random.uniform(jax.random.key(2), (1, h, w, 4), jnp.float32,
                                0.0, 1.0)

        @jax.jit
        def pipeline(state, frames, hr):
            def per_frame(lr):
                dn = eval_step(state, lr)
                dn = jnp.clip(dn, 0, 1)
                dn = illuminance_correct(dn, hr)
                p = psnr(dn[0] * 255.0, hr[0] * 255.0)
                s = ssim(dn[0] * 255.0, hr[0] * 255.0)
                return p + s

            return jnp.sum(jax.lax.map(per_frame, frames))

        # make_eval_step(fast=True) returns a python wrapper with a
        # transformed-weight cache; jit of the composed pipeline needs the
        # plain function, so rebuild it inline for timing:
        from pnnp_tpu.models.unet_s2d import (
            transform_params_hybrid,
            unet_hybrid_forward,
        )
        from pnnp_tpu.train.steps import pad_to_multiple

        tparams = jax.jit(
            lambda p: transform_params_hybrid(p, jnp.bfloat16))(state.params)

        @jax.jit
        def pipeline(tparams, frames, hr):  # noqa: F811
            def per_frame(lr):
                x, (Hf, Wf) = pad_to_multiple(lr, 16)
                dn = unet_hybrid_forward(tparams, x, res=False)[:, :Hf, :Wf, :]
                dn = jnp.clip(dn.astype(jnp.float32), 0, 1)
                dn = illuminance_correct(dn, hr)
                p = psnr(dn[0] * 255.0, hr[0] * 255.0)
                s = ssim(dn[0] * 255.0, hr[0] * 255.0)
                return p + s

            return jnp.sum(jax.lax.map(per_frame, frames))

        t0 = time.perf_counter()
        float(pipeline(tparams, frames, hr))  # compile + warmup
        compile_s = time.perf_counter() - t0

        dt = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(pipeline(tparams, frames, hr))
            dt = min(dt, (time.perf_counter() - t0) / K)

        mpix = H * W / 1e6
        print(json.dumps({
            "camera": cam,
            "mosaic": f"{H}x{W}",
            "ms_per_frame": round(dt * 1e3, 2),
            "mpix_s": round(mpix / dt, 1),
            "compile_s": round(compile_s, 1),
            "includes": "pad16+unet+clip+illum_correct+psnr+ssim",
        }))


if __name__ == "__main__":
    main()
