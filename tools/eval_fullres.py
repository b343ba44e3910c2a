"""Full-resolution end-to-end eval exercise on the real TPU.

Times the PRODUCTION fused eval step (make_eval_metrics_step: packed UNet
forward + clip + illuminance correct + PSNR + Pallas-SSIM in one jit) at
BOTH real camera frame shapes (SonyA7S2 2848x4256, IMX686 3472x4624 mosaics;
reference full-frame semantics trainer_SID.py:221-228). The IMX686 packed
dims are %16-misaligned and exercise the pad/crop path.

Timing per CLAUDE.md: K frames chained inside one jit (lax.map) with a final
host readback — isolated timings through the axon tunnel lie.

Usage: python tools/eval_fullres.py  ->  one JSON line per shape.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

SHAPES = [("SonyA7S2", 2848, 4256), ("IMX686", 3472, 4624)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--packed", action="store_true",
                    help="feed host pre-packed frames (pack_frame_np), the "
                         "production loader-worker path — measures the step "
                         "with the on-device input s2d removed")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 interior serving path (unet_s2d_int8); "
                         "metrics stay f32")
    a = ap.parse_args()

    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import transform_params_hybrid
    from pnnp_tpu.train import create_train_state
    from pnnp_tpu.train.steps import make_eval_metrics_step, pad_to_multiple

    model = UNetSeeInDark(nf=32)
    state = create_train_state(jax.random.key(0), model,
                               jnp.zeros((1, 64, 64, 4)))
    tp = jax.jit(lambda p: transform_params_hybrid(p))(state.params)
    qparams = None
    if a.int8:
        from pnnp_tpu.models.unet_s2d_int8 import (
            calibrate_act_scales,
            quantize_params_int8,
        )

        cal = jax.random.uniform(jax.random.key(3), (1, 712, 1064, 16)) * 0.3
        qparams = quantize_params_int8(tp, calibrate_act_scales(tp, [cal]))
    step = make_eval_metrics_step(model, qparams=qparams)

    for cam, H, W in SHAPES:
        h, w = H // 2, W // 2
        K = a.frames
        frames = jax.random.uniform(jax.random.key(1), (K, 1, h, w, 4),
                                    jnp.float32, 0.0, 0.3)
        hr = jax.random.uniform(jax.random.key(2), (1, h, w, 4), jnp.float32)
        hr16, _ = pad_to_multiple(hr, 16)

        if a.packed:
            import numpy as np

            from pnnp_tpu.models.unet_s2d import pack_frame_np

            frames = jnp.asarray(np.stack(
                [pack_frame_np(np.asarray(f)) for f in frames]))

        @jax.jit
        def pipeline(tp, frames, hr16):
            def per_frame(lr):
                if lr.shape[-1] != 16:
                    lr, _ = pad_to_multiple(lr, 16)
                dnp, m = step(tp, lr, hr16, jnp.float32(1.0),
                              ori=False, correct=True, with_inputs=False)
                return m["psnr"] + m["ssim"]

            return jnp.sum(jax.lax.map(per_frame, frames))

        t0 = time.perf_counter()
        float(pipeline(tp, frames, hr16))  # compile + warmup
        compile_s = time.perf_counter() - t0

        dt = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(pipeline(tp, frames, hr16))
            dt = min(dt, (time.perf_counter() - t0) / K)

        mpix = H * W / 1e6
        print(json.dumps({
            "camera": cam,
            "mosaic": f"{H}x{W}",
            "path": ("fused-hybrid" + ("-packed-in" if a.packed else "")
                     + ("-int8" if a.int8 else "")),
            "ms_per_frame": round(dt * 1e3, 2),
            "mpix_s": round(mpix / dt, 1),
            "compile_s": round(compile_s, 1),
            "includes": ("fused unet+clip+illum+psnr+ssim, host-packed input"
                         if a.packed else
                         "fused pad16+unet+clip+illum+psnr+ssim (production step)"),
        }))


if __name__ == "__main__":
    main()
