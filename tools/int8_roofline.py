"""Band-by-band roofline close-out of the W8A8 int8 serving forward
(VERDICT r4 #3).

For every band of the composed prefix profile (tools/profile_prefix_int8.py)
this computes the band's exact MAC inventory from the real layer shapes and
reports the band's EFFECTIVE TOP/s (dense FLOPs / composed marginal ms) next
to the per-shape isolated MXU rates measured by tools/bench_int8.py:

    conv3x3 128ch int8 @712x1064 : 89.9 TOP/s   (the wide s8 rate)
    conv3x3  16->128 bf16        : 11.1 TF/s    (narrow-GEMM floor)
    conv3x3  64ch int8           : ~7.4-45 TOP/s (lane-padded: 64/128 lanes)

A band whose effective rate meets or beats its shape class's isolated rate
is CLOSED — XLA's composed schedule is already at the machine rate for that
math, and the only way to move it is different math (fewer/denser MACs),
not a better schedule.

Probes (run on the real TPU):
  --probe-int4   times the dominant wide conv shape in s4xs4->s32 vs s8:
                 if the MXU int4 rate were ~2x s8, re-quantizing the wide
                 convs would be the next lever; if not, there is no
                 lower-precision rate to harvest.

Usage: python tools/int8_roofline.py [--iters 16] [--probe-int4]
CPU smoke: ... --iters 2 --small --cpu
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--probe-int4", action="store_true")
    a = ap.parse_args(argv)

    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax import lax

    from tools.profile_prefix_int8 import main as prefix_main

    H2, W2 = (64, 64) if a.small else (712, 1064)
    px1 = H2 * W2            # level-1 packed pixels
    px2, px3, px4 = px1 // 4, px1 // 16, px1 // 64

    # FLOPs per band (dense MACs x2), from the actual forward's layer shapes
    # (models/unet_s2d_int8.py::_walk at nf=32, dense-s2d L1/L9).
    conv = lambda px, cin, cout: px * 9 * cin * cout * 2
    upT = lambda px_out, cin, cout: px_out * cin * cout * 2  # 2x2 stride-2
    bands = [
        ("head", [("conv1_1 bf16 16->128", conv(px1, 16, 128), "narrow-bf16"),
                  ("conv1_2 s8 128->128", conv(px1, 128, 128), "wide-s8")]),
        ("c2",   [("conv2_1 s8 32->64", conv(px1, 32, 64), "narrow-s8"),
                  ("conv2_2 s8 64->64", conv(px1, 64, 64), "64ch-s8")]),
        ("c3",   [("conv3_1 s8 64->128", conv(px2, 64, 128), "64ch-s8"),
                  ("conv3_2 s8 128->128", conv(px2, 128, 128), "wide-s8")]),
        ("c4+c5", [("conv4_1 s8 128->256", conv(px3, 128, 256), "wide-s8"),
                   ("conv4_2 s8 256->256", conv(px3, 256, 256), "wide-s8"),
                   ("conv5_1 s8 256->512", conv(px4, 256, 512), "wide-s8"),
                   ("conv5_2 s8 512->512", conv(px4, 512, 512), "wide-s8")]),
        ("c6+c7", [("upv6 bf16 512->256", upT(px3, 512, 256), "bf16-upT"),
                   ("conv6_1u/s s8 256", 2 * conv(px3, 256, 256), "wide-s8"),
                   ("conv6_2 s8 256", conv(px3, 256, 256), "wide-s8"),
                   ("upv7 bf16 256->128", upT(px2, 256, 128), "bf16-upT"),
                   ("conv7_1u/s s8 128", 2 * conv(px2, 128, 128), "wide-s8"),
                   ("conv7_2 s8 128", conv(px2, 128, 128), "wide-s8")]),
        ("c8",   [("upv8 bf16 128->64", upT(px1, 128, 64), "bf16-upT"),
                  ("conv8_1u/s s8 64", 2 * conv(px1, 64, 64), "64ch-s8"),
                  ("conv8_2 s8 64", conv(px1, 64, 64), "64ch-s8")]),
        ("tail", [("conv9_1u s8 65->128", conv(px1, 65, 128), "wide-s8"),
                  ("conv9_1s s8 128->128", conv(px1, 128, 128), "wide-s8"),
                  ("conv9_2 s8 128->128", conv(px1, 128, 128), "wide-s8"),
                  ("head einsum 32x4", px1 * 4 * 32 * 4 * 2, "tiny")]),
    ]

    # Composed prefix marginals, re-measured in this run (same method/shapes
    # as the banked STATUS.md table).
    rows = prefix_main(["--iters", str(a.iters)] + (["--small"] if a.small
                       else []) + (["--cpu"] if a.cpu else []))
    marginals = []
    prev = 0.0
    for _, t in rows:
        marginals.append(t - prev)
        prev = t

    # Isolated per-shape MXU rates (tools/bench_int8.py, v5e, banked in
    # STATUS.md round-3): the machine's own numbers for each shape class.
    iso_rates = {"wide-s8": 89.9, "narrow-bf16": 11.1, "64ch-s8": 45.0,
                 "narrow-s8": 45.0, "bf16-upT": 9.0, "tiny": 10.0}

    print(f"\nBand roofline at {H2}x{W2} packed (effective = dense FLOPs / "
          f"composed marginal; iso = what the band would cost at each op's "
          f"ISOLATED measured MXU rate):")
    print(f"{'band':>7} | {'TFLOP':>7} | {'measured ms':>11} | "
          f"{'eff TOP/s':>9} | {'iso ms':>7} | verdict")
    out = []
    for (name, ops), meas in zip(bands, marginals):
        tflop = sum(f for _, f, _ in ops) / 1e12
        iso_ms = sum(f / 1e12 / iso_rates[cls] * 1e3 for _, f, cls in ops)
        eff = tflop / max(meas, 1e-9)  # dense TFLOP / seconds = TOP/s
        verdict = ("CLOSED (>= isolated rate)" if meas <= iso_ms * 1.05
                   else f"{meas / iso_ms:.2f}x isolated-rate cost")
        print(f"{name:>7} | {tflop:7.4f} | {meas*1e3:11.2f} | {eff:9.1f} | "
              f"{iso_ms:7.2f} | {verdict}")
        out.append({"band": name, "tflop": round(tflop, 4),
                    "measured_ms": round(meas * 1e3, 2),
                    "eff_tops": round(eff, 1),
                    "iso_ms": round(iso_ms, 2)})

    int4 = None
    if a.probe_int4:
        # Dominant wide shape in s4: is there a 2x int4 MXU rate to harvest?
        x8 = jnp.ones((1, H2, W2, 128), jnp.int8)
        k8 = jnp.ones((3, 3, 128, 128), jnp.int8)

        def time_conv(x, k, iters):
            @jax.jit
            def run(x):
                def body(c, _):
                    acc = lax.conv_general_dilated(
                        x, k, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.int32)
                    return jnp.clip(acc[..., :x.shape[-1]],
                                    -8, 7).astype(x.dtype), None

                y, _ = lax.scan(body, x, None, length=iters)
                return jnp.sum(y.astype(jnp.float32))

            float(run(x))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(x))
                best = min(best, (time.perf_counter() - t0) / iters)
            return best

        t8 = time_conv(x8, k8, a.iters)
        try:
            t4 = time_conv(x8.astype(jnp.int4), k8.astype(jnp.int4), a.iters)
        except Exception as e:  # int4 conv may not lower on this backend
            t4, int4 = None, {"error": str(e)[:200]}
        fl = conv(px1, 128, 128) / 1e12
        if t4 is not None:
            int4 = {"s8_ms": round(t8 * 1e3, 3), "s4_ms": round(t4 * 1e3, 3),
                    "s8_tops": round(fl / t8 * 1e3, 1),
                    "s4_tops": round(fl / t4 * 1e3, 1)}
            print(f"\nint4 probe (conv3x3 128ch @{H2}x{W2}): "
                  f"s8 {t8*1e3:.3f} ms ({fl/t8*1e3:.1f} TOP/s) vs "
                  f"s4 {t4*1e3:.3f} ms ({fl/t4*1e3:.1f} TOP/s)")
        else:
            print(f"\nint4 probe: s4 conv failed to lower ({int4['error']})")

    print(json.dumps({"metric": "int8_roofline", "bands": out, "int4": int4}))
    return out


if __name__ == "__main__":
    main()
