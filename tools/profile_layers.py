"""Per-layer cost profile of the packed hybrid UNet forward on the live chip.

Times each conv shape of pnnp_tpu.models.unet_s2d.unet_hybrid_forward_packed
by chaining dependent iterations inside ONE jit (axon tunnel: isolated
microbenchmarks lie; block_until_ready is unreliable — force a host
readback). Same-channel convs chain directly (exact); ci!=co convs chain as a
ci->co->ci round trip and report half the pair time. Prints ms/frame and
effective TFLOP/s per layer plus the composed full-forward anchor.

Usage: python tools/profile_layers.py [--iters 30]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

DT = jnp.bfloat16


def _conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def time_scan(step, x0, iters):
    """step: x -> x (same shape/dtype). Returns s/iter of the chained loop."""

    @jax.jit
    def run(x):
        def body(c, _):
            return step(c), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    float(run(x0))  # compile + warm
    t0 = time.perf_counter()
    float(run(x0))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    key = jax.random.key(0)

    H2, W2 = 712, 1064  # packed spatial (SID frame 2848x4256 mosaic)
    S1 = (1, H2, W2)
    S3 = (1, H2 // 2, W2 // 2)
    S4 = (1, H2 // 4, W2 // 4)
    S5 = (1, H2 // 8, W2 // 8 + 1)

    # (name, spatial, Cin, Cout, count in the frame)
    layers = [
        ("conv1_1 d-s2d", S1, 16, 128, 1),
        ("conv1_2 d-s2d", S1, 128, 128, 1),
        ("conv2_1", S1, 32, 64, 1),
        ("conv2_2", S1, 64, 64, 1),
        ("conv3_1", S3, 64, 128, 1),
        ("conv3_2/7_1s/7_2", S3, 128, 128, 4),
        ("conv4_1", S4, 128, 256, 1),
        ("conv4_2/6_1s/6_2", S4, 256, 256, 4),
        ("conv5_1", S5, 256, 512, 1),
        ("conv5_2", S5, 512, 512, 1),
        ("conv8_1s/8_2", S1, 64, 64, 3),
        ("conv9_1s d-s2d/9_2", S1, 128, 128, 3),
    ]

    total = 0.0
    print(f"{'layer':22s} {'shape':24s} {'ms':>8s} {'TFLOP/s':>8s} {'xN':>3s} {'tot ms':>7s}")
    for name, sp, ci, co, count in layers:
        x = jax.random.normal(key, (*sp, ci), DT)
        if ci == co:
            k = (jax.random.normal(key, (3, 3, ci, co), DT) / (3 * ci ** 0.5))
            sec = time_scan(lambda c: _conv(c, k), x, args.iters)
            fl = 2 * 9 * ci * co * sp[1] * sp[2]
        else:
            k1 = jax.random.normal(key, (3, 3, ci, co), DT) / (3 * ci ** 0.5)
            k2 = jax.random.normal(key, (3, 3, co, ci), DT) / (3 * co ** 0.5)
            sec = time_scan(lambda c: _conv(_conv(c, k1), k2), x, args.iters) / 2
            fl = 2 * 9 * ci * co * sp[1] * sp[2]
        total += sec * count
        print(f"{name:22s} {str((*sp, ci))+'->'+str(co):24s} "
              f"{sec*1e3:8.3f} {fl/sec/1e12:8.1f} x{count} {sec*count*1e3:7.2f}")

    # convT up layers: chain convT(2x2,s2) then 2x2-s2-conv back down (pair/2)
    for nm, sp, ci, co in [("upv6", S5, 512, 256), ("upv7", S4, 256, 128),
                           ("upv8", S3, 128, 64)]:
        x = jax.random.normal(key, (*sp, ci), DT)
        ku = jax.random.normal(key, (2, 2, ci, co), DT) / (2 * ci ** 0.5)
        kd = jax.random.normal(key, (2, 2, co, ci), DT) / (2 * co ** 0.5)

        def step(c, ku=ku, kd=kd):
            o = jax.lax.conv_transpose(
                c, ku, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                o, kd, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        sec = time_scan(step, x, args.iters) / 2
        total += sec
        print(f"{nm+' convT (~half pair)':22s} {str((*sp, ci))+'->'+str(co):24s} "
              f"{sec*1e3:8.3f} {'':>8s} x1  {sec*1e3:7.2f}")

    # group_max (L1) + upv9 einsum + head: elementwise/matmul, time as one blob
    x1 = jax.random.normal(key, (*S1, 128), DT)
    p = jax.random.normal(key, (32, 128), DT) / (32 ** 0.5)

    def gstep(c):
        n, h, w, c4 = c.shape
        m = jnp.max(c.reshape(n, h, w, 4, c4 // 4), axis=3)
        return jnp.einsum("nhwc,cd->nhwd", m, p)

    sec = time_scan(gstep, x1, args.iters)
    total += sec * 2  # group_max+proj occurs ~2x (p1 path, upv9/head paths)
    print(f"{'gmax+1x1 (x2)':22s} {'':24s} {sec*1e3:8.3f} {'':>8s} x2  {sec*2*1e3:7.2f}")

    print(f"\nsum of parts: {total*1e3:.2f} ms")

    # anchor: full packed forward, chained with a real data dependence
    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import (
        transform_params_hybrid, unet_hybrid_forward_packed)

    model = UNetSeeInDark(nf=32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    tp = jax.jit(lambda pr: transform_params_hybrid(pr, DT))(params)
    jax.block_until_ready(tp)
    g1 = jax.random.normal(key, (1, H2, W2, 16), jnp.float32) * 0.01

    def fstep(c):
        return unet_hybrid_forward_packed(tp, c).astype(jnp.float32)

    sec = time_scan(fstep, g1, args.iters)
    print(f"full packed forward: {sec*1e3:.2f} ms/frame "
          f"({1424*2128*4/1e6/sec:.1f} Mpix/s)")


if __name__ == "__main__":
    main()
