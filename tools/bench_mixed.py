"""Time hybrid vs fused-head-only vs fused-tail-only vs fused-both (TPU).

Composed full-forward timings, scan-chained in one jit with a host readback.
Usage: python tools/bench_mixed.py [--iters 16] [--th 32] [--tw 136]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

DT = jnp.bfloat16
H2, W2 = 712, 1064
MPIX = 1424 * 2128 * 4 / 1e6


def time_fn(fn, x, iters):
    @jax.jit
    def run(x):
        def body(c, _):
            s, acc = c
            out = fn(x * s)
            return (s * 1.0001, acc + jnp.sum(out.astype(jnp.float32))), None

        (_, acc), _ = jax.lax.scan(
            body, (jnp.float32(1.0), jnp.float32(0.0)), None, length=iters
        )
        return acc

    float(run(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--th", type=int, default=32)
    ap.add_argument("--tw", type=int, default=136)
    a = ap.parse_args()

    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import (
        _group_max, transform_params_fused, unet_hybrid_forward_packed)
    from pnnp_tpu.kernels.s2d_chain import fused_head, fused_tail

    model = UNetSeeInDark(nf=32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    tp = transform_params_fused(params, DT)
    jax.block_until_ready(tp)
    g1 = jax.random.normal(jax.random.key(1), (1, H2, W2, 16), jnp.float32) * 0.1

    k = lambda name: tp[name]["kernel"]
    b = lambda name: tp[name]["bias"]
    lrelu = lambda x: jax.nn.leaky_relu(x, 0.2)
    conv = lambda t, name: lrelu(
        jax.lax.conv_general_dilated(
            t, k(name), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + b(name)
    )
    up = lambda t, name: jax.lax.conv_transpose(
        t, k(name), (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b(name)
    pool = lambda t: jax.lax.reduce_window(
        t, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )

    def dec_conv(up_t, skip, name):
        kk = k(name)
        cu = up_t.shape[-1]
        h = jax.lax.conv_general_dilated(
            up_t, kk[:, :, :cu], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jax.lax.conv_general_dilated(
            skip, kk[:, :, cu:], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return lrelu(h + b(name))

    def xla_head(g1):
        g1 = g1.astype(DT)
        c1g = conv(conv(g1, "conv1_1"), "conv1_2")
        return c1g, _group_max(c1g)

    def xla_tail(c8, c1g):
        ones = jnp.ones(c8.shape[:-1] + (1,), c8.dtype)
        h9 = lrelu(
            jax.lax.conv_general_dilated(
                jnp.concatenate([c8, ones], axis=-1),
                tp["conv9_1"]["kernel_up"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            + jax.lax.conv_general_dilated(
                c1g, tp["conv9_1"]["kernel_skip"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            + b("conv9_1")
        )
        c9g = conv(h9, "conv9_2")
        kh = k("conv10_1")[0, 0]
        n_, h_, w_, c4_ = c9g.shape
        head = jnp.einsum(
            "nhwgc,cd->nhwgd", c9g.reshape(n_, h_, w_, 4, c4_ // 4), kh
        ) + b("conv10_1")
        return head.reshape(n_, h_, w_, -1)

    def mid(p1):
        c2 = conv(conv(p1, "conv2_1"), "conv2_2")
        c3 = conv(conv(pool(c2), "conv3_1"), "conv3_2")
        c4 = conv(conv(pool(c3), "conv4_1"), "conv4_2")
        c5 = conv(conv(pool(c4), "conv5_1"), "conv5_2")
        c6 = conv(dec_conv(up(c5, "upv6"), c4, "conv6_1"), "conv6_2")
        c7 = conv(dec_conv(up(c6, "upv7"), c3, "conv7_1"), "conv7_2")
        c8 = conv(dec_conv(up(c7, "upv8"), c2, "conv8_1"), "conv8_2")
        return c8

    def make(head_mode, tail_mode):
        def f(g1):
            if head_mode == "pallas":
                c1g, p1 = fused_head(g1.astype(DT), tp["_head"],
                                     th=a.th, tw=a.tw)
            else:
                c1g, p1 = xla_head(g1)
            c8 = mid(p1)
            if tail_mode == "pallas":
                return fused_tail(c8, c1g, tp["_tail"], th=a.th, tw=a.tw)
            return xla_tail(c8, c1g)

        return f

    base = time_fn(lambda g: unet_hybrid_forward_packed(tp, g), g1, a.iters)
    print(f"hybrid (packed fn) : {base*1e3:6.2f} ms ({MPIX/base:5.1f} Mpix/s)")
    for hm, tm in [("xla", "xla"), ("pallas", "xla"), ("xla", "pallas"),
                   ("pallas", "pallas")]:
        t = time_fn(make(hm, tm), g1, a.iters)
        print(f"head={hm:6s} tail={tm:6s}: {t*1e3:6.2f} ms "
              f"({MPIX/t:5.1f} Mpix/s)")


if __name__ == "__main__":
    main()
