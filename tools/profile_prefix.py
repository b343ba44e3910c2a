"""Composed-prefix cost profile of the packed hybrid UNet forward.

Times successively longer PREFIXES of unet_hybrid_forward_packed; the
difference between consecutive prefixes is the honest marginal cost of the
added stage inside the real composed program (isolated chains mislead ~2.4x
on this stack; ablation replacements perturb scheduling). Each prefix chains
iterations inside one jit via lax.scan on a dummy carry and forces a host
readback (axon tunnel discipline).

Usage (repo root): python tools/profile_prefix.py [--iters 16]
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


def time_fn(fn, x, iters):
    @jax.jit
    def run(x):
        def body(c, _):
            # scale the input by a carry-dependent factor so scan can't hoist
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
    a = ap.parse_args()

    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import (
        _group_max,
        transform_params_hybrid,
    )

    model = UNetSeeInDark(nf=32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    tp = jax.jit(lambda p: transform_params_hybrid(p, DT))(params)
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

    def stage_head(g1):
        g1 = g1.astype(DT)
        c1g = conv(conv(g1, "conv1_1"), "conv1_2")
        return c1g, _group_max(c1g)

    def stage_c2(p1):
        return conv(conv(p1, "conv2_1"), "conv2_2")

    def stage_c3(c2):
        return conv(conv(pool(c2), "conv3_1"), "conv3_2")

    def stage_c4(c3):
        return conv(conv(pool(c3), "conv4_1"), "conv4_2")

    def stage_c5(c4):
        return conv(conv(pool(c4), "conv5_1"), "conv5_2")

    def stage_c6(c5, c4):
        return conv(dec_conv(up(c5, "upv6"), c4, "conv6_1"), "conv6_2")

    def stage_c7(c6, c3):
        return conv(dec_conv(up(c6, "upv7"), c3, "conv7_1"), "conv7_2")

    def stage_c8(c7, c2):
        return conv(dec_conv(up(c7, "upv8"), c2, "conv8_1"), "conv8_2")

    def stage_tail(c8, c1g):
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

    def prefix(n):
        def f(g1):
            c1g, p1 = stage_head(g1)
            if n == 0:
                return p1
            c2 = stage_c2(p1)
            if n == 1:
                return c2
            c3 = stage_c3(c2)
            if n == 2:
                return c3
            c4 = stage_c4(c3)
            c5 = stage_c5(c4)
            if n == 3:
                return c5
            c6 = stage_c6(c5, c4)
            c7 = stage_c7(c6, c3)
            if n == 4:
                return c7
            c8 = stage_c8(c7, c2)
            if n == 5:
                return c8
            return stage_tail(c8, c1g)

        return f

    names = [
        "head (c1_1+c1_2+gmax)",
        "+ c2 (conv2_1/2_2)",
        "+ c3 (pool+conv3_1/3_2)",
        "+ c4+c5 (bottleneck)",
        "+ c6+c7 (up deep)",
        "+ c8 (upv8+conv8_1/8_2)",
        "+ tail (upv9+c9+head)",
    ]
    prev = 0.0
    for n in range(7):
        t = time_fn(prefix(n), g1, a.iters)
        print(f"prefix {n} {names[n]:26s}: {t*1e3:6.2f} ms  "
              f"(marginal {1e3*(t-prev):+6.2f} ms)")
        prev = t


if __name__ == "__main__":
    main()
