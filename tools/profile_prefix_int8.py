"""Composed-prefix cost profile of the W8A8 int8 packed serving forward.

Same methodology as tools/profile_prefix.py (successively longer prefixes
of the real composed program, chained in one jit, host readback), applied
to the int8 path (models/unet_s2d_int8.py::_walk with qparams): the
marginal column says where the remaining ms/frame of the 670 Mpix/s
headline live — which decides whether another quant/fusion lever is worth
building.

Usage (repo root, real TPU): python tools/profile_prefix_int8.py [--iters 16]
CPU smoke: ... --iters 2 --small --cpu
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--small", action="store_true",
                    help="64x64 packed input (CPU smoke)")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args(argv)

    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax import lax

    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import _group_max, transform_params_hybrid
    from pnnp_tpu.models.unet_s2d_int8 import (
        calibrate_act_scales,
        quantize_params_int8,
    )

    DT = jnp.bfloat16
    H2, W2 = (64, 64) if a.small else (712, 1064)

    model = UNetSeeInDark(nf=32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    tp = jax.jit(lambda p: transform_params_hybrid(p, DT))(params)
    jax.block_until_ready(tp)
    g1 = jax.random.normal(jax.random.key(1), (1, H2, W2, 16), jnp.float32) * 0.1
    qp = quantize_params_int8(tp, calibrate_act_scales(tp, [g1], pct=99.95))

    k = lambda name: tp[name]["kernel"]
    b = lambda name: tp[name]["bias"]
    lrelu = lambda x: jax.nn.leaky_relu(x, 0.2)

    def conv_same(t, kk, prefer=None):
        return lax.conv_general_dilated(
            t, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=prefer)

    def q(x, name):
        s = qp["act_scale"][name]
        return jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                        -127, 127).astype(jnp.int8)

    def conv_q(x, name):
        layer = qp["layers"][name]
        acc = conv_same(q(x, name), layer["kq"], prefer=jnp.int32)
        return lrelu(acc.astype(jnp.float32) * layer["m"] + layer["bias"]
                     ).astype(DT)

    def dec_conv_q(up_t, skip, name):
        lu, ls = qp["layers"][name + "u"], qp["layers"][name + "s"]
        acc_u = conv_same(q(up_t, name + "u"), lu["kq"], prefer=jnp.int32)
        acc_s = conv_same(q(skip, name + "s"), ls["kq"], prefer=jnp.int32)
        return lrelu(acc_u.astype(jnp.float32) * lu["m"]
                     + acc_s.astype(jnp.float32) * ls["m"] + lu["bias"]
                     ).astype(DT)

    up = lambda t, name: lax.conv_transpose(
        t, k(name), (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b(name)
    pool = lambda t: lax.reduce_window(
        t, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def stage_head(g1):
        g1 = g1.astype(DT)
        c1 = lrelu(conv_same(g1, k("conv1_1")) + b("conv1_1"))
        c1g = conv_q(c1, "conv1_2")
        return c1g, _group_max(c1g)

    def stage_c2(p1):
        return conv_q(conv_q(p1, "conv2_1"), "conv2_2")

    def stage_c3(c2):
        return conv_q(conv_q(pool(c2), "conv3_1"), "conv3_2")

    def stage_c45(c3):
        c4 = conv_q(conv_q(pool(c3), "conv4_1"), "conv4_2")
        c5 = conv_q(conv_q(pool(c4), "conv5_1"), "conv5_2")
        return c4, c5

    def stage_c67(c5, c4, c3):
        c6 = conv_q(dec_conv_q(up(c5, "upv6"), c4, "conv6_1"), "conv6_2")
        c7 = conv_q(dec_conv_q(up(c6, "upv7"), c3, "conv7_1"), "conv7_2")
        return c7

    def stage_c8(c7, c2):
        return conv_q(dec_conv_q(up(c7, "upv8"), c2, "conv8_1"), "conv8_2")

    def stage_tail(c8, c1g):
        ones = jnp.ones(c8.shape[:-1] + (1,), c8.dtype)
        up9_in = jnp.concatenate([c8, ones], axis=-1)
        lu, ls = qp["layers"]["conv9_1u"], qp["layers"]["conv9_1s"]
        acc_u = conv_same(q(up9_in, "conv9_1u"), lu["kq"], prefer=jnp.int32)
        acc_s = conv_same(q(c1g, "conv9_1s"), ls["kq"], prefer=jnp.int32)
        h9 = lrelu(acc_u.astype(jnp.float32) * lu["m"]
                   + acc_s.astype(jnp.float32) * ls["m"] + lu["bias"]
                   ).astype(DT)
        c9g = conv_q(h9, "conv9_2")
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
            c4, c5 = stage_c45(c3)
            if n == 3:
                return c5
            c7 = stage_c67(c5, c4, c3)
            if n == 4:
                return c7
            c8 = stage_c8(c7, c2)
            if n == 5:
                return c8
            return stage_tail(c8, c1g)

        return f

    def time_fn(fn, x, iters):
        @jax.jit
        def run(x):
            def body(c, _):
                s, acc = c
                out = fn(x * s)
                return (s * 1.0001,
                        acc + jnp.sum(out.astype(jnp.float32))), None

            (_, acc), _ = lax.scan(
                body, (jnp.float32(1.0), jnp.float32(0.0)), None,
                length=iters)
            return acc

        float(run(x))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    names = [
        "head (c1_1 bf16 + c1_2 q + gmax)",
        "+ c2 (q conv2_1/2_2)",
        "+ c3 (pool + q)",
        "+ c4+c5 (bottleneck q)",
        "+ c6+c7 (up bf16 + dec q)",
        "+ c8 (upv8 + dec q)",
        "+ tail (q conv9 + head einsum)",
    ]
    prev = 0.0
    rows = []
    for n in range(7):
        t = time_fn(prefix(n), g1, a.iters)
        print(f"prefix {n} {names[n]:34s}: {t*1e3:6.2f} ms  "
              f"(marginal {1e3*(t-prev):+6.2f} ms)")
        rows.append((names[n], t))
        prev = t
    return rows


if __name__ == "__main__":
    main()
