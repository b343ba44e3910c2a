"""Marginal per-layer cost of the packed hybrid UNet forward, by ablation.

Isolated per-op chains mislead on this stack (XLA schedules composed programs
very differently — measured 2.4x); the honest marginal cost of layer L is
time(full) - time(full with L replaced by a shape-preserving no-op). All
timings chain iterations inside one jit with a host readback (axon tunnel).

Usage (repo root): python tools/profile_ablate.py [--iters 24]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pnnp_tpu.models import UNetSeeInDark
from pnnp_tpu.models.unet_s2d import _group_max, transform_params_hybrid

DT = jnp.bfloat16


def forward(tparams, g1, skip=()):
    """unet_hybrid_forward_packed with named layers ablated to no-ops."""
    k = lambda name: tparams[name]["kernel"]
    b = lambda name: tparams[name]["bias"]
    g1 = g1.astype(DT)
    lrelu = lambda x: jax.nn.leaky_relu(x, 0.2)

    def conv(t, name):
        if name in skip:
            co = k(name).shape[-1]
            ci = t.shape[-1]
            if co == ci:
                return lrelu(t + b(name))
            r = -(-co // ci)
            return lrelu(jnp.concatenate([t] * r, -1)[..., :co] + b(name))
        return lrelu(
            jax.lax.conv_general_dilated(
                t, k(name), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b(name)
        )

    def up(t, name):
        if name in skip:
            co = k(name).shape[-1]
            n_, h_, w_, _ = t.shape
            return jnp.pad(t[..., :co], ((0, 0), (0, h_), (0, w_), (0, 0)))
        return jax.lax.conv_transpose(
            t, k(name), (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b(name)

    def pool(t):
        if "pools" in skip:
            return t[:, ::2, ::2, :]
        return jax.lax.reduce_window(
            t, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def dec_conv(up_t, skip_t, name):
        if name in skip:
            co = k(name).shape[-1]
            return lrelu(up_t[..., :co] + b(name))
        kk = k(name)
        cu = up_t.shape[-1]
        h = jax.lax.conv_general_dilated(
            up_t, kk[:, :, :cu], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jax.lax.conv_general_dilated(
            skip_t, kk[:, :, cu:], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return lrelu(h + b(name))

    c1g = conv(conv(g1, "conv1_1"), "conv1_2")
    p1 = c1g[..., :32] if "gmax" in skip else _group_max(c1g)
    c2 = conv(conv(p1, "conv2_1"), "conv2_2")
    c3 = conv(conv(pool(c2), "conv3_1"), "conv3_2")
    c4 = conv(conv(pool(c3), "conv4_1"), "conv4_2")
    c5 = conv(conv(pool(c4), "conv5_1"), "conv5_2")
    c6 = conv(dec_conv(up(c5, "upv6"), c4, "conv6_1"), "conv6_2")
    c7 = conv(dec_conv(up(c6, "upv7"), c3, "conv7_1"), "conv7_2")
    c8 = conv(dec_conv(up(c7, "upv8"), c2, "conv8_1"), "conv8_2")

    if "conv9_1" in skip:
        h9 = lrelu(jnp.concatenate([c8, c8], axis=-1) + b("conv9_1"))
    else:
        # production form: upv9 folded into conv9_1's up-path kernel
        ones = jnp.ones(c8.shape[:-1] + (1,), c8.dtype)
        h9 = lrelu(
            jax.lax.conv_general_dilated(
                jnp.concatenate([c8, ones], axis=-1),
                tparams["conv9_1"]["kernel_up"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            + jax.lax.conv_general_dilated(
                c1g, tparams["conv9_1"]["kernel_skip"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            + b("conv9_1")
        )
    c9g = conv(h9, "conv9_2")

    if "head" in skip:
        return c9g[..., :16]
    kh = k("conv10_1")[0, 0]
    n_, h_, w_, c4_ = c9g.shape
    head = jnp.einsum(
        "nhwgc,cd->nhwgd", c9g.reshape(n_, h_, w_, 4, c4_ // 4), kh
    ) + b("conv10_1")
    return head.reshape(n_, h_, w_, -1)


def time_frame(tp, g1, skip, iters):
    @jax.jit
    def run(c):
        def body(c, _):
            return forward(tp, c, skip=skip).astype(jnp.float32), None
        out, _ = jax.lax.scan(body, c, None, length=iters)
        return jnp.sum(out)

    float(run(g1))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(g1))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24)
    args = ap.parse_args()

    H2, W2 = 712, 1064
    model = UNetSeeInDark(nf=32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    tp = jax.jit(lambda pr: transform_params_hybrid(pr, DT))(params)
    jax.block_until_ready(tp)
    g1 = jax.random.normal(jax.random.key(1), (1, H2, W2, 16), jnp.float32) * 0.01

    base = time_frame(tp, g1, (), args.iters)
    print(f"base frame: {base*1e3:.2f} ms ({1424*2128*4/1e6/base:.1f} Mpix/s)\n")

    groups = [
        ("upv6",), ("upv7",), ("upv8",), ("conv9_1",),
        ("head",), ("gmax",), ("pools",),
        ("upv6", "upv7", "upv8"),
        ("head", "gmax", "conv9_1", "pools"),
    ]
    for g in groups:
        t = time_frame(tp, g1, g, args.iters)
        print(f"ablate {'+'.join(g):28s}: {t*1e3:7.2f} ms  (marginal {1e3*(base-t):6.2f} ms)")


if __name__ == "__main__":
    main()
