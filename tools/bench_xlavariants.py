"""XLA-level variants of the packed hybrid forward: fold upv9 into conv9_1,
cheaper group_max forms. Measures composed full-forward time per variant and
max-abs error vs the current hybrid path (same dtype, so differences are
accumulation-order only).

Usage: python tools/bench_xlavariants.py [--iters 16]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

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
    a = ap.parse_args()

    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import (
        transform_params_hybrid, unet_hybrid_forward_packed)

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
    cconv = lambda t, kk: jax.lax.conv_general_dilated(
        t, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
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
        h = cconv(up_t, kk[:, :, :cu]) + cconv(skip, kk[:, :, cu:])
        return lrelu(h + b(name))

    # --- folded tail weights (built once, f32 -> DT) -----------------------
    k91 = np.asarray(jax.device_get(k("conv9_1")), np.float32)  # [3,3,512,512]
    # rows layout of conv9_1's dense kernel: input groups are
    # [up(32) | skip(32)] x 4 — recover via the same row map the hybrid uses.
    cu_, cs_ = 32, 32
    rows = np.arange(k91.shape[2]).reshape(4, cu_ + cs_)
    k91_up = k91[:, :, rows[:, :cu_].reshape(-1)]   # [3,3,128,512]
    k91_sk = k91[:, :, rows[:, cu_:].reshape(-1)]   # [3,3,128,512]
    w1 = np.asarray(jax.device_get(k("upv9")), np.float32)      # [64,128]
    bup = np.asarray(jax.device_get(b("upv9")), np.float32)     # [128]
    # fold: conv(einsum(c8,w1)+bup, k91_up) == conv([c8|1], kf) with
    # kf[:, :, :64] = w1 @ k91_up, kf[:, :, 64] = bup @ k91_up
    kf = np.einsum("cd,pqde->pqce", w1, k91_up)     # [3,3,64,512]
    kb_row = np.einsum("d,pqde->pqe", bup, k91_up)  # [3,3,512]
    kf65 = np.concatenate([kf, kb_row[:, :, None, :]], axis=2)  # [3,3,65,512]
    kf_dt = jnp.asarray(kf65, DT)
    ksk_dt = jnp.asarray(k91_sk, DT)

    def tail_current(c8, c1g):
        g_up = jnp.einsum("nhwc,cd->nhwd", c8, k("upv9")) + b("upv9")
        h9 = lrelu(cconv(g_up, jnp.asarray(k91_up, DT))
                   + cconv(c1g, ksk_dt) + b("conv9_1"))
        c9g = conv(h9, "conv9_2")
        kh = k("conv10_1")[0, 0]
        n_, h_, w_, c4_ = c9g.shape
        head = jnp.einsum(
            "nhwgc,cd->nhwgd", c9g.reshape(n_, h_, w_, 4, c4_ // 4), kh
        ) + b("conv10_1")
        return head.reshape(n_, h_, w_, -1)

    def tail_folded(c8, c1g):
        ones = jnp.ones(c8.shape[:-1] + (1,), c8.dtype)
        c8e = jnp.concatenate([c8, ones], axis=-1)   # [*, 65]
        h9 = lrelu(cconv(c8e, kf_dt) + cconv(c1g, ksk_dt) + b("conv9_1"))
        c9g = conv(h9, "conv9_2")
        kh = k("conv10_1")[0, 0]
        n_, h_, w_, c4_ = c9g.shape
        head = jnp.einsum(
            "nhwgc,cd->nhwgd", c9g.reshape(n_, h_, w_, 4, c4_ // 4), kh
        ) + b("conv10_1")
        return head.reshape(n_, h_, w_, -1)

    # --- group_max variants -------------------------------------------------
    def gmax_reshape(c1g):
        n, h, w, c4 = c1g.shape
        return jnp.max(c1g.reshape(n, h, w, 4, c4 // 4), axis=3)

    def gmax_slices(c1g):
        return jnp.maximum(
            jnp.maximum(c1g[..., 0:32], c1g[..., 32:64]),
            jnp.maximum(c1g[..., 64:96], c1g[..., 96:128]),
        )

    perms = np.zeros((4, 128, 32), np.float32)
    for g in range(4):
        perms[g, g * 32 : (g + 1) * 32, :] = np.eye(32)
    perms = jnp.asarray(perms, DT)

    def gmax_matmul(c1g):
        m = None
        for g in range(4):
            t = jnp.einsum("nhwc,cd->nhwd", c1g, perms[g])
            m = t if m is None else jnp.maximum(m, t)
        return m

    # --- composed forward parameterized by variants -------------------------
    def make(gmax_fn, tail_fn):
        def f(g1):
            g1 = g1.astype(DT)
            c1g = conv(conv(g1, "conv1_1"), "conv1_2")
            p1 = gmax_fn(c1g)
            c2 = conv(conv(p1, "conv2_1"), "conv2_2")
            c3 = conv(conv(pool(c2), "conv3_1"), "conv3_2")
            c4 = conv(conv(pool(c3), "conv4_1"), "conv4_2")
            c5 = conv(conv(pool(c4), "conv5_1"), "conv5_2")
            c6 = conv(dec_conv(up(c5, "upv6"), c4, "conv6_1"), "conv6_2")
            c7 = conv(dec_conv(up(c6, "upv7"), c3, "conv7_1"), "conv7_2")
            c8 = conv(dec_conv(up(c7, "upv8"), c2, "conv8_1"), "conv8_2")
            return tail_fn(c8, c1g)

        return f

    base = jax.jit(lambda g: unet_hybrid_forward_packed(tp, g))
    ref = base(g1)

    variants = [
        ("base hybrid", lambda g: unet_hybrid_forward_packed(tp, g)),
        ("gmax=slices", make(gmax_slices, tail_current)),
        ("gmax=matmul", make(gmax_matmul, tail_current)),
        ("tail=folded", make(gmax_reshape, tail_folded)),
        ("gmax=slices + tail=folded", make(gmax_slices, tail_folded)),
        ("gmax=matmul + tail=folded", make(gmax_matmul, tail_folded)),
    ]
    for name, f in variants:
        out = jax.jit(f)(g1)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        t = time_fn(f, g1, a.iters)
        print(f"{name:28s}: {t*1e3:6.2f} ms ({MPIX/t:5.1f} Mpix/s)"
              f"  err={err:.2e}")


if __name__ == "__main__":
    main()
