"""Row-block / column-dense s2d conv form: 2.67x FLOPs vs the dense form's
4x, with the per-group selection reduced to TWO row-shifted masked adds (no
lane movement — the failure mode of the full 2x2-block form in XLA was its
column selects).

Checks exactness vs the dense hybrid path, then times the composed forward
with the half-dense form applied to the L1/L9 convs.

RESULT (v5e, 2026-08-17): exact (6e-5 bf16) but SLOWER — 23.75 ms vs the
dense hybrid's 21.53 ms composed. The [2,3]-tap conv does not run
proportionally faster than [3,3] (XLA's conv lowering favors the square
kernel), and the two row-shifted masked reads add a full O-tensor of HBM
traffic. Dense-s2d remains the measured sweet spot; kept as the experiment
record alongside kernels/__init__.py's Pallas post-mortems.

Usage: python tools/bench_halfdense.py [--iters 16]
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


def transform_conv3_halfdense(k3):
    """[3,3,C,D] -> [2,3,4C,4D]: rows in exact 2-tap block form
    (dy = 2*(o+t-1)+a-o), columns dense (dx = 2*p + a - o, |dx|<=1)."""
    k3 = np.asarray(k3, np.float32)
    C, D = k3.shape[2], k3.shape[3]
    out = np.zeros((2, 3, 4 * C, 4 * D), np.float32)
    for t_h in (0, 1):
        for p_w in (-1, 0, 1):
            for a_h in (0, 1):
                for a_w in (0, 1):
                    for o_h in (0, 1):
                        for o_w in (0, 1):
                            dy = 2 * (o_h + t_h - 1) + a_h - o_h
                            dx = 2 * p_w + a_w - o_w
                            if abs(dy) <= 1 and abs(dx) <= 1:
                                gi, go = 2 * a_h + a_w, 2 * o_h + o_w
                                out[t_h, p_w + 1,
                                    gi * C:(gi + 1) * C,
                                    go * D:(go + 1) * D] = k3[dy + 1, dx + 1]
    return out


def halfdense_conv(g, kh, n_groups=4):
    """3x3 SAME conv in full-res semantics over the s2d tensor ``g``
    [n,h,w,4C] with a half-dense kernel [2,3,4C,4D]."""
    n, h, w, _ = g.shape
    D4 = kh.shape[-1]
    gp = jnp.pad(g, ((0, 0), (1, 1), (0, 0), (0, 0)))
    o = jax.lax.conv_general_dilated(
        gp, kh, (1, 1), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [n, h+1, w, 4D]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, D4), 3)
    m_top = (lane < D4 // 2).astype(o.dtype)    # out groups o_h=0 (g=0,1)
    return o[:, :h] * m_top + o[:, 1:h + 1] * (1.0 - m_top)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    a = ap.parse_args()

    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import (
        _group_max, _mid_levels, transform_params_hybrid,
        unet_hybrid_forward_packed)

    model = UNetSeeInDark(nf=32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    tp = jax.jit(lambda p: transform_params_hybrid(p, DT))(params)
    jax.block_until_ready(tp)

    # half-dense kernels for the L1/L9 convs, with upv9 folded as in the
    # hybrid transform (ones-channel bias trick)
    raw = {k: np.asarray(jax.device_get(v["kernel"]), np.float32)
           for k, v in params.items()}
    hd = {}
    for name in ("conv1_1", "conv1_2", "conv9_2"):
        hd[name] = jnp.asarray(transform_conv3_halfdense(raw[name]), DT)
    k91 = raw["conv9_1"]  # [3,3,64,32]
    kt = raw["upv9"]      # [2,2,64,32]
    bup = np.asarray(jax.device_get(params["upv9"]["bias"]), np.float32)
    hd_up = transform_conv3_halfdense(k91[:, :, :32])   # [2,3,128,128]
    hd_sk = transform_conv3_halfdense(k91[:, :, 32:])
    w1 = np.concatenate([kt[1 - ah, 1 - aw] for ah in (0, 1) for aw in (0, 1)],
                        axis=-1)  # [64,128]
    w1e = np.zeros((65, 128), np.float32)
    w1e[:64] = w1
    w1e[64] = np.tile(bup, 4)
    hd["k91f"] = jnp.asarray(np.einsum("cd,tpde->tpce", w1e, hd_up), DT)
    hd["k91s"] = jnp.asarray(hd_sk, DT)

    k = lambda name: tp[name]["kernel"]
    b = lambda name: tp[name]["bias"]
    lrelu = lambda x: jax.nn.leaky_relu(x, 0.2)

    def fwd_halfdense(g1):
        g1 = g1.astype(DT)
        c1g = lrelu(halfdense_conv(
            lrelu(halfdense_conv(g1, hd["conv1_1"]) + b("conv1_1")),
            hd["conv1_2"]) + b("conv1_2"))
        p1 = _group_max(c1g)
        c8 = _mid_levels(tp, p1)
        ones = jnp.ones(c8.shape[:-1] + (1,), c8.dtype)
        h9 = lrelu(halfdense_conv(jnp.concatenate([c8, ones], -1), hd["k91f"])
                   + halfdense_conv(c1g, hd["k91s"]) + b("conv9_1"))
        c9g = lrelu(halfdense_conv(h9, hd["conv9_2"]) + b("conv9_2"))
        kh_ = k("conv10_1")[0, 0]
        n_, h_, w_, c4_ = c9g.shape
        head = jnp.einsum(
            "nhwgc,cd->nhwgd", c9g.reshape(n_, h_, w_, 4, c4_ // 4), kh_
        ) + b("conv10_1")
        return head.reshape(n_, h_, w_, -1)

    g1 = jax.random.normal(jax.random.key(1), (1, H2, W2, 16), jnp.float32) * 0.1
    ref = jax.jit(lambda g: unet_hybrid_forward_packed(tp, g))(g1)
    out = jax.jit(fwd_halfdense)(g1)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32))))
    print(f"halfdense vs hybrid max err: {err:.3e}")

    def time_fn(fn, x, iters):
        @jax.jit
        def run(x):
            def body(c, _):
                s, acc = c
                o = fn(x * s)
                return (s * 1.0001, acc + jnp.sum(o.astype(jnp.float32))), None
            (_, acc), _ = jax.lax.scan(
                body, (jnp.float32(1.0), jnp.float32(0.0)), None, length=iters)
            return acc

        float(run(x))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    t = time_fn(lambda g: unet_hybrid_forward_packed(tp, g), g1, a.iters)
    print(f"hybrid (dense L1/L9):  {t*1e3:6.2f} ms ({MPIX/t:5.1f} Mpix/s)")
    t = time_fn(fwd_halfdense, g1, a.iters)
    print(f"half-dense L1/L9:      {t*1e3:6.2f} ms ({MPIX/t:5.1f} Mpix/s)")


if __name__ == "__main__":
    main()
