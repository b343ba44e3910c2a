"""TPU benchmark batch for the fused Pallas kernels vs the XLA hybrid path.

Runs (in one process, tunnel-friendly): correctness check, composed
full-forward bench for both paths, and a tile-size sweep for the kernels.
All timings chain iterations inside one jit with a host readback.

Usage: python tools/bench_fused.py [--iters 24] [--sweep]
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


def bench(fn, x, iters):
    @jax.jit
    def run(c):
        def body(c, _):
            return fn(c).astype(c.dtype), None
        out, _ = jax.lax.scan(body, c, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    float(run(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--sweep", action="store_true")
    a = ap.parse_args()

    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import (
        transform_params_hybrid, transform_params_fused,
        unet_hybrid_forward_packed, unet_fused_forward_packed)
    from pnnp_tpu.kernels import s2d_chain

    model = UNetSeeInDark(nf=32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    tp_h = jax.jit(lambda p: transform_params_hybrid(p, DT))(params)
    tp_f = transform_params_fused(params, DT)
    jax.block_until_ready((tp_h, tp_f))
    g1 = jax.random.normal(jax.random.key(1), (1, H2, W2, 16), jnp.float32) * 0.1

    ref = jax.jit(lambda g: unet_hybrid_forward_packed(tp_h, g))(g1)
    out = jax.jit(lambda g: unet_fused_forward_packed(tp_f, g))(g1)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32))))
    print(f"fused-vs-hybrid max abs err: {err:.3e}")

    t = bench(lambda g: unet_hybrid_forward_packed(tp_h, g), g1, a.iters)
    print(f"hybrid (XLA):        {t*1e3:6.2f} ms/frame ({MPIX/t:6.1f} Mpix/s)")
    t = bench(lambda g: unet_fused_forward_packed(tp_f, g), g1, a.iters)
    print(f"fused head+tail:     {t*1e3:6.2f} ms/frame ({MPIX/t:6.1f} Mpix/s)")

    if a.sweep:
        c1g = jax.random.normal(jax.random.key(2), (1, H2, W2, 128), DT)
        c8 = jax.random.normal(jax.random.key(3), (1, H2, W2, 64), DT)
        mix = lambda o, c: jnp.pad(
            o, ((0, 0), (0, 0), (0, 0), (0, 48))).astype(DT) * 0.5 + c * 0.5
        for th, tw in [(32, 136), (32, 264), (64, 136), (48, 200), (64, 264),
                       (16, 520), (32, 520)]:
            try:
                f = lambda c: mix(s2d_chain.fused_tail(
                    c, c1g, tp_f["_tail"], th=th, tw=tw), c)
                t = bench(f, c8, a.iters)
                print(f"tail th={th:3d} tw={tw:3d}: {t*1e3:6.2f} ms")
            except Exception as e:
                print(f"tail th={th:3d} tw={tw:3d}: FAIL {str(e).splitlines()[0][:70]}")
        for th, tw in [(32, 136), (32, 264), (64, 136), (48, 200), (64, 264)]:
            try:
                def f(c, th=th, tw=tw):
                    a1, p1 = s2d_chain.fused_head(c, tp_f["_head"], th=th, tw=tw)
                    return (a1[..., :16] * 0.5 + p1[..., :16] * 0.1 + c * 0.5).astype(DT)
                t = bench(f, g1.astype(DT), a.iters)
                print(f"head th={th:3d} tw={tw:3d}: {t*1e3:6.2f} ms")
            except Exception as e:
                print(f"head th={th:3d} tw={tw:3d}: FAIL {str(e).splitlines()[0][:70]}")


if __name__ == "__main__":
    main()
