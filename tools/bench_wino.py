"""Serving-forward A/B: hybrid (XLA dense-s2d) vs Pallas-Winograd tail/head.

Same harness as bench.py (24 packed frames in one jit via lax.map, best-of-8,
host readback); prints one JSON line per variant. Run on the real TPU.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def bench(name, fwd, tp, frames, K, n_iter=8):
    @jax.jit
    def run(tp, frames):
        return jax.lax.map(lambda g: fwd(tp, g).astype(jnp.float32), frames)

    t0 = time.perf_counter()
    float(jnp.sum(run(tp, frames)))
    compile_s = time.perf_counter() - t0
    dt = 1e9
    for _ in range(n_iter):
        t0 = time.perf_counter()
        float(jnp.sum(run(tp, frames)))
        dt = min(dt, (time.perf_counter() - t0) / K)
    B, h2, w2 = frames.shape[1], frames.shape[2], frames.shape[3]
    mpix = B * h2 * w2 * 16 / 1e6
    print(json.dumps({
        "variant": name, "ms_per_frame": round(dt * 1e3, 2),
        "mpix_s": round(mpix / dt, 1), "compile_s": round(compile_s, 1),
    }))
    return dt


def main():
    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import (
        transform_params_hybrid,
        transform_params_wino,
        unet_hybrid_forward_packed,
        unet_wino_forward_packed,
    )

    model = UNetSeeInDark(nf=32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    K, H2, W2 = 24, 712, 1064
    frames = jnp.zeros((K, 1, H2, W2, 16), jnp.float32)

    tp_h = jax.jit(lambda p: transform_params_hybrid(p))(params)
    jax.block_until_ready(tp_h)
    bench("hybrid", unet_hybrid_forward_packed, tp_h, frames, K)

    tp_w = jax.jit(lambda p: transform_params_wino(p))(params)
    jax.block_until_ready(tp_w)
    bench("wino", unet_wino_forward_packed, tp_w, frames, K)


if __name__ == "__main__":
    main()
