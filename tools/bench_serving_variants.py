"""Serving-loop structure A/B: can unrolling recover the ~1.5 ms loop floor?

kernels/__init__.py post-mortem #5 measured the lax.map serving loop's
per-frame floor at ~1.5 ms (identity body, layout-independent) and showed
that BATCHING frames into one conv batch loses more than the floor returns.
Untried there: SEQUENTIAL unrolling — a scan body that processes k
independent frames one after another, giving XLA's scheduler freedom to
interleave across frames without changing any conv's batch size.

Prints one JSON line per variant (ms/frame, best-of-n, chained in one jit
with a forced host readback per CLAUDE.md discipline).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import (
        transform_params_hybrid,
        unet_hybrid_forward_packed,
    )

    model = UNetSeeInDark(nf=32)
    B, H, W = 1, 1424, 2128
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    tparams = jax.jit(lambda p: transform_params_hybrid(p, jnp.bfloat16))(params)
    jax.block_until_ready(tparams)

    K = 24
    frames = jnp.zeros((K, B, H // 2, W // 2, 16), jnp.float32)
    fwd = lambda g: unet_hybrid_forward_packed(tparams, g).astype(jnp.float32)

    def timed(run, label):
        y = run(frames)
        float(jnp.sum(y))
        dt = 1e9
        for _ in range(8):
            t0 = time.perf_counter()
            y = run(frames)
            float(jnp.sum(y))
            dt = min(dt, (time.perf_counter() - t0) / K)
        print(json.dumps({"variant": label, "ms_per_frame": round(dt * 1e3, 3)}))

    @jax.jit
    def v_map(fr):
        return jax.lax.map(fwd, fr)

    timed(v_map, "lax.map (baseline)")

    for k in (2, 4):
        kk = k

        @jax.jit
        def v_unroll(fr, kk=kk):
            fr2 = fr.reshape(K // kk, kk, *fr.shape[1:])
            def body(_, chunk):
                # k independent frames, sequential calls in one scan body —
                # XLA may interleave their ops (unlike a batched conv)
                outs = [fwd(chunk[i]) for i in range(kk)]
                return None, jnp.stack(outs)
            _, y = jax.lax.scan(body, None, fr2)
            return y.reshape(K, *y.shape[2:])

        timed(v_unroll, f"scan body x{kk} sequential")


if __name__ == "__main__":
    main()
