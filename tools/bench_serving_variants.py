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

    # W8A8 interior-int8 serving path (models/unet_s2d_int8.py): the one
    # lever that changes the MAC cost (s8 MXU rate is ~2x bf16 on v5e).
    from pnnp_tpu.models.unet_s2d_int8 import (
        calibrate_act_scales,
        quantize_params_int8,
        unet_hybrid_forward_packed_int8,
    )

    cal = jax.random.uniform(jax.random.key(3), frames.shape[1:]) * 0.3
    scales = calibrate_act_scales(tparams, [cal])
    qparams = quantize_params_int8(tparams, scales)

    @jax.jit
    def v_int8(fr):
        return jax.lax.map(
            lambda g: unet_hybrid_forward_packed_int8(
                tparams, qparams, g).astype(jnp.float32), fr)

    timed(v_int8, "lax.map int8 interior (W8A8)")


if __name__ == "__main__":
    main()
