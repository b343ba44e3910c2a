"""Composed A/B of W8A8 quant-layer subsets on the serving loop.

The int8 microbench (tools/bench_int8.py) measured isolated rates:
128-ch convs 2.03x bf16, 64-ch convs 1.07x, 16-ch input conv 0.67x. But
the composed bf16 frame runs the dense tail ~1.7x faster than isolated
chains (CLAUDE.md: 77 vs 45 TFLOP/s dense-rate), so which layers PAY for
quantization is a composed question. This times the full 24-frame serving
loop (bench.py method: lax.map inside one jit, forced host readback,
best-of-N) for each quant subset and prints one JSON line per subset.

Usage (repo root, real TPU): python tools/ablate_int8_quantset.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pnnp_tpu.models import UNetSeeInDark
from pnnp_tpu.models.unet_s2d import transform_params_hybrid
from pnnp_tpu.models.unet_s2d_int8 import (
    QUANT_LAYERS,
    calibrate_act_scales,
    quantize_params_int8,
    unet_hybrid_forward_packed_int8,
    unet_hybrid_forward_packed_ref,
)

L64 = ("conv2_1", "conv2_2", "conv8_1u", "conv8_1s", "conv8_2")
L1 = ("conv1_2", "conv9_1u", "conv9_1s", "conv9_2")

SUBSETS = {
    "bf16": (),
    "all": QUANT_LAYERS,
    # drop the 64-ch layers (isolated speedup 1.07x — likely a composed wash)
    "no64ch": tuple(n for n in QUANT_LAYERS if n not in L64),
    # only the level-1 128-ch convs at 712x1064 (the dominant dense-s2d work)
    "L1only": L1,
    # the interior pyramid without level 1 (locates where the win comes from)
    "deep_only": tuple(n for n in QUANT_LAYERS if n not in L64 + L1),
    # VERDICT r4 #3 probes (OPTIONAL_QUANT, speed-only — accuracy unvalidated):
    # quantize the bf16 head conv (isolated 16->128 int8 measured 0.72x bf16
    # — does the composed schedule change the verdict?) ...
    "all+c11": QUANT_LAYERS + ("conv1_1",),
    # ... and the 2x2 upsample transposes between quantized bands
    "all+upv": QUANT_LAYERS + ("upv6", "upv7", "upv8"),
    "all+c11+upv": QUANT_LAYERS + ("conv1_1", "upv6", "upv7", "upv8"),
}


def main():
    only = sys.argv[1:]  # optional subset names to run
    print("devices:", jax.devices(), file=sys.stderr)
    model = UNetSeeInDark(nf=32)
    B, H, W = 1, 1424, 2128
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    tparams = jax.jit(lambda p: transform_params_hybrid(p, jnp.bfloat16))(params)
    jax.block_until_ready(tparams)

    K = 24
    frames = jnp.zeros((K, B, H // 2, W // 2, 16), jnp.float32)
    cal = jax.random.uniform(jax.random.key(3), frames.shape[1:]) * 0.3
    scales = calibrate_act_scales(tparams, [cal], pct=99.95)
    mpix = B * H * W * 4 / 1e6

    for name, subset in SUBSETS.items():
        if only and name not in only:
            continue
        if subset:
            qp = quantize_params_int8(tparams, scales, quant=subset)
            fwd = lambda g, qp=qp: unet_hybrid_forward_packed_int8(
                tparams, qp, g)
        else:
            fwd = lambda g: unet_hybrid_forward_packed_ref(tparams, g)

        @jax.jit
        def run(frames, fwd=fwd):
            return jax.lax.map(lambda g: fwd(g).astype(jnp.float32), frames)

        y = run(frames)
        float(jnp.sum(y))
        dt = 1e9
        for _ in range(6):
            t0 = time.perf_counter()
            y = run(frames)
            float(jnp.sum(y))
            dt = min(dt, (time.perf_counter() - t0) / K)
        print(json.dumps({
            "subset": name, "n_quant": len(subset),
            "ms_frame": round(dt * 1e3, 2),
            "mpix_s": round(mpix / dt, 1),
        }))


if __name__ == "__main__":
    main()
