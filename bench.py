"""Benchmark: UNet raw-denoise throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric is megapixels of Bayer mosaic denoised per second per chip
(H*W*4 packed pixels count as the 2H x 2W mosaic, i.e. 4*h*w pix/frame),
measured on the flagship UNetSeeInDark in bfloat16 at full-frame-equivalent
tiling. Baseline: 500 Mpix/s/chip (BASELINE.md rebuild target).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_MPIX_S = 500.0


def main():
    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import (
        transform_params_hybrid,
        unet_hybrid_forward_packed,
    )

    model = UNetSeeInDark(nf=32)
    # SID full frame is the 2848x4256 mosaic; the production pipeline feeds it
    # in the 4x4-superpixel (s2d) packing emitted by the native host packer
    # (native/rawproc.cpp pnnp_pack_s2d): [712, 1064, 16]. The forward is the
    # exact UNetSeeInDark function in that layout (tests/test_unet_s2d.py).
    B, H, W = 1, 1424, 2128
    g1 = jnp.zeros((B, H // 2, W // 2, 16), jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    tparams = jax.jit(lambda p: transform_params_hybrid(p, jnp.bfloat16))(params)
    jax.block_until_ready(tparams)

    # Serving loop: K distinct frames processed sequentially inside ONE jit
    # (lax.map) — per-frame cost without dispatch overhead or feedback-cast
    # artifacts, f32 in / f32 out; the final sum forces a host readback
    # (block_until_ready alone is not reliable through remote-device tunnels).
    K = 24
    frames = jnp.zeros((K, B, H // 2, W // 2, 16), jnp.float32)

    @jax.jit
    def run(tp, frames):
        return jax.lax.map(
            lambda g: unet_hybrid_forward_packed(tp, g).astype(jnp.float32), frames
        )

    y = run(tparams, frames)
    float(jnp.sum(y))  # warmup + compile

    # Best-of over repeats: the axon tunnel adds occasional multi-ms hiccups;
    # each repeat is itself a 24-frame average, best-of-8 reports steady-state.
    n_iter = 8
    dt = 1e9
    for _ in range(n_iter):
        t0 = time.perf_counter()
        y = run(tparams, frames)
        float(jnp.sum(y))
        dt = min(dt, (time.perf_counter() - t0) / K)

    mpix = B * H * W * 4 / 1e6  # Bayer mosaic megapixels per frame
    mpix_s = mpix / dt
    print(json.dumps({
        "metric": "unet_denoise_throughput",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 3),
    }))


if __name__ == "__main__":
    main()
