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
    from pnnp_tpu.models.unet_s2d import transform_params_hybrid, unet_hybrid_forward

    model = UNetSeeInDark(nf=32)
    # SID full frame is 2848x4256 mosaic -> packed 1424x2128x4 (both %16=0).
    B, H, W = 1, 1424, 2128
    x = jnp.zeros((B, H, W, 4), jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    # Exact-equivalent dense-s2d level-1 fast path (tests/test_unet_s2d.py),
    # bf16 activations; weight transform runs once per checkpoint.
    tparams = jax.jit(lambda p: transform_params_hybrid(p, jnp.bfloat16))(params)
    jax.block_until_ready(tparams)

    @jax.jit
    def fwd(tp, x):
        # residual-style feedback keeps iterations data-dependent so the
        # timing loop cannot overlap or be skipped by an async runtime
        return unet_hybrid_forward(tp, x) * 1e-3 + x

    # warmup + compile (force a host readback — block_until_ready alone is
    # not reliable through remote-device tunnels)
    y = fwd(tparams, x)
    float(jnp.sum(y))

    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        x = fwd(tparams, x)
    float(jnp.sum(x))  # forces the whole chain
    dt = (time.perf_counter() - t0) / n_iter

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
