"""Measure XLA's int8 conv/matmul rate on the local accelerator vs bf16.

Motivation: v5e's MXU peak is ~394 TOPS int8 vs ~197 TFLOP/s bf16 — the one
serving-path lever the kernels/__init__.py post-mortems never measured. If
XLA emits int8 convolutions anywhere near that rate at the dense-s2d shapes
([3,3,128,128] @ 712x1064 etc.), a quantized serving mode could beat the
exact path's measured roofline (~21.1 ms/frame); if the conv emitter falls
back to a slow path (like it does for even kernels, post-mortem #4), this
kills the idea in one measurement.

Method follows CLAUDE.md discipline: K iterations chained inside ONE jit
(feedback requant each step so int8 stays int8), best-of-N with a forced
host readback. Prints one JSON line per case with the in-harness rate and
the int8:bf16 ratio.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
from jax import lax


def _time_chain(make_step, x0, K=24, n_iter=6):
    @jax.jit
    def run(x):
        def body(t, _):
            return make_step(t), 0
        y, _ = lax.scan(body, x, None, length=K)
        return y

    y = run(x0)
    float(jnp.sum(y.astype(jnp.float32)))  # compile + warmup
    dt = 1e9
    for _ in range(n_iter):
        t0 = time.perf_counter()
        y = run(x0)
        float(jnp.sum(y.astype(jnp.float32)))
        dt = min(dt, (time.perf_counter() - t0) / K)
    return dt


def conv_case(H, W, C, D, kh=3, kw=3):
    """Chained 3x3 SAME conv, bf16 vs int8(+requant), TFLOP(TOP)/s."""
    key = jax.random.key(0)
    flops = 2 * H * W * kh * kw * C * D

    # bf16 baseline
    xb = jax.random.normal(key, (1, H, W, C), jnp.bfloat16)
    kb = (jax.random.normal(jax.random.key(1), (kh, kw, C, D), jnp.bfloat16)
          * 0.05)

    assert D >= C, "fold-back feedback needs D >= C"

    def step_b(t):
        acc = lax.conv_general_dilated(
            t, kb, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # fold the output back onto the carry (keeps the scan dependency
        # chain even when C != D; negligible vs the conv itself)
        return acc if D == C else t + acc[..., :C]

    dt_b = _time_chain(step_b, xb)

    # int8: conv s8xs8->s32, then shift-requant back to s8 for the next step
    xi = jax.random.randint(key, (1, H, W, C), -127, 128, jnp.int8)
    ki = jax.random.randint(jax.random.key(1), (kh, kw, C, D), -4, 5, jnp.int8)

    def step_i(t):
        acc = lax.conv_general_dilated(
            t, ki, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        q = jnp.clip(acc >> 7, -127, 127).astype(jnp.int8)
        return q if D == C else jnp.clip(
            t.astype(jnp.int32) + q[..., :C].astype(jnp.int32),
            -127, 127).astype(jnp.int8)

    dt_i = _time_chain(step_i, xi)
    return dt_b, dt_i, flops


def matmul_case(M, K_, N):
    """Chained matmul, bf16 vs int8: the AQT-style dot path."""
    key = jax.random.key(0)
    flops = 2 * M * K_ * N
    xb = jax.random.normal(key, (M, K_), jnp.bfloat16)
    wb = jax.random.normal(jax.random.key(1), (K_, N), jnp.bfloat16) * 0.05

    def step_b(t):
        acc = lax.dot(t, wb)
        # fold the (M, N) product back onto the (M, K) carry when N != K so
        # the scan chain stays dependent (negligible vs the dot itself)
        return acc if N == K_ else t + jnp.pad(acc, ((0, 0), (0, K_ - N)))

    dt_b = _time_chain(step_b, xb)

    xi = jax.random.randint(key, (M, K_), -127, 128, jnp.int8)
    wi = jax.random.randint(jax.random.key(1), (K_, N), -4, 5, jnp.int8)

    def step_i(t):
        acc = lax.dot(t, wi, preferred_element_type=jnp.int32)
        q = jnp.clip(acc >> 7, -127, 127)
        if N != K_:
            q = jnp.clip(t.astype(jnp.int32)
                         + jnp.pad(q, ((0, 0), (0, K_ - N))), -127, 127)
        return q.astype(jnp.int8)

    dt_i = _time_chain(step_i, xi)
    return dt_b, dt_i, flops


def main():
    import sys

    small = "--small" in sys.argv  # API smoke test (CPU-friendly shapes)
    if small:
        import jax as _j
        _j.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices())
    if small:
        cases = [
            ("conv3x3_32x32@64x64", lambda: conv_case(64, 64, 32, 32)),
            ("matmul_4k_128_128", lambda: matmul_case(4096, 128, 128)),
        ]
        for name, fn in cases:
            dt_b, dt_i, flops = fn()
            print(json.dumps({"case": name, "bf16_ms": round(dt_b * 1e3, 3),
                              "int8_ms": round(dt_i * 1e3, 3)}))
        return
    cases = [
        # the dense-s2d level-1 shape (dominates the 21.1 ms frame)
        ("conv3x3_128x128@712x1064", lambda: conv_case(712, 1064, 128, 128)),
        # first layer (narrow Cin)
        ("conv3x3_16x128@712x1064", lambda: conv_case(712, 1064, 16, 128)),
        # mid-level shape
        ("conv3x3_64x64@356x532", lambda: conv_case(356, 532, 64, 64)),
        # matmul reference points at the same M,K,N scale
        ("matmul_378k_128_128", lambda: matmul_case(712 * 532, 128, 128)),
        ("matmul_378k_1152_128", lambda: matmul_case(712 * 532, 1152, 128)),
    ]
    for name, fn in cases:
        dt_b, dt_i, flops = fn()
        print(json.dumps({
            "case": name,
            "bf16_ms": round(dt_b * 1e3, 3),
            "int8_ms": round(dt_i * 1e3, 3),
            "bf16_tflops": round(flops / dt_b / 1e12, 1),
            "int8_tops": round(flops / dt_i / 1e12, 1),
            "int8_speedup": round(dt_b / dt_i, 2),
        }))


if __name__ == "__main__":
    main()
