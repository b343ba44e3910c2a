"""Optimized-HLO materialization report for the W8A8 packed serving forward.

Compiles the int8 serve fn for the live backend, then scans the optimized
HLO for (a) convolution ops and their operand/result dtypes, (b) fusion
root dtypes, to answer: do the dequant->lrelu->requant chains fuse into
conv epilogues (int8-resident boundaries) or do full-frame bf16/s32
intermediates materialize in HBM?

Usage: python tools/hlo_int8_report.py [--cpu]
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="64x64 packed input (CPU smoke; 16 MB gate drops to 64 KB)")
    ap.add_argument("--dump", help="also write full HLO text here")
    a = ap.parse_args(argv)

    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import transform_params_hybrid
    from pnnp_tpu.models.unet_s2d_int8 import (
        calibrate_act_scales,
        quantize_params_int8,
        unet_hybrid_forward_packed_int8,
    )

    model = UNetSeeInDark(nf=32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    tp = jax.jit(lambda p: transform_params_hybrid(p, jnp.bfloat16))(params)
    jax.block_until_ready(tp)
    H2, W2 = (64, 64) if a.small else (712, 1064)
    g1 = jax.random.normal(jax.random.key(1), (1, H2, W2, 16),
                           jnp.float32) * 0.1
    qp = quantize_params_int8(tp, calibrate_act_scales(tp, [g1], pct=99.95))

    fn = jax.jit(lambda g: unet_hybrid_forward_packed_int8(tp, qp, g))
    txt = fn.lower(g1).compile().as_text()
    if a.dump:
        with open(a.dump, "w") as f:
            f.write(txt)

    nbytes = {"s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s32": 4, "f32": 4,
              "u32": 4}

    def shape_bytes(s):
        m = re.match(r"(\w+?)\[([\d,]*)\]", s)
        if not m or m.group(1) not in nbytes:
            return None
        dims = [int(d) for d in m.group(2).split(",") if d]
        n = nbytes[m.group(1)]
        for d in dims:
            n *= d
        return n

    gate = 64 * 2 ** 10 if a.small else 16 * 2 ** 20
    conv_lines = []
    big = []  # materialized values >= gate bytes (fusion roots / non-fused ops)
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"(%?[\w.\-]+) = (\S+) (\w+)\(", ls)
        if not m:
            continue
        name, shape, op = m.groups()
        if op == "convolution":
            conv_lines.append((name, shape, ls))
        b = shape_bytes(shape)
        if b is not None and b >= gate and op != "parameter":
            big.append((b, name, shape, op))

    print(f"== {len(conv_lines)} convolutions ==")
    for name, shape, ls in conv_lines:
        ops = re.findall(r"(\w+)\[[\d,]*\]", ls)
        print(f"  {name:40s} result={shape.split('{')[0]:28s} "
              f"operands={ops[1:3]}")

    print(f"\n== materialized values >= {gate / 2**20:g} MB ({len(big)}) ==")
    tot = 0
    for b, name, shape, op in sorted(big, reverse=True):
        tot += b
        print(f"  {b / 2**20:8.1f} MB  {op:12s} {shape.split('{')[0]:30s} "
              f"{name}")
    print(f"  total {tot / 2**20:.1f} MB")
    return conv_lines, big


if __name__ == "__main__":
    main()
