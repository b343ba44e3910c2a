"""Pallas TPU kernel: fused 3x3 conv + bias + LeakyReLU via in-VMEM im2col.

Why: XLA's TPU conv pads BOTH matmul dimensions of a small-channel conv to
the 128-lane MXU tile — a 32->32-channel 3x3 conv runs at ~13 TFLOP/s
(measured v5e) because the implicit GEMM is [HW, 32p128] @ [32p128, 32p128].
Building the im2col rows explicitly in VMEM keeps the *contraction* dense
(9*C = 288 for C=32) so the same conv runs as [HW, 288] @ [288, C_out]; only
the output dimension pays lane padding.

Design notes (the third iteration; see CLAUDE.md for the measured constraints):
  * grid (N, H-tiles, W-tiles); four neighbour blocks of the same padded
    input provide the +2 halo;
  * the kx-shifted windows are assembled by *stores into scratch* (never by
    value concatenation — Mosaic's scoped-vmem accounting of concat values is
    what OOMs large tiles, and concat needs equal non-concat-dim offsets);
  * a static sub-row loop walks the tile, lane-concatenating 9 small
    offset-0 scratch reads per sub-tile and issuing one MXU matmul each,
    with bias + LeakyReLU fused into the store.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x00, x01, x10, x11, w_ref, b_ref, o_ref, shift_ref, *,
            tile_h, sub_h, chunk_w, C, Cout, negative_slope, apply_act):
    # Assemble the 3 kx-realigned halo windows [tile_h+2, chunk_w, C] purely
    # with stores (destination offsets realign for free).
    for kx in range(3):
        if kx == 0:
            shift_ref[kx, :tile_h] = x00[0]
            shift_ref[kx, tile_h:] = x10[0, :2]
        else:
            shift_ref[kx, :tile_h, : chunk_w - kx] = x00[0][:, kx:]
            shift_ref[kx, :tile_h, chunk_w - kx :] = x01[0][:, :kx]
            shift_ref[kx, tile_h:, : chunk_w - kx] = x10[0, :2, kx:]
            shift_ref[kx, tile_h:, chunk_w - kx :] = x11[0, :2, :kx]

    bias = b_ref[0, :].astype(jnp.float32)
    for r in range(tile_h // sub_h):
        r0 = r * sub_h
        cols = jnp.concatenate(
            [shift_ref[kx, r0 + ky : r0 + ky + sub_h]
             for ky in range(3) for kx in range(3)],
            axis=-1,
        )  # [sub_h, cw, 9C]
        acc = jax.lax.dot_general(
            cols.reshape(sub_h * chunk_w, 9 * C),
            w_ref[:, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + bias
        if apply_act:
            acc = jnp.where(acc >= 0, acc, acc * negative_slope)
        o_ref[0, r0 : r0 + sub_h] = acc.reshape(sub_h, chunk_w, Cout).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("tile_h", "sub_h", "chunk_w", "negative_slope", "apply_act"),
)
def conv3x3_bias_act(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    tile_h: int = 32,
    sub_h: int = 8,
    chunk_w: int = 256,
    negative_slope: float = 0.2,
    apply_act: bool = True,
) -> jnp.ndarray:
    """Fused SAME 3x3 conv + bias (+ LeakyReLU). x [N,H,W,C] -> [N,H,W,Cout]."""
    N, H, W, C = x.shape
    Cout = w.shape[-1]
    n_h = -(-H // tile_h)
    n_w = -(-W // chunk_w)
    hp = (n_h + 1) * tile_h          # 1 halo + alignment (>= H + 2)
    wp = (n_w + 1) * chunk_w
    xp = jnp.pad(x, ((0, 0), (1, hp - H - 1), (1, wp - W - 1), (0, 0)))

    w2 = w.reshape(9 * C, Cout)
    b2 = b.reshape(1, Cout)
    kernel = functools.partial(
        _kernel, tile_h=tile_h, sub_h=sub_h, chunk_w=chunk_w, C=C, Cout=Cout,
        negative_slope=negative_slope, apply_act=apply_act,
    )
    blk = lambda di, dj: pl.BlockSpec(
        (1, tile_h, chunk_w, C),
        lambda n, i, j, di=di, dj=dj: (n, i + di, j + dj, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, n_h * tile_h, n_w * chunk_w, Cout), x.dtype),
        grid=(N, n_h, n_w),
        in_specs=[
            blk(0, 0), blk(0, 1), blk(1, 0), blk(1, 1),
            pl.BlockSpec((9 * C, Cout), lambda n, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda n, i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, chunk_w, Cout), lambda n, i, j: (n, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((3, tile_h + 2, chunk_w, C), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * 9 * C * Cout,
            bytes_accessed=4 * xp.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, xp, xp, xp, w2, b2)
    return out[:, :H, :W, :]


def conv3x3_reference(x, w, b, negative_slope=0.2, apply_act=True):
    """XLA reference for testing."""
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    if apply_act:
        out = jnp.where(out >= 0, out, out * negative_slope)
    return out
