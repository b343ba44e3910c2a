"""Pallas TPU kernels: fused s2d block-form conv chains for UNetSeeInDark.

Why (measured on v5e, tools/profile_ablate.py): in the packed hybrid forward
(`models/unet_s2d.py`) the level-1 dense-s2d convs already run at 144-191
TFLOP/s — XLA leaves nothing on the table *per FLOP* — but the dense-s2d
kernel form pays 4x structural-zero FLOPs, and the narrow-lane glue around
them (`upv9` 1x1: 1.9 ms, group_max: 2.1 ms, head einsum) is relayout-bound.
The exact 2x2-block s2d form pays only 1.78x FLOPs, but in XLA its per-group
shifted slices cost ~5.7 ms/conv in lane shuffles.

These kernels evaluate the block form with the group-select done in VMEM as
*lane-preserving masked shifted adds* (output group g keeps lane block g —
only sublane/minor offsets change), which the VPU does for free. Fused per
tile, so the inter-layer tensors never touch HBM:

  fused_tail:  c8, c1g -> head output   (upv9 1x1 folded into conv9_1's
               up-path block kernel via an appended ones-channel; conv9_1,
               conv9_2 block-form; block-diagonal 1x1 head)
  fused_head:  g1 -> c1g, p1            (conv1_1 + conv1_2 block-form;
               group_max via permutation matmuls)

Math of the block form (see `unet_s2d._transform_conv3_kernel`, reference
construction `unet_s2d._s2d_conv_pre`): a 3x3 SAME conv on [H,W,C] equals, on
the s2d tensor g=[H/2,W/2,4C], O = conv2x2_VALID(pad1(g), Kp) followed by
  out[y, x, gBlock] = O[y + a_h(g), x + a_w(g), gBlock],   g = 2*a_h + a_w,
and bias-add + LeakyReLU commute with that selection (per-lane bias, lanes
unmoved), so each stage finalizes O before selecting.

Boundary semantics: callers pre-pad inputs with zeros (SAME-conv halo); the
kernels zero-mask the intermediate activation outside the frame because
lrelu(0 + bias) != 0. Mosaic's `Element` block dims provide the overlapping
halo windows (low padding unsupported on this libtpu, hence the XLA-side
pre-pad).

Used by `unet_s2d.unet_fused_forward_packed`; exactness vs the XLA hybrid
path is covered by tests/test_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas import core as pallas_core

from pnnp_tpu.models.unet_s2d import _transform_conv3_kernel

DT = jnp.bfloat16

# Output-group spatial offsets of the block-form selection: group g = 2ah+aw
_AP = ((0, 0), (0, 1), (1, 0), (1, 1))


def _elem(sizes):
    return tuple(pallas_core.Element(s, (0, 0)) for s in sizes)


def _lane_masks(n_groups: int, block: int, dtype):
    """[n_groups, 1, 1, n_groups*block] 0/1 masks selecting lane block g."""
    lanes = n_groups * block
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lanes), 2)
    return [
        (lane // block == g).astype(dtype).reshape(1, 1, lanes)
        for g in range(n_groups)
    ]


def _bconv_store(x_slices, rows, cols, out_s, bias, slope, chunk=8):
    """One 2x2 block-form conv: O[r, c] = sum_t x[r+p, c+q] @ Kp[t], with
    bias + LeakyReLU fused, streamed into ``out_s`` (bf16) in row chunks.

    ``x_slices``: list of (read_fn, kp_ref) pairs — read_fn(p, q, r0, rs,
    cols) returns the [rs, cols, Cin] window rows r0..r0+rs shifted by tap
    (p, q); multiple pairs accumulate (the dual-input conv9_1). Chunking
    keeps the f32 accumulator value small (whole-tile accumulators spill)."""
    for r0 in range(0, rows, chunk):
        rs = min(chunk, rows - r0)
        acc = None
        for read, kp_ref in x_slices:
            for t, (p, q) in enumerate(_AP):
                a = read(p, q, r0, rs, cols)
                r = jax.lax.dot_general(
                    a, kp_ref[t],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = r if acc is None else acc + r
        acc = acc + bias
        acc = jnp.where(acc >= 0, acc, acc * slope)
        out_s[r0 : r0 + rs, :cols, :] = acc.astype(DT)


def _select(o_ref, masks, rows, cols):
    """out[r, c] = sum_g mask_g * O[r + a_h(g), c + a_w(g)] (lanes unmoved).

    Exact in bf16: the per-group lane masks are disjoint, so no addition
    ever mixes two nonzero values."""
    out = None
    for g, (ah, aw) in enumerate(_AP):
        term = o_ref[ah : ah + rows, aw : aw + cols, :] * masks[g]
        out = term if out is None else out + term
    return out


# ---------------------------------------------------------------------------
# fused_tail: (c8e, c1g) -> packed head output [*, 16]
# ---------------------------------------------------------------------------


def _tail_kernel(c8_ref, c1g_ref, kf_ref, kb_ref, k92_ref, scal_ref, khb_ref,
                 o_ref, o1_s, h9_s, *, th, tw, H, W, slope):
    """Column geometry: every MXU dot uses width DW = tw+8 (a 16-multiple —
    Mosaic's reshape-for-dot needs 16-aligned bf16 collapse widths); scratch
    buffers are DW+8 wide so width-DW reads at offsets {0,1} stay in bounds.
    Columns right of the mathematically-needed region carry finite garbage
    that provably never migrates left into the selected output columns (each
    stage shifts columns by at most 1)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    dw = tw + 8
    masks = _lane_masks(4, 32, DT)
    b91 = scal_ref[0:1, :].astype(jnp.float32).reshape(1, 1, 128)
    b92 = scal_ref[1:2, :].astype(jnp.float32).reshape(1, 1, 128)
    bh = scal_ref[2:3, :].astype(jnp.float32).reshape(1, 1, 128)

    # stage 1: O1 rows [-1 .. th+1] (scratch row 0 = global row i*th-1)
    r1 = th + 3
    read8 = lambda p, q, r0, rs, c: c8_ref[p + r0 : p + r0 + rs, q : q + c, :]
    read1g = lambda p, q, r0, rs, c: c1g_ref[p + r0 : p + r0 + rs, q : q + c, :]
    _bconv_store([(read8, kf_ref), (read1g, kb_ref)], r1, dw, o1_s, b91, slope)

    # stage 2: h9 rows [-1 .. th], zero outside the frame
    r2 = th + 2
    h9 = _select(o1_s, masks, r2, dw + 1)
    gy = jax.lax.broadcasted_iota(jnp.int32, (r2, dw + 1, 1), 0) + (i * th - 1)
    gx = jax.lax.broadcasted_iota(jnp.int32, (r2, dw + 1, 1), 1) + (j * tw - 1)
    inside = (gy >= 0) & (gy < H) & (gx >= 0) & (gx < W)
    h9_s[:, : dw + 1, :] = jnp.where(inside, h9, 0.0).astype(DT)

    # stage 3: O2 rows [0 .. th] (reuse stage-1 scratch, dead)
    r3 = th + 1
    read9 = lambda p, q, r0, rs, c: h9_s[p + r0 : p + r0 + rs, q : q + c, :]
    _bconv_store([(read9, k92_ref)], r3, dw, o1_s, b92, slope)

    # stage 4: c9 select + block-diagonal head
    c9 = _select(o1_s, masks, th, dw).astype(DT)
    out = jax.lax.dot_general(
        c9, khb_ref[:, :], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bh
    o_ref[:, :, :] = out[:, :tw, :16].astype(o_ref.dtype)


def tail_weights(params: dict, dtype: Any = DT) -> dict:
    """Derive fused-tail weights from a *standard* UNetSeeInDark param tree.

    Folds upv9's 1x1 s2d form (+bias, via an appended ones-channel at index
    64) into the block-form up-path kernels of conv9_1; builds block forms of
    conv9_1's skip path and conv9_2; block-diagonal head. nf=32 only (the
    flagship shape — lane blocks of 32 over 128 lanes).
    """
    import numpy as np  # init-time only

    np32 = lambda x: np.asarray(jax.device_get(x), np.float32)

    k91 = np32(params["conv9_1"]["kernel"])        # [3,3,64,32] (up | skip)
    b91 = np32(params["conv9_1"]["bias"])          # [32]
    k92 = np32(params["conv9_2"]["kernel"])        # [3,3,32,32]
    b92 = np32(params["conv9_2"]["bias"])
    kt = np32(params["upv9"]["kernel"])            # [2,2,64,32] ConvTranspose
    bup = np32(params["upv9"]["bias"])             # [32]
    kh = np32(params["conv10_1"]["kernel"])        # [1,1,32,out]
    bh = np32(params["conv10_1"]["bias"])

    kp_up = np.asarray(
        _transform_conv3_kernel(jnp.asarray(k91[:, :, :32]))).reshape(4, 128, 128)
    kp_sk = np.asarray(
        _transform_conv3_kernel(jnp.asarray(k91[:, :, 32:]))).reshape(4, 128, 128)
    kp_92 = np.asarray(
        _transform_conv3_kernel(jnp.asarray(k92))).reshape(4, 128, 128)

    # upv9's s2d 1x1 form (see transform_params_hybrid): output group (ah,aw)
    # takes ConvTranspose tap (1-ah, 1-aw); bias rides the ones-channel.
    w1 = np.concatenate(
        [kt[1 - ah, 1 - aw] for ah in (0, 1) for aw in (0, 1)], axis=-1
    )  # [64, 128]
    w1e = np.zeros((72, 128), np.float32)
    w1e[:64] = w1
    w1e[64] = np.tile(bup, 4)
    kf = np.einsum("cd,tde->tce", w1e, kp_up)      # [4,72,128]

    khb = np.zeros((128, 128), np.float32)         # block-diag head, padded
    n_out = kh.shape[-1]
    for g in range(4):
        khb[g * 32 : (g + 1) * 32, g * n_out : (g + 1) * n_out] = kh[0, 0]
    bh_t = np.zeros((128,), np.float32)
    bh_t[: 4 * n_out] = np.tile(bh, 4)

    scal = np.stack([np.tile(b91, 4), np.tile(b92, 4), bh_t])  # [3,128]
    return {
        "kf": jnp.asarray(kf, dtype),
        "kb": jnp.asarray(kp_sk, dtype),
        "k92": jnp.asarray(kp_92, dtype),
        "scal": jnp.asarray(scal, jnp.float32),
        "khb": jnp.asarray(khb, dtype),
    }


# ---------------------------------------------------------------------------
# fused_head: g1 -> (c1g, p1)
# ---------------------------------------------------------------------------


def _head_kernel(g1_ref, k11_ref, k12_ref, scal_ref, perm_ref, c1g_ref, p1_ref,
                 o_s, a_s, *, th, tw, H, W, slope):
    """conv1_1 + conv1_2 in 2x2-block s2d form, then group_max via
    permutation matmuls (the MXU is the only unit that moves lanes cheaply;
    0/1 matrices copy bf16 exactly under f32 accumulation — lane rolls
    don't lower on this libtpu). Same column geometry as
    :func:`_tail_kernel`."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    dw = tw + 8
    masks = _lane_masks(4, 32, DT)
    b11 = scal_ref[0:1, :].astype(jnp.float32).reshape(1, 1, 128)
    b12 = scal_ref[1:2, :].astype(jnp.float32).reshape(1, 1, 128)

    # stage 1: conv1_1 -> a1 rows [-1 .. th], zero-masked outside the frame
    r1 = th + 3
    read_g = lambda p, q, r0, rs, c: g1_ref[p + r0 : p + r0 + rs, q : q + c, :]
    _bconv_store([(read_g, k11_ref)], r1, dw, o_s, b11, slope)

    r2 = th + 2
    a1 = _select(o_s, masks, r2, dw + 1)
    gy = jax.lax.broadcasted_iota(jnp.int32, (r2, dw + 1, 1), 0) + (i * th - 1)
    gx = jax.lax.broadcasted_iota(jnp.int32, (r2, dw + 1, 1), 1) + (j * tw - 1)
    inside = (gy >= 0) & (gy < H) & (gx >= 0) & (gx < W)
    a_s[:, : dw + 1, :] = jnp.where(inside, a1, 0.0).astype(DT)

    # stage 2: conv1_2 -> c1g tile (reuse stage-1 scratch, dead)
    r3 = th + 1
    read_a = lambda p, q, r0, rs, c: a_s[p + r0 : p + r0 + rs, q : q + c, :]
    _bconv_store([(read_a, k12_ref)], r3, dw, o_s, b12, slope)

    c1g = _select(o_s, masks, th, dw).astype(DT)
    c1g_ref[:, :, :] = c1g[:, :tw, :].astype(c1g_ref.dtype)

    # stage 3: group_max — permutation matmuls bring each sub-position block
    # into lanes 0:32, where the VPU maxes them
    m = c1g.astype(jnp.float32)
    for g in range(3):
        m = jnp.maximum(
            m,
            jax.lax.dot_general(
                c1g, perm_ref[g],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
        )
    p1_ref[:, :, :] = m[:, :tw, :32].astype(p1_ref.dtype)


def head_weights(params: dict, dtype: Any = DT) -> dict:
    """Block-form conv1_1/conv1_2 weights from a standard nf=32 param tree."""
    import numpy as np

    np32 = lambda x: np.asarray(jax.device_get(x), np.float32)
    kp11 = np.asarray(_transform_conv3_kernel(
        jnp.asarray(np32(params["conv1_1"]["kernel"])))).reshape(4, 16, 128)
    kp12 = np.asarray(_transform_conv3_kernel(
        jnp.asarray(np32(params["conv1_2"]["kernel"])))).reshape(4, 128, 128)
    scal = np.stack([np.tile(np32(params["conv1_1"]["bias"]), 4),
                     np.tile(np32(params["conv1_2"]["bias"]), 4)])
    perm = np.zeros((3, 128, 128), np.float32)  # block g+1 -> lanes 0:32
    for g in range(3):
        perm[g, (g + 1) * 32 : (g + 2) * 32, :32] = np.eye(32)
    return {
        "k11": jnp.asarray(kp11, dtype),
        "k12": jnp.asarray(kp12, dtype),
        "scal": jnp.asarray(scal, jnp.float32),
        "perm": jnp.asarray(perm, dtype),
    }


@functools.partial(jax.jit, static_argnames=("th", "tw", "interpret"))
def fused_head(g1: jnp.ndarray, w: dict, th: int = 32, tw: int = 136,
               interpret: bool = False):
    """g1 [1,H,W,16] -> (c1g [1,H,W,128], p1 [1,H,W,32]).

    Equals lrelu(conv1_2(lrelu(conv1_1(.)))) and its group_max on the packed
    hybrid path."""
    _, H, W, _ = g1.shape
    interpret = interpret or jax.default_backend() == "cpu"
    nh, nw = pl.cdiv(H, th), pl.cdiv(W, tw)
    hp, wp = nh * th, nw * tw
    g1p = jnp.pad(g1[0], ((2, hp - H + 2), (2, wp - W + 14), (0, 0)))

    kern = functools.partial(_head_kernel, th=th, tw=tw, H=H, W=W, slope=0.2)
    c1g, p1 = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp, 128), g1.dtype),
            jax.ShapeDtypeStruct((hp, wp, 32), g1.dtype),
        ),
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec(_elem((th + 4, tw + 16, 16)),
                         lambda i, j: (i * th, j * tw, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 16, 128), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 128, 128), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128, 128), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((th, tw, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw, 32), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 3, tw + 16, 128), DT),
            pltpu.VMEM((th + 2, tw + 16, 128), DT),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * W * 4 * (2 * 128 * 128) // 4,
            bytes_accessed=(g1p.size + hp * wp * 160) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(g1p.astype(DT), w["k11"], w["k12"], w["scal"], w["perm"])
    return c1g[None, :H, :W, :], p1[None, :H, :W, :]


@functools.partial(jax.jit, static_argnames=("th", "tw", "interpret"))
def fused_tail(c8: jnp.ndarray, c1g: jnp.ndarray, w: dict,
               th: int = 32, tw: int = 136, interpret: bool = False
               ) -> jnp.ndarray:
    """(c8 [1,H,W,64], c1g [1,H,W,128]) -> packed head output [1,H,W,16].

    Equals head(conv9_2(conv9_1(upv9(c8) || c1g))) of the XLA hybrid path.
    """
    _, H, W, _ = c8.shape
    interpret = interpret or jax.default_backend() == "cpu"
    nh, nw = pl.cdiv(H, th), pl.cdiv(W, tw)
    hp, wp = nh * th, nw * tw
    # Input windows are (th+4, tw+16): halo 2 each side plus spare cols so
    # the window (tw+16) and out block (tw) are 8-divisible (Mosaic block
    # constraint) and width-(tw+8) dot reads at offsets {0,1} stay in bounds.
    # The ones-channel 64 carries upv9's bias through the fold; zero halo
    # keeps it exact at the frame boundary.
    c8e = jnp.pad(c8[0], ((2, hp - H + 2), (2, wp - W + 14), (0, 8)))
    c8e = c8e.at[2 : H + 2, 2 : W + 2, 64].set(1.0)
    c1p = jnp.pad(c1g[0], ((2, hp - H + 2), (2, wp - W + 14), (0, 0)))

    kern = functools.partial(_tail_kernel, th=th, tw=tw, H=H, W=W, slope=0.2)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((hp, wp, 16), c8.dtype),
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec(_elem((th + 4, tw + 16, 72)),
                         lambda i, j: (i * th, j * tw, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(_elem((th + 4, tw + 16, 128)),
                         lambda i, j: (i * th, j * tw, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 72, 128), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 128, 128), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 128, 128), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, tw, 16), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th + 3, tw + 16, 128), DT),
            pltpu.VMEM((th + 2, tw + 16, 128), DT),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * W * 4 * (200 * 128 + 128 * 128 + 32 * 128 // 4),
            bytes_accessed=(c8e.size + c1p.size + hp * wp * 16) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(c8e.astype(DT), c1p.astype(DT), w["kf"], w["kb"], w["k92"],
      w["scal"], w["khb"])
    return out[None, :H, :W, :]
