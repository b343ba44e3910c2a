"""Pallas Winograd F(2x2,3x3) for the dense-s2d 128-channel UNet convs.

The serving profile (tools/profile_prefix.py, v5e) puts 60% of the packed
UNetSeeInDark frame in the head + tail, dominated by four [3,3,C~128,128]
dense-s2d convs that XLA runs at ~77 TF/s dense rate. Winograd F(2x2,3x3)
cuts the multiplies 2.25x and casts them as [Wt,C]@[C,D] MXU matmuls — the
shape class Pallas can run near peak (unlike the round-2 VPU-bound block-form
chains, kernels/__init__.py post-mortem).

Key layout decision: the caller pre-splits the SAME-padded input into
even/odd COLUMN planes (`de`, `do`), so the kernel performs NO strided and
NO lane-sliced access at all — Winograd's stride-2 tiling becomes contiguous
sublane slices of the two parity planes:

    tile col tw taps cols 2tw..2tw+3  ==  de[tw], do[tw], de[tw+1], do[tw+1]

Outputs come back parity-split the same way, so a CHAIN of Winograd convs
(conv9_1 -> conv9_2 -> 1x1 head) never materializes an interleaved 128-ch
tensor: `repad_split` re-pads directly in split space and the final
interleave happens on the 16-channel packed output.

Per tile-row the kernel does 16 matmuls [Wt, C] @ [C, D] (f32 accum) with
BT/AT transforms as VPU adds (~3% of FLOPs). Parity vs the direct conv is
tested in interpret mode (tests/test_kernels_wino.py); TPU wiring lives in
models/unet_s2d.unet_wino_forward_packed and is adopted only on measurement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32
DT = jnp.bfloat16
TR = 4  # Winograd tile-rows per program (2*TR output rows)

# F(2, 3) transform matrices (correlation convention, as in ML convs)
BT = np.array([[1, 0, -1, 0],
               [0, 1, 1, 0],
               [0, -1, 1, 0],
               [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0],
              [.5, .5, .5],
              [.5, -.5, .5],
              [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0],
               [0, 1, -1, -1]], np.float32)


def wino_filter(k3: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, D] -> U = G k G^T : [4, 4, C, D] (f32; cast at use)."""
    return jnp.einsum("ia,abcd,jb->ijcd", G, k3.astype(f32), G)


def _kernel(de_ref, do_ref, he_ref, ho_ref, u_ref, b_ref, ye_ref, yo_ref,
            se, so, *, relu):
    # contiguous scratch strip = main rows + 2 halo rows
    se[0:2 * TR] = de_ref[...]
    se[2 * TR:2 * TR + 2] = he_ref[...]
    so[0:2 * TR] = do_ref[...]
    so[2 * TR:2 * TR + 2] = ho_ref[...]
    Wt = ye_ref.shape[1]
    bias = b_ref[...].astype(f32)

    for tr in range(TR):
        r0 = 2 * tr
        # W-direction transform per input row; s-order e0,o0,e1,o1 with
        # BT rows [1,0,-1,0] [0,1,1,0] [0,-1,1,0] [0,1,0,-1]
        Vw = []
        for r in range(4):
            e = se[r0 + r].astype(f32)
            o = so[r0 + r].astype(f32)
            e0, e1 = e[0:Wt], e[1:Wt + 1]
            o0, o1 = o[0:Wt], o[1:Wt + 1]
            Vw.append([
                (e0 - e1).astype(DT),
                (o0 + e1).astype(DT),
                (e1 - o0).astype(DT),
                (o0 - o1).astype(DT),
            ])
        acc = [[None, None], [None, None]]
        for i in range(4):
            for j in range(4):
                if i == 0:
                    V = Vw[0][j].astype(f32) - Vw[2][j].astype(f32)
                elif i == 1:
                    V = Vw[1][j].astype(f32) + Vw[2][j].astype(f32)
                elif i == 2:
                    V = Vw[2][j].astype(f32) - Vw[1][j].astype(f32)
                else:
                    V = Vw[1][j].astype(f32) - Vw[3][j].astype(f32)
                M = jnp.dot(V.astype(DT), u_ref[i, j],
                            preferred_element_type=f32)
                for a in range(2):
                    if AT[a, i] == 0:
                        continue
                    for bq in range(2):
                        if AT[bq, j] == 0:
                            continue
                        coef = AT[a, i] * AT[bq, j]
                        t = M if coef == 1.0 else M * coef
                        acc[a][bq] = t if acc[a][bq] is None else acc[a][bq] + t
        for a in range(2):
            ye_row = acc[a][0] + bias
            yo_row = acc[a][1] + bias
            if relu:
                ye_row = jnp.where(ye_row >= 0, ye_row, 0.2 * ye_row)
                yo_row = jnp.where(yo_row >= 0, yo_row, 0.2 * yo_row)
            ye_ref[r0 + a] = ye_row.astype(ye_ref.dtype)
            yo_ref[r0 + a] = yo_row.astype(yo_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu",))
def wino_conv_split(de, do, U, bias, relu: bool = True):
    """Winograd SAME 3x3 conv on parity-split padded input.

    de/do: [hp+2, Wh, C] even/odd column planes of the padded input, with
    hp % (2*TR) == 0 and Wh = w/2 + 1. Returns (ye, yo): [hp, w/2, D] —
    even/odd column planes of the conv output (+bias, optional LeakyReLU).
    """
    hp2, Wh, C = de.shape
    hp = hp2 - 2
    assert hp % (2 * TR) == 0, (hp, TR)
    Wt = Wh - 1
    D = U.shape[-1]
    R = hp // (2 * TR)
    ye, yo = pl.pallas_call(
        functools.partial(_kernel, relu=relu),
        grid=(R,),
        in_specs=[
            pl.BlockSpec((2 * TR, Wh, C), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * TR, Wh, C), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Wh, C), lambda r: (TR * (r + 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Wh, C), lambda r: (TR * (r + 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4, C, D), lambda r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2 * TR, Wt, D), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * TR, Wt, D), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hp, Wt, D), DT),
            jax.ShapeDtypeStruct((hp, Wt, D), DT),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * TR + 2, Wh, C), DT),
            pltpu.VMEM((2 * TR + 2, Wh, C), DT),
        ],
    )(de, do, de, do, U.astype(DT), bias.reshape(1, -1).astype(DT))
    return ye, yo


def pad_split(x: jnp.ndarray):
    """[h, w, C] -> SAME-padded even/odd column planes [h+2, w/2+1, C]."""
    h, w, C = x.shape
    dp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    d = dp.reshape(h + 2, (w + 2) // 2, 2, C)
    return d[:, :, 0, :], d[:, :, 1, :]


def repad_split(ye: jnp.ndarray, yo: jnp.ndarray):
    """Re-pad a conv's parity-split OUTPUT into the next conv's parity-split
    padded INPUT, entirely in split space.

    Padded column c' maps to output column c'-1, which flips parity: padded
    even cols = [0, yo...], padded odd cols = [ye..., 0].
    """
    zrow = jnp.zeros((1,) + ye.shape[1:], ye.dtype)
    yer = jnp.concatenate([zrow, ye, zrow], 0)
    yor = jnp.concatenate([zrow, yo, zrow], 0)
    zc = jnp.zeros((yer.shape[0], 1, ye.shape[-1]), ye.dtype)
    return jnp.concatenate([zc, yor], 1), jnp.concatenate([yer, zc], 1)


def interleave_cols(ye: jnp.ndarray, yo: jnp.ndarray) -> jnp.ndarray:
    """[h, w/2, D] x2 -> [h, w, D]."""
    h, Wt, D = ye.shape
    return jnp.stack([ye, yo], axis=2).reshape(h, 2 * Wt, D)


def wino_conv(x: jnp.ndarray, U: jnp.ndarray, bias: jnp.ndarray,
              relu: bool = True) -> jnp.ndarray:
    """Whole-image SAME 3x3 conv via the Winograd kernel ([h, w, C], h even
    and % (2*TR), w even). Convenience wrapper; chains should stay split."""
    de, do = pad_split(x)
    ye, yo = wino_conv_split(de, do, U, bias, relu=relu)
    return interleave_cols(ye, yo)
