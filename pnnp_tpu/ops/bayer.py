"""Bayer mosaic packing / unpacking, TPU-native NHWC layout.

Semantics match the reference ISP utilities (reference: utils/isp_ops.py:57-112,
data_process/process.py:40-64) but are expressed as pure, jittable JAX functions
over channel-last tensors so XLA can fuse them into the surrounding compute.

Channel order for packed 4-channel images is **RGBG**: ``[R, G1, B, G2]`` where,
for an RGGB Bayer pattern,

    R  = raw[0::2, 0::2]    G1 = raw[0::2, 1::2]
    G2 = raw[1::2, 0::2]    B  = raw[1::2, 1::2]

All functions accept arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

# Index maps between RGBG plane order and the 2x2 Bayer cell (row-major
# positions [[0, 1], [2, 3]] = [(0,0), (0,1), (1,0), (1,1)]).
# RGGB cell: R at (0,0), G1 at (0,1), G2 at (1,0), B at (1,1).
_RGGB_CELL_TO_RGBG = (0, 1, 3, 2)  # cell position -> rgbg channel
_RGGB_RGBG_TO_CELL = (0, 1, 3, 2)  # rgbg channel -> cell position (involution)


def pack_bayer(raw: jnp.ndarray) -> jnp.ndarray:
    """Pack a single-channel Bayer mosaic ``[..., H, W]`` into RGBG ``[..., H/2, W/2, 4]``.

    Pure reshape/transpose (layout change only) — XLA lowers this to a cheap
    relayout fused with neighbouring ops. Assumes an RGGB pattern
    (reference: utils/isp_ops.py:84-96 hard-codes the same assumption).
    """
    *lead, H, W = raw.shape
    x = raw.reshape(*lead, H // 2, 2, W // 2, 2)
    x = jnp.moveaxis(x, -3, -2)  # [..., H/2, W/2, 2, 2]
    cells = x.reshape(*lead, H // 2, W // 2, 4)
    return cells[..., jnp.array(_RGGB_CELL_TO_RGBG)]


def unpack_bayer(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_bayer`: RGBG ``[..., h, w, 4]`` -> Bayer ``[..., 2h, 2w]``."""
    *lead, h, w, _ = packed.shape
    cells = packed[..., jnp.array(_RGGB_RGBG_TO_CELL)]
    x = cells.reshape(*lead, h, w, 2, 2)
    x = jnp.moveaxis(x, -2, -3)  # [..., h, 2, w, 2]
    return x.reshape(*lead, 2 * h, 2 * w)


def bayer2rggb(bayer: jnp.ndarray) -> jnp.ndarray:
    """``[..., H, W]`` -> ``[..., H/2, W/2, 4]`` in raster cell order R,G,G,B.

    Matches reference utils/isp_ops.py:57-59 (cell-position order, *not* RGBG).
    """
    *lead, H, W = bayer.shape
    x = bayer.reshape(*lead, H // 2, 2, W // 2, 2)
    x = jnp.moveaxis(x, -3, -2)
    return x.reshape(*lead, H // 2, W // 2, 4)


def rggb2bayer(rggb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`bayer2rggb` (reference utils/isp_ops.py:61-63)."""
    *lead, h, w, _ = rggb.shape
    x = rggb.reshape(*lead, h, w, 2, 2)
    x = jnp.moveaxis(x, -2, -3)
    return x.reshape(*lead, 2 * h, 2 * w)


def bayer2rows(bayer: jnp.ndarray) -> jnp.ndarray:
    """Split a Bayer mosaic into its even/odd row planes ``[..., 2, H/2, W]``.

    (reference utils/isp_ops.py:65-68)
    """
    *lead, H, W = bayer.shape
    x = bayer.reshape(*lead, H // 2, 2, W)
    return jnp.moveaxis(x, -2, -3)


def rows2bayer(rows: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`bayer2rows` (reference utils/isp_ops.py:76-81)."""
    *lead, _, h, W = rows.shape
    x = jnp.moveaxis(rows, -3, -2)
    return x.reshape(*lead, 2 * h, W)


def raw2bayer(
    raw: jnp.ndarray,
    wp: float = 1023.0,
    bl: float = 64.0,
    norm: bool = True,
    clip: bool = False,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pack a raw mosaic to normalized RGBG with per-channel black level.

    ``out = (packed - (bias + bl)) / (wp - (bias + bl))`` per RGBG channel
    (reference utils/isp_ops.py:84-96). ``bias`` is an optional per-channel
    RGBG black-level-error correction of shape ``[4]`` (or broadcastable).
    Output is channel-last: ``[..., H/2, W/2, 4]``.
    """
    out = pack_bayer(raw.astype(jnp.float32))
    if norm:
        b = jnp.zeros((4,), jnp.float32) if bias is None else jnp.asarray(bias, jnp.float32)
        blc = b + bl
        out = (out - blc) / (wp - blc)
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    return out


def bayer2gray(raw: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-equivalent grayscale from a mosaic ``[..., H, W]``
    (reference: utils/isp_ops.py:70-74 used cv2.filter2D)."""
    import jax

    k = jnp.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], jnp.float32) / 16.0
    lead = raw.shape[:-2]
    x = raw.reshape((-1,) + raw.shape[-2:] + (1,)).astype(jnp.float32)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        xp, k[:, :, None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out.reshape(lead + raw.shape[-2:])


def repair_bad_pixels(raw: jnp.ndarray, bad_mask: jnp.ndarray) -> jnp.ndarray:
    """Replace flagged pixels with the median of their 3x3 same-color
    neighbourhood (reference: utils/isp_ops.py:115-123 used cv2.medianBlur
    per RGGB plane + point writes).

    Unlike the rest of this module, takes a single 2-D mosaic [H, W]
    (vmap for batches)."""
    H, W = raw.shape
    rggb = bayer2rggb(raw)  # [H/2, W/2, 4]
    xp = jnp.pad(rggb, ((1, 1), (1, 1), (0, 0)), mode="edge")
    stack = jnp.stack(
        [xp[1 + dy : xp.shape[0] - 1 + dy, 1 + dx : xp.shape[1] - 1 + dx]
         for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
        axis=0,
    )
    med = jnp.median(stack, axis=0)
    fixed = rggb2bayer(med)
    return jnp.where(bad_mask, fixed, raw)


def bayer2raw(packed: jnp.ndarray, wp: float = 16383.0, bl: float = 512.0) -> jnp.ndarray:
    """Unpack normalized RGBG ``[..., h, w, 4]`` back to an integer-range mosaic.

    ``raw = clip(packed, 0, 1) * (wp - bl) + bl`` (reference utils/isp_ops.py:98-112).
    Returned as float32; cast to uint16 at the host edge if needed.
    """
    x = jnp.clip(packed, 0.0, 1.0) * (wp - bl) + bl
    return unpack_bayer(x)
