"""Pallas tiled-reduction SSIM — the eval-metric hot op.

Motivation (measured on v5e, full IMX686 frame [1736, 2312, 4] f32): the XLA
SSIM costs 42.8 ms as five non-separable 7x7 ``reduce_window``s over 4-lane
tensors and still 18 ms after the stacked-separable rewrite
(pnnp_tpu/ops/metrics.py) — every windowed moment makes full-frame HBM round
trips. SSIM is a *reduction to one scalar*: a tiled kernel reads x and y
exactly once, forms the five moments, runs the separable 7x7 box in VMEM
(H pass = static sublane-shifted adds, W pass = ``pltpu.roll`` lane shifts +
edge masking), evaluates the SSIM map, and emits one partial sum per tile.
HBM traffic drops from ~15 passes to 2.

Layout: channels ride the SUBLANE axis as stacked row bands — inputs are
``[C*H, W]`` f32 (``img.transpose(2,0,1).reshape(C*H, W)``), so lanes carry
W at full 128-lane utilization (the eval tensors' natural ``[H, W, 4]``
layout wastes 124/128 lanes). Windows never cross band boundaries: the grid
is (channel, row-tile) and each program scores only its band's valid rows.

Matches ``skimage.structural_similarity(channel_axis=-1)`` exactly like
``pnnp_tpu.ops.metrics.ssim`` (uniform 7x7, N/(N-1) covariance, border
crop); parity is tested in tests/test_kernels_ssim.py and the public entry
``ssim_fast`` falls back to the XLA path off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 7
TH = 32  # banded-layout output rows per program (VMEM-bound at 64)
TH_FLAT = 8  # flat-layout rows per program (lanes are C x wider)


def _kernel(x_hbm, y_hbm, out_ref, xt, yt, sems, *, H, W, Wp, cs, th,
            data_range):
    # W = true image width in PIXELS; cs = lane stride between horizontally
    # adjacent same-channel pixels (1 for channel-banded [C*H, W] inputs,
    # C for channel-interleaved flat [H, W*C] inputs); Wp = 128-padded lane
    # count (Mosaic requires lane-dim slices in 128 multiples)
    c = pl.program_id(0)
    t = pl.program_id(1)
    Hv = H - (WIN - 1)          # valid output rows per channel band
    Wv = W - (WIN - 1)
    # Mosaic requires DMA starts AND slice heights aligned to the (8, 128)
    # tiling: align the clamped start down to 8 (requires H % 8 == 0 so
    # c*H stays aligned) and widen the window to TH+16 rows / TH+8 compute
    # rows so alignment slack never loses coverage; the caller bottom-pads
    # the array by 16 rows to keep the last window in bounds.
    s = jnp.minimum(t * th, H - (th + WIN - 1))
    s = (s // 8) * 8
    rs = c * H + s

    dx = pltpu.make_async_copy(x_hbm.at[pl.ds(rs, th + 16), :], xt,
                               sems.at[0])
    dy = pltpu.make_async_copy(y_hbm.at[pl.ds(rs, th + 16), :], yt,
                               sems.at[1])
    dx.start()
    dy.start()
    dx.wait()
    dy.wait()

    x = xt[...]
    y = yt[...]
    TC = th + 8  # computed output rows per tile (coverage incl. align slack)

    def box(m):
        # H pass: static sublane-shifted adds
        h = m[0:TC]
        for k in range(1, WIN):
            h = h + m[k:TC + k]
        # W pass: lane rolls by cs*k — one image column = cs lanes (shift
        # Wp-cs*k == -cs*k circularly; pltpu.roll wants non-negative
        # shifts); wrapped columns are masked out below
        w = h
        for k in range(1, WIN):
            w = w + pltpu.roll(h, Wp - cs * k, 1)
        return w

    n = float(WIN * WIN)
    cov_norm = n / (n - 1.0)
    ux = box(x) / n
    uy = box(y) / n
    uxx = box(x * x) / n
    uyy = box(y * y) / n
    uxy = box(x * y) / n
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    smap = ((2.0 * ux * uy + c1) * (2.0 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2))

    # masks: global output row in [t*TH, min((t+1)*TH, Hv)); col < Wv
    rows = jax.lax.broadcasted_iota(jnp.int32, (TC, Wp), 0) + s
    cols = jax.lax.broadcasted_iota(jnp.int32, (TC, Wp), 1)
    mask = ((rows >= t * th) & (rows < jnp.minimum((t + 1) * th, Hv))
            & (cols // cs < Wv))
    total = jnp.sum(jnp.where(mask, smap, 0.0))

    # all programs map the SAME (8, 128) output block (TPU grid programs run
    # sequentially per core): initialize once, accumulate the partial sums
    @pl.when((c == 0) & (t == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # scalar VMEM stores are unsupported: broadcast-add the partial over the
    # whole (8, 128) block; every slot ends up holding the same grand total
    out_ref[...] = out_ref[...] + total


@functools.partial(jax.jit, static_argnames=("C", "data_range"))
def _ssim_bands(xf: jnp.ndarray, yf: jnp.ndarray, C: int,
                data_range: float = 255.0) -> jnp.ndarray:
    """Mean SSIM from channel-banded [C*H, W] f32 inputs."""
    CH, W = xf.shape
    H = CH // C
    Wp = -(-W // 128) * 128
    RT = -(-(H - (WIN - 1)) // TH)
    grid = (C, RT)
    partials = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, Wp=Wp, cs=1, th=TH,
                          data_range=float(data_range)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda c, t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TH + 16, Wp), jnp.float32),
            pltpu.VMEM((TH + 16, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(jnp.pad(xf, ((0, 16), (0, Wp - W))),
      jnp.pad(yf, ((0, 16), (0, Wp - W))))
    Hv, Wv = H - (WIN - 1), W - (WIN - 1)
    return partials[0, 0] / (C * Hv * Wv)


def ssim_kernel(x: jnp.ndarray, y: jnp.ndarray,
                data_range: float = 255.0) -> jnp.ndarray:
    """skimage-compatible mean SSIM of an [H, W, C] pair via the Pallas
    tiled reduction. Requires H >= TH + 6; use :func:`ssim_fast` for the
    size- and backend-guarded entry point."""
    H, W, C = x.shape
    xf = x.astype(jnp.float32).transpose(2, 0, 1).reshape(C * H, W)
    yf = y.astype(jnp.float32).transpose(2, 0, 1).reshape(C * H, W)
    return _ssim_bands(xf, yf, C, data_range=data_range)


def ssim_fast(x: jnp.ndarray, y: jnp.ndarray,
              data_range: float = 255.0) -> jnp.ndarray:
    """Mean SSIM [H, W, C]: Pallas kernel on TPU for full-frame inputs, the
    XLA stacked-separable path otherwise (small crops, CPU tests)."""
    from pnnp_tpu.ops.metrics import ssim as ssim_xla

    H = x.shape[0]
    if jax.default_backend() != "tpu" or H < TH + WIN - 1 or H % 8:
        return ssim_xla(x, y, data_range=data_range)
    return ssim_kernel(x, y, data_range=data_range)


def packed_to_banded(g: jnp.ndarray) -> jnp.ndarray:
    """4x4-superpixel packed [h2, w2, 16] -> channel-banded [4*H, W] (the
    SSIM kernel's input layout; H = 2*h2, W = 2*w2).

    Packed channel (2a+b)*4+c at (i, j) is unpacked pixel (c, 2i+a, 2j+b)
    (layout contract of models/unet_s2d.s2d over RGGB-packed frames)."""
    h2, w2, c16 = g.shape
    assert c16 == 16, g.shape
    t = g.reshape(h2, w2, 2, 2, 4).transpose(4, 0, 2, 1, 3)  # [4,h2,2,w2,2]
    return t.reshape(4 * 2 * h2, 2 * w2)


@functools.partial(jax.jit, static_argnames=("C", "data_range"))
def _ssim_flat_kernel(xf: jnp.ndarray, yf: jnp.ndarray, C: int,
                      data_range: float = 255.0) -> jnp.ndarray:
    """Mean SSIM from channel-INTERLEAVED flat [H, W*C] f32 inputs.

    This is the production layout: lane ``l`` holds pixel column ``l // C``,
    channel ``l % C``, so a horizontal image step is a lane roll of C and the
    7x7 box never mixes channels. Crucially, the eval pipeline produces these
    tensors for free (``[H, W, C]`` host frames reshape to ``[H, W*C]`` as a
    view; the network's flat output is one fused transpose), where the
    channel-banded layout cost a ~8 ms XLA relayout per full-frame tensor.
    """
    H, WC = xf.shape
    W = WC // C
    Wp = -(-WC // 128) * 128
    RT = -(-(H - (WIN - 1)) // TH_FLAT)
    partials = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, Wp=Wp, cs=C, th=TH_FLAT,
                          data_range=float(data_range)),
        grid=(1, RT),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda c, t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TH_FLAT + 16, Wp), jnp.float32),
            pltpu.VMEM((TH_FLAT + 16, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(jnp.pad(xf, ((0, 16), (0, Wp - WC))),
      jnp.pad(yf, ((0, 16), (0, Wp - WC))))
    Hv, Wv = H - (WIN - 1), W - (WIN - 1)
    return partials[0, 0] / (C * Hv * Wv)


def ssim_flat(xf: jnp.ndarray, yf: jnp.ndarray, C: int = 4,
              data_range: float = 255.0) -> jnp.ndarray:
    """Mean SSIM from channel-interleaved flat [H, W*C] inputs; Pallas on
    TPU, XLA fallback (un-flatten + stacked-separable path) elsewhere."""
    H = xf.shape[0]
    if jax.default_backend() == "tpu" and H >= TH + WIN - 1 and H % 8 == 0:
        return _ssim_flat_kernel(xf.astype(jnp.float32),
                                 yf.astype(jnp.float32), C,
                                 data_range=data_range)
    from pnnp_tpu.ops.metrics import ssim as ssim_xla

    unflat = lambda t: t.reshape(H, -1, C)
    return ssim_xla(unflat(xf), unflat(yf), data_range=data_range)


def ssim_banded(xf: jnp.ndarray, yf: jnp.ndarray, C: int = 4,
                data_range: float = 255.0) -> jnp.ndarray:
    """Mean SSIM from channel-banded [C*H, W] inputs; Pallas on TPU, XLA
    fallback (un-band + stacked-separable path) elsewhere."""
    H = xf.shape[0] // C
    if jax.default_backend() == "tpu" and H >= TH + WIN - 1 and H % 8 == 0:
        return _ssim_bands(xf.astype(jnp.float32), yf.astype(jnp.float32), C,
                           data_range=data_range)
    from pnnp_tpu.ops.metrics import ssim as ssim_xla

    unband = lambda t: t.reshape(C, H, -1).transpose(1, 2, 0)
    return ssim_xla(unband(xf), unband(yf), data_range=data_range)
