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
_MIN_H = 32  # below this the XLA path wins (kernel launch overhead)


def _kernel(xm, xh, ym, yh, out_ref, *, Hv, W, Wp, cs, tc, data_range):
    # Pipelined tile: main block (8 rows) + halo block (the NEXT 8 rows) per
    # input — Pallas double-buffers BlockSpec operands, so HBM fetch overlaps
    # compute and no manual DMA alignment is needed. Each program scores the
    # 8 output rows of its main block (window rows 8t..8t+13 <= 16 loaded).
    # W = true image width in PIXELS; cs = lane stride between horizontally
    # adjacent same-channel pixels (1 for channel-banded [C*H, W] inputs,
    # C for channel-interleaved flat [H, W*C] inputs); Wp = 128-padded lanes.
    c = pl.program_id(0)
    t = pl.program_id(1)
    Wv = W - (WIN - 1)
    TC = tc

    x = jnp.concatenate([xm[...], xh[...]], axis=0)  # [TC+8, Wp]
    y = jnp.concatenate([ym[...], yh[...]], axis=0)

    def box(m):
        # H pass: pair/quad decomposition (4 adds instead of 6)
        a = m[0:TC + 5] + m[1:TC + 6]          # taps {k, k+1}
        b = a[0:TC + 3] + a[2:TC + 5]          # taps {k..k+3}
        h = b[0:TC] + a[4:TC + 4] + m[6:TC + 6]  # {0..3}+{4,5}+{6}
        # W pass: lane rolls by cs*k, same decomposition (shift Wp-cs*k ==
        # -cs*k circularly; wrapped columns are masked out below)
        ra = h + pltpu.roll(h, Wp - cs, 1)
        rb = ra + pltpu.roll(ra, Wp - 2 * cs, 1)
        return rb + pltpu.roll(ra, Wp - 4 * cs, 1) + pltpu.roll(h, Wp - 6 * cs, 1)

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

    # masks: each tile's 8 output rows are unique; drop rows >= Hv and the
    # wrapped/border columns
    rows = jax.lax.broadcasted_iota(jnp.int32, (TC, Wp), 0) + t * TC
    cols = jax.lax.broadcasted_iota(jnp.int32, (TC, Wp), 1)
    mask = (rows < Hv) & (cols // cs < Wv)
    total = jnp.sum(jnp.where(mask, smap, 0.0))

    # all programs map the SAME (8, 128) output block (TPU grid programs run
    # sequentially per core): initialize once, accumulate the partial sums
    @pl.when((c == 0) & (t == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # scalar VMEM stores are unsupported: broadcast-add the partial over the
    # whole (8, 128) block; every slot ends up holding the same grand total
    out_ref[...] = out_ref[...] + total


def _ssim_call(xf, yf, bands, Hband, Hv, W, cs, data_range, C, tc=8):
    """Shared pallas_call: grid (bands, row-tiles of ``tc``), each program
    reading a main (tc, Wp) block plus the NEXT 8 rows as a halo block —
    Pallas double-buffers both, so HBM fetch overlaps compute.

    ``Hband`` (the per-band row count of xf/yf) must be % tc so block
    offsets land on band starts; callers pad bands and pass the true
    valid-row count ``Hv`` for masking/normalization.

    ``tc=8`` is measured-best AND the VMEM ceiling at full-frame lane
    widths (~18.5k lanes): tc=16 fails Mosaic VMEM accounting, and the
    extra halo re-read at tc=8 (2x input traffic) is hidden behind
    compute by the double buffering — v5e sweep 2026-08-17: Sony
    7.27 ms / IMX686 8.73 ms vs 10.6 ms for the manual-DMA TH=32 form.
    """
    assert tc % 8 == 0 and Hband % tc == 0, (tc, Hband)
    Wl = xf.shape[1]
    Wp = -(-Wl // 128) * 128
    HB = Hband // tc
    RT = -(-Hv // tc)
    xp = jnp.pad(xf, ((0, tc + 8), (0, Wp - Wl)))
    yp = jnp.pad(yf, ((0, tc + 8), (0, Wp - Wl)))
    spec_m = pl.BlockSpec((tc, Wp), lambda c, t: (c * HB + t, 0),
                          memory_space=pltpu.VMEM)
    spec_h = pl.BlockSpec((8, Wp),
                          lambda c, t: ((c * Hband + (t + 1) * tc) // 8, 0),
                          memory_space=pltpu.VMEM)
    partials = pl.pallas_call(
        functools.partial(_kernel, Hv=Hv, W=W, Wp=Wp, cs=cs, tc=tc,
                          data_range=float(data_range)),
        grid=(bands, RT),
        in_specs=[spec_m, spec_h, spec_m, spec_h],
        out_specs=pl.BlockSpec((8, 128), lambda c, t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(xp, xp, yp, yp)
    Wv = W - (WIN - 1)
    return partials[0, 0] / (C * Hv * Wv)


def _ssim_call_sum(xf, yf, bands, Hband, Hv, W, cs, data_range, C, tc=8):
    """:func:`_ssim_call` without the final normalization — the raw SUM over
    the (C * Hv * (W-6)) valid window positions."""
    return _ssim_call(xf, yf, bands, Hband, Hv, W, cs, data_range, C,
                      tc=tc) * (C * Hv * (W - (WIN - 1)))


@functools.partial(jax.jit, static_argnames=("C", "data_range"))
def _ssim_bands(xf: jnp.ndarray, yf: jnp.ndarray, C: int,
                data_range: float = 255.0) -> jnp.ndarray:
    """Mean SSIM from channel-banded [C*H, W] f32 inputs. Bands are padded
    to % 8 rows here so block offsets stay band-aligned for any H."""
    CH, W = xf.shape
    H = CH // C
    Hp = -(-H // 8) * 8
    if Hp != H:
        b = xf.reshape(C, H, W)
        pad = ((0, 0), (0, Hp - H), (0, 0))
        xf = jnp.pad(b, pad).reshape(C * Hp, W)
        yf = jnp.pad(yf.reshape(C, H, W), pad).reshape(C * Hp, W)
    return _ssim_call(xf, yf, C, Hp, H - (WIN - 1), W, 1, data_range, C)


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
    Hp = -(-H // 8) * 8
    if Hp != H:
        xf = jnp.pad(xf, ((0, Hp - H), (0, 0)))
        yf = jnp.pad(yf, ((0, Hp - H), (0, 0)))
    return _ssim_call(xf, yf, 1, Hp, H - (WIN - 1), WC // C, C,
                      data_range, C)


def ssim_kernel(x: jnp.ndarray, y: jnp.ndarray,
                data_range: float = 255.0) -> jnp.ndarray:
    """skimage-compatible mean SSIM of an [H, W, C] pair via the Pallas
    tiled reduction; use :func:`ssim_fast` for the backend-guarded entry."""
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
    if jax.default_backend() != "tpu" or H < _MIN_H:
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


def ssim_flat(xf: jnp.ndarray, yf: jnp.ndarray, C: int = 4,
              data_range: float = 255.0) -> jnp.ndarray:
    """Mean SSIM from channel-interleaved flat [H, W*C] inputs; Pallas on
    TPU, XLA fallback (un-flatten + stacked-separable path) elsewhere."""
    H = xf.shape[0]
    if jax.default_backend() == "tpu" and H >= _MIN_H:
        return _ssim_flat_kernel(xf.astype(jnp.float32),
                                 yf.astype(jnp.float32), C,
                                 data_range=data_range)
    from pnnp_tpu.ops.metrics import ssim as ssim_xla

    unflat = lambda t: t.reshape(H, -1, C)
    return ssim_xla(unflat(xf), unflat(yf), data_range=data_range)


def ssim_flat_sum(xf: jnp.ndarray, yf: jnp.ndarray, C: int = 4,
                  data_range: float = 255.0) -> jnp.ndarray:
    """SUM of the valid-window SSIM map from channel-interleaved flat
    [H, W*C] inputs — :func:`ssim_flat` times the valid-window count
    ``(H-6) * (W-6) * C``. Pallas on TPU, XLA fallback elsewhere.

    Used by the width-sharded fused eval: a shard slab of ``own + 6`` pixel
    columns makes this sum exactly the shard's owned window positions, so
    psum over shards + one global normalize reproduces the full-frame mean
    (see parallel.mesh.make_eval_metrics_step_sharded)."""
    H = xf.shape[0]
    W = xf.shape[1] // C
    if jax.default_backend() == "tpu" and H >= _MIN_H:
        Hp = -(-H // 8) * 8
        if Hp != H:
            xf = jnp.pad(xf, ((0, Hp - H), (0, 0)))
            yf = jnp.pad(yf, ((0, Hp - H), (0, 0)))
        return _ssim_call_sum(xf.astype(jnp.float32), yf.astype(jnp.float32),
                              1, Hp, H - (WIN - 1), W, C, data_range, C)
    from pnnp_tpu.ops.metrics import ssim_sum as ssim_sum_xla

    unflat = lambda t: t.reshape(H, -1, C)
    return ssim_sum_xla(unflat(xf), unflat(yf), data_range=data_range)


def ssim_banded(xf: jnp.ndarray, yf: jnp.ndarray, C: int = 4,
                data_range: float = 255.0) -> jnp.ndarray:
    """Mean SSIM from channel-banded [C*H, W] inputs; Pallas on TPU, XLA
    fallback (un-band + stacked-separable path) elsewhere."""
    H = xf.shape[0] // C
    if jax.default_backend() == "tpu" and H >= _MIN_H:
        return _ssim_bands(xf.astype(jnp.float32), yf.astype(jnp.float32), C,
                           data_range=data_range)
    from pnnp_tpu.ops.metrics import ssim as ssim_xla

    unband = lambda t: t.reshape(C, H, -1).transpose(1, 2, 0)
    return ssim_xla(unband(xf), unband(yf), data_range=data_range)
