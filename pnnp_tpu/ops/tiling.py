"""Halo-tiled full-frame inference (the reference's spatial "long context" path).

Re-expresses the overlap-tile crop/merge of the reference
(reference: data_process/real_datasets.py:139-189) as static-shape JAX ops:
reflect-pad with a ``base/2`` halo, gather ``nh*nw`` tiles of ``patch_size``,
run the model over the tile batch (optionally as a memory-bounded
``lax.map``), and stitch the halo-stripped interiors back together.

All tile coordinates are computed from static shapes at trace time, so the
whole pipeline compiles to one XLA program per (H, W) bucket.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _tile_starts(size: int, patch: int, stride: int) -> np.ndarray:
    """Main-grid starts [0, l, 2l, ...] plus one end-anchored tile (reference scheme)."""
    n = size // stride + 1
    starts = [i * stride for i in range(n - 1)]
    starts.append(size + 2 * (patch - stride) // 2 - patch)  # == padded_size - patch
    return np.array(starts, np.int32)


def eval_crop(data: jnp.ndarray, patch_size: int, base: int = 64) -> jnp.ndarray:
    """``[H, W, C]`` -> ``[nh*nw, patch, patch, C]`` overlap tiles with reflect halo."""
    H, W, _ = data.shape
    d = base // 2
    l = patch_size - base
    if H < l or W < l:
        raise ValueError(
            f"image {H}x{W} smaller than the tile stride "
            f"{l} (= patch_size {patch_size} - base {base}); lower patch_size "
            "or evaluate the frame whole")
    padded = jnp.pad(data, ((d, d), (d, d), (0, 0)), mode="reflect")
    hs = _tile_starts(H, patch_size, l)
    ws = _tile_starts(W, patch_size, l)
    starts = np.stack(np.meshgrid(hs, ws, indexing="ij"), axis=-1).reshape(-1, 2)

    def grab(st):
        return jax.lax.dynamic_slice(padded, (st[0], st[1], 0), (patch_size, patch_size, data.shape[-1]))

    return jax.vmap(grab)(jnp.asarray(starts))


def eval_merge(tiles: jnp.ndarray, out_hw: tuple[int, int], base: int = 64) -> jnp.ndarray:
    """Stitch ``[nh*nw, patch, patch, C]`` interiors back into ``[H, W, C]``.

    Writes follow the reference order (main grid, then right/bottom
    end-anchored strips, then the corner) so overlapping edge regions resolve
    identically (reference: data_process/real_datasets.py:166-189).
    """
    H, W = out_hw
    patch = tiles.shape[1]
    C = tiles.shape[-1]
    d = base // 2
    l = patch - base
    nh = H // l + 1
    nw = W // l + 1
    tiles = tiles.reshape(nh, nw, patch, patch, C)
    inner = tiles[:, :, d : patch - d, d : patch - d, :]  # [nh, nw, l, l, C]

    out = jnp.zeros((H, W, C), tiles.dtype)
    # Main grid: disjoint l x l blocks — one reshape-scatter.
    main = inner[: nh - 1, : nw - 1]
    main_block = main.transpose(0, 2, 1, 3, 4).reshape((nh - 1) * l, (nw - 1) * l, C)
    out = out.at[: (nh - 1) * l, : (nw - 1) * l, :].set(main_block)
    # Right strip (end-anchored columns).
    right = inner[: nh - 1, nw - 1].reshape((nh - 1) * l, l, C)
    out = out.at[: (nh - 1) * l, W - l :, :].set(right)
    # Bottom strip.
    bottom = inner[nh - 1, : nw - 1].transpose(1, 0, 2, 3).reshape(l, (nw - 1) * l, C)
    out = out.at[H - l :, : (nw - 1) * l, :].set(bottom)
    # Corner.
    out = out.at[H - l :, W - l :, :].set(inner[nh - 1, nw - 1])
    return out


def tiled_apply(fn, data: jnp.ndarray, patch_size: int, base: int = 64, tile_batch: int = 0) -> jnp.ndarray:
    """Apply ``fn`` (a [N,p,p,C]->[N,p,p,C] batch op) over halo tiles of ``[H,W,C]``.

    ``tile_batch > 0`` bounds peak memory by scanning chunks of tiles through
    ``fn`` with ``lax.map`` — the XLA-native version of the reference's
    per-tile Python loop (reference: trainer_SID.py:345-360).
    """
    H, W, _ = data.shape
    tiles = eval_crop(data, patch_size, base)
    if tile_batch and tiles.shape[0] > tile_batch:
        n = tiles.shape[0]
        pad_n = (-n) % tile_batch
        tiles_p = jnp.pad(tiles, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
        chunks = tiles_p.reshape(-1, tile_batch, *tiles.shape[1:])
        outs = jax.lax.map(fn, chunks).reshape(-1, *tiles.shape[1:])[:n]
    else:
        outs = fn(tiles)
    return eval_merge(outs, (H, W), base)
