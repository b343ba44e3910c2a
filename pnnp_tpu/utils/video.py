"""Multi-frame (video) index helpers (reference: utils/video_ops.py).

Builds per-output-frame input-index windows for nframes-input video models,
with reflect or clip boundary handling, and gathers frame stacks — expressed
as NumPy index math + one JAX gather.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _reflect(nums, lo, hi):
    # single bounce + clamp: windows wider than 2x the clip would otherwise
    # go negative after one reflection and silently wrap in gathers
    nums = np.abs(np.asarray(nums) - lo)
    return np.clip(hi - np.abs(hi - nums), lo, hi)


def frame_index_splitor(nframes: int = 1, pad: bool = True, reflect: bool = True,
                        total: int = 7) -> np.ndarray:
    """Index windows [n_out, nframes] over a clip of ``total`` frames.

    pad=True keeps n_out == total (centered windows, boundary-reflected/
    clipped); pad=False yields only fully-interior windows.
    """
    r = nframes // 2
    if pad:
        frames = [[i + k - r for k in range(nframes)] for i in range(total)]
    else:
        frames = [[i + k for k in range(nframes)] for i in range(total + 1 - nframes)]
    frames = np.asarray(frames)
    if reflect:
        return _reflect(frames, 0, total - 1)
    return np.clip(frames, 0, total - 1)


def multi_frame_gather(clip: jnp.ndarray, index: np.ndarray, gt: bool = False,
                       keepdims: bool = False) -> jnp.ndarray:
    """Gather input stacks from ``clip [B, T, H, W, C]``.

    gt=False -> [n_out, B, nframes, H, W, C]; gt=True picks each window's
    center frame -> [n_out, B, (1,) H, W, C].
    """
    index = np.asarray(index)
    if gt:
        centers = index[:, index.shape[1] // 2]
        out = clip[:, jnp.asarray(centers)]  # [B, n_out, ...]
        out = jnp.moveaxis(out, 1, 0)
        if keepdims:
            out = out[:, :, None]
        return out
    out = clip[:, jnp.asarray(index)]  # [B, n_out, nframes, ...]
    return jnp.moveaxis(out, 1, 0)
