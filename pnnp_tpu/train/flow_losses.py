"""Optical-flow-heritage losses (EPE / census-ternary / Sobel).

Parity-completion of the reference's ``losses/flow_loss.py`` (unused by any
reference trainer — its import is commented at ``losses/__init__.py:2`` —
but part of the public loss surface). Re-designed functional/NHWC:

* :func:`epe_loss` — per-pixel endpoint error with a validity mask
  (reference ``flow_loss.py:6-13``).
* :func:`ternary_loss` — census-transform (7x7 patch ternary signature)
  soft hamming distance between two RGB images, border-masked (reference
  ``flow_loss.py:15-50``). The patch extraction is one 49-channel conv
  (eye kernel), MXU-friendly.
* :func:`sobel_loss` — L1 between Sobel gradients (reference
  ``flow_loss.py:52-75``); thin wrapper over ``losses.gradient``.

All take NHWC float tensors and return per-pixel maps like the reference
(callers reduce).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pnnp_tpu.train.losses import gradient


def epe_loss(flow: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Endpoint error: ||flow - gt||_2 over channels, masked. [N,H,W,C] -> [N,H,W,1]."""
    d = (flow - jax.lax.stop_gradient(gt)) ** 2
    m = jnp.sqrt(jnp.sum(d, axis=-1, keepdims=True) + 1e-6)
    return m * mask


def _rgb2gray(rgb: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray([0.2989, 0.5870, 0.1140], rgb.dtype)
    return jnp.sum(rgb[..., :3] * w, axis=-1, keepdims=True)


def _census(img: jnp.ndarray, patch: int = 7) -> jnp.ndarray:
    """Ternary census signature: normalized difference of each 7x7 neighbour
    to the center pixel. [N,H,W,1] -> [N,H,W,49]."""
    k = np.eye(patch * patch, dtype=np.float32).reshape(
        patch, patch, 1, patch * patch)
    patches = jax.lax.conv_general_dilated(
        img, jnp.asarray(k, img.dtype), (1, 1),
        [(patch // 2, patch // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    t = patches - img
    return t / jnp.sqrt(0.81 + t * t)


def _border_mask(shape, pad: int, dtype) -> jnp.ndarray:
    n, h, w = shape[0], shape[1], shape[2]
    inner = jnp.ones((n, h - 2 * pad, w - 2 * pad, 1), dtype)
    return jnp.pad(inner, ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def ternary_loss(img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """Census soft-hamming distance map between two RGB images. -> [N,H,W,1]."""
    t0 = _census(_rgb2gray(img0))
    t1 = _census(_rgb2gray(img1))
    d = (t0 - t1) ** 2
    ham = jnp.mean(d / (0.1 + d), axis=-1, keepdims=True)
    return ham * _border_mask(img0.shape, 1, img0.dtype)


def sobel_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """L1 of Sobel-gradient difference, per pixel. [N,H,W,C] -> [N,H,W,C]."""
    lx = jnp.abs(gradient(pred, "x", "sobel") - gradient(gt, "x", "sobel"))
    ly = jnp.abs(gradient(pred, "y", "sobel") - gradient(gt, "y", "sobel"))
    return lx + ly
