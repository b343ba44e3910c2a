"""ISP support filters in JAX (reference: utils/isp_algos.py:21-99).

stdfilt, (fast) guided filter, and the bilateral row-mean FPN remover used by
dark-shading calibration — all expressed as box-filter compositions that XLA
fuses and vectorizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _box(img: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mean filter with edge-replicate padding over the last two dims of [..., H, W]."""
    # asymmetric pad keeps output size n for even k too (pad + pad - (k-1) = 0)
    pl, pr = k // 2, (k - 1) // 2
    x = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(pl, pr), (pl, pr)], mode="edge")
    # separable box via cumulative sums
    ker = jnp.ones((k,), img.dtype) / k

    def conv1d(a, axis):
        a = jnp.moveaxis(a, axis, -1)
        out = jax.vmap(lambda row: jnp.convolve(row, ker, mode="valid"))(
            a.reshape(-1, a.shape[-1])
        ).reshape(a.shape[:-1] + (a.shape[-1] - k + 1,))
        return jnp.moveaxis(out, -1, axis)

    return conv1d(conv1d(x, -1), -2)


def stdfilt(img: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    """Local standard deviation (reference: isp_algos.py:21-30)."""
    mu = _box(img, k)
    mu2 = _box(img * img, k)
    return jnp.sqrt(jnp.maximum(mu2 - mu * mu, 0.0))


def guided_filter(I: jnp.ndarray, p: jnp.ndarray, k: int = 5, eps: float = 0.01):
    """He et al. guided filter (reference: isp_algos.py:61-82)."""
    mean_I = _box(I, k)
    mean_p = _box(p, k)
    corr_I = _box(I * I, k)
    corr_Ip = _box(I * p, k)
    var_I = corr_I - mean_I * mean_I
    cov_Ip = corr_Ip - mean_I * mean_p
    a = cov_Ip / (var_I + eps)
    b = mean_p - a * mean_I
    return _box(a, k) * I + _box(b, k)


def fast_guided_filter(p: jnp.ndarray, k: int = 5, eps: float = 0.01):
    """Self-guided variant (reference: isp_algos.py:42-59)."""
    return guided_filter(p, p, k, eps)


def row_denoise(raw: jnp.ndarray, sigma_s: float = 7.0, sigma_r: float = 0.5):
    """Bilateral smoothing of per-row means: estimates row FPN for dark-shading
    calibration (reference: isp_algos.py:84-99, which used cv2.bilateralFilter
    on the row-mean profile). Returns the raw with row noise removed.

    ``raw`` is a Bayer mosaic [H, W]; row means are taken per Bayer row-plane.
    """
    H, W = raw.shape
    rows = raw.reshape(H // 2, 2, W).transpose(1, 0, 2)  # [2, H/2, W]
    row_mean = jnp.mean(rows, axis=-1)  # [2, H/2]

    # 1-D bilateral filter on each plane's row-mean profile.
    n = row_mean.shape[1]
    radius = int(3 * sigma_s)
    offsets = jnp.arange(-radius, radius + 1)
    spatial_w = jnp.exp(-0.5 * (offsets / sigma_s) ** 2)

    def bilateral(profile):
        idx = jnp.clip(jnp.arange(n)[:, None] + offsets[None, :], 0, n - 1)
        neigh = profile[idx]  # [n, 2r+1]
        range_w = jnp.exp(-0.5 * ((neigh - profile[:, None]) / sigma_r) ** 2)
        w = spatial_w[None, :] * range_w
        return jnp.sum(w * neigh, axis=1) / jnp.sum(w, axis=1)

    smooth = jax.vmap(bilateral)(row_mean)
    fpn = row_mean - smooth  # the residual row noise
    corrected = rows - fpn[:, :, None]
    return corrected.transpose(1, 0, 2).reshape(H, W)
