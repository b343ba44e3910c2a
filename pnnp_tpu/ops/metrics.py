"""On-device image quality metrics: PSNR and SSIM, skimage-compatible.

The reference scores raw-domain quality with skimage's ``compare_psnr`` /
``compare_ssim`` at ``data_range=255`` on CPU (reference:
utils/visualization.py:26-33) — a major eval bottleneck. These are exact
JAX re-implementations (uniform 7x7 window SSIM with sample-covariance
normalization and border crop) that run fused on TPU and vmap over batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 255.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio; ``x`` is the estimate, ``y`` the target."""
    mse = jnp.mean((x.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


def _window_mean(img: jnp.ndarray, win: int) -> jnp.ndarray:
    """Valid-mode uniform-window mean over the leading two axes of [H, W, C].

    Separable (H pass then W pass): the box filter factorizes, cutting the
    per-output adds from win^2 to 2*win. Measured on v5e full frames this is
    the difference between 42.8 and 18 ms per 5-moment SSIM when the five
    moments are stacked along C (see :func:`ssim`)."""
    s = jax.lax.reduce_window(
        img, 0.0, jax.lax.add,
        window_dimensions=(win, 1, 1), window_strides=(1, 1, 1),
        padding="VALID",
    )
    s = jax.lax.reduce_window(
        s, 0.0, jax.lax.add,
        window_dimensions=(1, win, 1), window_strides=(1, 1, 1),
        padding="VALID",
    )
    return s / (win * win)


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 255.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over an ``[H, W, C]`` image pair, channels averaged.

    Matches ``skimage.metrics.structural_similarity(..., channel_axis=-1)``
    defaults: 7x7 uniform filter, sample covariance (N/(N-1)), and the
    (win_size-1)/2 border crop — which valid-mode windows give us for free.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    n = win_size * win_size
    cov_norm = n / (n - 1.0)

    # One stacked separable window pass over [H, W, 5C] instead of five
    # passes over [H, W, C]: five 4-lane tensors waste 97% of the 128-lane
    # registers each; stacking fills 20 lanes and lets XLA amortize the
    # window shifts (42.8 -> 18 ms/frame for full IMX686 frames on v5e).
    stacked = jnp.concatenate([x, y, x * x, y * y, x * y], axis=-1)
    u = _window_mean(stacked, win_size)
    ux, uy, uxx, uyy, uxy = jnp.split(u, 5, axis=-1)

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    return jnp.mean(s)


def ssim_sum(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 255.0,
    win_size: int = 7,
) -> jnp.ndarray:
    """SUM of the valid-window SSIM map of an ``[H, W, C]`` pair (all
    channels): ``ssim(x, y) * (H-6) * (W-6) * C``. The partial-reduction
    form used by the width-sharded fused eval (each shard sums the window
    positions it owns; psum + global normalize reconstructs the exact
    full-frame mean)."""
    n = (x.shape[0] - win_size + 1) * (x.shape[1] - win_size + 1) * x.shape[2]
    return ssim(x, y, data_range=data_range, win_size=win_size) * n


def quality_assess(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 255.0) -> dict:
    """PSNR + SSIM dict for an HWC pair; X estimate, Y reference.

    (reference: utils/visualization.py:26-33)
    """
    return {"PSNR": psnr(x, y, data_range), "SSIM": ssim(x, y, data_range)}


def rgb_quality(out4c: jnp.ndarray, tgt4c: jnp.ndarray, wb=None, ccm=None):
    """sRGB-domain PSNR/SSIM of a packed-RGBG pair via the device ISP.

    Both images are rendered through :func:`pnnp_tpu.ops.isp.fast_isp` (WB ->
    demosaic -> CCM -> gamma, the device analog of the reference's
    ``raw2rgb_rawpy``) and scored at data_range=255 with uint8 quantization —
    the reference's disabled "RGB metrics" eval option
    (trainer_SID.py:272 ``# raw_metrics = None # 用RGB metrics`` +
    visualization.py:57-63), computed fully on-device.

    Returns (psnr, ssim) as device scalars; inputs are [h, w, 4] in [0, 1].
    """
    from pnnp_tpu.ops.isp import fast_isp

    # uint8 truncation like the reference's scale_up (visualization.py:6-7)
    a = jnp.floor(jnp.clip(fast_isp(out4c, wb=wb, ccm=ccm), 0, 1) * 255.0)
    b = jnp.floor(jnp.clip(fast_isp(tgt4c, wb=wb, ccm=ccm), 0, 1) * 255.0)
    return psnr(a, b), ssim(a, b)
