"""Device-side ISP: white balance, CCM, gamma, demosaic — batched, NHWC, jittable.

Mirrors the reference's batched raw->sRGB pipeline (reference:
data_process/process.py:104-155, utils/isp_ops.py:125-158) but runs entirely
on-device so eval-time RGB metrics never bounce through LibRaw/OpenCV.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pnnp_tpu.ops.bayer import unpack_bayer

# SonyA7S2 cam->sRGB CCM used by the reference when rawpy's matrix is identity
# (reference: utils/isp_ops.py:151-153, get_dataset_infos.py:5).
SONY_CCM = jnp.array(
    [
        [1.9712269, -0.6789218, -0.29230508],
        [-0.29104823, 1.748401, -0.45735288],
        [0.02051281, -0.5380369, 1.5175241],
    ],
    jnp.float32,
)


def apply_gains(bayer_images: jnp.ndarray, wbs: jnp.ndarray) -> jnp.ndarray:
    """White-balance a batch of RGBG images ``[N, h, w, 4]`` with gains ``[N, 4]``.

    (reference: data_process/process.py:104-109)
    """
    return bayer_images * wbs[:, None, None, :]


def apply_ccms(images: jnp.ndarray, ccms: jnp.ndarray) -> jnp.ndarray:
    """Apply color correction matrices: ``[N, h, w, 3] @ ccm^T`` with ``[N, 3, 3]``.

    (reference: data_process/process.py:112-121; `sum(img * ccm, -1)` ==
    matmul with the matrix's rows, i.e. ``img @ ccm.T``.)
    """
    return jnp.einsum("nhwc,nkc->nhwk", images, ccms,
                      precision=jax.lax.Precision.HIGHEST)


def gamma_compression(images: jnp.ndarray, gamma: float = 2.2) -> jnp.ndarray:
    """Linear -> gamma, with the reference's uint8 round-trip quantization.

    (reference: data_process/process.py:124-129 — note the int() truncation)
    """
    outs = jnp.maximum(images, 1e-8) ** (1.0 / gamma)
    outs = jnp.clip(jnp.floor(outs * 255.0).astype(jnp.int32), 0, 255).astype(jnp.float32) / 255.0
    return outs


def raw2lrgb(bayer_images: jnp.ndarray) -> jnp.ndarray:
    """RGBG ``[N, h, w, 4]`` -> linear RGB ``[N, h, w, 3]`` by binning G1/G2.

    (reference: data_process/process.py:132-139)
    """
    r = bayer_images[..., 0]
    g = 0.5 * (bayer_images[..., 1] + bayer_images[..., 3])
    b = bayer_images[..., 2]
    return jnp.stack([r, g, b], axis=-1)


def process(
    bayer_images: jnp.ndarray,
    wbs: jnp.ndarray,
    cam2rgbs: jnp.ndarray,
    gamma: float = 2.2,
) -> jnp.ndarray:
    """Full batched RGBG -> sRGB pipeline (reference: data_process/process.py:142-155)."""
    x = apply_gains(bayer_images, wbs)
    x = jnp.clip(x, 0.0, 1.0)
    x = raw2lrgb(x)
    x = apply_ccms(x, cam2rgbs)
    x = jnp.clip(x, 0.0, 1.0)
    return gamma_compression(x, gamma)


def simple_isp(
    rggb: jnp.ndarray,
    bl: float = 512.0,
    wp: float = 16383.0,
    wb=(2.0, 1.0, 1.0, 2.0),
    gamma: float = 2.2,
) -> jnp.ndarray:
    """Half-resolution preview ISP over cell-order RGGB ``[..., h, w, 4]``.

    NOTE ``wb`` is CELL-order RGGB (blue at index 3, like the reference's
    SimpleISP default [2,1,1,2] — isp_ops.py:125-132); everything else in
    this repo (fast_isp, dataset info 'wb') uses RGBG with blue at index 2.
    """
    x = (rggb.astype(jnp.float32) - bl) / (wp - bl)
    x = x * jnp.asarray(wb, jnp.float32)
    x = jnp.clip(x, 0.0, 1.0)[..., jnp.array([0, 1, 3])]
    return x ** (1.0 / gamma)


def bilinear_demosaic(bayer: jnp.ndarray) -> jnp.ndarray:
    """Bilinear RGGB demosaic of a mosaic ``[..., H, W]`` -> ``[..., H, W, 3]``.

    TPU-native replacement for the reference's OpenCV/LibRaw demosaic calls
    (reference: utils/isp_ops.py:149, :190). Expressed as three depthwise-style
    3x3 convolutions over masked color planes so XLA fuses it into one pass.
    """
    lead = bayer.shape[:-2]
    H, W = bayer.shape[-2:]
    x = bayer.reshape((-1, H, W, 1)).astype(jnp.float32)

    ii = jnp.arange(H)[:, None]
    jj = jnp.arange(W)[None, :]
    r_mask = ((ii % 2 == 0) & (jj % 2 == 0)).astype(jnp.float32)[None, :, :, None]
    b_mask = ((ii % 2 == 1) & (jj % 2 == 1)).astype(jnp.float32)[None, :, :, None]
    g_mask = 1.0 - r_mask - b_mask

    k_g = jnp.array([[0, 1, 0], [1, 4, 1], [0, 1, 0]], jnp.float32) / 4.0
    k_rb = jnp.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], jnp.float32) / 4.0

    def conv(img, k):
        # full precision: the output is floor-quantized to uint8 by the RGB
        # metrics, where TPU bf16-default conv error straddles bin edges
        return jax.lax.conv_general_dilated(
            img,
            k[:, :, None, None],
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )

    # Interpolate each sparse plane, normalizing by the convolved sample mask so
    # border windows (which see fewer lattice samples) stay exact.
    r = conv(x * r_mask, k_rb) / jnp.maximum(conv(r_mask, k_rb), 1e-8)
    g = conv(x * g_mask, k_g) / jnp.maximum(conv(g_mask, k_g), 1e-8)
    b = conv(x * b_mask, k_rb) / jnp.maximum(conv(b_mask, k_rb), 1e-8)
    out = jnp.concatenate([r, g, b], axis=-1)
    return out.reshape(*lead, H, W, 3)


def fast_isp(
    img4c: jnp.ndarray,
    wb: jnp.ndarray | None = None,
    ccm: jnp.ndarray | None = None,
    gamma: float = 2.2,
) -> jnp.ndarray:
    """Full-resolution ISP over packed RGBG ``[..., h, w, 4]`` -> sRGB ``[..., 2h, 2w, 3]``.

    Reassembles the mosaic with R/B white-balance gains, demosaics on-device,
    applies the CCM and gamma (reference: utils/isp_ops.py:134-158, which used
    cv2.cvtColor for the demosaic step).
    """
    red_gain = 2.0 if wb is None else wb[0]
    blue_gain = 2.0 if wb is None else wb[2]
    gains = jnp.stack(
        [jnp.asarray(red_gain, jnp.float32), jnp.float32(1.0), jnp.asarray(blue_gain, jnp.float32), jnp.float32(1.0)]
    )
    mosaic = unpack_bayer(jnp.clip(img4c * gains, 0.0, 1.0))
    img = bilinear_demosaic(mosaic)
    ccm = SONY_CCM if ccm is None else jnp.asarray(ccm, jnp.float32)
    img = jnp.einsum("...hwc,kc->...hwk", img, ccm,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.clip(img, 0.0, 1.0) ** (1.0 / gamma)
