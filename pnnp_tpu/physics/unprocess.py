"""sRGB -> RAW unprocessing (Brooks et al.) in JAX, NHWC.

Port of reference data_process/unprocess.py with the per-camera fixed CCMs and
white-balance polynomial fits. Works on ``[..., H, W, 3]`` images; batched
inputs share one sampled metadata tuple per call, like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pnnp_tpu.physics.noise import random_gains

RGB2CAM = {
    "SonyA7S2": np.eye(3, dtype=np.float32),
    "IMX686": np.array(
        [
            [0.61093086, 0.31565922, 0.07340994],
            [0.09433191, 0.7658969, 0.1397712],
            [0.03532438, 0.3020709, 0.6626047],
        ],
        np.float32,
    ),
}


def random_ccm(camera_type: str = "IMX686") -> jnp.ndarray:
    """Fixed per-camera RGB->cam CCM (reference: unprocess.py:7-46)."""
    return jnp.asarray(RGB2CAM[camera_type])


def inverse_smoothstep(image: jnp.ndarray) -> jnp.ndarray:
    image = jnp.clip(image, 0.0, 1.0)
    return 0.5 - jnp.sin(jnp.arcsin(1.0 - 2.0 * image) / 3.0)


def gamma_expansion(image: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(image, 1e-8) ** 2.2


def apply_ccm(image: jnp.ndarray, ccm: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...c,kc->...k", image, ccm)


def safe_invert_gains(image, rgb_gain, red_gain, blue_gain):
    """Invert WB gains with the saturation-protecting mask (reference:106-121)."""
    gains = jnp.stack([1.0 / red_gain, jnp.ones_like(red_gain), 1.0 / blue_gain]) / rgb_gain
    gains = gains.reshape(1, 1, 3)
    gray = jnp.mean(image, axis=-1, keepdims=True)
    inflection = 0.9
    mask = (jnp.maximum(gray - inflection, 0.0) / (1.0 - inflection)) ** 2.0
    safe_gains = jnp.maximum(mask + (1.0 - mask) * gains, gains)
    return image * safe_gains


def mosaic_rggb(image: jnp.ndarray) -> jnp.ndarray:
    """RGB ``[..., H, W, 3]`` -> packed RGBG ``[..., H/2, W/2, 4]`` (reference:123-144)."""
    red = image[..., 0::2, 0::2, 0]
    green_red = image[..., 0::2, 1::2, 1]
    green_blue = image[..., 1::2, 0::2, 1]
    blue = image[..., 1::2, 1::2, 2]
    return jnp.stack([red, green_red, blue, green_blue], axis=-1)


def unprocess(
    key: jax.Array,
    image: jnp.ndarray,
    lock_wb=False,
    camera_type: str = "IMX686",
):
    """sRGB -> unprocessed linear raw + metadata (reference: unprocess.py:170-217).

    ``lock_wb`` False/None samples random gains; True uses the reference's
    fixed-gain default (1, 2, 2 — the commented form at unprocess.py:175),
    matching the dataset layer's boolean ``lock_wb`` flag; a 3-sequence
    ``(rgb, red, blue)`` passes fixed gains (the reference's list form).
    """
    rgb2cam = random_ccm(camera_type)
    cam2rgb = jnp.linalg.inv(rgb2cam)
    if lock_wb is False or lock_wb is None:
        rgb_gain, red_gain, blue_gain = random_gains(key, camera_type, 1)
        rgb_gain, red_gain, blue_gain = rgb_gain[0], red_gain[0], blue_gain[0]
    elif lock_wb is True:
        rgb_gain = jnp.float32(1.0)
        red_gain = jnp.float32(2.0)
        blue_gain = jnp.float32(2.0)
    else:
        rgb_gain, red_gain, blue_gain = (jnp.float32(g) for g in lock_wb)

    x = inverse_smoothstep(image)
    x = gamma_expansion(x)
    x = apply_ccm(x, rgb2cam)
    x = safe_invert_gains(x, rgb_gain, red_gain, blue_gain)
    x = jnp.clip(x, 0.0, 1.0)
    metadata = {
        "cam2rgb": cam2rgb,
        "rgb_gain": rgb_gain,
        "red_gain": red_gain,
        "blue_gain": blue_gain,
    }
    return x, metadata


def random_noise_levels(key: jax.Array):
    """Log-log linear shot/read noise sampler (reference: unprocess.py:220-231)."""
    k1, k2 = jax.random.split(key)
    log_shot = jax.random.uniform(
        k1, (), minval=jnp.log(0.0001), maxval=jnp.log(0.012)
    )
    shot = jnp.exp(log_shot)
    log_read = 2.18 * log_shot + 1.20 + 0.26 * jax.random.normal(k2, ())
    return shot, jnp.exp(log_read)


def add_noise(key: jax.Array, image: jnp.ndarray, shot_noise=0.01, read_noise=0.0005):
    """Gaussian-approximated shot+read noise for unprocessed data (reference:234-242)."""
    variance = image * shot_noise + read_noise
    return image + jax.random.normal(key, image.shape) * jnp.sqrt(variance)
