"""Training losses (reference: losses/base_loss.py, losses/__init__.py).

Plain functions over NHWC arrays — they fuse into the jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def charbonnier_loss(pred, target, eps: float = 1e-6):
    """L1-Charbonnier (reference: base_loss.py:63-74)."""
    diff = pred - target
    return jnp.mean(jnp.sqrt(diff * diff + eps))


def unet_loss(pred, target, charbonnier: bool = False):
    """The denoiser loss: plain L1 (reference: base_loss.py:75-107)."""
    return charbonnier_loss(pred, target) if charbonnier else l1_loss(pred, target)


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def pyramid_sample(x, max_scale: int = 8):
    """Average-pyramid levels [x/2, x/4, ..., x/max_scale] (reference: base_loss.py:38-47)."""
    outs = []
    cur = x
    s = 2
    while s <= max_scale:
        cur = _avg_pool2(cur)
        outs.append(cur)
        s *= 2
    return outs


def pyramid_loss(lows, highs, rate: float = 0.5, charbonnier: bool = False):
    """Scale-weighted multi-resolution loss (reference: base_loss.py:49-61)."""
    loss = 0.0
    weight = 1.0
    total = 0.0
    for lo, hi in zip(lows, highs):
        loss = loss + weight * unet_loss(lo, hi, charbonnier)
        total = total + weight
        weight = weight * rate
    return loss / total


def unet_dpsv_loss(outputs, target, charbonnier: bool = False):
    """Deep-supervision loss over [out, out2, out4, out8].

    Reference semantics (base_loss.py:109-121): an UNWEIGHTED SUM over the
    scales (Pyramid_Loss with rate=1, norm=False) — distinct from
    Unet_Loss.pyramid_loss's rate=0.5 normalized mean. Note the upstream
    class is latent: no trainer instantiates it and every shipped runfile
    sets use_dpsv False (using it would crash trainer_SID.py:99's
    pred.clamp on a list); implemented for parity of the config surface.
    """
    highs = [target] + pyramid_sample(target, max_scale=2 ** (len(outputs) - 1))
    return sum(unet_loss(lo, hi, charbonnier)
               for lo, hi in zip(outputs, highs))


def unet_dpsv_up_loss(outputs, target, charbonnier: bool = False):
    """`Unet_dpsv_Loss_up` (base_loss.py:122-133): the finest target is
    supervised TWICE (outputs[0] and outputs[1] both score against it), the
    pyramid only reaching 2^(len-2). Same unweighted-sum semantics; latent
    upstream, see :func:`unet_dpsv_loss`."""
    highs = [target, target] + pyramid_sample(
        target, max_scale=2 ** (len(outputs) - 2))
    return sum(unet_loss(lo, hi, charbonnier)
               for lo, hi in zip(outputs, highs))


def _grad_kernels():
    sobel_x = jnp.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], jnp.float32)
    robert_x = jnp.array([[0, 0], [-1, 1]], jnp.float32)
    return sobel_x, robert_x


def gradient(x, direction: str = "x", mode: str = "sobel"):
    """Sobel/Robert image gradients (reference: base_loss.py Sobel/Robert ops)."""
    sobel_x, robert_x = _grad_kernels()
    k = sobel_x if mode == "sobel" else robert_x
    if direction == "y":
        k = k.T
    kh, kw = k.shape
    pad = ((0, 0), (kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2), (0, 0))
    xpad = jnp.pad(x, pad)
    c = x.shape[-1]
    kernel = jnp.zeros((kh, kw, c, c)).at[:, :, jnp.arange(c), jnp.arange(c)].set(
        k[:, :, None]
    )
    return jax.lax.conv_general_dilated(
        xpad, kernel, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def grad_loss(pred, target, mode: str = "sobel"):
    """L1 on gradient maps (reference: base_loss.py grad_loss)."""
    gx = jnp.abs(gradient(pred, "x", mode) - gradient(target, "x", mode))
    gy = jnp.abs(gradient(pred, "y", mode) - gradient(target, "y", mode))
    return jnp.mean(gx + gy)


def gan_loss(logits, target_is_real: bool, mode: str = "lsgan"):
    """GAN criterion (reference: base_loss.py:135-182; vanilla/lsgan)."""
    target = jnp.ones_like(logits) if target_is_real else jnp.zeros_like(logits)
    if mode == "lsgan":
        return jnp.mean((logits - target) ** 2)
    # vanilla: BCE with logits
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def psnr_loss(pred, target):
    """Per-image mean PSNR on [0,1] tensors (reference: losses/__init__.py:4-15)."""
    mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    return jnp.mean(10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12)))
