"""Reusable block library (reference: archs/modules.py).

Building blocks beyond the UNet family: CBAM channel/spatial attention,
pixel-shuffle upsampling, pixel-unshuffle, padded concat, BN convs and
residual stacks — NHWC flax modules for composing new denoiser variants.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pnnp_tpu.models.unet import ResidualBlock, conv_init, lrelu


class ConvWithBN(nn.Module):
    """conv3x3 (+BN) (+ReLU) (reference: modules.py:141-154)."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bn: bool = True
    activate: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, dtype=self.dtype, kernel_init=conv_init)(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        if self.activate:
            x = nn.relu(x)
        return x


class DoubleConvBlock(nn.Module):
    """Two bias-free conv3x3+ReLU (reference: modules.py:156-166)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvWithBN(self.features, use_bn=False, dtype=self.dtype)(x, train)
        return ConvWithBN(self.features, use_bn=False, dtype=self.dtype)(x, train)


class ChannelAttention(nn.Module):
    """CBAM channel attention: shared MLP over avg+max pooled descriptors
    (reference: modules.py:199-219)."""

    ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hidden = max(c // self.ratio, 1)
        mlp = nn.Sequential([
            nn.Dense(hidden, use_bias=False, dtype=self.dtype,
                     kernel_init=conv_init),
            nn.relu,
            nn.Dense(c, use_bias=False, dtype=self.dtype,
                     kernel_init=conv_init),
        ])
        avg = mlp(jnp.mean(x, axis=(1, 2)))
        mx = mlp(jnp.max(x, axis=(1, 2)))
        scale = nn.sigmoid(avg + mx)[:, None, None, :]
        return x * scale


class SpatialAttention(nn.Module):
    """CBAM spatial attention: 7x7 conv over [avg, max] channel maps
    (reference: modules.py:221-243)."""

    kernel: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        att = nn.Conv(1, (self.kernel, self.kernel), padding="SAME",
                      kernel_init=conv_init,
                      use_bias=False, dtype=self.dtype)(
            jnp.concatenate([avg, mx], axis=-1)
        )
        return x * nn.sigmoid(att)


class CBAM(nn.Module):
    """Channel then spatial attention."""

    ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return SpatialAttention(dtype=self.dtype)(
            ChannelAttention(self.ratio, dtype=self.dtype)(x)
        )


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Depth-to-space [N, H, W, C*r^2] -> [N, rH, rW, C], torch channel
    order (C-major: channel index c*r^2 + i*r + j maps to offset (i, j)),
    so converted torch.PixelShuffle checkpoints stay spatially coherent."""
    n, h, w, c = x.shape
    r = factor
    cp = c // (r * r)
    x = x.reshape(n, h, w, cp, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, cp)


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Space-to-depth [N, rH, rW, C] -> [N, H, W, C*r^2], torch channel
    order (reference: modules.py:277-304)."""
    n, H, W, c = x.shape
    r = factor
    x = x.reshape(n, H // r, r, W // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, H // r, W // r, c * r * r)


class UpsampleBlock(nn.Module):
    """conv -> pixel shuffle x2 -> lrelu (reference: modules.py:257-266)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features * 4, (3, 3), padding="SAME",
                    dtype=self.dtype, kernel_init=conv_init)(x)
        return lrelu(pixel_shuffle(x, 2))


def concat_pad(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Channel concat with zero-padding for H/W mismatch after up/downsampling
    (reference: modules.py:306-326)."""
    dh = b.shape[1] - a.shape[1]
    dw = b.shape[2] - a.shape[2]
    a = jnp.pad(a, ((0, 0), (max(dh, 0) // 2, max(dh, 0) - max(dh, 0) // 2),
                    (max(dw, 0) // 2, max(dw, 0) - max(dw, 0) // 2), (0, 0)))
    b = jnp.pad(b, ((0, 0), (max(-dh, 0) // 2, max(-dh, 0) - max(-dh, 0) // 2),
                    (max(-dw, 0) // 2, max(-dw, 0) - max(-dw, 0) // 2), (0, 0)))
    return jnp.concatenate([a, b], axis=-1)


class ResBlockStack(nn.Module):
    """n chained ResidualBlocks (reference: modules.py:168-174)."""

    features: int
    n_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_layers):
            x = ResidualBlock(self.features, dtype=self.dtype, name=f"block{i}")(x)
        return x
