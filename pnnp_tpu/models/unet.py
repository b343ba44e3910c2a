"""Denoiser model family in flax.linen, NHWC, mixed-precision-ready.

TPU-native re-designs of the reference architectures:
  * ``UNetSeeInDark`` — the flagship SID UNet (reference: archs/Unet.py:4-99)
  * ``DeepUNet`` — deep-supervised variant (reference: archs/Unet.py:102-211)
  * ``ResUNet`` / ``DeepResUNet`` — residual-block variants
    (reference: archs/ResUnet.py)

Design notes (TPU-first):
  * channel-last layout and 3x3 convs with SAME padding map directly onto the
    MXU via XLA's conv-to-matmul tiling; LeakyReLU/bias fuse into the conv.
  * ``dtype`` selects the compute/activation precision (use bfloat16 on TPU);
    parameters stay float32 (``param_dtype``) for optimizer stability.
  * submodule names mirror the reference layer names (``conv1_1`` ...) so the
    torch->jax checkpoint converter is a pure name/layout mapping.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# Reference weight init: N(0, 0.02) for conv weights (archs/__init__.py:12-19).
conv_init = nn.initializers.normal(stddev=0.02)


def lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def _maxpool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class UNetSeeInDark(nn.Module):
    """5-level encoder-decoder, 2x(conv3x3+LeakyReLU 0.2) per level, nf=32..512."""

    in_nc: int = 4
    out_nc: int = 4
    nf: int = 32
    res: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding="SAME", name=name, dtype=self.dtype,
            kernel_init=conv_init, bias_init=conv_init,
        )
        up = lambda f, name: nn.ConvTranspose(
            f, (2, 2), strides=(2, 2), name=name, dtype=self.dtype,
            kernel_init=conv_init,
        )
        x = x.astype(self.dtype)
        nf = self.nf

        conv1 = lrelu(conv(nf, 3, "conv1_1")(x))
        conv1 = lrelu(conv(nf, 3, "conv1_2")(conv1))
        pool1 = _maxpool(conv1)

        conv2 = lrelu(conv(nf * 2, 3, "conv2_1")(pool1))
        conv2 = lrelu(conv(nf * 2, 3, "conv2_2")(conv2))
        pool2 = _maxpool(conv2)

        conv3 = lrelu(conv(nf * 4, 3, "conv3_1")(pool2))
        conv3 = lrelu(conv(nf * 4, 3, "conv3_2")(conv3))
        pool3 = _maxpool(conv3)

        conv4 = lrelu(conv(nf * 8, 3, "conv4_1")(pool3))
        conv4 = lrelu(conv(nf * 8, 3, "conv4_2")(conv4))
        pool4 = _maxpool(conv4)

        conv5 = lrelu(conv(nf * 16, 3, "conv5_1")(pool4))
        conv5 = lrelu(conv(nf * 16, 3, "conv5_2")(conv5))

        up6 = jnp.concatenate([up(nf * 8, "upv6")(conv5), conv4], axis=-1)
        conv6 = lrelu(conv(nf * 8, 3, "conv6_1")(up6))
        conv6 = lrelu(conv(nf * 8, 3, "conv6_2")(conv6))

        up7 = jnp.concatenate([up(nf * 4, "upv7")(conv6), conv3], axis=-1)
        conv7 = lrelu(conv(nf * 4, 3, "conv7_1")(up7))
        conv7 = lrelu(conv(nf * 4, 3, "conv7_2")(conv7))

        up8 = jnp.concatenate([up(nf * 2, "upv8")(conv7), conv2], axis=-1)
        conv8 = lrelu(conv(nf * 2, 3, "conv8_1")(up8))
        conv8 = lrelu(conv(nf * 2, 3, "conv8_2")(conv8))

        up9 = jnp.concatenate([up(nf, "upv9")(conv8), conv1], axis=-1)
        conv9 = lrelu(conv(nf, 3, "conv9_1")(up9))
        conv9 = lrelu(conv(nf, 3, "conv9_2")(conv9))

        out = conv(self.out_nc, 1, "conv10_1")(conv9)
        if self.res:
            out = out + x
        return out.astype(jnp.float32)


class DeepUNet(nn.Module):
    """UNetSeeInDark with deep-supervision heads out2/out4/out8 when training.

    (reference: archs/Unet.py:102-211; the reference's variant never defines
    its activation — we use the family's LeakyReLU(0.2).)
    """

    in_nc: int = 4
    out_nc: int = 4
    nf: int = 32
    res: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding="SAME", name=name, dtype=self.dtype,
            kernel_init=conv_init, bias_init=conv_init,
        )
        up = lambda f, name: nn.ConvTranspose(
            f, (2, 2), strides=(2, 2), name=name, dtype=self.dtype,
            kernel_init=conv_init,
        )
        x = x.astype(self.dtype)
        nf = self.nf

        conv1 = lrelu(conv(nf, 3, "conv1_1")(x))
        conv1 = lrelu(conv(nf, 3, "conv1_2")(conv1))
        pool1 = _maxpool(conv1)
        conv2 = lrelu(conv(nf * 2, 3, "conv2_1")(pool1))
        conv2 = lrelu(conv(nf * 2, 3, "conv2_2")(conv2))
        pool2 = _maxpool(conv2)
        conv3 = lrelu(conv(nf * 4, 3, "conv3_1")(pool2))
        conv3 = lrelu(conv(nf * 4, 3, "conv3_2")(conv3))
        pool3 = _maxpool(conv3)
        conv4 = lrelu(conv(nf * 8, 3, "conv4_1")(pool3))
        conv4 = lrelu(conv(nf * 8, 3, "conv4_2")(conv4))
        pool4 = _maxpool(conv4)
        conv5 = lrelu(conv(nf * 16, 3, "conv5_1")(pool4))
        conv5 = lrelu(conv(nf * 16, 3, "conv5_2")(conv5))
        up6 = jnp.concatenate([up(nf * 8, "upv6")(conv5), conv4], axis=-1)
        conv6 = lrelu(conv(nf * 8, 3, "conv6_1")(up6))
        conv6 = lrelu(conv(nf * 8, 3, "conv6_2")(conv6))
        up7 = jnp.concatenate([up(nf * 4, "upv7")(conv6), conv3], axis=-1)
        conv7 = lrelu(conv(nf * 4, 3, "conv7_1")(up7))
        conv7 = lrelu(conv(nf * 4, 3, "conv7_2")(conv7))
        up8 = jnp.concatenate([up(nf * 2, "upv8")(conv7), conv2], axis=-1)
        conv8 = lrelu(conv(nf * 2, 3, "conv8_1")(up8))
        conv8 = lrelu(conv(nf * 2, 3, "conv8_2")(conv8))
        up9 = jnp.concatenate([up(nf, "upv9")(conv8), conv1], axis=-1)
        conv9 = lrelu(conv(nf, 3, "conv9_1")(up9))
        conv9 = lrelu(conv(nf, 3, "conv9_2")(conv9))
        out = conv(self.out_nc, 1, "conv10_1")(conv9)

        if train:
            out8 = conv(self.out_nc, 1, "out8")(conv6)
            out4 = conv(self.out_nc, 1, "out4")(conv7)
            out2 = conv(self.out_nc, 1, "out2")(conv8)
            if self.res:
                avg = lambda t: nn.avg_pool(t, (2, 2), strides=(2, 2))
                x2 = avg(x)
                x4 = avg(x2)
                x8 = avg(x4)
                out, out2, out4, out8 = out + x, out2 + x2, out4 + x4, out8 + x8
            return tuple(t.astype(jnp.float32) for t in (out, out2, out4, out8))
        if self.res:
            out = out + x
        return out.astype(jnp.float32)


class ResidualBlock(nn.Module):
    """conv3x3(+lrelu) -> conv3x3, optional 1x1 shortcut projection, no-bias convs.

    (reference: archs/modules.py:176-197 with is_activate=False as used by ResUnet)
    """

    features: int
    activate: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # reference structure (modules.py:176-197): convWithBN(ReLU) ->
        # convWithBN(no act) -> LeakyReLU(0.2) -> + shortcut
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding="SAME", use_bias=False, name=name,
            dtype=self.dtype, kernel_init=conv_init,
        )
        y = nn.relu(conv(self.features, 3, "conv1")(x))
        y = conv(self.features, 3, "conv2")(y)
        if self.activate:
            y = lrelu(y)
        if x.shape[-1] != self.features:
            x = conv(self.features, 1, "short_cut")(x)
        return y + x


class ResUNet(nn.Module):
    """Residual-block UNet with stride-2 conv downsampling (reference: archs/ResUnet.py:3-88)."""

    in_nc: int = 4
    out_nc: int = 4
    nf: int = 32
    res: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s, name, bias=True: nn.Conv(
            f, (k, k), strides=(s, s), padding="SAME", use_bias=bias, name=name,
            dtype=self.dtype, kernel_init=conv_init, bias_init=conv_init,
        )
        up = lambda f, name: nn.ConvTranspose(
            f, (2, 2), strides=(2, 2), name=name, dtype=self.dtype, kernel_init=conv_init,
        )
        block = lambda f, name: ResidualBlock(f, dtype=self.dtype, name=name)
        x = x.astype(self.dtype)
        nf = self.nf

        conv_in = nn.relu(conv(nf, 3, 1, "conv_in")(x))
        conv1 = block(nf, "conv1")(conv_in)
        pool1 = nn.relu(conv(nf * 2, 3, 2, "pool1")(conv1))
        conv2 = block(nf * 2, "conv2")(pool1)
        pool2 = nn.relu(conv(nf * 4, 3, 2, "pool2")(conv2))
        conv3 = block(nf * 4, "conv3")(pool2)
        pool3 = nn.relu(conv(nf * 8, 3, 2, "pool3")(conv3))
        conv4 = block(nf * 8, "conv4")(pool3)
        pool4 = nn.relu(conv(nf * 16, 3, 2, "pool4")(conv4))
        conv5 = block(nf * 16, "conv5")(pool4)

        up6 = jnp.concatenate([up(nf * 8, "upv6")(conv5), conv4], axis=-1)
        conv6 = block(nf * 8, "conv6")(up6)
        up7 = jnp.concatenate([up(nf * 4, "upv7")(conv6), conv3], axis=-1)
        conv7 = block(nf * 4, "conv7")(up7)
        up8 = jnp.concatenate([up(nf * 2, "upv8")(conv7), conv2], axis=-1)
        conv8 = block(nf * 2, "conv8")(up8)
        up9 = jnp.concatenate([up(nf, "upv9")(conv8), conv1], axis=-1)
        conv9 = block(nf, "conv9")(up9)

        out = conv(self.out_nc, 1, 1, "conv10")(conv9)
        if self.res:
            out = out + x
        return out.astype(jnp.float32)


class DeepResUNet(nn.Module):
    """ResUNet with deep-supervision heads (reference: archs/ResUnet.py:90-192)."""

    in_nc: int = 4
    out_nc: int = 4
    nf: int = 32
    res: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding="SAME", name=name,
            dtype=self.dtype, kernel_init=conv_init, bias_init=conv_init,
        )
        up = lambda f, name: nn.ConvTranspose(
            f, (2, 2), strides=(2, 2), name=name, dtype=self.dtype, kernel_init=conv_init,
        )
        block = lambda f, name: ResidualBlock(f, dtype=self.dtype, name=name)
        x = x.astype(self.dtype)
        nf = self.nf

        conv_in = nn.relu(conv(nf, 3, 1, "conv_in")(x))
        conv1 = block(nf, "conv1")(conv_in)
        pool1 = nn.relu(conv(nf * 2, 3, 2, "pool1")(conv1))
        conv2 = block(nf * 2, "conv2")(pool1)
        pool2 = nn.relu(conv(nf * 4, 3, 2, "pool2")(conv2))
        conv3 = block(nf * 4, "conv3")(pool2)
        pool3 = nn.relu(conv(nf * 8, 3, 2, "pool3")(conv3))
        conv4 = block(nf * 8, "conv4")(pool3)
        pool4 = nn.relu(conv(nf * 16, 3, 2, "pool4")(conv4))
        conv5 = block(nf * 16, "conv5")(pool4)

        up6 = jnp.concatenate([up(nf * 8, "upv6")(conv5), conv4], axis=-1)
        conv6 = block(nf * 8, "conv6")(up6)
        up7 = jnp.concatenate([up(nf * 4, "upv7")(conv6), conv3], axis=-1)
        conv7 = block(nf * 4, "conv7")(up7)
        up8 = jnp.concatenate([up(nf * 2, "upv8")(conv7), conv2], axis=-1)
        conv8 = block(nf * 2, "conv8")(up8)
        up9 = jnp.concatenate([up(nf, "upv9")(conv8), conv1], axis=-1)
        conv9 = block(nf, "conv9")(up9)
        out = conv(self.out_nc, 1, 1, "conv10")(conv9)

        if train:
            out8 = conv(self.out_nc, 1, 1, "out8")(conv6)
            out4 = conv(self.out_nc, 1, 1, "out4")(conv7)
            out2 = conv(self.out_nc, 1, 1, "out2")(conv8)
            if self.res:
                avg = lambda t: nn.avg_pool(t, (2, 2), strides=(2, 2))
                x2 = avg(x)
                x4 = avg(x2)
                x8 = avg(x4)
                out, out2, out4, out8 = out + x, out2 + x2, out4 + x4, out8 + x8
            return tuple(t.astype(jnp.float32) for t in (out, out2, out4, out8))
        if self.res:
            out = out + x
        return out.astype(jnp.float32)
