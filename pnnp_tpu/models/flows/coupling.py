"""RealNVP affine coupling with the NoiseFlow CNN conditioner (NHWC).

Re-design of reference archs/flow_layers/affine_coupling.py:19-53,245-295.
The conditioner ("ShiftAndLogScale") is: 3x3 conv -> BN -> ReLU -> 1x1 conv
-> BN -> ReLU, then the *border-flag trick*: zero-pad H/W by 1, append an
extra channel that is 1 exactly on the padded ring, and apply a zero-init
VALID 3x3 conv — letting the zero-padded border be distinguishable to the
network. Output is scaled by ``exp(3 * logs)`` (zero-init per-channel) and
log-scale is bounded by ``scale * tanh(.)`` with a tiny learnable scale.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pnnp_tpu.models.flows.base import Bijector, sum_except_batch


class ShiftAndLogScale(nn.Module):
    num_out: int
    width: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        init_small = nn.initializers.normal(stddev=self.width / 512 * 0.05)
        h = nn.Conv(self.width, (3, 3), padding="SAME", kernel_init=init_small,
                    bias_init=nn.initializers.zeros, name="conv2d_1")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.width, (1, 1), kernel_init=init_small,
                    bias_init=nn.initializers.zeros, name="conv2d_2")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2")(h)
        h = nn.relu(h)

        # Border-flag channel: pad H/W with zeros, extra channel = 1 on the ring.
        n, H, W, _ = h.shape
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 1)))
        ring = jnp.zeros((H + 2, W + 2), h.dtype)
        ring = ring.at[0, :].set(1.0).at[-1, :].set(1.0).at[:, 0].set(1.0).at[:, -1].set(1.0)
        h = h.at[..., -1].set(ring[None])

        h = nn.Conv(self.num_out, (3, 3), padding="VALID",
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="conv2d_3")(h)
        logs = self.param("logs", nn.initializers.zeros, (1, 1, 1, self.num_out))
        h = h * jnp.exp(logs * 3.0)

        shift, log_scale = jnp.split(h, 2, axis=-1)
        scale = self.param("scale", lambda rng: jnp.full((1,), 1e-4))
        log_scale = scale * jnp.tanh(log_scale)
        return shift, log_scale


class ShiftAndLogScaleV2(nn.Module):
    """TF-Glow-style conditioner without the border-flag trick: 3x3 conv ->
    BN -> ReLU -> 1x1 conv -> BN -> ReLU -> zero-init 3x3 conv
    (reference: affine_coupling_v2.py:62-95). Returns raw (shift, log_scale);
    the coupling applies its learnable rescale."""

    num_out: int
    width: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        init_small = nn.initializers.normal(stddev=self.width / 512 * 0.05)
        h = nn.Conv(self.width, (3, 3), padding="SAME", kernel_init=init_small,
                    bias_init=nn.initializers.zeros, name="conv2d_1")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.width, (1, 1), kernel_init=init_small,
                    bias_init=nn.initializers.zeros, name="conv2d_2")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.num_out, (3, 3), padding="SAME",
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="conv2d_zeros")(h)
        logs = self.param("logs", nn.initializers.zeros, (1, 1, 1, self.num_out))
        h = h * jnp.exp(logs * 3.0)
        shift, log_scale = jnp.split(h, 2, axis=-1)
        return shift, log_scale


class AffineCouplingV2(Bijector):
    """Coupling with the learnable global rescale applied at the coupling
    level (reference: affine_coupling_v2.py:19-60)."""

    num_channels: int = 4
    width: int = 4

    def setup(self):
        c = self.num_channels
        self.net = ShiftAndLogScaleV2(num_out=2 * (c - c // 2), width=self.width)
        self.scale = self.param("scale", lambda rng: jnp.full((1,), 1e-4))

    def forward_ldj(self, x, train: bool = False, **ctx):
        c = self.num_channels
        x0, x1 = x[..., : c // 2], x[..., c // 2 :]
        shift, log_scale = self.net(x0, train=train)
        log_scale = self.scale * jnp.tanh(log_scale)
        z1 = x1 * jnp.exp(log_scale) + shift
        return jnp.concatenate([x0, z1], axis=-1), sum_except_batch(log_scale)

    def inverse(self, z, train: bool = False, **ctx):
        c = self.num_channels
        z0, z1 = z[..., : c // 2], z[..., c // 2 :]
        shift, log_scale = self.net(z0, train=train)
        log_scale = self.scale * jnp.tanh(log_scale)
        x1 = (z1 - shift) * jnp.exp(-log_scale)
        return jnp.concatenate([z0, x1], axis=-1)


class AffineCoupling(Bijector):
    """Split channels in half; affine-transform the second half from the first."""

    num_channels: int = 4
    width: int = 4

    def setup(self):
        c = self.num_channels
        self.net = ShiftAndLogScale(num_out=2 * (c - c // 2), width=self.width)

    def forward_ldj(self, x, train: bool = False, **ctx):
        c = self.num_channels
        x0, x1 = x[..., : c // 2], x[..., c // 2 :]
        shift, log_scale = self.net(x0, train=train)
        z1 = x1 * jnp.exp(log_scale) + shift
        z = jnp.concatenate([x0, z1], axis=-1)
        return z, sum_except_batch(log_scale)

    def inverse(self, z, train: bool = False, **ctx):
        c = self.num_channels
        z0, z1 = z[..., : c // 2], z[..., c // 2 :]
        shift, log_scale = self.net(z0, train=train)
        x1 = (z1 - shift) * jnp.exp(-log_scale)
        return jnp.concatenate([z0, x1], axis=-1)
