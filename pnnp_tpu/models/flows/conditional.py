"""ISO/camera-conditional flow layers (Noise2NoiseFlow heritage).

Re-designs of reference archs/flow_layers/{affine_coupling.py:55-150,
conv2d1x1.py:94-186, linear_transformation.py, utils.py}: conditioning is a
25-way (5 ISO x 5 camera) one-hot selection. All NHWC.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pnnp_tpu.models.flows.base import Bijector, sum_except_batch
from pnnp_tpu.models.flows.coupling import ShiftAndLogScale

ISO_VALS = jnp.asarray([100.0, 400.0, 800.0, 1600.0, 3200.0])
CAM_VALS = jnp.asarray([0.0, 1.0, 2.0, 3.0, 4.0])  # IP, GP, S6, N6, G4


def iso_cam_onehot(iso, cam):
    """Per-example 10-dim [iso-onehot | cam-onehot] from mean-field values.

    (reference: affine_coupling.py:70-74 — equality match against the value
    ladders; mean over the image selects the scalar condition.)
    """
    iso_mean = jnp.mean(iso.reshape(iso.shape[0], -1), axis=1)
    cam_mean = jnp.round(jnp.mean(cam.reshape(cam.shape[0], -1), axis=1) * 10) / 10
    g = (iso_mean[:, None] == ISO_VALS[None, :]).astype(jnp.float32)
    c = (cam_mean[:, None] == CAM_VALS[None, :]).astype(jnp.float32)
    return jnp.concatenate([g, c], axis=1)


def iso_cam_index(iso, cam):
    """Flat 25-way index iso*5 + cam (reference: conv2d1x1.py:169-175).

    Nearest-value match: exact ladder hits behave like the reference's
    equality lookup, while off-table values pick the nearest entry instead
    of silently indexing 0 (argmax of an all-False mask)."""
    iso_mean = jnp.mean(iso)
    cam_mean = jnp.round(jnp.mean(cam) * 10) / 10
    i = jnp.argmin(jnp.abs(ISO_VALS - iso_mean))
    c = jnp.argmin(jnp.abs(CAM_VALS - cam_mean))
    return i * 5 + c


class ConditionalAffineCoupling(Bijector):
    """Coupling whose conditioner also sees the clean image, with a learned
    ISO/cam embedding scaling the log-scale (reference: affine_coupling.py:55-101)."""

    num_channels: int = 4
    width: int = 4

    def setup(self):
        c = self.num_channels
        self.net = ShiftAndLogScale(num_out=2 * (c - c // 2), width=self.width)
        self.encoder = nn.Dense(1, name="encoder")

    def _embed(self, iso, cam):
        return self.encoder(iso_cam_onehot(iso, cam)).reshape(-1, 1, 1, 1)

    def forward_ldj(self, x, clean=None, iso=None, cam=None, train=False, **ctx):
        c = self.num_channels
        x0, x1 = x[..., : c // 2], x[..., c // 2 :]
        shift, log_scale = self.net(jnp.concatenate([x0, clean], axis=-1), train=train)
        log_scale = log_scale * self._embed(iso, cam)
        z1 = x1 * jnp.exp(log_scale) + shift
        return jnp.concatenate([x0, z1], axis=-1), sum_except_batch(log_scale)

    def inverse(self, z, clean=None, iso=None, cam=None, train=False, **ctx):
        c = self.num_channels
        z0, z1 = z[..., : c // 2], z[..., c // 2 :]
        shift, log_scale = self.net(jnp.concatenate([z0, clean], axis=-1), train=train)
        log_scale = log_scale * self._embed(iso, cam)
        x1 = (z1 - shift) * jnp.exp(-log_scale)
        return jnp.concatenate([z0, x1], axis=-1)


class ConditionalAffine(Bijector):
    """Elementwise affine from the clean image (no channel split), optional
    ISO/cam embedding (reference: affine_coupling.py:103-150)."""

    num_channels: int = 4
    width: int = 4
    only_clean: bool = False

    def setup(self):
        self.net = ShiftAndLogScale(num_out=2 * self.num_channels, width=self.width)
        if not self.only_clean:
            self.encoder = nn.Dense(1, name="encoder")

    def _params(self, clean, iso, cam, train):
        shift, log_scale = self.net(clean, train=train)
        if not self.only_clean:
            emb = self.encoder(iso_cam_onehot(iso, cam)).reshape(-1, 1, 1, 1)
            log_scale = log_scale * emb
        return shift, log_scale

    def forward_ldj(self, x, clean=None, iso=None, cam=None, train=False, **ctx):
        shift, log_scale = self._params(clean, iso, cam, train)
        z = x * jnp.exp(log_scale) + shift
        return z, sum_except_batch(log_scale)

    def inverse(self, z, clean=None, iso=None, cam=None, train=False, **ctx):
        shift, log_scale = self._params(clean, iso, cam, train)
        return (z - shift) * jnp.exp(-log_scale)


class ConditionalLinear(Bijector):
    """25-way conditional per-channel affine (reference: linear_transformation.py)."""

    num_channels: int = 4

    def setup(self):
        self.shift = self.param(
            "shift", nn.initializers.zeros, (25, self.num_channels)
        )
        self.log_scale = self.param(
            "log_scale", nn.initializers.zeros, (25, self.num_channels)
        )

    def forward_ldj(self, x, iso=None, cam=None, **ctx):
        idx = iso_cam_index(iso, cam)
        s, ls = self.shift[idx], self.log_scale[idx]
        z = x * jnp.exp(ls) + s
        hw = x.shape[-3] * x.shape[-2]
        ldj = hw * jnp.sum(ls)
        return z, jnp.broadcast_to(ldj, (x.shape[0],))

    def inverse(self, z, iso=None, cam=None, **ctx):
        idx = iso_cam_index(iso, cam)
        return (z - self.shift[idx]) * jnp.exp(-self.log_scale[idx])


class ConditionalInvertibleConv1x1(Bijector):
    """25-way conditional LU 1x1 conv (reference: conv2d1x1.py:94-186)."""

    num_channels: int = 4

    def setup(self):
        c = self.num_channels

        def init_all(rng):
            w = jnp.linalg.qr(jax.random.normal(rng, (c, c)))[0]
            p, l, u = jax.scipy.linalg.lu(w)
            s = jnp.diag(u)
            rep = lambda a: jnp.tile(a[None], (25,) + (1,) * a.ndim)
            return {
                "p": p, "sign_s": jnp.sign(s),
                "l": rep(jnp.tril(l, -1)),
                "log_s": rep(jnp.log(jnp.abs(s))),
                "u": rep(jnp.triu(u, 1)),
            }

        self.lu = self.param("lu", init_all)

    def _weight(self, idx):
        c = self.num_channels
        p = jax.lax.stop_gradient(self.lu["p"])
        sign_s = jax.lax.stop_gradient(self.lu["sign_s"])
        l_mask = jnp.tril(jnp.ones((c, c)), -1)
        l = self.lu["l"][idx] * l_mask + jnp.eye(c)
        u = self.lu["u"][idx] * l_mask.T + jnp.diag(sign_s * jnp.exp(self.lu["log_s"][idx]))
        return p @ l @ u, self.lu["log_s"][idx]

    def forward_ldj(self, x, iso=None, cam=None, **ctx):
        idx = iso_cam_index(iso, cam)
        w, log_s = self._weight(idx)
        z = jnp.einsum("nhwc,dc->nhwd", x, w)
        ldj = jnp.sum(log_s) * x.shape[-3] * x.shape[-2]
        return z, jnp.broadcast_to(ldj, (x.shape[0],))

    def inverse(self, z, iso=None, cam=None, **ctx):
        idx = iso_cam_index(iso, cam)
        w, _ = self._weight(idx)
        return jnp.einsum("nhwc,dc->nhwd", z, jnp.linalg.inv(w))


class SdnModelScale(nn.Module):
    """Signal-dependent scale net with per-(iso, cam) gain params
    (reference: flow_layers/utils.py:17-111): scale = sqrt(b1*clean/g + b2)
    with g = gain(iso) * exp(gain_scale) per camera."""

    n_cams: int = 5

    @nn.compact
    def __call__(self, clean, iso, cam):
        beta1 = self.param("beta1", lambda r: jnp.float32(-5.0))
        beta2 = self.param("beta2", lambda r: jnp.float32(0.0))
        gain_scale = self.param("gain_scale", nn.initializers.zeros, (self.n_cams,))
        cam_idx = jnp.argmax(CAM_VALS == jnp.round(jnp.mean(cam) * 10) / 10)
        iso_mean = jnp.mean(iso)
        gain = iso_mean / 100.0 * jnp.exp(gain_scale[cam_idx])
        scale = jnp.exp(beta1) * clean / gain + jnp.exp(beta2)
        return jnp.sqrt(jnp.maximum(scale, 1e-12))
