"""Signal-dependent (shot-noise) and gain bijectors with ISO interpolation.

Re-designs of reference archs/flow_layers/signal_dependant.py:19-73 and
gain.py:65-110. Per-ISO camera parameters live on a 31-entry "legal ISO"
ladder; a queried ISO linearly interpolates its exp-params between bracketing
ladder entries (searchsorted). All interpolation is branch-free so a traced
per-batch ISO works inside jit.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pnnp_tpu.models.flows.base import Bijector, sum_except_batch
from pnnp_tpu.physics.calibration import LEGAL_ISO


def _interp_iso(legal_iso: jnp.ndarray, cam_param: jnp.ndarray, iso: jnp.ndarray):
    """exp(cam_param) rows at ``iso`` via the reference's searchsorted pick.

    ``iso`` scalar or [n]; returns shape ``iso.shape + cam_param.shape[1:]``.
    NOTE reference-exact semantics (gain.py:79-86): the reference's
    "interpolation" formula collapses — off-ladder ISOs snap to the
    nearest-ABOVE ladder entry and exact hits return their own row; true
    linear interpolation never happens. Kept bit-compatible here.
    """
    iso = jnp.asarray(iso, jnp.float32)
    hi = len(legal_iso) - 1
    l = jnp.clip(jnp.searchsorted(legal_iso, iso, side="left"), 0, hi)
    r = jnp.clip(jnp.searchsorted(legal_iso, iso, side="right"), 0, hi)
    iso_l, iso_r = legal_iso[l], legal_iso[r]
    cp_l = jnp.exp(cam_param[l])
    cp_r = jnp.exp(cam_param[r])
    denom = iso_r - iso_l
    w_shape = denom.shape + (1,) * (cp_l.ndim - denom.ndim)
    interp = (
        (iso - iso_l).reshape(w_shape) * cp_r + (iso_r - iso).reshape(w_shape) * cp_l
    ) / jnp.where(denom == 0, 1.0, denom).reshape(w_shape)
    return jnp.where((denom == 0).reshape(w_shape), cp_l, interp)


class SignalDependantISO(Bijector):
    """scale = sqrt(beta1 * clean / gain(iso) + beta2) (reference sdn layer)."""

    def setup(self):
        self.legal_iso = jnp.asarray(LEGAL_ISO)
        # Frozen per-ISO modifiers (requires_grad=False in the reference):
        # a param with stop_gradient on use, so no extra variable collection.
        self.cam_param = self.param(
            "cam_param", lambda rng: jnp.zeros((len(LEGAL_ISO), 3))
        )
        self.gain = self.param("gain", lambda rng: jnp.float32(-6.0))
        self.beta1 = self.param("beta1", lambda rng: jnp.float32(-5.0))
        self.beta2 = self.param("beta2", lambda rng: jnp.float32(-4.0))

    def _scale(self, clean, iso):
        import jax as _jax

        cp = _interp_iso(self.legal_iso, _jax.lax.stop_gradient(self.cam_param), iso)
        beta1 = jnp.exp(self.beta1 * cp[..., 0])
        beta2 = jnp.exp(self.beta2 * cp[..., 1])
        gain = jnp.exp(self.gain * cp[..., 2]) * iso
        shape = beta1.shape + (1,) * (clean.ndim - beta1.ndim)
        scale = beta1.reshape(shape) * clean / gain.reshape(shape) + beta2.reshape(shape)
        return jnp.sqrt(jnp.maximum(scale, 1e-12))

    def forward_ldj(self, x, clean=None, iso=None, **ctx):
        scale = self._scale(clean, iso)
        z = x / scale
        return z, -sum_except_batch(jnp.log(jnp.broadcast_to(scale, x.shape)))

    def inverse(self, z, clean=None, iso=None, **ctx):
        return z * self._scale(clean, iso)


class SignalDependantNS(Bijector):
    """Neural-spline signal-dependent bijector: an RQ spline whose bin
    parameters come from a CNN over the clean image
    (reference: signal_dependant.py:131-258)."""

    num_channels: int = 4
    num_bins: int = 10
    tail_bound: float = 1.0
    hidden: int = 16

    def setup(self):
        self.mult = self.num_bins * 3 - 1  # linear tails
        self.net1 = nn.Conv(self.hidden, (3, 3), padding="SAME", name="net1")
        self.net2 = nn.Conv(self.num_channels * self.mult, (1, 1), name="net2",
                            kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros)

    def _params(self, clean):
        h = nn.relu(self.net1(clean))
        p = self.net2(h)  # [n, H, W, C*mult]
        n, H, W, _ = p.shape
        p = p.reshape(n, H, W, self.num_channels, self.mult)
        scale = 1.0 / jnp.sqrt(self.hidden)
        w = p[..., : self.num_bins] * scale
        hgt = p[..., self.num_bins : 2 * self.num_bins] * scale
        d = p[..., 2 * self.num_bins :]
        return w, hgt, d

    def forward_ldj(self, x, clean=None, **ctx):
        from pnnp_tpu.models.flows.spline import unconstrained_rational_quadratic_spline

        w, h, d = self._params(clean)
        z, ladj = unconstrained_rational_quadratic_spline(
            x, w, h, d, inverse=False, tail_bound=self.tail_bound
        )
        return z, sum_except_batch(ladj)

    def inverse(self, z, clean=None, **ctx):
        from pnnp_tpu.models.flows.spline import unconstrained_rational_quadratic_spline

        w, h, d = self._params(clean)
        x, _ = unconstrained_rational_quadratic_spline(
            z, w, h, d, inverse=True, tail_bound=self.tail_bound
        )
        return x


class GainISO(Bijector):
    """scale = exp(cam_param(iso) * gain_params) * iso (reference gain.py:65-110)."""

    def setup(self):
        self.legal_iso = jnp.asarray(LEGAL_ISO)
        self.cam_param = self.param("cam_param", lambda rng: jnp.zeros((len(LEGAL_ISO),)))
        self.gain_params = self.param("gain_params", lambda rng: jnp.float32(-5.0))

    def _scale(self, iso):
        cp = _interp_iso(self.legal_iso, self.cam_param, iso)
        return jnp.exp(cp * self.gain_params) * iso

    def forward_ldj(self, x, iso=None, **ctx):
        scale = self._scale(jnp.asarray(iso, jnp.float32))
        shape = scale.shape + (1,) * (x.ndim - scale.ndim)
        scale_b = jnp.broadcast_to(scale.reshape(shape), x.shape)
        z = x / scale_b
        return z, -sum_except_batch(jnp.log(scale_b))

    def inverse(self, z, iso=None, **ctx):
        scale = self._scale(jnp.asarray(iso, jnp.float32))
        shape = scale.shape + (1,) * (z.ndim - scale.ndim)
        return z * scale.reshape(shape)
