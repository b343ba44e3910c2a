"""Glow invertible 1x1 convolution, LU-parameterized (NHWC).

Re-design of the reference layer (reference: archs/flow_layers/conv2d1x1.py:
19-92): weight ``W = P @ L @ U`` with fixed permutation ``P`` and sign(s),
learnable strictly-lower ``L``, strictly-upper ``U`` and ``log|s|``. The
log-det is ``sum(log|s|) * H * W`` — read off the parameterization, no slogdet
— and the inverse recomposes W and inverts it on-device (f32) instead of
the reference's CPU float64 round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn  # noqa: F401

from pnnp_tpu.models.flows.base import Bijector


class InvertibleConv1x1(Bijector):
    num_channels: int = 4

    def setup(self):
        c = self.num_channels

        def init_all(rng):
            w = jnp.linalg.qr(jax.random.normal(rng, (c, c)))[0]
            p, l, u = jax.scipy.linalg.lu(w)
            s = jnp.diag(u)
            return {
                "p": p,                        # frozen (stop_gradient on use)
                "sign_s": jnp.sign(s),          # frozen
                "l": jnp.tril(l, -1),
                "log_s": jnp.log(jnp.abs(s)),
                "u": jnp.triu(u, 1),
            }

        self.lu = self.param("lu", init_all)

    def _pieces(self):
        c = self.num_channels
        p = jax.lax.stop_gradient(self.lu["p"])
        sign_s = jax.lax.stop_gradient(self.lu["sign_s"])
        l_mask = jnp.tril(jnp.ones((c, c)), -1)
        l = self.lu["l"] * l_mask + jnp.eye(c)
        u = self.lu["u"] * l_mask.T + jnp.diag(sign_s * jnp.exp(self.lu["log_s"]))
        return p, l, u

    def forward_ldj(self, x, **ctx):
        p, l, u = self._pieces()
        w = p @ l @ u
        h, wd = x.shape[-3], x.shape[-2]
        z = jnp.einsum("nhwc,dc->nhwd", x, w)
        ldj = jnp.sum(self.lu["log_s"]) * h * wd
        return z, jnp.broadcast_to(ldj, (x.shape[0],))

    def inverse(self, z, **ctx):
        # Channel count is tiny (4); a direct inverse of the recomposed W is
        # exact to f32 for the near-orthogonal matrices this layer maintains
        # (log|s| is trained from ~0), and avoids the reference's CPU float64
        # round-trip (conv2d1x1.py:71-73).
        p, l, u = self._pieces()
        w_inv = jnp.linalg.inv(p @ l @ u)
        return jnp.einsum("nhwc,dc->nhwd", z, w_inv)
