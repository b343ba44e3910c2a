"""Small bijectors: ActNorm, Squeeze, Logit, UniformDequantization, NoiseExtraction.

Re-designs of reference archs/flow_layers/{actnorm,squeeze,logit,
uniform_dequantization,noise_extraction}.py in NHWC. ActNorm's data-dependent
init is a functional helper (:func:`actnorm_data_init`) producing updated
params from a sample batch — the JAX analog of the torch lazy-init flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn  # noqa: F401

from pnnp_tpu.models.flows.base import Bijector


class ActNorm(Bijector):
    """Per-channel affine: z = scale * x + shift, ldj = H*W*sum(log_scale)."""

    features: int = 4

    def setup(self):
        self.log_scale = self.param("log_scale", lambda rng: jnp.zeros((self.features,)))
        self.shift = self.param("shift", lambda rng: jnp.zeros((self.features,)))

    def forward_ldj(self, x, **ctx):
        z = jnp.exp(self.log_scale) * x + self.shift
        hw = x.shape[-3] * x.shape[-2] if x.ndim == 4 else 1
        ldj = hw * jnp.sum(self.log_scale)
        return z, jnp.broadcast_to(ldj, (x.shape[0],))

    def inverse(self, z, **ctx):
        return (z - self.shift) * jnp.exp(-self.log_scale)


def actnorm_data_init(x: jnp.ndarray) -> dict:
    """Data-dependent ActNorm init: post-norm activations ~ N(0, 1).

    Returns {'log_scale', 'shift'} from a representative batch
    (reference: actnorm.py:80-95).
    """
    flat = x.reshape(-1, x.shape[-1])
    # floor the std: a constant channel in the init batch (e.g. a clipped
    # black-level plane) would otherwise give inf log_scale / NaN grads
    std = jnp.maximum(jnp.std(flat, axis=0, ddof=1), 1e-6)
    mu = jnp.mean(flat / std, axis=0)
    return {"log_scale": -jnp.log(std), "shift": -mu}


class Squeeze(Bijector):
    """Space-to-depth by ``factor`` (volume-preserving, ldj = 0)."""

    factor: int = 2

    def forward_ldj(self, x, **ctx):
        f = self.factor
        n, H, W, c = x.shape
        z = x.reshape(n, H // f, f, W // f, f, c)
        z = z.transpose(0, 1, 3, 5, 2, 4).reshape(n, H // f, W // f, c * f * f)
        return z, jnp.zeros((n,))

    def inverse(self, z, **ctx):
        f = self.factor
        n, h, w, C = z.shape
        c = C // (f * f)
        x = z.reshape(n, h, w, c, f, f)
        x = x.transpose(0, 1, 4, 2, 5, 3).reshape(n, h * f, w * f, c)
        return x


class Logit(Bijector):
    """x in (0,1) -> logits; ldj via softplus identity (reference logit.py)."""

    temperature: float = 1.0
    eps: float = 1e-6

    def forward_ldj(self, x, **ctx):
        t = jnp.float32(self.temperature)
        xc = jnp.clip(x, self.eps, 1.0 - self.eps)
        z = (1.0 / t) * (jnp.log(xc) - jnp.log1p(-xc))
        per = -(jnp.log(t) - jax.nn.softplus(-t * z) - jax.nn.softplus(t * z))
        ldj = jnp.sum(per.reshape(x.shape[0], -1), axis=1)
        return z, ldj

    def inverse(self, z, **ctx):
        return jax.nn.sigmoid(self.temperature * z)


class UniformDequantization(Bijector):
    """Integer pixels + U[0,1) -> continuous [0,1); ldj = -bits*log2 per dim."""

    num_bits: int = 8

    def forward_ldj(self, x, rng=None, **ctx):
        bins = 2**self.num_bits
        if rng is None:
            rng = self.make_rng("sample")
        u = jax.random.uniform(rng, x.shape)
        z = (x + u) / bins
        n_dims = 1
        for d in x.shape[1:]:
            n_dims *= d
        ldj = jnp.full((x.shape[0],), -self.num_bits * jnp.log(2.0) * n_dims)
        return z, ldj

    def inverse(self, z, **ctx):
        bins = 2**self.num_bits
        return jnp.clip(jnp.floor(bins * z), 0, bins - 1)


class NoiseExtraction(Bijector):
    """z = x - clean (zero ldj)."""

    def forward_ldj(self, x, clean=None, **ctx):
        return x - clean, jnp.zeros((x.shape[0],))

    def inverse(self, z, clean=None, **ctx):
        return z + clean
