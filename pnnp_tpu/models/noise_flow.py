"""NoiseFlow: a normalizing-flow camera noise model (NHWC, flax).

Re-design of reference archs/noise_flow.py:24-221. The arch string DSL is
kept: ``'sdn|unc|unc|unc|unc|giso|unc|unc|unc|unc'`` where ``unc`` expands to
InvertibleConv1x1 + AffineCoupling, ``sdn`` to SignalDependantISO, and
``giso``/``gain`` to GainISO. The prior is a standard diagonal Gaussian.

API (all jittable through ``.apply``):
  * ``loss(noise, clean, iso)`` -> (nll_per_dim, sd_z)
  * ``sample(rng, clean, iso, eps_std)`` -> noise draw
  * ``forward(noise, clean, iso)`` -> (z, log_det)
  * ``inverse(z, clean, iso)`` -> noise
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pnnp_tpu.models.flows.conv1x1 import InvertibleConv1x1
from pnnp_tpu.models.flows.coupling import AffineCoupling
from pnnp_tpu.models.flows.sdn import SignalDependantISO, GainISO


class NoiseFlow(nn.Module):
    x_shape: Tuple[int, int, int] = (256, 256, 4)  # (H, W, C) NHWC
    arch: str = "sdn|unc|unc|unc|unc|giso|unc|unc|unc|unc"
    flow_permutation: int = 1

    def setup(self):
        c = self.x_shape[-1]
        layers = []
        for i, lyr in enumerate(self.arch.split("|")):
            if lyr == "unc":
                if self.flow_permutation == 1:
                    layers.append(InvertibleConv1x1(num_channels=c, name=f"conv1x1_{i}"))
                # any other flow_permutation value means "no permutation
                # layer", matching the reference's fall-through
                # (noise_flow.py:53-66 prints and continues)
                layers.append(AffineCoupling(num_channels=c, name=f"unc_{i}"))
            elif lyr == "sdn":
                layers.append(SignalDependantISO(name=f"sdn_{i}"))
            elif lyr in ("giso", "gain"):
                layers.append(GainISO(name=f"giso_{i}"))
            else:
                raise ValueError(f"unknown flow layer '{lyr}'")
        self.bijectors = layers

    def forward(self, noise, clean=None, iso=None, train: bool = False):
        z = noise
        objective = jnp.zeros((noise.shape[0],))
        for bij in self.bijectors:
            z, ldj = bij.forward_ldj(z, clean=clean, iso=iso, train=train)
            objective = objective + ldj
        return z, objective

    def inverse(self, z, clean=None, iso=None):
        x = z
        for bij in reversed(self.bijectors):
            x = bij.inverse(x, clean=clean, iso=iso)
        return x

    def __call__(self, noise, clean=None, iso=None, train: bool = False):
        return self.loss(noise, clean=clean, iso=iso, train=train)

    def loss(self, noise, clean=None, iso=None, train: bool = False):
        """Per-dim NLL under the standard-normal prior + std of the input.

        (reference: noise_flow.py:133-165; ``sd_z`` is the reference's noise
        std diagnostic.)
        """
        z, objective = self.forward(noise, clean=clean, iso=iso, train=train)
        logp = -0.5 * jnp.sum(
            (math.log(2 * math.pi) + z**2).reshape(z.shape[0], -1), axis=1
        )
        nll = -(objective + logp)
        dims = noise.shape[1] * noise.shape[2] * noise.shape[3]
        nll_dim = jnp.mean(nll) / dims
        var_z = jnp.var(noise.reshape(noise.shape[0], -1), axis=1)
        sd_z = jnp.mean(jnp.sqrt(var_z))
        return nll_dim, sd_z

    def sample(self, rng, clean=None, iso=None, eps_std=None):
        """Draw noise: z ~ N(0, 1) -> inverse bijector chain (reference:173-188)."""
        eps = jax.random.normal(rng, clean.shape)
        if eps_std is not None:
            eps = eps * jnp.reshape(eps_std, (-1, 1, 1, 1))
        return self.inverse(eps, clean=clean, iso=iso)
