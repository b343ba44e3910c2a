"""PNNP proxy network ``pw_iso_2stage`` — re-designed (withheld upstream).

The reference ships only this model's config (reference:
runfiles/SonyA7S2/PNNP.yml:47-59 — pixel-wise, ISO-conditioned, 2-stage,
nf=16, nb=2, d=1024 bins, swish, ISO2K linear gain map) and its call contract
``proxy_net.sample(clean, iso) -> noise`` (reference: trainer_SID.py:463-472);
the implementation is withheld (archs/__init__.py:10). This is a from-scratch
design guided by the PNNP paper's "physics-guided noise neural proxy" idea
(arXiv:2310.09126): keep the physics where physics is exact, learn only the
dark/read-noise distribution.

Architecture:
  * **Physics part** (no parameters): shot noise is exact Poisson with system
    gain ``K(iso) = ISO2K[0]*iso + ISO2K[1]``.
  * **Stage 1 — pixel proxy**: a learned inverse-CDF (quantile function) over
    ``d`` uniform probability bins, parameterized by an ISO-conditioned MLP
    (``nb`` hidden layers of width ``nf``, swish). Sampling is a single
    per-pixel gather: ``u ~ U(0,1) -> Q_theta(u | iso)`` — a TPU-friendly,
    fully vectorized generator with an exact tractable density (piecewise
    constant), so the proxy trains by maximum likelihood on real dark frames.
  * **Stage 2 — row proxy** (mode '2stage'): an identical quantile head whose
    samples are drawn per (row, channel) and broadcast along the row, modeling
    banding noise.

All shapes NHWC; ``iso`` is a scalar or per-example [n] array.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Swish = nn.swish


class QuantileHead(nn.Module):
    """ISO-conditioned monotone piecewise-linear quantile function on d bins."""

    d: int = 1024
    nf: int = 16
    nb: int = 2

    # Init/clip for the learned support half-width (ADU): starts at e^2~7.4
    # (typical read-noise span) and stays in [e^-2, e^6] for stability.
    LOG_SCALE_INIT = 2.0
    LOG_SCALE_RANGE = (-2.0, 6.0)

    @nn.compact
    def __call__(self, iso_feat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """iso_feat [n, f] -> (knots [n, d+1], log_scale [n, 1])."""
        h = iso_feat
        for i in range(self.nb):
            h = Swish(nn.Dense(self.nf, name=f"fc{i}")(h))
        raw = nn.Dense(self.d + 1, name="bins")(h)  # d bin heights + 1 scale
        heights = nn.softmax(raw[..., : self.d], axis=-1)
        log_scale = jnp.clip(
            raw[..., self.d :] + self.LOG_SCALE_INIT, *self.LOG_SCALE_RANGE
        )
        # Monotone knots on [-1, 1], scaled: v_k = scale * (2*cum_k - 1).
        cum = jnp.cumsum(heights, axis=-1)
        cum = jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum], axis=-1)
        knots = jnp.exp(log_scale) * (2.0 * cum - 1.0)
        return knots, log_scale

    @staticmethod
    def quantile(knots: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """Evaluate the PWL quantile at u in [0,1). knots [n, d+1], u [n, ...]."""
        d = knots.shape[-1] - 1
        t = u * d
        k = jnp.clip(t.astype(jnp.int32), 0, d - 1)
        frac = t - k

        def gather(kn, idx):
            return kn[idx]

        lo = jax.vmap(gather)(knots, k.reshape(k.shape[0], -1)).reshape(u.shape)
        hi = jax.vmap(gather)(knots, (k + 1).reshape(k.shape[0], -1)).reshape(u.shape)
        return lo + frac * (hi - lo)

    @staticmethod
    def log_prob(knots: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """Exact log-density of the PWL-quantile distribution at x.

        pdf = (1/d) / segment_width on each segment. Outside the support the
        density decays with a smooth exponential tail (length scale = 10% of
        the support half-width) — a bounded training signal that pulls the
        learned support outward without the gradient blow-ups of a hard
        penalty.
        """
        d = knots.shape[-1] - 1

        def per_example(kn, xs):
            idx = jnp.clip(jnp.searchsorted(kn, xs, side="right") - 1, 0, d - 1)
            width = jnp.maximum(kn[idx + 1] - kn[idx], 1e-8)
            inside = (xs >= kn[0]) & (xs <= kn[-1])
            logp = -jnp.log(d * width)
            half_width = jnp.maximum((kn[-1] - kn[0]) * 0.5, 1e-6)
            excess = jnp.abs(xs - jnp.clip(xs, kn[0], kn[-1]))
            return jnp.where(inside, logp, logp - excess / (0.1 * half_width))

        return jax.vmap(per_example)(knots, x.reshape(x.shape[0], -1)).reshape(x.shape)


class PixelWiseISOProxy(nn.Module):
    """``pw_iso_2stage``: physics shot + learned pixel/row dark-noise proxies."""

    iso2k: Sequence[float] = (0.0009546, -0.00193)
    nf: int = 16
    nb: int = 2
    d: int = 1024
    mode: str = "2stage+iso"
    wp: float = 16383.0
    bl: float = 512.0

    def _iso_feat(self, iso: jnp.ndarray) -> jnp.ndarray:
        """Normalized ISO features: [K(iso), log-ISO] — the '+iso' conditioning."""
        iso = jnp.atleast_1d(jnp.asarray(iso, jnp.float32))
        k = self.iso2k[0] * iso + self.iso2k[1]
        if "iso" in self.mode:
            return jnp.stack([k, jnp.log(iso / 1600.0)], axis=-1)
        return k[:, None]

    @nn.compact
    def __call__(self, clean, iso, rng=None, mode: str = "sample"):
        """mode='sample' -> noise draw; mode='loss' -> (nll, aux)."""
        pixel_head = QuantileHead(self.d, self.nf, self.nb, name="pixel_stage")
        row_head = (
            QuantileHead(self.d, self.nf, self.nb, name="row_stage")
            if "2stage" in self.mode
            else None
        )
        feat = self._iso_feat(iso)
        n = clean.shape[0]
        feat = jnp.broadcast_to(feat, (n, feat.shape[-1]))
        knots_px, _ = pixel_head(feat)
        knots_row = row_head(feat)[0] if row_head is not None else None

        if mode == "sample":
            if rng is None:
                rng = self.make_rng("sample")
            return self._sample(rng, clean, feat, knots_px, knots_row)
        return self._loss(clean, iso, knots_px, knots_row)

    def _sample(self, rng, clean, feat, knots_px, knots_row):
        k_shot, k_px, k_row = jax.random.split(rng, 3)
        n, h, w, c = clean.shape
        span = self.wp - self.bl
        K = feat[:, 0].reshape(n, 1, 1, 1)
        clean_adu = jnp.maximum(clean, 0.0) * span
        shot = (
            jax.random.poisson(k_shot, clean_adu / jnp.maximum(K, 1e-6)).astype(jnp.float32)
            * K
            - clean_adu
        )
        u_px = jax.random.uniform(k_px, clean.shape, minval=1e-6, maxval=1 - 1e-6)
        read = QuantileHead.quantile(knots_px, u_px)
        total = shot + read
        if knots_row is not None:
            u_row = jax.random.uniform(k_row, (n, h, 1, c), minval=1e-6, maxval=1 - 1e-6)
            total = total + QuantileHead.quantile(knots_row, u_row)
        return total / span

    def _loss(self, noise, iso, knots_px, knots_row):
        """NLL of observed noise (ADU) decomposed into row + pixel components.

        Row component is estimated as the per-(row, channel) mean; the pixel
        head models the residual. Matches how the physics pipeline calibrates
        sigR vs sigGs from dark frames.
        """
        span = self.wp - self.bl
        x = noise * span
        row_mean = jnp.mean(x, axis=2, keepdims=True)
        resid = x - row_mean
        nll_px = -jnp.mean(QuantileHead.log_prob(knots_px, resid))
        if knots_row is not None:
            nll_row = -jnp.mean(QuantileHead.log_prob(knots_row, row_mean))
        else:
            nll_row = 0.0
        # Weight the row term by its dimensionality share (one draw per
        # (row, channel) vs one per pixel).
        w_row = 1.0 / max(noise.shape[2], 1)
        return nll_px + w_row * nll_row, {"nll_px": nll_px, "nll_row": nll_row}

    def sample(self, clean, iso, rng=None):
        return self(clean, iso, rng=rng, mode="sample")

    def loss(self, noise, iso):
        return self(noise, iso, mode="loss")
