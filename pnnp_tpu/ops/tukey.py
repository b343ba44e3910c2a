"""Tukey-lambda distribution in pure JAX.

The reference samples TL read noise through scipy (``stats.tukeylambda.rvs``,
reference: data_process/process.py:611) and builds HighBitRecovery LUTs from
its cdf/ppf (reference: data_process/process.py:705-743). scipy has no device
path, so we implement the quantile function in closed form and the CDF by
bisection on the (strictly monotone) quantile — all jittable and vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LAM_EPS = 1e-7


def tukeylambda_ppf(p: jnp.ndarray, lam) -> jnp.ndarray:
    """Quantile function Q(p; lam) = (p^lam - (1-p)^lam) / lam, logit at lam=0.

    Computed as (expm1(lam*log p) - expm1(lam*log1p(-p))) / lam: the naive
    power form catastrophically cancels for |lam| < ~1e-3 in float32 (both
    powers round to ~1.0), deviating from scipy by up to 5e-2 at lam=1e-6;
    the expm1 form stays accurate for all lam and has the exact logit limit.
    """
    p = jnp.asarray(p)
    lam = jnp.asarray(lam, p.dtype)
    logit = jnp.log(p) - jnp.log1p(-p)
    lam_safe = jnp.where(jnp.abs(lam) < _LAM_EPS, 1.0, lam)
    q_nonzero = (
        jnp.expm1(lam_safe * jnp.log(p)) - jnp.expm1(lam_safe * jnp.log1p(-p))
    ) / lam_safe
    return jnp.where(jnp.abs(lam) < _LAM_EPS, logit, q_nonzero)


def _support_bound(lam) -> jnp.ndarray:
    """|Q(1; lam)| = 1/lam for lam > 0 (finite support); inf otherwise."""
    lam = jnp.asarray(lam, jnp.float32)
    return jnp.where(lam > _LAM_EPS, 1.0 / jnp.maximum(lam, _LAM_EPS), jnp.inf)


def tukeylambda_cdf(x: jnp.ndarray, lam, iters: int = 60) -> jnp.ndarray:
    """CDF by bisection on the quantile function (monotone in p).

    Matches scipy.stats.tukeylambda.cdf to float32 precision. ``iters=60``
    halves the [0,1] bracket to far below float32 resolution.
    """
    x = jnp.asarray(x, jnp.float32)
    lam = jnp.asarray(lam, jnp.float32)

    lo = jnp.zeros_like(x)
    hi = jnp.ones_like(x)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        q = tukeylambda_ppf(mid, lam)
        go_right = q < x
        return jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    p = 0.5 * (lo + hi)
    # Outside the finite support (lam > 0) the CDF saturates at 0/1 exactly.
    bound = _support_bound(lam)
    p = jnp.where(x <= -bound, 0.0, jnp.where(x >= bound, 1.0, p))
    return p


def tukeylambda_sample(key, lam, scale=1.0, shape=()) -> jnp.ndarray:
    """Draw TL(lam) * scale via inverse-CDF sampling (scipy rvs-compatible).

    ``lam``/``scale`` may be scalars or arrays broadcastable to ``shape``
    (e.g. per-batch noise parameters of shape ``[N, 1, 1, 1]``).
    """
    # Open-interval uniform avoids inf at p in {0, 1} when lam <= 0.
    tiny = jnp.float32(1e-7)
    p = jax.random.uniform(key, shape, jnp.float32, minval=tiny, maxval=1.0 - tiny)
    return tukeylambda_ppf(p, lam) * scale
