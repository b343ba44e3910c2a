"""Fast Poisson sampling for TPU noise synthesis.

The reference draws shot noise with ``torch.poisson`` inside the GPU
preprocess (reference: data_process/process.py:651, trainer_SID.py:449-462).
The JAX equivalent, ``jax.random.poisson``, lowers to a Knuth/rejection
implementation built on ``lax.while_loop`` — measured at ~28 ms for an
8x512^2 Bayer batch on v5e, which made shot sampling the single largest
component of the packed train step (synth alone was 21.5 of 58.8 ms/step).

This module replaces it with a branch-free, fixed-unrolled hybrid that XLA
fuses into one elementwise kernel (~5 ms in the same harness, at the
measured dispatch floor):

* ``lam <= SMALL_LAM_MAX`` — exact inverse-CDF inversion: the Poisson pmf is
  accumulated by the recurrence ``pmf_k = pmf_{k-1} * lam / k`` for a static
  ``KMAX`` terms and the sample is the count of CDF values below a single
  uniform draw.  ``P(X > KMAX | lam = SMALL_LAM_MAX) ~ 1e-16``, far below
  f32 resolution, so the truncation is unobservable.
* ``lam > SMALL_LAM_MAX`` — second-order Cornish-Fisher normal expansion
  ``round(lam + sqrt(lam) z + (z^2 - 1)/6)``, which matches mean, variance
  AND skewness of the Poisson.  Measured sym-KLD vs ``jax.random.poisson``
  at 2M samples: <= 2e-4 for every lam in {17, 24, 48, 160, 1000} — at the
  sampling noise floor (the small-lam side measures <= 3e-5).

Both branches are computed on every element (they are cheap); ``where``
selects.  Statistical regression tests: tests/test_poisson_fast.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Branch point between exact CDF inversion and the Cornish-Fisher normal
# expansion. 16 keeps the exact path over the lambda range that dominates
# low-light content while the expansion's skewness match makes the
# crossover statistically invisible (see module docstring).
SMALL_LAM_MAX = 16.0
# Static number of unrolled pmf terms for the exact path.
KMAX = 60


def poisson_sample(key: jax.Array, lam: jnp.ndarray, shape=None,
                   dtype=jnp.float32) -> jnp.ndarray:
    """Draw Poisson(lam) samples, elementwise over ``lam``.

    Drop-in for ``jax.random.poisson(key, lam).astype(f32)`` (same
    distribution, different stream).  ``lam`` must be >= 0 (callers clamp);
    ``lam = 0`` deterministically returns 0.
    """
    if shape is None:
        shape = jnp.shape(lam)
    ku, kn = jax.random.split(key)
    u = jax.random.uniform(ku, shape)
    z = jax.random.normal(kn, shape)
    lam = jnp.asarray(lam, jnp.float32)

    lam_c = jnp.minimum(lam, SMALL_LAM_MAX)
    pmf = jnp.exp(-lam_c)
    cdf = pmf
    cnt = (u > cdf).astype(jnp.float32)
    for k in range(1, KMAX + 1):
        pmf = pmf * (lam_c / k)
        cdf = cdf + pmf
        cnt = cnt + (u > cdf).astype(jnp.float32)

    large = jnp.round(lam + jnp.sqrt(lam) * z + (z * z - 1.0) / 6.0)
    out = jnp.where(lam <= SMALL_LAM_MAX, cnt, jnp.maximum(large, 0.0))
    return out.astype(dtype)
