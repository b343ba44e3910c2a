"""Statistical parity of ops.poisson.poisson_sample vs scipy.

The sampler replaces ``jax.random.poisson`` (while_loop rejection, ~28 ms on
v5e for the train-step batch) with a fixed-unrolled hybrid (~5 ms). These
tests pin its distribution against the scipy pmf across the lambda range the
noise physics produces, including both sides of the SMALL_LAM_MAX crossover.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from pnnp_tpu.ops.poisson import SMALL_LAM_MAX, poisson_sample


def _sym_kld_vs_pmf(samples: np.ndarray, lam: float) -> float:
    hi = int(samples.max()) + 1
    emp = np.bincount(samples.astype(np.int64), minlength=hi) / samples.size
    pmf = stats.poisson.pmf(np.arange(hi), lam)
    pmf[-1] += stats.poisson.sf(hi - 1, lam)  # fold the tail in
    eps = 1e-12
    m = (emp > 0) | (pmf > 0)
    return float(0.5 * np.sum((emp[m] - pmf[m]) * np.log((emp[m] + eps) / (pmf[m] + eps))))


@pytest.mark.parametrize("lam", [0.05, 0.5, 2.0, 8.0, 15.0, 17.0, 48.0, 400.0])
def test_distribution_matches_scipy(lam):
    n = 400_000
    s = np.asarray(poisson_sample(jax.random.key(int(lam * 100)), jnp.full((n,), lam)))
    assert abs(s.mean() - lam) < 4 * np.sqrt(lam / n) + 0.05
    assert abs(s.std() ** 2 / lam - 1.0) < 0.05
    assert _sym_kld_vs_pmf(s, lam) < 2e-3


def test_lam_zero_and_mixed_branches():
    lam = jnp.array([0.0, 1.0, SMALL_LAM_MAX, SMALL_LAM_MAX + 1, 1000.0])
    s = poisson_sample(jax.random.key(0), jnp.tile(lam, (10_000, 1)))
    s = np.asarray(s)
    assert (s[:, 0] == 0).all()
    assert (s >= 0).all()
    assert s.dtype == np.float32
    # per-column means track lambda
    np.testing.assert_allclose(s.mean(0)[1:], np.asarray(lam)[1:], rtol=0.15)


def test_jit_and_shape_arg():
    f = jax.jit(lambda k: poisson_sample(k, 3.0, shape=(64, 64)))
    out = f(jax.random.key(1))
    assert out.shape == (64, 64)
    assert float(out.mean()) == pytest.approx(3.0, abs=0.3)
