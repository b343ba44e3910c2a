"""Noise-engine statistical validation: device sampler vs NumPy/scipy oracle.

For each (camera, ISO, noise_code) config, draws noise from the fused JAX
generator and from an independent NumPy/scipy implementation of the same
physics (Poisson shot, Tukey-lambda/Gaussian read, row, quantization), and
reports histogram KL divergences (the reference's noise-model quality metric,
utils/kld_div.py:163). KLD ~ 1e-3 or below means the synthetic distributions
are indistinguishable at this sample size.

Usage: python tools/validate_noise_model.py [--samples 2000000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from pnnp_tpu.ops.kld import kl_div_norm
from pnnp_tpu.physics import generate_noisy
from pnnp_tpu.physics import calibration as calib


def oracle(rng, y, p, code, ratio):
    scale = p["wp"] - p["bl"]
    y_adu = y * scale / ratio
    z = rng.poisson(np.maximum(y_adu / p["K"], 0)).astype(np.float64) * p["K"]
    if "b" not in code:
        if "g" in code:
            z += stats.tukeylambda.rvs(p["lam"], scale=p["sigTL"], size=y.shape,
                                       random_state=rng)
        else:
            z += rng.normal(0, p["sigGs"], y.shape)
        if "r" in code:
            z += rng.normal(0, p["sigR"], y.shape[:-2] + (1, y.shape[-1]))
        if "q" in code:
            z += (rng.uniform(size=y.shape) - 0.5) * p["q"] * scale
    z = np.clip(z / scale, -p["bl"] / p["wp"], 1) * ratio
    return z


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=2_000_000)
    ap.add_argument("--signal", type=float, default=0.002)
    a = ap.parse_args(argv)

    n = int(np.sqrt(a.samples / 4))
    print(f"{'camera':10s} {'iso':>6s} {'code':>6s} {'ratio':>6s} "
          f"{'kl_fwd':>9s} {'kl_inv':>9s} {'kl_sym':>9s}")
    for camera, iso, code, ratio in [
        ("SonyA7S2", 1600, "pgrq", 100.0),
        ("SonyA7S2", 1600, "pr", 250.0),
        ("SonyA7S2", 6400, "p", 300.0),
        ("IMX686", 6400, "prq", 16.0),
        ("IMX686", 100, "pgrq", 1.0),
    ]:
        t = calib.ISO_TABLES[camera]
        i = int(np.where(t["iso"] == iso)[0][0])
        p = {k: float(np.asarray(t[k])[i] if np.ndim(t[k]) else t[k])
             for k in ("Kmax", "lam", "sigGs", "sigTL", "sigR", "q", "wp", "bl")}
        p["K"] = p.pop("Kmax")
        params = {
            "K": jnp.full((1,), p["K"]), "sigTL": jnp.full((1,), p["sigTL"]),
            "sigR": jnp.full((1,), p["sigR"]), "sigGs": jnp.full((1,), p["sigGs"]),
            "bias": jnp.zeros((1, 4)), "lam": jnp.full((1,), p["lam"]),
            "q": jnp.full((1,), p["q"]), "ratio": jnp.full((1,), ratio),
            "wp": jnp.full((1,), p["wp"]), "bl": jnp.full((1,), p["bl"]),
        }
        y = jnp.full((1, n, n, 4), a.signal)
        z_dev = np.asarray(generate_noisy(jax.random.key(0), y, params, code))
        rng = np.random.default_rng(1)
        z_ref = oracle(rng, np.full((1, n, n, 4), a.signal), p, code, ratio)
        span = p["wp"] - p["bl"]
        res = kl_div_norm(z_dev / ratio * span, z_ref / ratio * span,
                          bl=p["bl"], wp=int(p["wp"]))
        print(f"{camera:10s} {iso:6d} {code:>6s} {ratio:6.0f} "
              f"{res['kl_fwd']:9.5f} {res['kl_inv']:9.5f} {res['kl_sym']:9.5f}")


if __name__ == "__main__":
    main()
