"""Noise-parameter samplers — vectorized, PRNG-keyed, jit-safe.

Re-expresses the reference's per-crop Python sampling loops
(reference: data_process/process.py:311-412, called per crop at
trainer_SID.py:449-462) as batched JAX samplers that run *inside* the jitted
train step: one call produces parameters for the whole crop batch, and every
random draw hangs off an explicit PRNG key.

The parameter pytree ("params") is a dict of float32 arrays, each of leading
shape ``[n]`` (``bias`` is ``[n, 4]``):
    K, sigTL, sigR, sigGs, bias, lam, q, ratio, wp, bl
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pnnp_tpu.physics import calibration as calib


def _regression_consts(camera_type: str) -> dict:
    p = calib.CAMERA_REGRESSION[camera_type]
    return {k: np.float32(v) for k, v in p.items()}


def sample_params_max(
    key: jax.Array,
    camera_type: str = "NikonD850",
    n: int = 1,
    ratio: Optional[jnp.ndarray] = None,
    iso: Optional[object] = None,
    jitter_sigmas: bool = True,
    table: Optional[dict] = None,
) -> dict:
    """Batched port of ``sample_params_max`` (reference: process.py:311-351).

    * ``iso`` given and calibrated -> point-calibration branch: gather the ISO
      row and perturb (K jitter +-1%, gaussian jitter on sigGs/sigTL/sigR).
      ``iso`` may be a static int or an int32 array of per-example table
      *indices* (see :func:`calibration.iso_index`).
    * ``iso`` None -> regression branch: per-example dual-ISO coin flip for
      SonyA7S2, K-jittered log-linear sigma models.
    * ``ratio`` None -> U(100, 300) for Sony-family, exp(U(0, 2.08)) otherwise.
    * ``jitter_sigmas=False`` (point branch only): keep sigGs/sigTL/sigR at
      their calibrated means — the trainer_LRID.py:404-408 law, which copies
      the dataset's measured ISO-6400 NLF and perturbs ONLY K.
    * ``table`` (point branch only): an ``ISO_TABLES``-shaped dict overriding
      the baked calibration — the user-h5 path
      (:func:`calibration.table_with_noiseparam`).
    """
    ks = jax.random.split(key, 8)

    if iso is not None and table is None and camera_type not in calib.ISO_TABLES:
        raise ValueError(
            f"explicit iso given but {camera_type!r} has no per-ISO "
            "calibration table; only regression sampling (iso=None) exists "
            "for this camera")
    if iso is not None:
        if table is None:
            table = calib.ISO_TABLES[camera_type]
        if isinstance(iso, (int, float, str, np.integer, np.floating)):
            idx = jnp.full((n,), calib.iso_index(camera_type, iso), jnp.int32)
        else:
            idx = jnp.asarray(iso, jnp.int32)
        gather = lambda name: jnp.asarray(table[name], jnp.float32)[idx]
        K = gather("Kmax") * (1.0 + jax.random.uniform(ks[0], (n,), minval=-0.01, maxval=0.01))
        if jitter_sigmas:
            sigGs = gather("sigGs") + jax.random.normal(ks[1], (n,)) * gather("sigGssig")
            sigTL = gather("sigTL") + jax.random.normal(ks[2], (n,)) * gather("sigTLsig")
            sigR = gather("sigR") + jax.random.normal(ks[3], (n,)) * gather("sigRsig")
        else:
            sigGs, sigTL, sigR = gather("sigGs"), gather("sigTL"), gather("sigR")
        bias = jnp.asarray(table["bias"], jnp.float32)[idx]
        lam = gather("lam")
        wp = jnp.full((n,), table["wp"], jnp.float32)
        bl = jnp.full((n,), table["bl"], jnp.float32)
        q = jnp.full((n,), table["q"], jnp.float32)
    else:
        cam = camera_type
        if cam in calib.DUAL_ISO_CAMERAS:
            lo = _regression_consts(cam + "_lowISO")
            hi = _regression_consts(cam + "_highISO")
            pick_hi = jax.random.bernoulli(ks[4], 0.5, (n,))
            sel = lambda name: jnp.where(pick_hi, hi[name], lo[name])
        else:
            p = _regression_consts(cam)
            sel = lambda name: jnp.full((n,), p.get(name, np.float32(np.nan)), jnp.float32)

        log_K = sel("Kmax") + jax.random.uniform(ks[0], (n,), minval=-0.01, maxval=0.01)
        K = jnp.exp(log_K)
        mu_TL = sel("sigTLk") * log_K + sel("sigTLb")
        mu_R = sel("sigRk") * log_K + sel("sigRb")
        mu_Gs = sel("sigGsk") * log_K + sel("sigGsb")
        sigTL = jnp.exp(mu_TL)
        sigR = jnp.exp(mu_R)
        sigGs = jnp.exp(mu_Gs + jax.random.normal(ks[1], (n,)) * sel("sigGssig"))
        bias = jnp.zeros((n, 4), jnp.float32)
        lam = sel("lam")
        wp = sel("wp")
        bl = sel("bl")
        q = sel("q")

    if ratio is None:
        if "SonyA7S2" in camera_type:
            ratio = jax.random.uniform(ks[5], (n,), minval=100.0, maxval=300.0)
        else:
            ratio = jnp.exp(jax.random.uniform(ks[5], (n,), minval=0.0, maxval=2.08))
    else:
        ratio = jnp.broadcast_to(jnp.asarray(ratio, jnp.float32), (n,))

    return dict(K=K, sigTL=sigTL, sigR=sigR, sigGs=sigGs, bias=bias,
                lam=lam, q=q, ratio=ratio, wp=wp, bl=bl)


def sample_params(
    key: jax.Array,
    camera_type: str = "NikonD850",
    n: int = 1,
    ln_ratio: bool = False,
) -> dict:
    """Batched port of ``sample_params`` (reference: process.py:354-412).

    Full-regression sampling: log-K uniform over the camera's calibrated K
    range, gaussian jitter on every log-sigma, exp-bias for cameras with a
    calibrated read-bias model (SonyA7S2).
    """
    ks = jax.random.split(key, 8)
    cam = camera_type
    if cam in calib.DUAL_ISO_CAMERAS:
        lo = _regression_consts(cam + "_lowISO")
        hi = _regression_consts(cam + "_highISO")
        pick_hi = jax.random.bernoulli(ks[6], 0.5, (n,))
        sel = lambda name, d=np.float32(0.0): jnp.where(
            pick_hi, hi.get(name, d), lo.get(name, d)
        )
        has_uread = "uReadk" in lo
    else:
        p = _regression_consts(cam)
        sel = lambda name, d=np.float32(0.0): jnp.full((n,), p.get(name, d), jnp.float32)
        has_uread = "uReadk" in p

    log_K = jax.random.uniform(ks[0], (n,)) * (sel("Kmax") - sel("Kmin")) + sel("Kmin")
    K = jnp.exp(log_K)
    q = sel("q")
    mu_TL = sel("sigTLk") * log_K + sel("sigTLb")
    mu_R = sel("sigRk") * log_K + sel("sigRb")
    mu_Gs = sel("sigGsk") * log_K + sel("sigGsb")

    sigTL = jnp.exp(mu_TL + jax.random.normal(ks[1], (n,)) * sel("sigTLsig"))
    sigR = jnp.exp(mu_R + jax.random.normal(ks[2], (n,)) * sel("sigRsig"))
    sigGs = jnp.exp(mu_Gs + jax.random.normal(ks[3], (n,)) * sel("sigGssig"))
    if has_uread:
        mu_bias = sel("uReadk") * log_K + sel("uReadb")
        bias_s = jnp.exp(mu_bias + jax.random.normal(ks[4], (n,)) * sel("uReadsig"))
    else:
        # Reference quirk preserved: log_bias = 0 -> bias = exp(0) = 1.
        bias_s = jnp.ones((n,), jnp.float32)
    bias = jnp.broadcast_to(bias_s[:, None], (n, 4))

    if ln_ratio:
        high = 1.0 if "CRVD" in camera_type else 5.0
        ratio = jnp.exp(jax.random.uniform(ks[5], (n,), minval=-0.01, maxval=high))
    else:
        ratio = jax.random.uniform(ks[5], (n,), minval=100.0, maxval=300.0)

    return dict(K=K, sigTL=sigTL, sigR=sigR, sigGs=sigGs, bias=bias,
                lam=sel("lam"), q=q, ratio=ratio, wp=sel("wp"), bl=sel("bl"))


def sony_k_from_iso(key: jax.Array, iso: jnp.ndarray) -> jnp.ndarray:
    """SonyA7S2 system gain from ISO with the +-1% calibration jitter.

    ``K = 0.0009546 * iso - 0.00193`` (reference: process.py:455, runfile ISO2K).
    """
    a, b = calib.SONY_ISO2K
    jit = 1.0 + jax.random.uniform(key, jnp.shape(iso), minval=-0.01, maxval=0.01)
    return a * iso * jit + b


def params_at_iso_regression(key: jax.Array, camera_type: str, iso: jnp.ndarray) -> dict:
    """SNA/WB-aug helper: K(iso) + regression sigGs for ISOs outside the table.

    Mirrors the fallback in ``raw_wb_aug_torch``/``SNA_torch``
    (reference: process.py:505-517, :563-571). ``iso`` is a float array [n];
    the low/high branch follows iso <= 1600.
    """
    assert camera_type == "SonyA7S2"
    n = iso.shape[0]
    k1, k2 = jax.random.split(key)
    lo = _regression_consts("SonyA7S2_lowISO")
    hi = _regression_consts("SonyA7S2_highISO")
    use_hi = iso > 1600
    sel = lambda name: jnp.where(use_hi, hi[name], lo[name])
    K = sony_k_from_iso(k1, iso)
    mu_Gs = sel("sigGsk") * jnp.log(K) + sel("sigGsb")
    sigGs = jnp.exp(mu_Gs + jax.random.normal(k2, (n,)) * sel("sigGssig"))
    return dict(K=K, sigGs=sigGs, wp=sel("wp"), bl=sel("bl"), lam=sel("lam"), q=sel("q"))
