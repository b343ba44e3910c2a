"""Statistical parity of the noise engine vs NumPy/scipy oracles.

The reference synthesizes noise with numpy/scipy/torch samplers
(data_process/process.py:591-673); we verify our fused JAX generator matches
the composed distribution in moments and histogram KLD.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from pnnp_tpu.physics import (
    generate_noisy,
    sample_params_max,
    sample_params,
    sna,
    HighBitRecovery,
)
from pnnp_tpu.physics import calibration as calib


def make_params(n, ratio=100.0, iso=1600):
    """Fixed (unjittered) Sony params straight from the calibration table."""
    t = calib.ISO_TABLES["SonyA7S2"]
    i = int(np.where(t["iso"] == iso)[0][0])
    rep = lambda v: jnp.full((n,), v, jnp.float32)
    return dict(
        K=rep(t["Kmax"][i]), sigTL=rep(t["sigTL"][i]), sigR=rep(t["sigR"][i]),
        sigGs=rep(t["sigGs"][i]), bias=jnp.zeros((n, 4)), lam=rep(t["lam"][i]),
        q=rep(t["q"]), ratio=rep(ratio), wp=rep(t["wp"]), bl=rep(t["bl"]),
    )


def oracle_noisy(rng, y, p, noise_code, ratio, clip=False, ori=False):
    """NumPy oracle of the torch-path composition (process.py:634-673)."""
    scale = p["wp"] - p["bl"]
    y_adu = y * scale / ratio
    z = rng.poisson(np.maximum(y_adu / p["K"], 0)).astype(np.float64) * p["K"]
    if "g" in noise_code:
        z += stats.tukeylambda.rvs(p["lam"], scale=p["sigTL"], size=y.shape, random_state=rng)
    else:
        z += rng.normal(0, p["sigGs"], y.shape)
    if "r" in noise_code:
        z += rng.normal(0, p["sigR"], y.shape[:-2] + (1, y.shape[-1]))
    if "q" in noise_code:
        z += (rng.uniform(size=y.shape) - 0.5) * p["q"] * scale
    z = z / scale
    z = np.clip(z, 0, 1) if clip else np.clip(z, -p["bl"] / p["wp"], 1)
    if not ori:
        z = z * ratio
    return z


def test_generate_noisy_moments_pgrq():
    n, h, w = 4, 64, 64
    key = jax.random.key(0)
    y = jnp.full((n, h, w, 4), 0.002)  # dark-ish scene
    params = make_params(n, ratio=100.0)
    z = np.asarray(generate_noisy(key, y, params, noise_code="pgrq", ori=False))

    rng = np.random.default_rng(7)
    p_np = {k: float(np.asarray(v)[0]) for k, v in params.items() if k != "bias"}
    zo = oracle_noisy(rng, np.full((n, h, w, 4), 0.002), p_np, "pgrq", 100.0)

    assert abs(z.mean() - zo.mean()) < 0.003
    assert abs(z.std() / zo.std() - 1.0) < 0.03


def test_generate_noisy_gaussian_read_row():
    n, h, w = 2, 128, 128
    key = jax.random.key(1)
    y = jnp.zeros((n, h, w, 4))
    params = make_params(n, ratio=1.0)
    z = np.asarray(generate_noisy(key, y, params, noise_code="pr", ori=True))
    scale = float(np.asarray(params["wp"] - params["bl"])[0])
    sig_expected = np.hypot(float(params["sigGs"][0]), float(params["sigR"][0])) / scale
    assert abs(z.std() / sig_expected - 1.0) < 0.03
    # Row noise must correlate within rows: row means have extra variance.
    row_means = z.mean(axis=2)  # [n, h, 4]
    sig_row = float(params["sigR"][0]) / scale
    sig_read_row = np.sqrt(float(params["sigGs"][0]) ** 2 / scale**2 / w + sig_row**2)
    assert abs(row_means.std() / sig_read_row - 1.0) < 0.1


def test_generate_noisy_clip_bounds():
    n = 2
    key = jax.random.key(2)
    y = jnp.full((n, 32, 32, 4), 0.001)
    params = make_params(n, ratio=300.0)
    z = np.asarray(generate_noisy(key, y, params, noise_code="p", ori=False))
    bl_over_wp = float(np.asarray(params["bl"] / params["wp"])[0])
    assert z.min() >= -bl_over_wp * 300.0 - 1e-5
    z2 = np.asarray(generate_noisy(key, y, params, noise_code="p", ori=False, clip=True))
    assert z2.min() >= 0.0 and z2.max() <= 300.0 + 1e-5


def test_sample_params_max_regression_ranges():
    key = jax.random.key(3)
    p = sample_params_max(key, "SonyA7S2", n=4096)
    K = np.asarray(p["K"])
    lo, hi = calib.CAMERA_REGRESSION["SonyA7S2_lowISO"], calib.CAMERA_REGRESSION["SonyA7S2_highISO"]
    assert K.min() >= np.exp(lo["Kmax"] - 0.011)
    assert K.max() <= np.exp(hi["Kmax"] + 0.011)
    # dual-ISO: bimodal K
    frac_low = np.mean(K < np.exp(0.5))
    assert 0.4 < frac_low < 0.6
    r = np.asarray(p["ratio"])
    assert r.min() >= 100 and r.max() <= 300
    # lam follows the chosen branch
    lam = np.unique(np.asarray(p["lam"]))
    np.testing.assert_allclose(np.sort(lam), [-0.026, -0.025], atol=1e-6)


def test_sample_params_max_specific_iso():
    key = jax.random.key(4)
    p = sample_params_max(key, "SonyA7S2", n=2048, iso=3200)
    t = calib.ISO_TABLES["SonyA7S2"]
    i = int(np.where(t["iso"] == 3200)[0][0])
    K = np.asarray(p["K"])
    assert abs(K.mean() / t["Kmax"][i] - 1) < 0.005
    assert K.std() / t["Kmax"][i] < 0.01
    sigGs = np.asarray(p["sigGs"])
    assert abs(sigGs.mean() - t["sigGs"][i]) < 0.005
    assert abs(sigGs.std() / t["sigGssig"][i] - 1) < 0.1


def test_sample_params_full_regression():
    key = jax.random.key(5)
    p = sample_params(key, "IMX686", n=4096, ln_ratio=True)
    logK = np.log(np.asarray(p["K"]))
    reg = calib.CAMERA_REGRESSION["IMX686"]
    assert logK.min() >= reg["Kmin"] - 1e-4 and logK.max() <= reg["Kmax"] + 1e-4
    r = np.asarray(p["ratio"])
    assert r.min() >= np.exp(-0.01) - 1e-4 and r.max() <= np.exp(5.0) + 1e-3


def test_sna_moments():
    n, h, w = 2, 64, 64
    key = jax.random.key(6)
    gt = jnp.full((n, h, w, 4), 0.4)
    aug_wb = jnp.tile(jnp.asarray([[0.3, 0.1, 0.25, 0.1]], jnp.float32), (n, 1))
    iso = jnp.full((n,), 6400.0)
    dn, dy = sna(key, gt, aug_wb, camera_type="SonyA7S2", ratio=2.0, iso=iso, ori=True)
    dn, dy = np.asarray(dn), np.asarray(dy)
    # dy = gt_adu * aug_wb * ratio / scale = gt * aug_wb (exact)
    np.testing.assert_allclose(dy[0, 0, 0], 0.4 * np.array([0.3, 0.1, 0.25, 0.1]), rtol=1e-5)
    # dn mean ~ gt/ratio * aug_wb
    np.testing.assert_allclose(
        dn.mean(axis=(0, 1, 2)), 0.4 / 2.0 * np.array([0.3, 0.1, 0.25, 0.1]), rtol=0.05
    )


def test_hbr_recovers_continuous_distribution():
    hbr = HighBitRecovery(camera_type="IMX686", noise_code="pq", perturb=False)
    hbr.get_lut([6400])
    lut = hbr.lut[6400]
    sig = float(lut["scale"])
    rng = np.random.default_rng(0)
    # Quantized gaussian read noise (integer ADU), as from a real bias frame.
    raw = np.round(rng.normal(0, sig, (256, 256))).astype(np.float32)
    span = float(lut["param"]["wp"]) - float(lut["param"]["bl"])
    mapped = np.asarray(hbr.map(jax.random.key(0), jnp.asarray(raw / span), iso=6400)) * span
    # Mapped values must be continuous (many unique values) and keep sigma.
    assert len(np.unique(np.round(mapped, 3))) > 1000
    assert abs(mapped.std() / sig - 1.0) < 0.02
    assert abs(mapped.mean()) < 0.05
    # KLD between mapped histogram and a true gaussian sample should be small.
    true = rng.normal(0, sig, mapped.size)
    bins = np.linspace(-6 * sig, 6 * sig, 200)
    hp, _ = np.histogram(mapped, bins, density=True)
    hq, _ = np.histogram(true, bins, density=True)
    m = (hp > 0) & (hq > 0)
    kld = np.sum(hp[m] * np.log(hp[m] / hq[m])) * (bins[1] - bins[0])
    assert kld < 0.01


def test_generate_noisy_packed_structure():
    """Packed generator: per-pixel stats match the unpacked generator, and the
    row-noise component is constant along full-resolution rows (banding)."""
    from pnnp_tpu.physics import generate_noisy_packed
    from pnnp_tpu.models.unet_s2d import d2s, s2d

    n, h2, w2 = 2, 32, 32
    params = make_params(n, ratio=1.0)
    # isolate row noise: zero signal (Poisson(0)=0) and zero read noise
    params["sigGs"] = jnp.zeros_like(params["sigGs"])
    g = jnp.zeros((n, h2, w2, 16))
    zp = generate_noisy_packed(jax.random.key(0), g, params, "pr", ori=True)
    full = np.asarray(d2s(zp))  # [n, 2*h2, 2*w2, 4]
    # each full-res row is constant across W per channel
    row_std = full.std(axis=2)
    np.testing.assert_allclose(row_std, 0.0, atol=1e-7)
    # row noise magnitude matches sigR / span
    span = float(np.asarray(params["wp"] - params["bl"])[0])
    sig_expected = float(params["sigR"][0]) / span
    assert abs(full.std() / sig_expected - 1.0) < 0.05

    # full-code statistical parity with the unpacked generator
    params2 = make_params(n, ratio=100.0)
    y = jnp.full((n, 2 * h2, 2 * w2, 4), 0.002)
    z_unpacked = np.asarray(generate_noisy(jax.random.key(1), y, params2, "pgrq"))
    z_packed = np.asarray(
        d2s(generate_noisy_packed(jax.random.key(2), s2d(y), params2, "pgrq"))
    )
    assert abs(z_packed.mean() - z_unpacked.mean()) < 0.01
    assert abs(z_packed.std() / z_unpacked.std() - 1.0) < 0.03
