"""Unprocessing, filters, HBR-Tukey, WB-aug statistical coverage."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from pnnp_tpu.ops.filters import stdfilt, guided_filter, row_denoise
from pnnp_tpu.physics import HighBitRecovery, get_aug_param, raw_wb_aug
from pnnp_tpu.physics.unprocess import (
    unprocess,
    inverse_smoothstep,
    gamma_expansion,
    mosaic_rggb,
    random_noise_levels,
)


def test_unprocess_pipeline(rng):
    img = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
    raw, meta = unprocess(jax.random.key(0), img, camera_type="IMX686")
    assert raw.shape == img.shape
    assert float(jnp.min(raw)) >= 0 and float(jnp.max(raw)) <= 1
    assert meta["cam2rgb"].shape == (3, 3)
    # smoothstep inverse: forward smoothstep(s(x)) == x
    x = jnp.linspace(0.01, 0.99, 17)
    s = inverse_smoothstep(x)
    fwd = 3 * s**2 - 2 * s**3  # smoothstep
    np.testing.assert_allclose(np.asarray(fwd), np.asarray(x), atol=1e-5)
    # gamma expansion is monotone power 2.2
    np.testing.assert_allclose(
        np.asarray(gamma_expansion(jnp.asarray([0.5]))), [0.5**2.2], rtol=1e-5
    )


def test_mosaic_rggb(rng):
    img = jnp.asarray(rng.uniform(0, 1, (6, 8, 3)).astype(np.float32))
    m = mosaic_rggb(img)
    assert m.shape == (3, 4, 4)
    # channel order: [R, G_red, B, G_blue] (reference: unprocess.py:123-144)
    np.testing.assert_array_equal(np.asarray(m[..., 0]), np.asarray(img[0::2, 0::2, 0]))
    np.testing.assert_array_equal(np.asarray(m[..., 1]), np.asarray(img[0::2, 1::2, 1]))
    np.testing.assert_array_equal(np.asarray(m[..., 2]), np.asarray(img[1::2, 1::2, 2]))
    np.testing.assert_array_equal(np.asarray(m[..., 3]), np.asarray(img[1::2, 0::2, 1]))


def test_random_noise_levels_ranges():
    shot, read = random_noise_levels(jax.random.key(0))
    assert 1e-4 <= float(shot) <= 0.012
    assert float(read) > 0


def test_stdfilt_constant_zero():
    img = jnp.full((16, 16), 3.0)
    np.testing.assert_allclose(np.asarray(stdfilt(img)), 0.0, atol=1e-5)


def test_guided_filter_matches_scipy_oracle(rng):
    from scipy.ndimage import uniform_filter

    img = rng.uniform(0, 1, (12, 14)).astype(np.float32)

    def gf_ref(I, p, k=5, eps=0.01):
        f = lambda x: uniform_filter(x, size=k, mode="nearest")
        mI, mp = f(I), f(p)
        vI = f(I * I) - mI * mI
        cIp = f(I * p) - mI * mp
        a = cIp / (vI + eps)
        b = mp - a * mI
        return f(a) * I + f(b)

    ours = np.asarray(guided_filter(jnp.asarray(img), jnp.asarray(img), 5, 0.01))
    np.testing.assert_allclose(ours, gf_ref(img, img), atol=1e-5)


def test_row_denoise_removes_banding(rng):
    H, W = 32, 64
    clean = rng.uniform(0.2, 0.3, (H, W)).astype(np.float32)
    fpn = np.zeros((H, W), np.float32)
    rows = rng.normal(0, 0.2, (H // 2,)).astype(np.float32)
    fpn[0::2] += rows[:, None]  # banding on even Bayer rows
    noisy = clean + fpn
    out = np.asarray(row_denoise(jnp.asarray(noisy), sigma_s=5.0, sigma_r=0.6))
    res_before = np.std(noisy[0::2].mean(axis=1))
    res_after = np.std(out[0::2].mean(axis=1))
    assert res_after < res_before * 0.5


def test_hbr_tukey_mode():
    hbr = HighBitRecovery(camera_type="IMX686", noise_code="pgrq", perturb=False)
    hbr.get_lut([6400])
    lut = hbr.lut[6400]
    assert lut["use_tl"]
    rng = np.random.default_rng(1)
    lam, sig = float(lut["lam"]), float(lut["scale"])
    raw = np.round(stats.tukeylambda.rvs(lam, scale=sig, size=(128, 128),
                                         random_state=rng)).astype(np.float32)
    span = float(lut["param"]["wp"]) - float(lut["param"]["bl"])
    mapped = np.asarray(hbr.map(jax.random.key(0), jnp.asarray(raw / span), iso=6400)) * span
    ref_std = stats.tukeylambda.std(lam) * sig
    assert abs(mapped.std() / ref_std - 1.0) < 0.05


def test_get_aug_param_nonneg(rng):
    wb = jnp.tile(jnp.asarray([[2.0, 1.0, 1.6, 1.0]]), (16, 1))
    for cmd in ("augv5", "augv2"):
        for seed in range(4):
            r, g, b = get_aug_param(jax.random.key(seed), wb, 16, cmd, "SonyA7S2")
            m = np.minimum(np.minimum(np.asarray(r), np.asarray(g)), np.asarray(b))
            assert m.min() >= -1e-5, (cmd, seed, m.min())


def test_raw_wb_aug_gain_only(rng):
    gt = jnp.full((2, 16, 16, 4), 0.3)
    noisy = gt + 0.01
    aug = jnp.tile(jnp.asarray([[0.2, 0.0, 0.1, 0.0]]), (2, 1))
    iso = jnp.full((2,), 6400.0)
    out_n, out_g = raw_wb_aug(jax.random.key(0), noisy, gt, aug,
                              camera_type="IMX686", ratio=2.0, iso=iso, ori=True)
    # gt gains exactly: gt' = clip((gt_adu + gt_adu*aug)*ratio)/span
    expected_r = float(jnp.clip(0.3 * 1.2, 0, 1))
    np.testing.assert_allclose(np.asarray(out_g)[..., 0], expected_r, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_g)[..., 1], 0.3, rtol=1e-4)
    # noisy channel means shift by ~ gt/ratio*aug
    d = np.asarray(out_n - noisy).mean(axis=(0, 1, 2))
    np.testing.assert_allclose(d, [0.3 / 2 * 0.2, 0, 0.3 / 2 * 0.1, 0], atol=0.01)
