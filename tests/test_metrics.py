"""PSNR/SSIM parity with the skimage algorithm (the reference's metric oracle).

skimage itself is not installed in this image, so the oracle re-derives
``structural_similarity``'s documented algorithm with scipy.ndimage's
``uniform_filter`` — the exact filter skimage uses internally — with the same
7x7 window, N/(N-1) covariance normalization, and (win-1)/2 border crop.
"""

import jax.numpy as jnp
import numpy as np
from scipy.ndimage import uniform_filter

from pnnp_tpu.ops import psnr, ssim
from pnnp_tpu.ops.tukey import tukeylambda_cdf, tukeylambda_ppf, tukeylambda_sample
from pnnp_tpu.ops.vst import vst, inverse_vst


def oracle_psnr(x, y, data_range=255.0):
    mse = np.mean((x.astype(np.float64) - y.astype(np.float64)) ** 2)
    return 10 * np.log10(data_range**2 / mse)


def oracle_ssim_single(x, y, data_range=255.0, win=7, k1=0.01, k2=0.03):
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    n = win * win
    cov_norm = n / (n - 1)
    f = lambda im: uniform_filter(im, size=win)
    ux, uy = f(x), f(y)
    uxx, uyy, uxy = f(x * x), f(y * y), f(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    pad = (win - 1) // 2
    return s[pad:-pad, pad:-pad].mean()


def oracle_ssim(x, y, data_range=255.0):
    return np.mean([oracle_ssim_single(x[..., c], y[..., c], data_range) for c in range(x.shape[-1])])


def make_pair(rng, shape=(64, 48, 3)):
    y = rng.uniform(0, 255, shape).astype(np.float32)
    x = np.clip(y + rng.normal(0, 12, shape), 0, 255).astype(np.float32)
    return x, y


def test_psnr_matches_skimage(rng):
    x, y = make_pair(rng)
    ours = float(psnr(jnp.asarray(x), jnp.asarray(y), 255.0))
    ref = oracle_psnr(y, x, data_range=255)
    assert abs(ours - ref) < 1e-3


def test_ssim_matches_skimage(rng):
    x, y = make_pair(rng)
    ours = float(ssim(jnp.asarray(x), jnp.asarray(y), 255.0))
    ref = oracle_ssim(y, x, data_range=255)
    assert abs(ours - ref) < 2e-5


def test_ssim_matches_skimage_4ch(rng):
    x, y = make_pair(rng, (40, 40, 4))
    ours = float(ssim(jnp.asarray(x), jnp.asarray(y), 255.0))
    ref = oracle_ssim(y, x, data_range=255)
    assert abs(ours - ref) < 2e-5


def test_tukeylambda_ppf_matches_scipy():
    from scipy import stats

    p = np.linspace(0.01, 0.99, 23)
    for lam in [-0.26, -0.025, 0.0, 0.015, 0.102, 0.1474653]:
        ours = np.asarray(tukeylambda_ppf(jnp.asarray(p, jnp.float32), lam))
        ref = stats.tukeylambda.ppf(p, lam)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_tukeylambda_cdf_matches_scipy():
    from scipy import stats

    x = np.linspace(-8, 8, 33)
    for lam in [-0.26, -0.025, 0.015, 0.102]:
        ours = np.asarray(tukeylambda_cdf(jnp.asarray(x, jnp.float32), lam))
        ref = stats.tukeylambda.cdf(x, lam)
        np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_tukeylambda_sample_moments():
    from scipy import stats
    import jax

    lam, scale = -0.025, 1.7
    s = np.asarray(tukeylambda_sample(jax.random.key(0), lam, scale, (200_000,)))
    ref_var = stats.tukeylambda.var(lam) * scale**2
    assert abs(np.mean(s)) < 0.02
    assert abs(np.var(s) / ref_var - 1.0) < 0.02


def test_vst_roundtrip():
    x = jnp.linspace(0.01, 1.0, 50)
    sigma, gain = 2.0, 0.5
    y = vst(x, sigma, gain=gain)
    x2 = inverse_vst(y, sigma, gain=gain)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-5)


def test_rgb_quality_matches_numpy_isp_oracle():
    """rgb_quality (device ISP render + PSNR/SSIM) vs a full independent
    NumPy pipeline: WB -> mosaic -> bilinear demosaic -> CCM -> gamma ->
    uint8 -> skimage-style metrics (the reference's disabled RGB-metrics
    eval option, trainer_SID.py:272)."""
    from scipy.signal import convolve2d

    from pnnp_tpu.ops.metrics import rgb_quality
    from pnnp_tpu.ops.isp import SONY_CCM

    rng = np.random.default_rng(11)
    h, w = 24, 32
    a4 = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    b4 = np.clip(a4 + rng.normal(0, 0.05, a4.shape), 0, 1).astype(np.float32)
    wb = np.array([1.9, 1.0, 1.7, 1.0], np.float32)
    ccm = np.asarray(SONY_CCM)

    def np_isp(img4c):
        x = np.clip(img4c * np.array([wb[0], 1, wb[2], 1], np.float32), 0, 1)
        # RGBG [R,G1,B,G2] -> 2x2 cells [R,G1,G2,B] -> mosaic
        cells = x[..., [0, 1, 3, 2]].reshape(h, w, 2, 2)
        mosaic = np.moveaxis(cells, 2, 1).reshape(2 * h, 2 * w)
        ii, jj = np.mgrid[0 : 2 * h, 0 : 2 * w]
        r_m = ((ii % 2 == 0) & (jj % 2 == 0)).astype(np.float64)
        b_m = ((ii % 2 == 1) & (jj % 2 == 1)).astype(np.float64)
        g_m = 1.0 - r_m - b_m
        k_g = np.array([[0, 1, 0], [1, 4, 1], [0, 1, 0]], np.float64) / 4
        k_rb = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float64) / 4
        conv = lambda im, k: convolve2d(im, k, mode="same")
        r = conv(mosaic * r_m, k_rb) / np.maximum(conv(r_m, k_rb), 1e-8)
        g = conv(mosaic * g_m, k_g) / np.maximum(conv(g_m, k_g), 1e-8)
        b = conv(mosaic * b_m, k_rb) / np.maximum(conv(b_m, k_rb), 1e-8)
        rgb = np.stack([r, g, b], -1) @ ccm.T
        srgb = np.clip(rgb, 0, 1) ** (1 / 2.2)
        return np.floor(np.clip(srgb, 0, 1) * 255.0)

    ia, ib = np_isp(a4), np_isp(b4)
    p_ref = oracle_psnr(ia, ib)
    s_ref = oracle_ssim(ia, ib)

    p, s = rgb_quality(jnp.asarray(a4), jnp.asarray(b4), wb=jnp.asarray(wb),
                       ccm=jnp.asarray(ccm))
    assert abs(float(p) - p_ref) < 5e-2, (float(p), p_ref)
    assert abs(float(s) - s_ref) < 1e-3, (float(s), s_ref)


def test_kld_device_matches_host_at_saturation():
    """Device bincount KLD must merge the integers wp-1 and wp into one bin
    like np.histogram does on the host (regression: wp+1 bins made device
    KLD differ from kl_div_norm exactly when mass sits at the clip ceiling)."""
    import numpy as np
    from pnnp_tpu.ops.kld import kl_div_norm, kl_div_norm_device

    rng = np.random.default_rng(0)
    wp, bl = 63, 8
    # heavy mass at the ceiling: half the samples saturate
    p = np.concatenate([rng.integers(0, wp + 1, 4000),
                        np.full(4000, wp)]).astype(np.float32) - bl
    q = np.concatenate([rng.integers(0, wp + 1, 6000),
                        np.full(2000, wp)]).astype(np.float32) - bl
    host = kl_div_norm(p.copy(), q.copy(), bl=bl, wp=wp)
    dev = kl_div_norm_device(jnp.asarray(p), jnp.asarray(q), bl=bl, wp=wp)
    for k in ("kl_fwd", "kl_inv", "kl_sym"):
        np.testing.assert_allclose(float(dev[k]), float(host[k]), rtol=1e-5,
                                   atol=1e-7)
