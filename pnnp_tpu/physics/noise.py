"""The noise synthesis engine: fused, batched, on-device.

Implements the reference's ``noise_code`` char-DSL generator
(reference: data_process/process.py:591-673) as one vectorized JAX function.
The noise code is a *static* string, so each code compiles to a distinct fused
XLA program with zero branching at run time:

    p = Poisson shot noise        g = Tukey-lambda read (else Gaussian sigGs)
    r = per-(channel,row) noise   q = uniform quantization noise
    d = per-channel dark bias     b = black-frame mode (no read/row/q/d)

Composition (ADU domain): ``z = (shot + read + row + quant + bias) / (wp-bl)``,
clipped to ``[-bl/wp, 1]`` (sensor floor) or ``[0, 1]``, then scaled by the
exposure ratio unless ``ori``.

Layout is NHWC: images ``[n, h, w, 4]`` RGBG, params ``[n]`` per-example
(from :mod:`pnnp_tpu.physics.sampling`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pnnp_tpu.config import NoiseCode
from pnnp_tpu.ops.poisson import poisson_sample
from pnnp_tpu.ops.tukey import tukeylambda_sample
from pnnp_tpu.physics.sampling import params_at_iso_regression
from pnnp_tpu.physics import calibration as calib


def _b(x: jnp.ndarray, ndim: int = 4) -> jnp.ndarray:
    """Broadcast a [n] param vector against [n, h, w, c] images."""
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def generate_noisy(
    key: jax.Array,
    y: jnp.ndarray,
    params: dict,
    noise_code: str = "p",
    mfm: float = 1.0,
    ori: bool = False,
    clip: bool = False,
) -> jnp.ndarray:
    """Synthesize a noisy observation from clean RGBG ``y`` in [0, 1].

    Port of ``generate_noisy_torch`` (reference: process.py:634-673) with the
    numpy path's black-frame semantics (row/quant/bias suppressed under 'b',
    reference: process.py:609-622). ``mfm`` is MultiFrameMean.
    """
    n, h, w, c = y.shape

    def row_fn(k_row, MFM):
        # Row noise: one draw per (example, row, channel), broadcast over w.
        return jax.random.normal(k_row, (n, h, 1, c)) * _b(params["sigR"]) / MFM

    bias_fn = lambda: params["bias"][:, None, None, :]
    return _generate_noisy_core(key, y, params, noise_code, mfm, ori, clip,
                                row_fn, bias_fn)


def _generate_noisy_core(key, y, params, noise_code, mfm, ori, clip,
                         row_fn, bias_fn):
    """Shared physics of :func:`generate_noisy` / :func:`generate_noisy_packed`
    — everything except the layout-dependent row-noise draw and bias
    broadcast, which the wrappers inject (both are traced; zero runtime
    cost)."""
    nc = NoiseCode(noise_code)
    use_r, use_q, use_tl = nc.row, nc.quant, nc.read_tukey
    use_p, use_d, use_black = nc.shot_poisson, nc.dark_bias, nc.black_mode

    k_shot, k_read, k_row, k_quant = jax.random.split(key, 4)
    MFM = jnp.float32(mfm) ** 0.5

    scale = params["wp"] - params["bl"]  # [n]
    y_adu = y * _b(scale) / _b(params["ratio"])
    K = _b(params["K"])

    if use_p:
        lam_shot = jnp.maximum(MFM * y_adu / K, 0.0)
        shot = poisson_sample(k_shot, lam_shot) * K / MFM
    else:
        # Gaussian stand-in for shot noise: variance y*K/MFM, consistent with
        # the Poisson branch under M-frame averaging. (The reference's unused
        # fallback, process.py:652, carries an extra 1/sqrt(MFM) and scales
        # the mean; every reference recipe uses 'p', so we match the Poisson
        # branch's physics instead.)
        std = jnp.sqrt(jnp.maximum(MFM * y_adu / K, 1e-10))
        shot = y_adu + jax.random.normal(k_shot, y.shape) * std * K / MFM

    if use_black:
        read = row = quant = bias = 0.0
    else:
        if use_tl:
            read = tukeylambda_sample(
                k_read, _b(params["lam"]), _b(params["sigTL"]) / MFM, y.shape
            )
        else:
            read = jax.random.normal(k_read, y.shape) * _b(params["sigGs"]) / MFM
        row = row_fn(k_row, MFM) if use_r else 0.0
        if use_q:
            quant = (jax.random.uniform(k_quant, y.shape) - 0.5) * _b(params["q"] * scale)
        else:
            quant = 0.0
        bias = bias_fn() if use_d else 0.0

    z = (shot + read + row + quant + bias) / _b(scale)
    if clip:
        z = jnp.clip(z, 0.0, 1.0)
    else:
        z = jnp.clip(z, _b(-params["bl"] / params["wp"]), 1.0)
    if not ori:
        z = z * _b(params["ratio"])
    return z


def generate_noisy_packed(
    key: jax.Array,
    g: jnp.ndarray,
    params: dict,
    noise_code: str = "p",
    mfm: float = 1.0,
    ori: bool = False,
    clip: bool = False,
) -> jnp.ndarray:
    """:func:`generate_noisy` over the 4x4-superpixel (s2d) packed layout.

    ``g`` is ``[n, h, w, 16]`` with channels ``(2*aH + aW)*4 + c`` (see
    models/unet_s2d.s2d). Per-pixel noise components are layout-independent;
    the row-noise component is drawn per (full-resolution row, RGBG channel)
    — i.e. per (h, aH, c) — and broadcast across aW and w, preserving the
    exact banding structure of the unpacked generator. Enables fully-packed
    training pipelines (no device-side relayout of 4-lane tensors).
    """
    n, h, w, c16 = g.shape
    assert c16 == 16, "packed layout has 16 channels"

    def row_fn(k_row, MFM):
        # per (example, packed-row, aH, channel); broadcast over (w, aW)
        r = jax.random.normal(k_row, (n, h, 1, 2, 1, 4)) * (
            params["sigR"].reshape(-1, 1, 1, 1, 1, 1) / MFM
        )
        return jnp.broadcast_to(r, (n, h, 1, 2, 2, 4)).reshape(n, h, 1, 16)

    bias_fn = lambda: jnp.tile(params["bias"], (1, 4))[:, None, None, :]
    return _generate_noisy_core(key, g, params, noise_code, mfm, ori, clip,
                                row_fn, bias_fn)


def _k_and_wp_for(key, camera_type: str, iso: jnp.ndarray | None, n: int = 1):
    """Per-example (K, wp, bl) at given float ISOs, table or regression
    fallback; ``iso=None`` -> the table's top-ISO Kmax with +-1% jitter
    (reference: process.py:517-518)."""
    if iso is None:
        table = calib.ISO_TABLES[camera_type]
        K = jnp.full((n,), table["Kmax"][-1]) * (
            1.0 + jax.random.uniform(key, (n,), minval=-0.01, maxval=0.01)
        )
        return K, jnp.full((n,), table["wp"]), jnp.full((n,), table["bl"])
    if camera_type == "SonyA7S2":
        p = params_at_iso_regression(key, camera_type, iso)
        return p["K"], p["wp"], p["bl"]
    table = calib.ISO_TABLES[camera_type]
    iso_arr = jnp.asarray(table["iso"])
    idx = jnp.argmin(jnp.abs(iso[:, None] - iso_arr[None, :]), axis=1)
    kmax = jnp.asarray(table["Kmax"])[idx]
    jit = 1.0 + jax.random.uniform(key, iso.shape, minval=-0.01, maxval=0.01)
    n = iso.shape[0]
    return kmax * jit, jnp.full((n,), table["wp"]), jnp.full((n,), table["bl"])


def sna(
    key: jax.Array,
    gt: jnp.ndarray,
    aug_wb: jnp.ndarray,
    camera_type: str = "IMX686",
    ratio: jnp.ndarray | float = 1.0,
    iso: jnp.ndarray | None = None,
    black_lr: bool | jnp.ndarray = False,
    ori: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shot-Noise-Augmentation: brightness/WB delta plus matched Poisson noise.

    Port of ``SNA_torch`` (reference: process.py:562-588), batched over
    ``gt [n, h, w, 4]`` with per-example ``aug_wb [n, 4]`` (RGBG channel
    gains), ``ratio [n]``, ``iso [n]``. ``black_lr`` may be a python bool or
    a per-example [n] 0/1 array (batches can mix pasted bias frames with
    paired data, reference: phone_datasets.py:585-600). Returns ``(dn, dy)``:
    the noise delta for the LR image and the signal delta for the GT.
    """
    n = gt.shape[0]
    k_p, k_shot = jax.random.split(key)
    ratio = jnp.broadcast_to(jnp.asarray(ratio, jnp.float32), (n,))
    K, wp, bl = _k_and_wp_for(
        k_p, camera_type,
        None if iso is None else jnp.asarray(iso, jnp.float32), n=n)

    scale = wp - bl
    gt_adu = gt * _b(scale) / _b(ratio)
    dy = gt_adu * aug_wb[:, None, None, :]
    Kb = _b(K)
    dn = poisson_sample(k_shot, jnp.maximum(dy / Kb, 0.0)) * Kb
    # LR is a pasted black frame: remove the extra Poisson component the GT
    # already carries (reference: process.py:581). Per-example mask so mixed
    # batches (1-in-5 bias paste) stay one compiled program.
    black = jnp.broadcast_to(jnp.asarray(black_lr, jnp.float32), (n,))
    dy = dy - gt_adu * _b(black)
    dy = dy * _b(ratio) / _b(scale)
    dn = dn / _b(scale)
    if not ori:
        dn = dn * _b(ratio)
    return dn, dy


def raw_wb_aug(
    key: jax.Array,
    noisy: jnp.ndarray,
    gt: jnp.ndarray,
    aug_wb: jnp.ndarray | None,
    camera_type: str = "IMX686",
    ratio: jnp.ndarray | float = 1.0,
    iso: jnp.ndarray | None = None,
    ori: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gain-only white-balance augmentation of a *real* noisy/clean pair.

    Port of ``raw_wb_aug_torch`` (reference: process.py:504-560), gain-only
    branch (the reference raises NotImplementedError for reductions). Batched
    like :func:`sna`.
    """
    n = gt.shape[0]
    ratio = jnp.broadcast_to(jnp.asarray(ratio, jnp.float32), (n,))
    if aug_wb is None:
        if not ori:
            noisy = noisy * _b(ratio)
        return noisy, gt

    k_p, k_shot = jax.random.split(key)
    K, wp, bl = _k_and_wp_for(
        k_p, camera_type,
        None if iso is None else jnp.asarray(iso, jnp.float32), n=n)

    scale = wp - bl
    gt_adu = gt * _b(scale) / _b(ratio)
    noisy_adu = noisy * _b(scale)
    dy = gt_adu * aug_wb[:, None, None, :]
    Kb = _b(K)
    dn = poisson_sample(k_shot, jnp.maximum(dy / Kb, 0.0)) * Kb
    gt_out = jnp.clip((gt_adu + dy) * _b(ratio), 0.0, _b(scale)) / _b(scale)
    noisy_out = jnp.clip(noisy_adu + dn, _b(-bl), _b(scale)) / _b(scale)
    if not ori:
        noisy_out = noisy_out * _b(ratio)
    return noisy_out, gt_out


def random_gains(key: jax.Array, camera_type: str = "SonyA7S2", n: int = 1):
    """Random brightening + WB gains with the camera-fit blue polynomial.

    Port of ``random_gains`` (reference: data_process/unprocess.py:60-77).
    Returns ``(rgb_gain, red_gain, blue_gain)`` each ``[n]``.
    """
    k1, k2 = jax.random.split(key)
    rgb_gain = 1.0 / (0.8 + 0.1 * jax.random.normal(k1, (n,)))
    if camera_type == "SonyA7S2":
        red_gain = jax.random.uniform(k2, (n,), minval=1.75, maxval=2.65)
        poly = (14.65, -9.63942308, 1.80288462)
    elif camera_type == "IMX686":
        red_gain = jax.random.uniform(k2, (n,), minval=1.4, maxval=2.3)
        poly = (6.14381188, -3.65620261, 0.70205967)
    else:
        raise NotImplementedError(camera_type)
    blue_gain = poly[0] + poly[1] * red_gain + poly[2] * red_gain**2
    return rgb_gain, red_gain, blue_gain


def get_aug_param(
    key: jax.Array,
    wb: jnp.ndarray,
    n: int = 8,
    command: str = "augv5",
    camera_type: str = "SonyA7S2",
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """WB-augmentation gain sampler (reference: process.py:415-445).

    ``wb`` is the batch's camera white balance ``[n, 4]`` (RGBG). Returns
    per-example ``(aug_r, aug_g, aug_b)`` deltas, jointly shifted so all are
    >= -0 after the non-negativity renormalization.
    """
    ks = jax.random.split(key, 8)
    r = jax.random.randint(ks[0], (), 0, 2).astype(jnp.float32) * 0.25 + 0.25
    u = r
    do_aug = jax.random.randint(ks[1], (), 0, 4) > 0

    aug_r = jnp.zeros((n,))
    aug_g = jnp.zeros((n,))
    aug_b = jnp.zeros((n,))
    if "augv5" in command:
        rgb_gain, red_gain, blue_gain = random_gains(ks[2], camera_type, 1)
        rgb_gain = 1.0 / rgb_gain
        rg = wb[:, 0] / red_gain[0]
        bg = wb[:, 2] / blue_gain[0]
        aug_g5 = jax.random.uniform(ks[3], (n,)) * r + rgb_gain[0] - 0.9
        aug_r5 = jax.random.uniform(ks[4], (n,)) * r + rg * (1 + aug_g5) - 1.1
        aug_b5 = jax.random.uniform(ks[5], (n,)) * r + bg * (1 + aug_g5) - 1.1
        aug_r, aug_g, aug_b = aug_r5, aug_g5, aug_b5
    elif "augv2" in command:
        aug_g2 = jnp.clip(jax.random.normal(ks[3], (n,)) * r, 0.0, 4 * u)
        aug_r2 = jnp.clip((1 + jax.random.normal(ks[4], (n,)) * r) * (1 + aug_g2) - 1, 0.0, 4 * u)
        aug_b2 = jnp.clip((1 + jax.random.normal(ks[5], (n,)) * r) * (1 + aug_g2) - 1, 0.0, 4 * u)
        aug_r, aug_g, aug_b = aug_r2, aug_g2, aug_b2

    zero = jnp.zeros((n,))
    aug_r = jnp.where(do_aug, aug_r, zero)
    aug_g = jnp.where(do_aug, aug_g, zero)
    aug_b = jnp.where(do_aug, aug_b, zero)

    # Joint shift so the minimum channel delta is >= 0 (reference:435-440).
    daug = jnp.minimum(jnp.minimum(aug_r, aug_g), aug_b)
    daug = jnp.minimum(daug, 0.0)
    aug_r = (1 + aug_r) / (1 + daug) - 1
    aug_g = (1 + aug_g) / (1 + daug) - 1
    aug_b = (1 + aug_b) / (1 + daug) - 1
    return aug_r, aug_g, aug_b
