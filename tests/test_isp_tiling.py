"""ISP pipeline, halo tiling, and illuminance correction tests."""

import jax.numpy as jnp
import numpy as np

from pnnp_tpu.ops import (
    process,
    simple_isp,
    fast_isp,
    bilinear_demosaic,
    eval_crop,
    eval_merge,
    tiled_apply,
    illuminance_correct,
)


def oracle_process(bayer_nhwc, wb, ccm, gamma=2.2):
    """NumPy oracle for the reference's batched raw->sRGB pipeline
    (data_process/process.py:142-155)."""
    x = bayer_nhwc * wb[:, None, None, :]
    x = np.clip(x, 0, 1)
    rgb = np.stack([x[..., 0], 0.5 * (x[..., 1] + x[..., 3]), x[..., 2]], axis=-1)
    rgb = np.einsum("nhwc,nkc->nhwk", rgb, ccm)
    rgb = np.clip(rgb, 0, 1)
    out = np.maximum(rgb, 1e-8) ** (1 / gamma)
    out = np.clip((out * 255).astype(np.int32), 0, 255).astype(np.float32) / 255
    return out


def test_process_matches_oracle(rng):
    x = rng.uniform(0, 1.2, (2, 8, 10, 4)).astype(np.float32)
    wb = rng.uniform(1, 2.5, (2, 4)).astype(np.float32)
    wb[:, 1] = wb[:, 3] = 1.0
    ccm = np.stack([np.eye(3, dtype=np.float32)] * 2)
    ours = np.asarray(process(jnp.asarray(x), jnp.asarray(wb), jnp.asarray(ccm)))
    ref = oracle_process(x, wb, ccm)
    np.testing.assert_allclose(ours, ref, atol=1 / 255 + 1e-6)


def test_simple_isp_shape(rng):
    rggb = rng.integers(512, 16383, (16, 16, 4)).astype(np.float32)
    out = np.asarray(simple_isp(jnp.asarray(rggb)))
    assert out.shape == (16, 16, 3)
    assert out.min() >= 0 and out.max() <= 1


def test_bilinear_demosaic_constant_image():
    # A constant mosaic must demosaic to the same constant in every channel.
    mosaic = jnp.full((16, 20), 0.5)
    out = np.asarray(bilinear_demosaic(mosaic))
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_fast_isp_shapes(rng):
    img4c = rng.uniform(0, 1, (8, 12, 4)).astype(np.float32)
    out = np.asarray(fast_isp(jnp.asarray(img4c)))
    assert out.shape == (16, 24, 3)


def test_eval_crop_merge_roundtrip(rng):
    # identity network => merge(crop(x)) == x, for reference-style geometry
    h, w, c = 250, 340, 4
    x = rng.standard_normal((h, w, c)).astype(np.float32)
    patch, base = 128, 64
    tiles = eval_crop(jnp.asarray(x), patch, base)
    l = patch - base
    assert tiles.shape == ((h // l + 1) * (w // l + 1), patch, patch, c)
    merged = np.asarray(eval_merge(tiles, (h, w), base))
    np.testing.assert_allclose(merged, x, rtol=1e-6)


def test_tiled_apply_linear_fn(rng):
    x = rng.standard_normal((200, 260, 4)).astype(np.float32)
    out = np.asarray(tiled_apply(lambda t: 2.0 * t, jnp.asarray(x), 128, 64, tile_batch=4))
    np.testing.assert_allclose(out, 2 * x, rtol=1e-6)


def test_illuminance_correct_matches_oracle(rng):
    pred = rng.uniform(0, 1.4, (2, 16, 16, 4)).astype(np.float32)
    src = rng.uniform(0, 1, (2, 16, 16, 4)).astype(np.float32)
    src[0, :4, :4] = 1.0  # saturated region must be excluded from the fit
    ours = np.asarray(illuminance_correct(jnp.asarray(pred), jnp.asarray(src)))
    for i in range(2):
        p = np.clip(pred[i], 0, 1)
        mask = src[i] != 1
        num = np.dot(p[mask], src[i][mask])
        den = np.dot(p[mask], p[mask])
        np.testing.assert_allclose(ours[i], num / den * p, rtol=1e-5)


def test_illuminance_correct_recovers_scale(rng):
    src = rng.uniform(0.05, 0.6, (12, 12, 4)).astype(np.float32)
    pred = np.clip(src * 0.7, 0, 1)
    out = np.asarray(illuminance_correct(jnp.asarray(pred), jnp.asarray(src)))
    np.testing.assert_allclose(out, src, rtol=1e-3)
