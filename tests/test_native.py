"""Native C++ loader parity with the NumPy host path."""

import numpy as np
import pytest

from pnnp_tpu.data import pack_raw_np
from pnnp_tpu.data import native
from pnnp_tpu.data.crops import CropPlanner

pytestmark = pytest.mark.skipif(not native.available(), reason="librawproc.so not built")


def test_pack_full_matches_numpy(rng):
    raw = rng.integers(0, 16383, (64, 96)).astype(np.float32)
    ours = native.pack_full(raw, 16383.0, 512.0)
    ref = pack_raw_np(raw, 16383.0, 512.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_pack_full_with_darkshading_and_bias(rng):
    raw = rng.integers(0, 16383, (32, 48)).astype(np.float32)
    ds = rng.normal(0, 3, (32, 48)).astype(np.float32)
    bias = np.array([0.5, -0.25, 0.0, 1.0], np.float32)
    ours = native.pack_full(raw, 16383.0, 512.0, darkshading=ds, bias=bias, clip=True)
    ref = pack_raw_np(raw - ds, 16383.0, 512.0, clip=True, bias=bias)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_pack_crops_matches_numpy_path(rng):
    raw = rng.integers(0, 16383, (64, 96)).astype(np.float32)
    packed = pack_raw_np(raw, 16383.0, 512.0)
    planner = CropPlanner(32, 48, 8, 4, "random_crop", rng=np.random.default_rng(3))
    ref = planner.crop(packed)
    ours = native.pack_crops(
        raw, 16383.0, 512.0,
        planner.h_start, planner.w_start, planner.aug, 8,
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_pack_crops_ratio_and_halfclip(rng):
    raw = rng.integers(0, 16383, (32, 48)).astype(np.float32)
    packed = pack_raw_np(raw, 16383.0, 512.0) * 250.0
    packed = packed.clip(-np.inf, 1.0)
    hs, ws = np.array([0, 4]), np.array([0, 8])
    aug = np.array([0, 0])
    ours = native.pack_crops(
        raw, 16383.0, 512.0, hs, ws, aug, 8, clip_mode=2, ratio_mul=250.0
    )
    for i, (h0, w0) in enumerate(zip(hs, ws)):
        np.testing.assert_allclose(
            ours[i], packed[h0 : h0 + 8, w0 : w0 + 8], rtol=1e-4, atol=1e-5
        )


def test_pack_s2d_matches_jax_path(rng):
    import jax.numpy as jnp
    from pnnp_tpu.models.unet_s2d import s2d

    raw = rng.integers(0, 16383, (32, 48)).astype(np.float32)
    ours = native.pack_s2d(raw, 16383.0, 512.0)
    ref = np.asarray(s2d(jnp.asarray(pack_raw_np(raw, 16383.0, 512.0))[None]))[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
