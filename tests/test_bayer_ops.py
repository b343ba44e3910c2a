"""Bayer pack/unpack parity with the reference's NumPy semantics."""

import jax.numpy as jnp
import numpy as np

from pnnp_tpu.ops import (
    pack_bayer,
    unpack_bayer,
    bayer2rggb,
    rggb2bayer,
    bayer2rows,
    rows2bayer,
    raw2bayer,
    bayer2raw,
)


def ref_raw2bayer(raw, wp=1023, bl=64, norm=True, clip=False, bias=np.zeros(4)):
    """NumPy oracle implementing reference utils/isp_ops.py:84-96 semantics."""
    raw = raw.astype(np.float32)
    H, W = raw.shape
    out = np.stack(
        (raw[0:H:2, 0:W:2], raw[0:H:2, 1:W:2], raw[1:H:2, 1:W:2], raw[1:H:2, 0:W:2]),
        axis=0,
    )
    if norm:
        blc = (bias + bl).reshape(4, 1, 1)
        out = (out - blc) / (wp - blc)
    if clip:
        out = np.clip(out, 0, 1)
    return out.astype(np.float32)


def test_pack_bayer_channel_order(rng):
    raw = rng.integers(0, 1024, (8, 12)).astype(np.float32)
    packed = np.asarray(pack_bayer(jnp.asarray(raw)))
    assert packed.shape == (4, 6, 4)
    np.testing.assert_array_equal(packed[..., 0], raw[0::2, 0::2])  # R
    np.testing.assert_array_equal(packed[..., 1], raw[0::2, 1::2])  # G1
    np.testing.assert_array_equal(packed[..., 2], raw[1::2, 1::2])  # B
    np.testing.assert_array_equal(packed[..., 3], raw[1::2, 0::2])  # G2


def test_pack_unpack_roundtrip(rng):
    raw = rng.standard_normal((2, 16, 24)).astype(np.float32)
    out = np.asarray(unpack_bayer(pack_bayer(jnp.asarray(raw))))
    np.testing.assert_array_equal(out, raw)


def test_rggb_roundtrip_and_order(rng):
    raw = rng.standard_normal((10, 14)).astype(np.float32)
    rggb = np.asarray(bayer2rggb(jnp.asarray(raw)))
    # Reference order: cell raster positions [ (0,0), (0,1), (1,0), (1,1) ]
    np.testing.assert_array_equal(rggb[..., 0], raw[0::2, 0::2])
    np.testing.assert_array_equal(rggb[..., 1], raw[0::2, 1::2])
    np.testing.assert_array_equal(rggb[..., 2], raw[1::2, 0::2])
    np.testing.assert_array_equal(rggb[..., 3], raw[1::2, 1::2])
    np.testing.assert_array_equal(np.asarray(rggb2bayer(jnp.asarray(rggb))), raw)


def test_rows_roundtrip(rng):
    raw = rng.standard_normal((12, 8)).astype(np.float32)
    rows = np.asarray(bayer2rows(jnp.asarray(raw)))
    np.testing.assert_array_equal(rows[0], raw[0::2])
    np.testing.assert_array_equal(rows[1], raw[1::2])
    np.testing.assert_array_equal(np.asarray(rows2bayer(jnp.asarray(rows))), raw)


def test_raw2bayer_matches_reference(rng):
    raw = rng.integers(0, 16384, (32, 48)).astype(np.float32)
    bias = np.array([0.5, -0.25, 0.0, 1.0], np.float32)
    ours = np.asarray(raw2bayer(jnp.asarray(raw), wp=16383, bl=512, bias=jnp.asarray(bias)))
    ref = ref_raw2bayer(raw, wp=16383, bl=512, bias=bias)
    np.testing.assert_allclose(ours, np.moveaxis(ref, 0, -1), rtol=1e-6)


def test_bayer2raw_matches_reference(rng):
    packed = rng.uniform(-0.2, 1.2, (16, 24, 4)).astype(np.float32)
    ours = np.asarray(bayer2raw(jnp.asarray(packed), wp=16383, bl=512))
    clipped = np.clip(packed, 0, 1) * (16383 - 512) + 512
    H, W = 32, 48
    ref = np.empty((H, W), np.float32)
    ref[0::2, 0::2] = clipped[..., 0]
    ref[0::2, 1::2] = clipped[..., 1]
    ref[1::2, 1::2] = clipped[..., 2]
    ref[1::2, 0::2] = clipped[..., 3]
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
