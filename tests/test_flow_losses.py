"""Flow-heritage losses (EPE/ternary/Sobel) vs NumPy oracles; AlgoDebugger
contact sheets. Parity target: reference losses/flow_loss.py and
utils/__init__.py:8-56 (AlgoDebugger)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pnnp_tpu.train.flow_losses import epe_loss, sobel_loss, ternary_loss


def _np_census(gray, patch=7):
    n, h, w, _ = gray.shape
    pad = patch // 2
    gp = np.pad(gray[..., 0], ((0, 0), (pad, pad), (pad, pad)))
    out = np.zeros((n, h, w, patch * patch), np.float32)
    idx = 0
    for dy in range(patch):
        for dx in range(patch):
            out[..., idx] = gp[:, dy : dy + h, dx : dx + w]
            idx += 1
    t = out - gray
    return t / np.sqrt(0.81 + t * t)


def test_ternary_oracle():
    rng = np.random.default_rng(0)
    a = rng.random((2, 12, 16, 3)).astype(np.float32)
    b = rng.random((2, 12, 16, 3)).astype(np.float32)
    w = np.array([0.2989, 0.5870, 0.1140], np.float32)
    ga = np.sum(a * w, -1, keepdims=True)
    gb = np.sum(b * w, -1, keepdims=True)
    d = (_np_census(ga) - _np_census(gb)) ** 2
    ham = np.mean(d / (0.1 + d), -1, keepdims=True)
    mask = np.zeros((2, 12, 16, 1), np.float32)
    mask[:, 1:-1, 1:-1] = 1.0
    want = ham * mask

    got = np.asarray(ternary_loss(jnp.asarray(a), jnp.asarray(b)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)
    # identical inputs -> zero map
    z = np.asarray(ternary_loss(jnp.asarray(a), jnp.asarray(a)))
    assert np.abs(z).max() == 0.0


def test_epe_and_sobel_oracle():
    rng = np.random.default_rng(1)
    f = rng.standard_normal((1, 8, 9, 2)).astype(np.float32)
    g = rng.standard_normal((1, 8, 9, 2)).astype(np.float32)
    m = (rng.random((1, 8, 9, 1)) > 0.5).astype(np.float32)
    want = np.sqrt(np.sum((f - g) ** 2, -1, keepdims=True) + 1e-6) * m
    got = np.asarray(epe_loss(jnp.asarray(f), jnp.asarray(g), jnp.asarray(m)))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    kx = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)

    def conv2(img, k):
        h, w = img.shape
        ip = np.pad(img, 1)
        out = np.zeros_like(img)
        for y in range(h):
            for x in range(w):
                out[y, x] = np.sum(ip[y : y + 3, x : x + 3] * k)
        return out

    p = rng.standard_normal((1, 8, 9, 1)).astype(np.float32)
    q = rng.standard_normal((1, 8, 9, 1)).astype(np.float32)
    want = np.abs(conv2(p[0, ..., 0], kx) - conv2(q[0, ..., 0], kx)) + np.abs(
        conv2(p[0, ..., 0], kx.T) - conv2(q[0, ..., 0], kx.T))
    got = np.asarray(sobel_loss(jnp.asarray(p), jnp.asarray(q)))[0, ..., 0]
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_algo_debugger_sheets(tmp_path):
    from pnnp_tpu.utils.debugger import AlgoDebugger

    rng = np.random.default_rng(2)
    img = rng.random((24, 32, 3)).astype(np.float32)
    dbg = AlgoDebugger()
    paths = dbg.debug([img], out_dir=str(tmp_path), steps=3)
    assert len(paths) == 2  # one sheet per trackbar (d, eps)
    import os

    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_algo_debugger_custom_algo(tmp_path):
    from pnnp_tpu.utils.debugger import AlgoDebugger

    calls = []

    def algo(img, gain):
        calls.append(gain)
        return np.clip(img * gain, 0, 1)

    dbg = AlgoDebugger({
        "algo": algo,
        "win_name": "gain",
        "trackbar": {"g": {"default": 10, "max_num": 20,
                           "func": lambda x: x / 10.0}},
    })
    img = np.full((8, 8, 3), 0.25, np.float32)
    paths = dbg.debug([img], out_dir=str(tmp_path), steps=3)
    assert len(paths) == 1
    assert any(abs(g - 2.0) < 1e-9 for g in calls)  # max position swept
