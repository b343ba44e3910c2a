"""W8A8 int8 serving path: skeleton parity, integer exactness, deviation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnnp_tpu.models import UNetSeeInDark
from pnnp_tpu.models.unet_s2d import (
    transform_params_hybrid,
    unet_hybrid_forward_packed,
)
from pnnp_tpu.models.unet_s2d_int8 import (
    QUANT_LAYERS,
    calibrate_act_scales,
    quantize_params_int8,
    unet_hybrid_forward_packed_int8,
    unet_hybrid_forward_packed_ref,
)


@pytest.fixture(scope="module")
def setup():
    model = UNetSeeInDark(nf=32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    params = jax.tree.map(lambda a: a * 5.0, params)  # off the tiny init
    tparams = transform_params_hybrid(params, jnp.bfloat16)
    g1 = jax.random.uniform(jax.random.key(1), (1, 32, 48, 16)) * 0.5
    return tparams, g1


def test_int8_skeleton_matches_bf16_path(setup):
    """_walk with no quantization must equal the production bf16 forward."""
    tparams, g1 = setup
    a = np.asarray(unet_hybrid_forward_packed(tparams, g1))
    b = np.asarray(unet_hybrid_forward_packed_ref(tparams, g1))
    np.testing.assert_array_equal(a, b)


def test_int8_conv_matches_f64_oracle(setup):
    """One quantized conv vs an exact f64 integer emulation."""
    tparams, g1 = setup
    scales = calibrate_act_scales(tparams, [g1])
    qp = quantize_params_int8(tparams, scales, quant=["conv2_1"])
    layer = qp["layers"]["conv2_1"]
    sa = qp["act_scale"]["conv2_1"]

    x = np.asarray(
        jax.random.normal(jax.random.key(2), (1, 8, 8, 32)), np.float64) * sa * 80
    xq = np.clip(np.round(x / sa), -127, 127)

    # f64 oracle: SAME conv of the integer tensors, dequantized
    kq = np.asarray(layer["kq"], np.float64)
    acc = np.zeros((1, 8, 8, kq.shape[-1]))
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for dy in range(3):
        for dx in range(3):
            acc += np.einsum("nhwc,cd->nhwd",
                             xp[:, dy : dy + 8, dx : dx + 8, :], kq[dy, dx])
    want = acc * np.asarray(layer["m"], np.float64) + np.asarray(
        layer["bias"], np.float64)

    got = jax.lax.conv_general_dilated(
        jnp.asarray(xq, jnp.int8), layer["kq"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * layer["m"] + layer["bias"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_int8_forward_end_to_end(setup):
    """Full W8A8 forward: finite, same shape, bounded deviation from bf16.

    The deviation bound is a smoke check on RANDOM weights (no real
    checkpoints in this environment); per-model PSNR validation is required
    before production use (module docstring).
    """
    tparams, g1 = setup
    scales = calibrate_act_scales(
        tparams, [g1, g1 * 0.3 + 0.01])
    # every default quant input gets a scale; the OPTIONAL_QUANT probes
    # (conv1_1, upvN) are also observed but only quantize on request
    from pnnp_tpu.models.unet_s2d_int8 import OPTIONAL_QUANT

    assert set(QUANT_LAYERS) <= set(scales)
    assert set(scales) <= set(QUANT_LAYERS) | set(OPTIONAL_QUANT)
    qp = quantize_params_int8(tparams, scales)

    ref = np.asarray(unet_hybrid_forward_packed(tparams, g1), np.float32)
    out = np.asarray(unet_hybrid_forward_packed_int8(tparams, qp, g1),
                     np.float32)
    assert out.shape == ref.shape
    assert np.isfinite(out).all()
    # Sanity bound on random weights (measured 0.053; bf16-vs-f32 alone is
    # 0.011 on this stack) — random-weight deviation is NOT an accuracy
    # claim for trained checkpoints, see module docstring.
    rel = np.linalg.norm(out - ref) / max(np.linalg.norm(ref), 1e-9)
    assert rel < 0.08, f"relative deviation {rel:.4f}"
    cc = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert cc > 0.995, cc


def test_build_int8_server(setup):
    """One-call constructor: raw params -> jitted packed serve fn."""
    from pnnp_tpu.models import build_int8_server

    _, g1 = setup
    model = UNetSeeInDark(nf=32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    params = jax.tree.map(lambda a: a * 5.0, params)
    serve = build_int8_server(params, [g1])
    out = np.asarray(serve(g1), np.float32)
    tparams = transform_params_hybrid(params, jnp.bfloat16)
    ref = np.asarray(unet_hybrid_forward_packed(tparams, g1), np.float32)
    assert out.shape == ref.shape and np.isfinite(out).all()
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.995


def test_int8_fused_eval_step(setup):
    """make_eval_metrics_step(qparams=...) swaps in the W8A8 forward."""
    from pnnp_tpu.train import create_train_state
    from pnnp_tpu.train.steps import make_eval_metrics_step

    model = UNetSeeInDark(nf=32)
    st = create_train_state(jax.random.key(0), model, jnp.zeros((1, 64, 64, 4)))
    tp = transform_params_hybrid(st.params)
    cal = jax.random.uniform(jax.random.key(3), (1, 32, 32, 16)) * 0.3
    qp = quantize_params_int8(tp, calibrate_act_scales(tp, [cal]))

    lr = jax.random.uniform(jax.random.key(1), (1, 60, 92, 4)) * 0.4
    hr = jax.random.uniform(jax.random.key(2), (1, 60, 92, 4))
    kw = dict(ori=False, correct=True, with_inputs=False)
    dn8, m8 = make_eval_metrics_step(model, qparams=qp)(
        tp, lr, hr, jnp.float32(1.0), **kw)
    dn16, m16 = make_eval_metrics_step(model)(tp, lr, hr, jnp.float32(1.0), **kw)
    assert dn8.shape == dn16.shape and np.isfinite(np.asarray(dn8)).all()
    assert abs(float(m8["psnr"]) - float(m16["psnr"])) < 0.5


def test_int8_partial_quant_ablation(setup):
    """Restricting `quant` leaves the other layers on the bf16 path."""
    tparams, g1 = setup
    scales = calibrate_act_scales(tparams, [g1])
    qp = quantize_params_int8(tparams, scales, quant=["conv1_2", "conv9_2"])
    out = np.asarray(unet_hybrid_forward_packed_int8(tparams, qp, g1))
    ref = np.asarray(unet_hybrid_forward_packed(tparams, g1), np.float32)
    rel = np.linalg.norm(out - ref) / max(np.linalg.norm(ref), 1e-9)
    assert np.isfinite(out).all() and rel < 0.03, rel


def test_optional_quant_layers_run(setup):
    """OPTIONAL_QUANT (conv1_1 + upvN) quantize on request: the forward
    runs, stays finite, and tracks the bf16 reference (speed probes in
    tools/ablate_int8_quantset.py; accuracy must be validated separately
    before any production use)."""
    from pnnp_tpu.models.unet_s2d_int8 import OPTIONAL_QUANT

    tparams, g1 = setup
    scales = calibrate_act_scales(tparams, [g1, g1 * 0.3 + 0.01])
    qp = quantize_params_int8(tparams, scales,
                              quant=QUANT_LAYERS + OPTIONAL_QUANT)
    assert "conv1_1" in qp["layers"] and "upv8" in qp["layers"]
    ref = np.asarray(unet_hybrid_forward_packed(tparams, g1), np.float32)
    out = np.asarray(unet_hybrid_forward_packed_int8(tparams, qp, g1),
                     np.float32)
    assert out.shape == ref.shape and np.isfinite(out).all()
    rel = np.linalg.norm(out - ref) / max(np.linalg.norm(ref), 1e-9)
    assert rel < 0.25, f"relative deviation {rel:.4f}"  # more layers, looser
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.98
