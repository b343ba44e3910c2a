"""Fused eval-metrics step == the unfused eval sequence (trainer semantics).

make_eval_metrics_step runs forward + clip + illuminance correct + PSNR/SSIM
in one jit with layout-aware (flat / channel-banded) math; it must reproduce
the reference eval pipeline (trainer_SID.py:221-248) as implemented by the
unfused ops on the same inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnnp_tpu.models import UNetSeeInDark
from pnnp_tpu.models.unet_s2d import transform_params_hybrid
from pnnp_tpu.ops import illuminance_correct, psnr, ssim
from pnnp_tpu.train import create_train_state, make_eval_step
from pnnp_tpu.train.steps import make_eval_metrics_step


@pytest.mark.parametrize("ori,correct", [(False, True), (True, False)])
def test_fused_eval_metrics_matches_unfused(ori, correct):
    model = UNetSeeInDark(nf=4)
    state = create_train_state(jax.random.key(0), model,
                               jnp.zeros((1, 16, 16, 4)))
    tp = transform_params_hybrid(state.params)

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 0.4, (1, 32, 48, 4)).astype(np.float32))
    hr = jnp.asarray(rng.uniform(0, 1.0, (1, 32, 48, 4)).astype(np.float32))
    ratio = jnp.float32(2.0)

    fused = make_eval_metrics_step(model)
    dnp, m, lrp_out = fused(tp, lr, hr, ratio, ori=ori, correct=correct,
                            with_inputs=True)

    # unfused reference sequence (exactly the trainer eval loop)
    es = make_eval_step(model, fast=True)
    dn = es(state, lr)
    lr2 = lr * ratio if ori else lr
    dn = dn * ratio if ori else dn
    lr2 = jnp.clip(lr2, 0, 1)
    dn = jnp.clip(dn, 0, 1)
    if correct:
        dn = illuminance_correct(dn, hr)
    hrc = jnp.clip(hr, 0, 1)
    p_ref = float(psnr(dn[0] * 255.0, hrc[0] * 255.0))
    s_ref = float(ssim(dn[0] * 255.0, hrc[0] * 255.0))
    p_in_ref = float(psnr(lr2[0] * 255.0, hrc[0] * 255.0))
    s_in_ref = float(ssim(lr2[0] * 255.0, hrc[0] * 255.0))

    assert abs(float(m["psnr"]) - p_ref) < 5e-3, (float(m["psnr"]), p_ref)
    assert abs(float(m["ssim"]) - s_ref) < 1e-4
    assert abs(float(m["psnr_in"]) - p_in_ref) < 5e-3
    assert abs(float(m["ssim_in"]) - s_in_ref) < 1e-4

    # the returned flat frame is the corrected, clipped image
    np.testing.assert_allclose(np.asarray(dnp).reshape(dn.shape),
                               np.asarray(dn), rtol=1e-4, atol=1e-5)
    # and the input panel is the ori-scaled clipped lr (plot contract)
    np.testing.assert_allclose(np.asarray(lrp_out).reshape(lr2.shape),
                               np.asarray(lr2), rtol=1e-5, atol=1e-6)


def test_trainer_eval_fused_matches_sharded_path(tmp_path, monkeypatch):
    """The production eval loop through the FUSED single-device path yields
    the same metrics pkl as the default (spatial-sharded) path. The conftest
    exposes 8 devices, so the fused branch is forced the way a single-chip
    TPU serving run selects it."""
    monkeypatch.chdir(tmp_path)
    import yaml

    from pnnp_tpu.data.fixtures import make_sid_fixture, make_sid_runfile
    from pnnp_tpu.trainer import Trainer
    from pnnp_tpu.train.steps import make_eval_metrics_step

    make_sid_fixture(tmp_path, n_scenes=2, H=64, W=96)
    runfile = make_sid_runfile(tmp_path, batch_size=2, H=64, W=96)
    path = str(tmp_path / "run.yml")
    with open(path, "w") as f:
        yaml.safe_dump(runfile, f)

    def run(force_fused):
        t = Trainer(path, mode="train", nofig=True, debug=True)
        t.dataset_eval.change_eval_ratio(100)
        if force_fused:
            t.mesh_spatial = None
            t._fused_eval = make_eval_metrics_step(t.model)
        t.eval(-1)
        return t.eval_psnr.avg, t.eval_ssim.avg

    p1, s1 = run(False)
    p2, s2 = run(True)
    assert abs(p1 - p2) < 5e-3, (p1, p2)
    assert abs(s1 - s2) < 1e-4, (s1, s2)


def test_pad_to_multiple_matches_reference_symmetric_pad():
    """Reference eval pads p2d=(4,4,4,4) reflect and center-crops
    (trainer_SID.py:221-226); both camera shapes have residue 8. The
    general form splits the pad evenly per side."""
    from pnnp_tpu.train.steps import pad_split, pad_to_multiple

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (1, 24, 40, 4)).astype(np.float32)  # residues 8, 8
    p, (oy, ox, H, W) = pad_to_multiple(jnp.asarray(x), 16)
    ref = np.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
    np.testing.assert_array_equal(np.asarray(p), ref)
    assert (oy, ox, H, W) == (4, 4, 24, 40)
    assert pad_split(1736) == (4, 4) and pad_split(2312) == (4, 4)
    assert pad_split(1424) == (0, 0) and pad_split(2128) == (0, 0)


@pytest.mark.parametrize("with_inputs", [False, True])
def test_fused_eval_packed_input_is_exact(with_inputs):
    """Host pre-packed lr (pack_frame_np) through the step's packed branch
    produces BIT-identical outputs to the unpacked path: the host pad+s2d is
    the f32-exact mirror of the on-device input stage, and everything after
    g1 is the same traced program."""
    from pnnp_tpu.models.unet_s2d import d2s_np, pack_frame_np, s2d_np

    model = UNetSeeInDark(nf=4)
    state = create_train_state(jax.random.key(0), model,
                               jnp.zeros((1, 16, 16, 4)))
    tp = transform_params_hybrid(state.params)

    rng = np.random.default_rng(2)
    # %16-misaligned on purpose: the host pack must reproduce the reflect pad
    lr = rng.uniform(0, 0.4, (1, 36, 44, 4)).astype(np.float32)
    hr = jnp.asarray(rng.uniform(0, 1.0, (1, 36, 44, 4)).astype(np.float32))
    ratio = jnp.float32(2.0)

    # host helpers mirror the device layout ops exactly
    from pnnp_tpu.models.unet_s2d import d2s, s2d
    x = rng.uniform(0, 1, (1, 8, 12, 4)).astype(np.float32)
    np.testing.assert_array_equal(s2d_np(x), np.asarray(s2d(jnp.asarray(x))))
    np.testing.assert_array_equal(
        d2s_np(s2d_np(x)), np.asarray(d2s(s2d(jnp.asarray(x)))))

    fused = make_eval_metrics_step(model)
    o_u = fused(tp, jnp.asarray(lr), hr, ratio, ori=True, correct=True,
                with_inputs=with_inputs)
    packed = pack_frame_np(lr)
    assert packed.shape == (1, 24, 24, 16)
    o_p = fused(tp, jnp.asarray(packed), hr, ratio, ori=True,
                correct=True, with_inputs=with_inputs)
    (dn_u, m_u), (dn_p, m_p) = o_u[:2], o_p[:2]
    if with_inputs:
        # the packed branch recovers the unpacked input panel exactly
        np.testing.assert_array_equal(np.asarray(o_u[2]), np.asarray(o_p[2]))

    np.testing.assert_array_equal(np.asarray(dn_u), np.asarray(dn_p))
    assert set(m_u) == set(m_p)
    for k in m_u:
        np.testing.assert_array_equal(np.asarray(m_u[k]), np.asarray(m_p[k]))


def test_packed_to_banded_layout_contract():
    from pnnp_tpu.kernels.ssim import packed_to_banded
    from pnnp_tpu.models.unet_s2d import s2d

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 12, 16, 4)).astype(np.float32))
    banded = packed_to_banded(s2d(x)[0])
    ref = jnp.transpose(x[0], (2, 0, 1)).reshape(4 * 12, 16)
    np.testing.assert_array_equal(np.asarray(banded), np.asarray(ref))
