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
    dnp, m = fused(tp, lr, hr, ratio, ori=ori, correct=correct,
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


def test_packed_to_banded_layout_contract():
    from pnnp_tpu.kernels.ssim import packed_to_banded
    from pnnp_tpu.models.unet_s2d import s2d

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 12, 16, 4)).astype(np.float32))
    banded = packed_to_banded(s2d(x)[0])
    ref = jnp.transpose(x[0], (2, 0, 1)).reshape(4 * 12, 16)
    np.testing.assert_array_equal(np.asarray(banded), np.asarray(ref))
