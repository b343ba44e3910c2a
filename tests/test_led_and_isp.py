"""LED identity-eval harness, device-ISP math, plot smoke."""

import os
import pickle

import jax.numpy as jnp
import numpy as np
import yaml

from pnnp_tpu.ops import fast_isp, simple_isp
from tests.test_train_data import make_sid_fixture


def test_fast_isp_constant_scene_math(rng):
    """On a constant mosaic the demosaic is exact, so fast_isp must equal the
    closed-form WB -> CCM -> gamma chain (reference FastISP semantics)."""
    val = 0.2
    img4c = jnp.full((8, 12, 4), val)
    wb = np.array([1.8, 1.0, 1.5, 1.0], np.float32)
    ccm = np.array([[1.5, -0.3, -0.2], [-0.2, 1.4, -0.2], [0.1, -0.5, 1.4]], np.float32)
    out = np.asarray(fast_isp(img4c, wb=jnp.asarray(wb), ccm=jnp.asarray(ccm)))
    lin = np.array([val * 1.8, val, val * 1.5])
    expected = np.clip(ccm @ lin, 0, 1) ** (1 / 2.2)
    np.testing.assert_allclose(out[4, 6], expected, rtol=1e-4, atol=1e-5)


def test_simple_isp_math():
    raw = jnp.full((4, 4, 4), 512 + 0.25 * (16383 - 512))
    out = np.asarray(simple_isp(raw, bl=512, wp=16383, wb=[2, 1, 1, 2]))
    np.testing.assert_allclose(out[0, 0, 0], 0.5 ** (1 / 2.2), rtol=1e-4)
    np.testing.assert_allclose(out[0, 0, 1], 0.25 ** (1 / 2.2), rtol=1e-4)


def test_led_identity_eval(tmp_path, monkeypatch):
    """LED harness scores inputs with NO denoiser: psnr_dn == input psnr."""
    monkeypatch.chdir(tmp_path)
    make_sid_fixture(tmp_path, n_scenes=2, H=32, W=48)
    with open(tmp_path / "infos" / "SID_eval.info", "rb") as f:
        infos = pickle.load(f)
    big = []
    for k in range(120):
        e = dict(infos[k % len(infos)])
        e["short"], e["ratio"] = e["short"][0], e["ratio"][0]
        big.append(e)
    with open(tmp_path / "infos" / "SID_eval.info", "wb") as f:
        pickle.dump(big, f)

    runfile = {
        "mode": "eval", "checkpoint": "saved_model/L", "fast_ckpt": "checkpoints/L",
        "model_name": "LED_test", "num_workers": 0, "brightness_correct": True,
        "dst": {"dataset": "SID_Dataset", "dstname": "SID", "command": "",
                "camera_type": "SonyA7S2", "noise_code": "pr", "patch_size": 8,
                "H": 32, "W": 48, "crop_per_image": 1, "croptype": "random_crop",
                "wp": 16383, "bl": 512, "ori": False, "clip": 2,
                "infos_dir": str(tmp_path / "infos")},
        "arch": {"name": "UNetSeeInDark", "nf": 4, "nframes": 1},
        "hyper": {"lr_scheduler": "fixed", "learning_rate": 1e-4, "batch_size": 1,
                  "stop_epoch": 1, "last_epoch": 0, "save_freq": 1,
                  "plot_freq": 1, "best_psnr": 0},
    }
    runfile["dst_eval"] = dict(runfile["dst"], mode="eval")
    with open(tmp_path / "led.yml", "w") as f:
        yaml.safe_dump(runfile, f)

    from pnnp_tpu.trainer_led import LEDTrainer

    t = LEDTrainer(str(tmp_path / "led.yml"), mode="eval", debug=True)
    # LED must never route through the fused eval step: that would run the
    # REAL model forward instead of the identity (regression, round 3)
    assert t._fused_eval is None
    # the "network" is identity (reference: trainer_LED.py:111)
    probe = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 8, 8, 4)))
    np.testing.assert_array_equal(np.asarray(t.eval_step(t.state, probe)),
                                  np.asarray(probe))
    t.dataset_eval.change_eval_ratio(100)
    t.eval(-1)
    # metrics computed; dn differs from lr only by the ELD brightness
    # correction (applied to dn like the reference does)
    assert t.eval_psnr.count > 0
    assert np.isfinite(t.eval_psnr.avg) and np.isfinite(t.eval_psnr_lr.avg)


def test_lrid_eval_correction_gate(tmp_path, monkeypatch):
    """The reference LRID trainer never illuminance-corrects in eval (its
    brightness_correct flag is inert, trainer_LRID.py:195-319), while
    trainer_LED corrects on the same data (trainer_LED.py:122). Trainer must
    skip correction for IMX686 eval datasets; LEDTrainer must apply it."""
    from test_phone_and_nf import make_lrid_fixture, phone_args

    monkeypatch.chdir(tmp_path)
    make_lrid_fixture(tmp_path, n_scenes=59)
    dst = phone_args(tmp_path, dataset="IMX686_Dataset", mode="eval",
                     camera_type="IMX686", ori=True)
    runfile = {
        "mode": "eval", "checkpoint": "sm", "fast_ckpt": "ck",
        "model_name": "LRIDCORR_Unet", "num_workers": 0,
        "brightness_correct": True,
        "dst": dst, "dst_eval": dst,
        "arch": {"name": "UNetSeeInDark", "in_nc": 4, "out_nc": 4, "nf": 4,
                 "nframes": 1, "res": False},
        "hyper": {"lr_scheduler": "fixed", "learning_rate": 1e-4,
                  "batch_size": 1, "last_epoch": 0, "stop_epoch": 1,
                  "save_freq": 1, "plot_freq": 1, "best_psnr": 0},
    }
    with open(tmp_path / "corr.yml", "w") as f:
        yaml.safe_dump(runfile, f)

    import pnnp_tpu.trainer as tr

    calls = []
    orig = tr.illuminance_correct

    def spy(dn, hr):
        calls.append(1)
        return orig(dn, hr)

    monkeypatch.setattr(tr, "illuminance_correct", spy)

    from pnnp_tpu.trainer import Trainer
    from pnnp_tpu.trainer_led import LEDTrainer

    t = Trainer(str(tmp_path / "corr.yml"), mode="eval", debug=True, nofig=True)
    t.dataset_eval.change_eval_ratio(2)
    t.eval(-1)
    assert not calls, "LRID eval must NOT illuminance-correct"

    t2 = LEDTrainer(str(tmp_path / "corr.yml"), mode="eval", nofig=True)
    t2.dataset_eval.change_eval_ratio(2)
    t2.eval(-1)
    assert calls, "LED eval corrects on the same data"


def test_plot_sample_writes_jpg(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    make_sid_fixture(tmp_path, n_scenes=2, H=32, W=48)
    runfile = {
        "mode": "trainonly", "checkpoint": "sm", "fast_ckpt": "ck",
        "model_name": "PLOT_test", "num_workers": 0,
        "dst": {"dataset": "Raw_Dataset", "dstname": "SID", "command": "",
                "camera_type": "SonyA7S2", "noise_code": "pr", "patch_size": 8,
                "H": 32, "W": 48, "crop_per_image": 1, "croptype": "random_crop",
                "wp": 16383, "bl": 512, "ori": False, "clip": 2,
                "infos_dir": str(tmp_path / "infos")},
        "arch": {"name": "UNetSeeInDark", "nf": 4, "nframes": 1},
        "hyper": {"lr_scheduler": "fixed", "learning_rate": 1e-4, "batch_size": 1,
                  "stop_epoch": 1, "last_epoch": 0, "save_freq": 1,
                  "plot_freq": 1, "best_psnr": 0},
    }
    runfile["dst_train"] = dict(runfile["dst"], mode="train")
    with open(tmp_path / "p.yml", "w") as f:
        yaml.safe_dump(runfile, f)

    from pnnp_tpu.trainer import Trainer

    t = Trainer(str(tmp_path / "p.yml"), mode="trainonly", debug=True)
    img = jnp.full((16, 24, 4), 0.3)
    t._plot_sample(img, img, img, {"wb": np.array([2, 1, 1.5, 1], np.float32)},
                   "smoke", -1)
    t._drain_plots()  # renders are async (thread pool) since round 3
    assert os.path.exists(os.path.join(t.sample_dir, "smoke_epoch-1.jpg"))
    # the reference's denoised-PNG contract (visualization.py:90-91)
    assert os.path.exists(os.path.join(t.sample_dir, "smoke_denoised.png"))
