"""End-to-end trainer test: runfile -> train epochs -> eval, on synthetic data.

The reference has no tests; its de-facto oracle is the eval log format
(SURVEY.md §4). This exercises the full stack — config load, dataset,
loader, on-device synthesis, jitted train step, checkpointing, eval with
PSNR/SSIM + illuminance correction, log file emission — on a tiny synthetic
SID tree.
"""

import os
import pickle

import numpy as np
import pytest
import yaml

from tests.test_train_data import make_sid_fixture


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    make_sid_fixture(tmp_path, n_scenes=3, H=32, W=48)

    runfile = {
        "mode": "train",
        "checkpoint": "saved_model/T",
        "fast_ckpt": "checkpoints/T",
        "model_name": "TEST_PNNP_Unet",
        "result_dir": "images/",
        "num_workers": 0,
        "brightness_correct": True,
        "dst": {
            "root_dir": ".", "dataset": "Raw_Dataset", "dstname": "SID",
            "command": "", "camera_type": "SonyA7S2", "noise_code": "pr",
            "patch_size": 8, "H": 32, "W": 48, "crop_per_image": 2,
            "croptype": "random_crop", "wp": 16383, "bl": 512,
            "ori": False, "clip": 2, "gpu_preprocess": True,
            "infos_dir": str(tmp_path / "infos"),
        },
        "arch": {"name": "UNetSeeInDark", "in_nc": 4, "out_nc": 4, "nf": 4,
                 "nframes": 1, "res": False},
        "hyper": {"lr_scheduler": "WarmupCosine", "learning_rate": 1e-3,
                  "batch_size": 1, "last_epoch": 0, "step_size": 2,
                  "stop_epoch": 3, "T": 1, "save_freq": 1, "plot_freq": 50,
                  "best_psnr": 0},
    }
    runfile["dst_train"] = dict(runfile["dst"], mode="train")
    runfile["dst_eval"] = dict(runfile["dst"], mode="eval", dataset="SID_Dataset",
                               clip=2)
    with open(tmp_path / "run.yml", "w") as f:
        yaml.safe_dump(runfile, f)

    # SID eval split needs >= 80 entries for evaltest remap; use eval mode
    # infos with single-short entries instead.
    with open(tmp_path / "infos" / "SID_eval.info", "rb") as f:
        infos = pickle.load(f)
    big = []
    for k in range(120):
        e = dict(infos[k % len(infos)])
        e["short"] = e["short"][0]
        e["ratio"] = e["ratio"][0]
        big.append(e)
    with open(tmp_path / "infos" / "SID_eval.info", "wb") as f:
        pickle.dump(big, f)

    from pnnp_tpu.trainer import Trainer

    t = Trainer(str(tmp_path / "run.yml"), mode="train", nofig=True, debug=True)
    t.train()

    # checkpoints written (last + best-on-eval may not exist without eval)
    assert os.path.exists(t.ckpt.last_path())
    # log file written
    assert os.path.exists(f"./logs/log_{runfile['model_name']}.log")

    # eval on the (synthetic) SID eval split
    t2 = Trainer(str(tmp_path / "run.yml"), mode="eval", nofig=True, debug=True)
    t2.dataset_eval.change_eval_ratio(100)
    t2.eval(-1)
    assert t2.eval_psnr.count > 0
    assert np.isfinite(t2.eval_psnr.avg)
    assert os.path.exists(f"./metrics/{runfile['model_name']}_metrics.pkl")


def test_eval_log_format_matches_reference(tmp_path, monkeypatch):
    """The eval summary keeps the reference's 3-line log contract
    (trainer_SID.py:309-312): Epoch/PSNR, psnrs_lr/dn, ssims_lr/dn."""
    import re

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

    import yaml as _yaml
    runfile = {
        "mode": "eval", "checkpoint": "saved_model/T", "fast_ckpt": "checkpoints/T",
        "model_name": "FMT_Unet", "num_workers": 0, "brightness_correct": True,
        # exercise the opt-in device-ISP RGB meters (trainer_SID.py:272)
        "rgb_metrics": True,
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
    with open(tmp_path / "f.yml", "w") as f:
        _yaml.safe_dump(runfile, f)

    from pnnp_tpu.trainer import Trainer

    t = Trainer(str(tmp_path / "f.yml"), mode="eval", nofig=True, debug=True)
    t.dataset_eval.change_eval_ratio(100)
    t.eval(-1)
    logtext = open(f"./logs/log_FMT_Unet.log").read()
    assert re.search(r"Epoch -1: PSNR=\d+\.\d\d", logtext)
    assert re.search(r"psnrs_lr=\d+\.\d\d, psnrs_dn=\d+\.\d\d", logtext)
    assert re.search(r"ssims_lr=[\d.]+, ssims_dn=[\d.]+", logtext)


def test_runtime_error_recovery(tmp_path, monkeypatch):
    """A RuntimeError mid-epoch must not poison the donated train state: the
    trainer recovers from the last checkpoint (or fresh init) and subsequent
    epochs keep training (regression: state aliased freed buffers and every
    later step re-raised)."""
    monkeypatch.chdir(tmp_path)
    make_sid_fixture(tmp_path, n_scenes=3, H=32, W=48)

    runfile = {
        "mode": "trainonly", "checkpoint": "sm", "fast_ckpt": "ck",
        "model_name": "RECOVER_Unet", "num_workers": 0,
        "dst": {"root_dir": ".", "dataset": "Raw_Dataset", "dstname": "SID",
                "command": "", "camera_type": "SonyA7S2", "noise_code": "p",
                "patch_size": 8, "H": 32, "W": 48, "crop_per_image": 1,
                "croptype": "random_crop", "wp": 16383, "bl": 512,
                "ori": False, "clip": 2, "gpu_preprocess": True,
                "infos_dir": str(tmp_path / "infos")},
        "arch": {"name": "UNetSeeInDark", "in_nc": 4, "out_nc": 4, "nf": 4,
                 "nframes": 1, "res": False},
        "hyper": {"lr_scheduler": "fixed", "learning_rate": 1e-3,
                  "batch_size": 1, "last_epoch": 0, "stop_epoch": 3,
                  "save_freq": 1, "plot_freq": 50, "best_psnr": 0},
    }
    runfile["dst_train"] = dict(runfile["dst"], mode="train")
    with open(tmp_path / "run.yml", "w") as f:
        yaml.safe_dump(runfile, f)

    from pnnp_tpu.trainer import Trainer

    t = Trainer(str(tmp_path / "run.yml"), mode="trainonly", debug=True)
    real_step = t.train_step
    state = {"fail_next": False, "failed": 0, "ok": 0}

    def flaky_step(s, batch, key, epoch):
        if state["fail_next"]:
            state["fail_next"] = False
            state["failed"] += 1
            raise RuntimeError("injected OOM")
        state["ok"] += 1
        return real_step(s, batch, key, epoch)

    t.train_step = flaky_step
    state["fail_next"] = True  # first step of epoch 1 fails
    t.train()
    assert state["failed"] == 1 and state["ok"] > 0
    # params survived recovery and later epochs trained + checkpointed
    import jax

    leaf = np.asarray(jax.tree_util.tree_leaves(t.state.params)[0])
    assert np.isfinite(leaf).all()
    assert t.ckpt.restore("last") is not None


def test_trainer_int8_eval(tmp_path, monkeypatch):
    """--int8 serves eval through the W8A8 fused path (lazy per-params
    calibration at the validated default percentile) and lands within the
    validated PSNR envelope of the exact bf16 eval on the same frames."""
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
        "mode": "eval", "checkpoint": "saved_model/T",
        "fast_ckpt": "checkpoints/T",
        "model_name": "I8_Unet", "num_workers": 0,
        "brightness_correct": True,
        "dst": {"dataset": "SID_Dataset", "dstname": "SID", "command": "",
                "camera_type": "SonyA7S2", "noise_code": "pr",
                "patch_size": 8, "H": 32, "W": 48, "crop_per_image": 1,
                "croptype": "random_crop", "wp": 16383, "bl": 512,
                "ori": False, "clip": 2,
                "infos_dir": str(tmp_path / "infos")},
        "arch": {"name": "UNetSeeInDark", "nf": 4, "nframes": 1},
        "hyper": {"lr_scheduler": "fixed", "learning_rate": 1e-4,
                  "batch_size": 1, "stop_epoch": 1, "last_epoch": 0,
                  "save_freq": 1, "plot_freq": 1, "best_psnr": 0},
    }
    runfile["dst_eval"] = dict(runfile["dst"], mode="eval")
    with open(tmp_path / "i8.yml", "w") as f:
        yaml.safe_dump(runfile, f)

    from pnnp_tpu.train.steps import make_eval_metrics_step
    from pnnp_tpu.trainer import Trainer

    def force_fused(t):
        # conftest exposes 8 virtual devices; force the single-chip fused
        # branch the way a one-TPU serving run selects it (same pattern as
        # test_eval_metrics_step.test_trainer_eval_fused_matches_sharded_path)
        t.mesh_spatial = None
        t._fused_eval = make_eval_metrics_step(t.model)
        return t

    t16 = force_fused(Trainer(str(tmp_path / "i8.yml"), mode="eval",
                              nofig=True, debug=True))
    t16.dataset_eval.change_eval_ratio(100)
    t16.eval(-1)

    # pin the production calibration recipe to the validated one: the first
    # int8_cal_frames (default 3) eval frames as traffic, pct=99.95 — the
    # exact config tools/validate_int8.py --cal-from-eval --cal-frames 3
    # measured (one frame alone measured -0.10 dB mean vs disjoint-x3)
    import pnnp_tpu.models.unet_s2d_int8 as i8mod

    cal_spy = {}
    real_cal = i8mod.calibrate_act_scales

    def spy(tp, frames, pct=100.0, **kw):
        cal_spy["n"], cal_spy["pct"] = len(frames), pct
        return real_cal(tp, frames, pct=pct, **kw)

    monkeypatch.setattr(i8mod, "calibrate_act_scales", spy)

    t8 = force_fused(Trainer(str(tmp_path / "i8.yml"), mode="eval",
                             nofig=True, debug=True, int8=True))
    t8.dataset_eval.change_eval_ratio(100)
    assert t8.int8_cal_frames == 3  # the validated default
    t8.eval(-1)
    assert t8._int8_cache["step"] is not None  # int8 path actually served
    assert cal_spy == {"n": 3, "pct": 99.95}, cal_spy
    assert t8.eval_psnr.count == t16.eval_psnr.count > 0
    assert np.isfinite(t8.eval_psnr.avg)
    # random-init weights at nf=4 are a far harsher quantization target than
    # a trained checkpoint (validated at +-0.05 dB); this guards wiring, not
    # accuracy
    assert abs(t8.eval_psnr.avg - t16.eval_psnr.avg) < 1.0, (
        t8.eval_psnr.avg, t16.eval_psnr.avg)

    # rgb_metrics is incompatible with the raw-domain int8 fused path
    runfile["rgb_metrics"] = True
    with open(tmp_path / "i8rgb.yml", "w") as f:
        yaml.safe_dump(runfile, f)
    trgb = Trainer(str(tmp_path / "i8rgb.yml"), mode="eval", nofig=True,
                   debug=True, int8=True)
    trgb.dataset_eval.change_eval_ratio(100)
    with pytest.raises(ValueError, match="raw-domain"):
        trgb.eval(-1)
