"""CLI mode dispatch mirrors the reference's substring dispatch
(trainer_SID.py:520-562 + README "Quick Start"):

  * --mode test  -> METRICS sweep over dst_test ("SID only"), not a dump
  * --mode dump  -> output-saving denoise pass (the reference test() method,
                    reached upstream via --mode trainonly)
  * --mode train -> after training, reload BEST weights and run the full
                    evaltest sweep
"""

import glob
import os
import re

import numpy as np
import pytest
import yaml

from pnnp_tpu.data.fixtures import make_sid_fixture, make_sid_runfile

pytestmark = pytest.mark.slow


def _write(tmp_path, rf):
    path = str(tmp_path / "run.yml")
    with open(path, "w") as f:
        yaml.safe_dump(rf, f)
    return path


def _seed_best_ckpt(rf):
    """evaltest-style modes restore 'best'; give them one."""
    import jax
    import jax.numpy as jnp

    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.train import create_train_state
    from pnnp_tpu.train.checkpoint import save_checkpoint

    model = UNetSeeInDark(nf=rf["arch"]["nf"])
    state = create_train_state(jax.random.key(0), model,
                               jnp.zeros((1, 16, 16, 4)))
    os.makedirs(rf["fast_ckpt"], exist_ok=True)
    save_checkpoint(
        os.path.join(rf["fast_ckpt"], f"{rf['model_name']}_best_model.ckpt"),
        state.params, None, {"epoch": 0, "eval_psnr": 1.0})


def test_mode_test_is_a_metrics_sweep_and_dump_saves(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    make_sid_fixture(tmp_path)
    rf = make_sid_runfile(tmp_path, batch_size=2)
    rf["dst_test"] = dict(rf["dst_eval"], mode="evaltest", ratio_list=[100])
    path = _write(tmp_path, rf)
    _seed_best_ckpt(rf)

    from pnnp_tpu.trainer import main as trainer_main

    trainer_main(["-f", path, "--mode", "test", "--debug", "--nofig"])
    with open(f"logs/log_{rf['model_name']}.log") as f:
        logtext = f.read()
    assert re.search(r"Epoch -1: PSNR=[\d.]+", logtext), logtext
    # a metrics sweep, not an output dump
    dump_dir = os.path.join(rf["result_dir"],
                            f"samples-{rf['model_name']}", "test")
    assert not glob.glob(os.path.join(dump_dir, "*.npy"))

    trainer_main(["-f", path, "--mode", "dump", "--debug", "--nofig"])
    dumped = glob.glob(os.path.join(dump_dir, "*_dn.npy"))
    assert dumped, "dump mode must save denoised outputs"
    assert np.isfinite(np.load(dumped[0])).all()


def test_mode_train_runs_full_sweep_with_best_weights(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    make_sid_fixture(tmp_path)
    rf = make_sid_runfile(tmp_path, batch_size=2)
    # plot_freq=1: the training epoch evals and writes a BEST checkpoint, so
    # the post-train fall-through really exercises the best-weights restore.
    # The in-training SID eval uses the constructor's ratio-250 split
    # (reference real_datasets.py:320) which is EMPTY for the 3-scene fixture
    # (scenes land in the x100 slice), so it scores 0.00 — seed the best-PSNR
    # watermark below zero so that score still claims `best` (the runfile
    # `best_psnr` hyper is the reference's own knob for this).
    rf["hyper"]["plot_freq"] = 1
    rf["hyper"]["best_psnr"] = -1
    rf["dst_eval"]["ratio_list"] = [100]
    path = _write(tmp_path, rf)

    from pnnp_tpu.trainer import main as trainer_main

    trainer_main(["-f", path, "--mode", "train", "--debug", "--nofig"])
    with open(f"logs/log_{rf['model_name']}.log") as f:
        logtext = f.read()
    # the training epoch saved a best checkpoint...
    assert os.path.exists(os.path.join(
        rf["fast_ckpt"], f"{rf['model_name']}_best_model.ckpt"))
    # ...and the post-training sweep scored real frames (reference falls
    # through to evaltest with the best checkpoint)
    scores = [float(m) for m in
              re.findall(r"Epoch -1: PSNR=([\d.]+)", logtext)]
    assert scores and all(s > 0 for s in scores), logtext
