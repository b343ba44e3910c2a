"""tools/golden_parity.py machinery, driven on the synthetic evaltest trees.

The real-data golden-parity check is environment-blocked (no SID/ELD/LRID
data, no released checkpoints), so this exercises everything EXCEPT the
data: preflight diagnostics, checkpoint conversion into the best-model
slot, the evaltest CLI drive, log parsing, the per-sweep diff table, and
the exit-code contract. With random-init weights the diff against the
reference numbers MUST fail — asserting that the comparison is live.
"""

import json
import os
import re

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow


def test_golden_parity_machinery(tmp_path, monkeypatch, capsys):
    import torch
    from test_evaltest_harness import (H, NF, W, make_eld_tree, make_sid_tree,
                                       make_torch_state)

    import tools.golden_parity as gp

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(5)
    make_sid_tree(str(tmp_path / "SID"), rng)
    make_eld_tree(str(tmp_path / "ELD"), rng)

    from tools.get_dataset_infos import main as build_infos

    infos = str(tmp_path / "infos")
    build_infos(["--dstname", "SID", "--root_dir", str(tmp_path / "SID"),
                 "--mode", "evaltest", "--out_dir", infos])
    build_infos(["--dstname", "ELD", "--root_dir", str(tmp_path / "ELD"),
                 "--out_dir", infos])

    sd = make_torch_state(np.random.default_rng(9))
    ckpt = str(tmp_path / "released.pth")
    torch.save(sd, ckpt)

    # a harness-shaped runfile standing in for runfiles/SonyA7S2/PNNP.yml
    dst = {
        "dstname": "SID", "command": "", "camera_type": "SonyA7S2",
        "noise_code": "p", "patch_size": 8, "H": H, "W": W,
        "crop_per_image": 1, "croptype": "random_crop", "wp": 16383,
        "bl": 512, "ori": False, "clip": 2,
    }
    runfile = {
        "mode": "evaltest", "checkpoint": "saved_model/T",
        "fast_ckpt": "checkpoints/T", "model_name": "GPTOOL_Unet",
        "num_workers": 0, "brightness_correct": True,
        "dst": dst,
        "dst_eval": dict(dst, mode="eval", dataset="ELD_Dataset",
                         iso_list=[800, 1600, 3200], ratio_list=[100, 200]),
        "arch": {"name": "UNetSeeInDark", "in_nc": 4, "out_nc": 4, "nf": NF,
                 "nframes": 1, "res": False},
        "hyper": {"lr_scheduler": "fixed", "learning_rate": 1e-4,
                  "batch_size": 1, "last_epoch": 0, "stop_epoch": 1,
                  "save_freq": 1, "plot_freq": 1, "best_psnr": 0},
    }
    rpath = str(tmp_path / "gp_run.yml")
    with open(rpath, "w") as f:
        yaml.safe_dump(runfile, f)

    cfg = dict(gp.CONFIGS["SonyA7S2_PNNP"], runfile=rpath)
    monkeypatch.setitem(gp.CONFIGS, "TEST_PNNP", cfg)

    # prereq path: missing checkpoint reports actionable diagnostics
    rc = gp.main(["--config", "TEST_PNNP", "--ckpt", str(tmp_path / "no.pth"),
                  "--infos_dir", infos, "--workdir", str(tmp_path / "wd0")])
    out = capsys.readouterr().out
    assert rc == 2 and "prereq_missing" in out and "--ckpt" in out

    # full drive: 5 sweeps parsed, diffs computed, FAIL with random weights
    rc = gp.main(["--config", "TEST_PNNP", "--ckpt", ckpt,
                  "--infos_dir", infos, "--workdir", str(tmp_path / "wd1")])
    out = capsys.readouterr().out
    assert rc == 1
    tail = json.loads(out.strip().splitlines()[-1])
    assert tail["status"] == "fail" and tail["sweeps"] == 5
    assert len(re.findall(r"PSNR +[\d.]+ vs +[\d.]+", out)) == 5
    # the trainer really ran: per-sweep summaries exist in the logfile
    with open("logs/log_GPTOOL_Unet.log") as f:
        assert len(re.findall(r"psnrs_dn=", f.read())) == 5
    assert os.path.exists(str(tmp_path / "wd1") + "/checkpoints/"
                          "GPTOOL_Unet_best_model.ckpt")
