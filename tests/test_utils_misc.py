"""Utility-layer tests: video indexing, checkpoints, loggers, config DSLs."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pnnp_tpu.config import Command, NoiseCode, load_runfile
from pnnp_tpu.train.checkpoint import (
    CheckpointManager,
    save_checkpoint,
    load_checkpoint,
    save_checkpoint_orbax,
    load_checkpoint_orbax,
)
from pnnp_tpu.utils.logging import AverageMeter, log
from pnnp_tpu.utils.video import frame_index_splitor, multi_frame_gather


def test_frame_index_splitor_reflect():
    idx = frame_index_splitor(nframes=3, pad=True, reflect=True)
    assert idx.shape == (7, 3)
    np.testing.assert_array_equal(idx[0], [1, 0, 1])  # reflected edge
    np.testing.assert_array_equal(idx[3], [2, 3, 4])
    np.testing.assert_array_equal(idx[6], [5, 6, 5])


def test_frame_index_splitor_clip_nopad():
    idx = frame_index_splitor(nframes=3, pad=False, reflect=False)
    assert idx.shape == (5, 3)
    np.testing.assert_array_equal(idx[0], [0, 1, 2])


def test_multi_frame_gather():
    clip = jnp.arange(2 * 7 * 2 * 2 * 1, dtype=jnp.float32).reshape(2, 7, 2, 2, 1)
    idx = frame_index_splitor(nframes=3)
    stacks = multi_frame_gather(clip, idx)
    assert stacks.shape == (7, 2, 3, 2, 2, 1)
    gts = multi_frame_gather(clip, idx, gt=True)
    assert gts.shape == (7, 2, 2, 2, 1)
    np.testing.assert_array_equal(np.asarray(gts[3]), np.asarray(clip[:, 3]))


def test_checkpoint_manager_last_best(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "fast"), str(tmp_path / "slow"), "M", save_freq=2)
    params = {"w": np.ones((2, 2), np.float32)}
    assert mgr.save(1, params, eval_psnr=30.0)  # first is best
    assert not mgr.save(2, params, eval_psnr=20.0)
    assert mgr.save(3, params, eval_psnr=40.0)
    assert os.path.exists(mgr.epoch_path(2))
    restored = mgr.restore("best")
    assert restored["meta"]["eval_psnr"] == 40.0
    # corrupted best falls back to last
    with open(mgr.best_path(), "wb") as f:
        f.write(b"garbage")
    restored = mgr.restore("best")
    assert restored is not None and restored["meta"]["epoch"] == 3


def test_orbax_roundtrip(tmp_path):
    params = {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3)}}
    path = str(tmp_path / "ckpt_orbax")
    save_checkpoint_orbax(path, params, meta={"epoch": 7})
    out = load_checkpoint_orbax(path)
    np.testing.assert_allclose(np.asarray(out["params"]["layer"]["kernel"]),
                               np.arange(6.0).reshape(2, 3))
    assert out["meta"]["epoch"] == 7


def test_average_meter_history(tmp_path):
    m = AverageMeter("PSNR", ":2f", history_dir=str(tmp_path))
    for v in (30.0, 40.0):
        m.update(v)
    assert m.avg == 35.0
    m.record()
    m.save_history("model")
    m2 = AverageMeter("PSNR", last_epoch=1, history_dir=str(tmp_path))
    assert m2.load_history("model") == [35.0]
    assert "PSNR" in str(m)


def test_command_and_noisecode_dsl():
    cmd = Command("idremap, darkshading2++, preHB")
    assert "darkshading" in cmd and "darkshading2" in cmd and "++" in cmd
    assert "HB" in cmd  # substring semantics (preHB contains HB) — reference behavior
    nc = NoiseCode("PgRq")
    assert nc.shot_poisson and nc.read_tukey and nc.row and nc.quant
    assert not nc.dark_bias and not nc.black_mode


def test_load_reference_runfile_compat():
    cfg = load_runfile("/root/reference/runfiles/IMX686/PNNP.yml")
    assert cfg["arch_proxy"]["name"] == "pw_iso_2stage"
    assert cfg["dst_train"]["dataset"] == "IMX686_Proxy_Dataset"
    assert cfg["dst"]["clip"] is False
