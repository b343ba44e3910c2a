"""Full-resolution eval exercise at the REAL camera frame shapes.

The production eval loop (pad %16 -> fast path -> PSNR/SSIM -> illuminance
correct -> metrics pkl) and the width-sharded spatial path are driven at the
actual SonyA7S2 (2848x4256) and IMX686 (3472x4624) mosaic sizes — the shapes
real-data day will compile (reference full-frame semantics:
trainer_SID.py:221-228). Everything runs on the 8-virtual-device CPU mesh;
per-shape TPU numbers live in tools/eval_fullres.py + STATUS.md.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from pnnp_tpu.data.fixtures import make_sid_fixture, make_sid_runfile
from pnnp_tpu.trainer import Trainer

# (camera, mosaic H, mosaic W): packed eval frames are [1, H/2, W/2, 4]
SHAPES = [("SonyA7S2", 2848, 4256), ("IMX686", 3472, 4624)]


def _tiny_trainer(tmp_path, H, W):
    make_sid_fixture(tmp_path, n_scenes=1, H=H, W=W)
    runfile = make_sid_runfile(tmp_path, batch_size=1, H=H, W=W, nf=4)
    path = str(tmp_path / "run.yml")
    with open(path, "w") as f:
        yaml.safe_dump(runfile, f)
    return Trainer(path, mode="train", nofig=True, debug=True)


@pytest.mark.slow
@pytest.mark.parametrize("cam,H,W", SHAPES, ids=[s[0] for s in SHAPES])
def test_fullres_sharded_eval_matches_single_device(tmp_path, monkeypatch,
                                                    cam, H, W):
    """Width-sharded halo-exchange eval == single-device eval at the real
    frame shapes (IMX686's packed dims are %16-misaligned: 1736x2312 — the
    spatial path must pad to nsp*16 and crop back exactly)."""
    monkeypatch.chdir(tmp_path)
    t = _tiny_trainer(tmp_path, 64, 96)  # tiny data; the frames below are synthetic
    nsp = t.mesh_spatial.shape["spatial"]
    assert nsp == 8, "conftest should expose 8 virtual devices"
    frame = jnp.asarray(
        np.random.default_rng(0)
        .uniform(0, 1, (1, H // 2, W // 2, 4))
        .astype(np.float32)
    )
    full = t.eval_step(t.state, frame)
    sharded = t._forward_full(frame)
    assert sharded.shape == frame.shape
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(full),
                               rtol=2e-3, atol=2e-3)  # bf16 fast eval path


@pytest.mark.slow
def test_fullres_production_eval_loop(tmp_path, monkeypatch):
    """The COMPLETE production eval loop at the Sony full-frame shape:
    loader -> pad %16 -> width-sharded fast path -> illuminance correct ->
    on-device PSNR/SSIM -> metrics pkl + 3-line log summary."""
    monkeypatch.chdir(tmp_path)
    H, W = 2848, 4256
    t = _tiny_trainer(tmp_path, H, W)
    # the x250 default split indexes infos[40:80] — empty on a 1-scene
    # fixture; the x100 split holds the scene
    t.dataset_eval.change_eval_ratio(100)
    t.eval(-1)
    assert np.isfinite(t.eval_psnr.avg) and t.eval_psnr.count >= 1
    assert 0.0 < t.eval_ssim.avg <= 1.0
    metrics_path = f"./metrics/{t.model_name}_metrics.pkl"
    assert os.path.exists(metrics_path)
    import pickle

    with open(metrics_path, "rb") as f:
        metrics = pickle.load(f)
    assert all(np.isfinite(v).all() for v in metrics.values())
