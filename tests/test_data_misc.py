"""Data-layer odds and ends: info IO, crop planner modes, combinators."""

import numpy as np
import pytest

from pnnp_tpu.data import build_dataset, save_info, load_info, MixedSubsetDataset
from pnnp_tpu.data.crops import CropPlanner
from tests.test_train_data import make_sid_fixture


def test_info_json_roundtrip(tmp_path):
    infos = [{"name": "a", "ratio": [100, 250], "wb": np.array([2.0, 1, 1.5, 1])}]
    p = str(tmp_path / "x.json")
    save_info(infos, p)
    back = load_info(p)
    assert back[0]["name"] == "a"
    assert back[0]["ratio"] == [100, 250]
    p2 = str(tmp_path / "x.info")
    save_info(infos, p2)
    assert load_info(p2)[0]["name"] == "a"


def test_crop_planner_nonoverlapped():
    planner = CropPlanner(32, 48, 8, crop_per_image=64, croptype="non-overlapped",
                          rng=np.random.default_rng(0))
    # full grid: (32//8) * (48//8) = 24 planned crops
    assert planner.n_planned == 24
    img = np.arange(32 * 48 * 4, dtype=np.float32).reshape(32, 48, 4)
    crops = planner.crop(img)
    assert crops.shape == (24, 8, 8, 4)
    # non-overlap: grid starts are distinct and tile the plane
    starts = set(zip(planner.h_start.tolist(), planner.w_start.tolist()))
    assert len(starts) == 24


def test_crop_aug_modes():
    img = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    a0 = CropPlanner.augment(img, 0)
    a1 = CropPlanner.augment(img, 1)  # rot180
    a2 = CropPlanner.augment(img, 2)  # flip W
    a3 = CropPlanner.augment(img, 3)  # both
    np.testing.assert_array_equal(a0, img)
    np.testing.assert_array_equal(a1, img[::-1, ::-1])
    np.testing.assert_array_equal(a2, img[:, ::-1])
    np.testing.assert_array_equal(a3, img[::-1, :])


def test_build_multidataset(tmp_path):
    make_sid_fixture(tmp_path)
    dst = dict(
        dataset="MultiDataset", datasets=["SID_Dataset", "SID_Dataset"],
        dstnames=["SID", "SID"], mode="train", H=32, W=48, patch_size=8,
        crop_per_image=1, croptype="random_crop", command="", wp=16383, bl=512,
        ori=False, clip=2, infos_dir=str(tmp_path / "infos"),
    )
    ds = build_dataset(dst)
    assert len(ds) == 6  # 3 scenes x 2 datasets
    assert ds[4]["hr"].shape == (1, 8, 8, 4)


def test_mixed_subset_rates(tmp_path):
    make_sid_fixture(tmp_path)
    dst = dict(
        dataset="SID_Dataset", mode="train", H=32, W=48, patch_size=8,
        crop_per_image=1, croptype="random_crop", command="", wp=16383, bl=512,
        ori=False, clip=2, infos_dir=str(tmp_path / "infos"),
    )
    base = build_dataset(dst)
    extra = build_dataset(dst)
    mix = MixedSubsetDataset(base, extra, extra_rate=4)
    assert len(mix) == len(base) + 1
    assert mix[0]["hr"].shape == mix[len(base)]["hr"].shape


def test_sfrn_lr10_limits_bias_pick(tmp_path, monkeypatch):
    """'lr10' restricts bias-frame choice to the first 10 files
    (reference: syn_datasets.py:530)."""
    import numpy as np
    from pnnp_tpu.data.datasets import SFRNDataset
    from tests.test_train_data import make_sid_fixture

    monkeypatch.chdir(tmp_path)
    make_sid_fixture(tmp_path, n_scenes=1, H=32, W=48)
    rng = np.random.default_rng(0)
    bias_dir = tmp_path / "bias" / "1600"
    bias_dir.mkdir(parents=True)
    # first 10 frames ~0 post-BL; the rest carry a huge marker offset
    for j in range(15):
        val = 512.0 if j < 10 else 9000.0
        np.save(str(bias_dir / f"b{j:02d}.npy"), np.full((32, 48), val, np.float32))

    args = dict(dataset="SFRN_Dataset", mode="train", dstname="SID",
                camera_type="SonyA7S2", noise_code="pgrq", patch_size=8,
                H=32, W=48, crop_per_image=1, croptype="random_crop",
                wp=16383, bl=512, ori=False, clip=2, command="HB, lr10",
                infos_dir=str(tmp_path / "infos"), bias_dir=str(tmp_path / "bias"))
    ds = SFRNDataset(args, seed=3)
    for i in range(20):
        d = ds[i % len(ds)]
        # marker frames (>0.5 normalized) must never be picked
        assert float(np.abs(d["lr"]).max()) < 0.5
    ds2 = SFRNDataset(dict(args, command="HB"), seed=3)
    seen_marker = any(float(np.abs(ds2[i % len(ds2)]["lr"]).max()) > 0.4
                      for i in range(40))
    assert seen_marker
