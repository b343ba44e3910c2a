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


def test_crop_aug_modes_syn8():
    """Syn datasets use the reference's 8-mode aug (rot90 k=mode%4 then
    flip-W if mode//4, syn_datasets.py:101-107) — noise is synthesized after
    the aug, so rotations are legal there. Paired stays 4-mode."""
    img = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    for mode in range(8):
        want = np.rot90(img, k=mode % 4, axes=(0, 1))
        if mode // 4:
            want = want[:, ::-1]
        np.testing.assert_array_equal(
            CropPlanner.augment(img, mode, aug_modes=8), want)
    # planners draw from the configured support
    p8 = CropPlanner(32, 48, 8, 64, "random_crop",
                     rng=np.random.default_rng(0), aug_modes=8)
    assert set(p8.aug.tolist()) > {4, 5}  # rot90 modes actually drawn
    p4 = CropPlanner(32, 48, 8, 64, "random_crop",
                     rng=np.random.default_rng(0))
    assert set(p4.aug.tolist()) <= {0, 1, 2, 3}

    from pnnp_tpu.data.datasets import BaseRawDataset, SynDataset
    assert SynDataset.AUG_MODES == 8 and BaseRawDataset.AUG_MODES == 4


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
    base = build_dataset(dict(dst, crop_per_image=2))
    extra = build_dataset(dst)
    mix = MixedSubsetDataset(base, extra, extra_rate=2)
    # reference semantics (data_process/__init__.py:73-87): l1 + l2 // rate
    # samples, each mixed sample concatenating `rate` consecutive extra
    # items so the whole extra subset is covered
    assert len(mix) == len(base) + len(extra) // 2
    # the constructor enforces the reference's crop contract (extra built at
    # base_crops // rate) so every mixed item has ONE leading dim — no
    # per-shape jit recompiles, no sampling-weight skew
    assert extra.args["crop_per_image"] == 1
    assert mix[len(base)]["hr"].shape[0] == mix[0]["hr"].shape[0] == 2
    # an un-matchable contract (base crops not divisible by rate) raises
    import pytest
    with pytest.raises(ValueError):
        MixedSubsetDataset(build_dataset(dst), build_dataset(dst), extra_rate=2)
    # an empty extra contributes no samples instead of crashing
    class Empty:
        def __len__(self):
            return 0

        def __getitem__(self, i):
            raise IndexError

    assert len(MixedSubsetDataset(base, Empty(), extra_rate=2)) == len(base)


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


def test_sony_hot_check_table():
    """Exact hot-scene id table (reference: real_datasets.py:241-254)."""
    from pnnp_tpu.data.datasets import BaseRawDataset

    ds = BaseRawDataset()
    # name[2:5] is the scene id: '10072_00_10s' -> 072
    assert ds.sony_hot_check("10072_00_10s.ARW")
    assert ds.sony_hot_check("10232_00")
    assert not ds.sony_hot_check("10071_00")
    assert not ds.sony_hot_check("10178_00")  # gap 178-182
    assert not ds.sony_hot_check("10210_00")
    assert not ds.sony_hot_check("10233_00")
    assert not ds.sony_hot_check("weird-name")


def test_hotfix_command_gates_plus2(tmp_path):
    """'hotfix' command adds +2 ADU on hot scenes only (upstream carries this
    commented out at real_datasets.py:552; opt-in here)."""
    from tests.test_train_data import make_sid_fixture
    from pnnp_tpu.data.datasets import SIDDataset
    import pickle

    make_sid_fixture(tmp_path, n_scenes=2, H=32, W=48)
    # rename scene 0 to a hot id (name[2:5] = 100 is in the table)
    info_path = tmp_path / "infos" / "SID_eval.info"
    with open(info_path, "rb") as f:
        infos = pickle.load(f)
    infos = [dict(e, short=[e["short"][0]], ratio=[e["ratio"][0]]) for e in infos]
    infos[0]["name"] = "10100_00"
    infos[1]["name"] = "10071_00"  # not hot
    # keep shorts dark enough that lr x ratio stays below the clip ceiling
    rng = np.random.default_rng(5)
    for e in infos:
        np.save(e["short"][0], rng.uniform(513, 560, (32, 48)).astype(np.float32))
    big = [dict(infos[i % 2]) for i in range(120)]
    with open(info_path, "wb") as f:
        pickle.dump(big, f)

    args = dict(mode="eval", dstname="SID", camera_type="SonyA7S2",
                noise_code="p", H=32, W=48, wp=16383, bl=512, ori=False,
                clip=2, infos_dir=str(tmp_path / "infos"))
    base = SIDDataset(dict(args, command=""), seed=0)
    fixed = SIDDataset(dict(args, command="hotfix"), seed=0)
    base.change_eval_ratio(100)
    fixed.change_eval_ratio(100)
    d0, f0 = base[0], fixed[0]   # hot scene
    d1, f1 = base[1], fixed[1]   # cold scene
    ratio = float(d0["ratio"][0])
    delta = (f0["lr"] - d0["lr"]) * (16383.0 - 512.0) / ratio
    np.testing.assert_allclose(delta, 2.0, atol=1e-3)
    np.testing.assert_array_equal(f1["lr"], d1["lr"])


def test_predict_saves_npy(tmp_path, monkeypatch):
    """predict() packs raw+bl and saves {name}.npy (trainer_SID.py:345-360)."""
    import yaml
    from tests.test_train_data import make_sid_fixture

    monkeypatch.chdir(tmp_path)
    make_sid_fixture(tmp_path, n_scenes=1, H=32, W=48)
    runfile = {
        "mode": "eval", "checkpoint": "saved_model/T", "fast_ckpt": "checkpoints/T",
        "model_name": "PRED_Unet", "num_workers": 0,
        "dst": {"dataset": "Raw_Dataset", "dstname": "SID", "command": "",
                "camera_type": "SonyA7S2", "noise_code": "p", "patch_size": 8,
                "H": 32, "W": 48, "crop_per_image": 1, "croptype": "random_crop",
                "wp": 16383, "bl": 512, "ori": False, "clip": 2,
                "infos_dir": str(tmp_path / "infos")},
        "arch": {"name": "UNetSeeInDark", "nf": 4, "nframes": 1},
        "hyper": {"lr_scheduler": "fixed", "learning_rate": 1e-4, "batch_size": 1,
                  "stop_epoch": 1, "last_epoch": 0, "save_freq": 1,
                  "plot_freq": 1, "best_psnr": 0},
    }
    with open(tmp_path / "p.yml", "w") as f:
        yaml.safe_dump(runfile, f)
    from pnnp_tpu.trainer import Trainer

    t = Trainer(str(tmp_path / "p.yml"), mode="eval", nofig=True, debug=True)
    raw = np.random.default_rng(0).uniform(0, 8000, (64, 64)).astype(np.float32)
    out = t.predict(raw, name="dsout", patch_size=32, base=8)
    assert out.shape == (32, 32, 4)
    saved = np.load("dsout.npy")
    np.testing.assert_array_equal(saved, out)


def test_infos_dedup_decode_cache(tmp_path):
    """Trees holding both raws and their decode caches (path + '.npy') must
    index each frame once, preferring the cache (regression: every image
    double-indexed, breaking positional GT/short pairing)."""
    import os

    from pnnp_tpu.data.infos import _dedup_cached

    files = ["a/IMG_1.ARW", "a/IMG_1.ARW.npy", "a/IMG_2.ARW",
             "a/IMG_3.npy", "a/IMG_1.ARW.npy"]
    out = _dedup_cached(files)
    assert out == ["a/IMG_1.ARW.npy", "a/IMG_2.ARW", "a/IMG_3.npy"]


def test_meta_sidecar_found_for_decode_cache(tmp_path):
    """tools/decode_cache writes IMG_1.json next to IMG_1.ARW; indexing the
    cache file IMG_1.ARW.npy must find that sidecar (regression: the lookup
    only tried IMG_1.ARW.json, so cached trees fell back to ISO=100)."""
    import json

    from pnnp_tpu.data.infos import _meta_for

    np.save(str(tmp_path / "IMG_1.ARW.npy"), np.zeros((4, 4), np.uint16))
    with open(tmp_path / "IMG_1.json", "w") as f:
        json.dump({"ISO": 3200, "ExposureTime": 0.04}, f)
    m = _meta_for(str(tmp_path / "IMG_1.ARW.npy"))
    assert m["ISO"] == 3200 and abs(m["ExposureTime"] - 0.04) < 1e-9
    # plain .npy trees with stem sidecars keep working
    np.save(str(tmp_path / "f2.npy"), np.zeros((4, 4), np.uint16))
    with open(tmp_path / "f2.json", "w") as f:
        json.dump({"ISO": 800, "ExposureTime": 0.1}, f)
    assert _meta_for(str(tmp_path / "f2.npy"))["ISO"] == 800


def test_multi_mixer_name_dispatch(tmp_path):
    """Multi_{Real,Sync,Mix,Uproc}_Dataset names resolve through
    build_dataset to the MixedSubsetDataset mixing contract (reference:
    data_process/__init__.py:42-141 — base='indoor' variant at full
    crop_per_image, extra=dstname variant at crop_per_image//4)."""
    import shutil

    from pnnp_tpu.data.datasets import MixDataset
    from pnnp_tpu.data.extra import ImgDataset
    from tests.test_phone_and_nf import make_lrid_fixture

    make_sid_fixture(tmp_path)
    dst = dict(
        dataset="Multi_Mix_Dataset", dstname="SID", mode="train", H=32, W=48,
        patch_size=8, crop_per_image=8, croptype="random_crop", command="",
        camera_type="SonyA7S2", noise_code="p", wp=16383, bl=512, ori=False,
        clip=2, infos_dir=str(tmp_path / "infos"),
    )
    mix = build_dataset(dst)
    assert isinstance(mix, MixedSubsetDataset)
    assert isinstance(mix.base, MixDataset) and isinstance(mix.extra, MixDataset)
    assert mix.base.args["dstname"] == "indoor"
    assert mix.base.args["crop_per_image"] == 8
    assert mix.extra.args["crop_per_image"] == 2  # cpi // 4 contract
    assert len(mix) == len(mix.base) + len(mix.extra) // 4
    # mixed items concatenate 4 extra items back to the base crop count
    assert mix[len(mix.base)]["hr"].shape[0] == 8

    # Multi_Uproc: both halves are the sRGB-unprocess dataset over root_dir
    up = build_dataset(dict(dst, dataset="Multi_Uproc_Dataset",
                            root_dir=str(tmp_path)))
    assert isinstance(up.base, ImgDataset) and isinstance(up.extra, ImgDataset)

    # Multi_Sync: Img base + Mix extra
    sync = build_dataset(dict(dst, dataset="Multi_Sync_Dataset",
                              root_dir=str(tmp_path)))
    assert isinstance(sync.base, ImgDataset) and isinstance(sync.extra, MixDataset)

    # Multi_Real: phone Real_Dataset pair (the 'indoor' base replaces dstname
    # in root_dir too)
    from pnnp_tpu.data.phone import LRIDRealDataset

    make_lrid_fixture(tmp_path)
    for name in ("indoor", "outdoor"):
        for suffix in ("GT_align_ours", "short"):
            shutil.copy(tmp_path / "infos" / f"indoor_x5_{suffix}.info",
                        tmp_path / "infos" / f"{name}_{suffix}.info")
    real = build_dataset(dict(
        dst, dataset="Multi_Real_Dataset", dstname="outdoor",
        camera_type="IMX686", wp=1023, bl=64, ori=True, clip=False,
        ratio_list=[1, 2, 4], command="alldg",
        root_dir=str(tmp_path / "outdoor")))
    assert isinstance(real.base, LRIDRealDataset)
    assert isinstance(real.extra, LRIDRealDataset)
    assert real.base.args["dstname"] == "indoor"
    assert real.base.args["root_dir"] == str(tmp_path / "indoor")
    assert real.extra.args["dstname"] == "outdoor"

    # crop contract violations fail loudly
    with pytest.raises(ValueError):
        build_dataset(dict(dst, crop_per_image=6))
