"""Full synthetic-tree evaltest harness (SURVEY.md §6 / BASELINE.md on-ramp).

One end-to-end chain over a mini SID + ELD tree in the reference's on-disk
layout (npy decode-cache files + JSON sidecars, exactly what
tools/decode_cache.py emits for real ARW data):

  raw trees -> tools/get_dataset_infos.py CLI -> torch .pth checkpoint ->
  torch->flax converter -> `--mode evaltest` trainer CLI (ELD dgain sweep +
  SID x100/x250/x300 sweep) -> parse the reference 3-line log summaries ->
  assert every number against an independent NumPy+torch oracle (+-0.05 dB,
  the BASELINE.md golden-parity budget).

With this in place, real-data golden parity (vs the four committed reference
logs) reduces to swapping the data in: run tools/decode_cache.py on the real
trees and point the same runfile at them. Parity runs should set
``disable_fast_path: true`` (as here) so eval math is f32.
"""

import os
import pickle
import re

import numpy as np
import pytest

pytestmark = pytest.mark.slow

H, W = 32, 48  # tiny mosaics; packed frames are [16, 24, 4]
NF = 4


# ---------------------------------------------------------------------------
# synthetic trees in the reference layout
# ---------------------------------------------------------------------------


def _write_raw(path, rng, lo, hi):
    np.save(path, rng.uniform(lo, hi, (H, W)).astype(np.float32))


def make_sid_tree(root, rng):
    """SID long/short dirs; exposure parses from filenames. Scene blocks are
    positional: [0:40] ratio 100, [40:80] ratio 250, [80:] ratio 300 (the
    reference's evaltest split, real_datasets.py:323-343)."""
    os.makedirs(os.path.join(root, "long"), exist_ok=True)
    os.makedirs(os.path.join(root, "short"), exist_ok=True)
    specs = [("10s", "0.1s")] * 40 + [("10s", "0.04s")] * 40 + [("30s", "0.1s")] * 6
    for fid, (le, se) in enumerate(specs):
        _write_raw(os.path.join(root, "long", f"{fid:05d}_00_{le}.npy"),
                   rng, 512, 16383)
        _write_raw(os.path.join(root, "short", f"{fid:05d}_00_{se}.npy"),
                   rng, 400, 2200)


def make_eld_tree(root, rng, n_scenes=2):
    """ELD scene dirs: ids {1,6,11,16} are GT (ISO100, 1s); the 3x2 iso/ratio
    grid sits at ids 2..5,7,8 with exact binary exposure times."""
    import json

    combos = [(800, 100), (800, 200), (1600, 100), (1600, 200),
              (3200, 100), (3200, 200)]
    slots = [2, 3, 4, 5, 7, 8]
    for s in range(1, n_scenes + 1):
        sd = os.path.join(root, "SonyA7S2", f"scene-{s}")
        os.makedirs(sd, exist_ok=True)
        for img_id in range(1, 17):
            p = os.path.join(sd, f"IMG_{img_id:04d}.npy")
            if img_id in (1, 6, 11, 16):
                meta = {"ISO": 100, "ExposureTime": 1.0}
                _write_raw(p, rng, 512, 16383)
            elif img_id in slots:
                iso, ratio = combos[slots.index(img_id)]
                meta = {"ISO": iso, "ExposureTime": 100.0 / (iso * ratio)}
                _write_raw(p, rng, 400, 2200)
            else:
                meta = {"ISO": 50, "ExposureTime": 1.0}  # never matched
                _write_raw(p, rng, 512, 16383)
            with open(os.path.splitext(p)[0] + ".json", "w") as f:
                json.dump(meta, f)


# ---------------------------------------------------------------------------
# independent torch forward + NumPy eval pipeline (the oracle)
# ---------------------------------------------------------------------------


def make_torch_state(rng):
    import torch

    def conv_w(o, i, k):
        return torch.from_numpy(rng.normal(0, 0.02, (o, i, k, k)).astype(np.float32))

    def tconv_w(i, o):
        return torch.from_numpy(rng.normal(0, 0.02, (i, o, 2, 2)).astype(np.float32))

    def b(o):
        return torch.from_numpy(rng.normal(0, 0.02, (o,)).astype(np.float32))

    sd, nf = {}, NF
    chans = {
        "conv1_1": (nf, 4, 3), "conv1_2": (nf, nf, 3),
        "conv2_1": (2 * nf, nf, 3), "conv2_2": (2 * nf, 2 * nf, 3),
        "conv3_1": (4 * nf, 2 * nf, 3), "conv3_2": (4 * nf, 4 * nf, 3),
        "conv4_1": (8 * nf, 4 * nf, 3), "conv4_2": (8 * nf, 8 * nf, 3),
        "conv5_1": (16 * nf, 8 * nf, 3), "conv5_2": (16 * nf, 16 * nf, 3),
        "conv6_1": (8 * nf, 16 * nf, 3), "conv6_2": (8 * nf, 8 * nf, 3),
        "conv7_1": (4 * nf, 8 * nf, 3), "conv7_2": (4 * nf, 4 * nf, 3),
        "conv8_1": (2 * nf, 4 * nf, 3), "conv8_2": (2 * nf, 2 * nf, 3),
        "conv9_1": (nf, 2 * nf, 3), "conv9_2": (nf, nf, 3),
        "conv10_1": (4, nf, 1),
    }
    for name, (o, i, k) in chans.items():
        sd[name + ".weight"] = conv_w(o, i, k)
        sd[name + ".bias"] = b(o)
    for name, (i, o) in {"upv6": (16 * nf, 8 * nf), "upv7": (8 * nf, 4 * nf),
                         "upv8": (4 * nf, 2 * nf), "upv9": (2 * nf, nf)}.items():
        sd[name + ".weight"] = tconv_w(i, o)
        sd[name + ".bias"] = b(o)
    return sd


def torch_unet(sd, x_nhwc):
    """Reference-architecture forward in torch NCHW (independent of flax)."""
    import torch
    import torch.nn.functional as F

    lr = lambda t: F.leaky_relu(t, 0.2)
    c = lambda t, n: F.conv2d(t, sd[n + ".weight"], sd[n + ".bias"],
                              padding=sd[n + ".weight"].shape[-1] // 2)
    u = lambda t, n: F.conv_transpose2d(t, sd[n + ".weight"], sd[n + ".bias"],
                                        stride=2)
    with torch.no_grad():
        x = torch.from_numpy(np.ascontiguousarray(
            x_nhwc.transpose(0, 3, 1, 2))).float()
        c1 = lr(c(lr(c(x, "conv1_1")), "conv1_2"))
        c2 = lr(c(lr(c(F.max_pool2d(c1, 2), "conv2_1")), "conv2_2"))
        c3 = lr(c(lr(c(F.max_pool2d(c2, 2), "conv3_1")), "conv3_2"))
        c4 = lr(c(lr(c(F.max_pool2d(c3, 2), "conv4_1")), "conv4_2"))
        c5 = lr(c(lr(c(F.max_pool2d(c4, 2), "conv5_1")), "conv5_2"))
        t = torch.cat([u(c5, "upv6"), c4], 1)
        c6 = lr(c(lr(c(t, "conv6_1")), "conv6_2"))
        t = torch.cat([u(c6, "upv7"), c3], 1)
        c7 = lr(c(lr(c(t, "conv7_1")), "conv7_2"))
        t = torch.cat([u(c7, "upv8"), c2], 1)
        c8 = lr(c(lr(c(t, "conv8_1")), "conv8_2"))
        t = torch.cat([u(c8, "upv9"), c1], 1)
        c9 = lr(c(lr(c(t, "conv9_1")), "conv9_2"))
        out = c(c9, "conv10_1")
        return out.numpy().transpose(0, 2, 3, 1)


def np_pack(raw, wp=16383.0, bl=512.0, clip=False):
    out = np.stack((raw[0::2, 0::2], raw[0::2, 1::2],
                    raw[1::2, 1::2], raw[1::2, 0::2]), -1).astype(np.float32)
    out = (out - bl) / (wp - bl)
    return np.clip(out, 0.0, 1.0) if clip else out


def np_ssim(x, y, data_range=255.0, win=7):
    from scipy.ndimage import uniform_filter

    x, y = x.astype(np.float64), y.astype(np.float64)
    n = win * win
    cov_norm = n / (n - 1.0)
    filt = lambda a: np.stack(
        [uniform_filter(a[..., c], win) for c in range(a.shape[-1])], -1)
    ux, uy = filt(x), filt(y)
    vx = cov_norm * (filt(x * x) - ux * ux)
    vy = cov_norm * (filt(y * y) - uy * uy)
    vxy = cov_norm * (filt(x * y) - ux * uy)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / \
        ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    pad = (win - 1) // 2
    return float(np.mean(s[pad:-pad, pad:-pad]))


def oracle_eval(sd, lr_pack, hr_pack, ratio, correct=True):
    """Replicates the eval contract: x ratio, half-clip, symmetric reflect-pad
    %16 + center crop (trainer_SID.py:221-226), forward, clamp,
    illuminance-correct (SID/ELD only — the reference LRID eval never calls
    the corrector, trainer_LRID.py:195-319), 255-scale PSNR/SSIM."""
    lr = np.minimum(lr_pack * ratio, 1.0)          # clip=2: lower bound -inf
    hr = np.clip(hr_pack, 0.0, 1.0)
    h, w = lr.shape[:2]
    ph, pw = (-h) % 16, (-w) % 16
    x = np.pad(lr[None], ((0, 0), (ph // 2, ph - ph // 2),
                          (pw // 2, pw - pw // 2), (0, 0)), mode="reflect")
    dn = torch_unet(sd, x)[0, ph // 2:ph // 2 + h, pw // 2:pw // 2 + w, :]
    dn = np.clip(dn, 0.0, 1.0)
    if correct:
        wgt = (hr != 1.0).astype(np.float64)
        dn = dn * (np.sum(dn * hr * wgt) / np.sum(dn * dn * wgt))
    out255, tgt255 = dn * 255.0, hr * 255.0
    in255 = np.clip(lr, 0.0, 1.0) * 255.0
    p = 10 * np.log10(255.0**2 / np.mean((out255 - tgt255) ** 2))
    p_in = 10 * np.log10(255.0**2 / np.mean((in255 - tgt255) ** 2))
    return p, np_ssim(out255, tgt255), p_in, np_ssim(in255, tgt255)


# ---------------------------------------------------------------------------
# the harness
# ---------------------------------------------------------------------------


def test_evaltest_full_chain(tmp_path, monkeypatch):
    import yaml

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(2024)
    make_sid_tree(str(tmp_path / "SID"), rng)
    make_eld_tree(str(tmp_path / "ELD"), rng)

    # 1. the real offline index CLI
    from tools.get_dataset_infos import main as build_infos

    build_infos(["--dstname", "SID", "--root_dir", str(tmp_path / "SID"),
                 "--mode", "evaltest", "--out_dir", str(tmp_path / "infos")])
    build_infos(["--dstname", "ELD", "--root_dir", str(tmp_path / "ELD"),
                 "--out_dir", str(tmp_path / "infos")])

    # 2. torch checkpoint -> converter -> trainer best-checkpoint slot
    import torch

    sd = make_torch_state(np.random.default_rng(7))
    torch.save(sd, tmp_path / "harness.pth")

    from pnnp_tpu.train.checkpoint import load_any, save_checkpoint

    params = load_any(str(tmp_path / "harness.pth"))["params"]
    os.makedirs("checkpoints/T", exist_ok=True)
    save_checkpoint("checkpoints/T/HARNESS_Unet_best_model.ckpt", params,
                    None, {"epoch": 0, "eval_psnr": 1.0})

    # 3. runfile: ELD eval sweep + SID evaltest sweep, f32 eval math
    dst = {
        "dstname": "SID", "command": "", "camera_type": "SonyA7S2",
        "noise_code": "p", "patch_size": 8, "H": H, "W": W,
        "crop_per_image": 1, "croptype": "random_crop", "wp": 16383,
        "bl": 512, "ori": False, "clip": 2,
        "infos_dir": str(tmp_path / "infos"),
    }
    runfile = {
        "mode": "evaltest", "checkpoint": "saved_model/T",
        "fast_ckpt": "checkpoints/T", "model_name": "HARNESS_Unet",
        "num_workers": 0, "brightness_correct": True,
        "disable_fast_path": True,
        "dst": dst,
        "dst_eval": dict(dst, mode="eval", dataset="ELD_Dataset",
                         iso_list=[800, 1600, 3200], ratio_list=[100, 200]),
        "dst_test": dict(dst, mode="evaltest", dataset="SID_Dataset",
                         ratio_list=[100, 250, 300]),
        "arch": {"name": "UNetSeeInDark", "in_nc": 4, "out_nc": 4, "nf": NF,
                 "nframes": 1, "res": False},
        "hyper": {"lr_scheduler": "fixed", "learning_rate": 1e-4,
                  "batch_size": 1, "last_epoch": 0, "stop_epoch": 1,
                  "save_freq": 1, "plot_freq": 1, "best_psnr": 0},
    }
    with open(tmp_path / "run.yml", "w") as f:
        yaml.safe_dump(runfile, f)

    # 4. the actual CLI entry (nofig: keep matplotlib out of the oracle loop)
    from pnnp_tpu.trainer import main as trainer_main

    trainer_main(["-f", str(tmp_path / "run.yml"), "--mode", "evaltest",
                  "--debug", "--nofig"])

    # 5. oracle: replay every sweep through the NumPy+torch pipeline
    with open(tmp_path / "infos" / "ELD_SonyA7S2.info", "rb") as f:
        eld_scenes = pickle.load(f)
    with open(tmp_path / "infos" / "SID_evaltest.info", "rb") as f:
        sid_infos = pickle.load(f)

    gt_ids = np.array([1, 6, 11, 16])
    summaries = []  # (psnr, ssim, psnr_lr, ssim_lr) per sweep

    for dgain in (100, 200):  # ELD: scene x iso, this ratio
        vals = []
        for scene in eld_scenes:
            for iso in (800, 1600, 3200):
                img_id = next(i + 1 for i, e in enumerate(scene)
                              if e["ISO"] == iso and e["ratio"] == dgain)
                gt_id = int(gt_ids[np.argmin(np.abs(img_id - gt_ids))])
                hr = np_pack(np.load(scene[gt_id - 1]["data"]), clip=True)
                lr = np_pack(np.load(scene[img_id - 1]["data"]), clip=False)
                vals.append(oracle_eval(sd, lr, hr, dgain))
        summaries.append(np.mean(vals, axis=0))

    splits = [sid_infos[:40], sid_infos[40:80], sid_infos[80:]]
    for split, ratio in zip(splits, (100, 250, 300)):
        vals = []
        for info in split:
            hr = np_pack(np.load(info["long"]), clip=True)
            lr = np_pack(np.load(info["short"][0]), clip=False)
            vals.append(oracle_eval(sd, lr, hr, float(info["ratio"][0])))
        summaries.append(np.mean(vals, axis=0))

    # 6. parse the 3-line log contract and compare (±0.05 dB budget)
    with open("logs/log_HARNESS_Unet.log") as f:
        logtext = f.read()
    psnrs = [float(m) for m in re.findall(r"Epoch -1: PSNR=([\d.]+)", logtext)]
    lrs = re.findall(r"psnrs_lr=([\d.]+), psnrs_dn=([\d.]+)", logtext)
    ssims = re.findall(r"ssims_lr=([\d.]+), ssims_dn=([\d.]+)", logtext)
    assert len(psnrs) == 5, logtext

    for i, (p_log, (plr, pdn), (slr, sdn)) in enumerate(zip(psnrs, lrs, ssims)):
        p_or, s_or, plr_or, slr_or = summaries[i]
        assert abs(p_log - p_or) < 0.05 + 0.006, (i, p_log, p_or)
        assert abs(float(pdn) - p_or) < 0.05 + 0.006, (i, pdn, p_or)
        assert abs(float(sdn) - s_or) < 0.002, (i, sdn, s_or)
        # nofig mode: lr meters mirror dn meters (reference plots drive them)

    # metrics pkl written with per-image entries
    with open("metrics/HARNESS_Unet_metrics.pkl", "rb") as f:
        metrics = pickle.load(f)
    assert len(metrics) >= 86 + 12


# ---------------------------------------------------------------------------
# LRID / IMX686 leg
# ---------------------------------------------------------------------------


def make_lrid_tree(root, rng, n_scenes=59):
    """LRID layout: {root}/indoor_x5/pos-XXX/{GT_align_ours|short_xN}/*.npy
    (+ JSON sidecars), matching tools/get_dataset_infos.py --dstname LRID."""
    import json

    global H, W
    for s in range(n_scenes):
        sd = os.path.join(root, "indoor_x5", f"pos-{s:03d}")
        gt_dir = os.path.join(sd, "GT_align_ours")
        os.makedirs(gt_dir, exist_ok=True)
        p = os.path.join(gt_dir, "gt.npy")
        _write_raw_lrid(p, rng, 64, 1023)
        with open(os.path.splitext(p)[0] + ".json", "w") as f:
            json.dump({"ISO": 100, "ExposureTime": 0.05}, f)
        for dg in (1, 2, 4, 8, 16):
            shd = os.path.join(sd, f"short_x{dg}")
            os.makedirs(shd, exist_ok=True)
            sp = os.path.join(shd, "s0.npy")
            _write_raw_lrid(sp, rng, 64, 64 + (1023 - 64) / dg)
            with open(os.path.splitext(sp)[0] + ".json", "w") as f:
                json.dump({"ISO": 6400, "ExposureTime": 0.05 / dg}, f)


def _write_raw_lrid(path, rng, lo, hi):
    np.save(path, rng.uniform(lo, hi, (H, W)).astype(np.float32))


def test_evaltest_lrid_chain(tmp_path, monkeypatch):
    import yaml

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(11)
    make_lrid_tree(str(tmp_path / "LRID"), rng)

    from tools.get_dataset_infos import main as build_infos

    build_infos(["--dstname", "LRID", "--root_dir", str(tmp_path / "LRID"),
                 "--subset", "indoor_x5", "--out_dir", str(tmp_path / "infos")])

    import torch

    sd = make_torch_state(np.random.default_rng(3))
    torch.save(sd, tmp_path / "h686.pth")

    from pnnp_tpu.train.checkpoint import load_any, save_checkpoint

    params = load_any(str(tmp_path / "h686.pth"))["params"]
    os.makedirs("checkpoints/T", exist_ok=True)
    save_checkpoint("checkpoints/T/HARNESS686_Unet_best_model.ckpt", params,
                    None, {"epoch": 0, "eval_psnr": 1.0})

    dst = {
        "dstname": "indoor_x5", "command": "", "camera_type": "IMX686",
        "GT_type": "GT_align_ours", "noise_code": "p", "patch_size": 8,
        "H": H, "W": W, "crop_per_image": 1, "croptype": "random_crop",
        "wp": 1023, "bl": 64, "ori": False, "clip": False,
        "infos_dir": str(tmp_path / "infos"),
    }
    runfile = {
        "mode": "evaltest", "checkpoint": "saved_model/T",
        "fast_ckpt": "checkpoints/T", "model_name": "HARNESS686_Unet",
        "num_workers": 0, "brightness_correct": True,
        "disable_fast_path": True,
        "dst": dst,
        "dst_eval": dict(dst, mode="eval", dataset="IMX686_Dataset",
                         ratio_list=[1, 2, 4, 8, 16]),
        "arch": {"name": "UNetSeeInDark", "in_nc": 4, "out_nc": 4, "nf": NF,
                 "nframes": 1, "res": False},
        "hyper": {"lr_scheduler": "fixed", "learning_rate": 1e-4,
                  "batch_size": 1, "last_epoch": 0, "stop_epoch": 1,
                  "save_freq": 1, "plot_freq": 1, "best_psnr": 0},
    }
    with open(tmp_path / "run686.yml", "w") as f:
        yaml.safe_dump(runfile, f)

    from pnnp_tpu.trainer import main as trainer_main

    trainer_main(["-f", str(tmp_path / "run686.yml"), "--mode", "evaltest",
                  "--debug", "--nofig"])

    # oracle over the eval scene split x dgain ladder
    from pnnp_tpu.data.phone import EVAL_IDS

    with open(tmp_path / "infos" / "indoor_x5_GT_align_ours.info", "rb") as f:
        gt_infos = pickle.load(f)
    with open(tmp_path / "infos" / "indoor_x5_short.info", "rb") as f:
        short_infos = pickle.load(f)

    summaries = []
    for dg in (1, 2, 4, 8, 16):
        vals = []
        for sid in EVAL_IDS["indoor_x5"]:
            hr = np_pack(np.load(gt_infos[sid]["data"]), wp=1023, bl=64, clip=True)
            lr = np_pack(np.load(short_infos[dg][sid]["data"][0]),
                         wp=1023, bl=64, clip=False)
            # LRID eval: NO illuminance correction (trainer_LRID never calls
            # the corrector even with brightness_correct: true)
            vals.append(oracle_eval(sd, lr, hr, float(dg), correct=False))
        summaries.append(np.mean(vals, axis=0))

    with open("logs/log_HARNESS686_Unet.log") as f:
        logtext = f.read()
    psnrs = [float(m) for m in re.findall(r"Epoch -1: PSNR=([\d.]+)", logtext)]
    ssims = re.findall(r"ssims_lr=([\d.]+), ssims_dn=([\d.]+)", logtext)
    assert len(psnrs) == 5, logtext
    for i, (p_log, (_, sdn)) in enumerate(zip(psnrs, ssims)):
        p_or, s_or = summaries[i][0], summaries[i][1]
        assert abs(p_log - p_or) < 0.05 + 0.006, (i, p_log, p_or)
        assert abs(float(sdn) - s_or) < 0.002, (i, sdn, s_or)
