"""Additional datasets: sRGB-unprocessing and indoor+X mixers.

Ports of reference syn_datasets.Img_Dataset (Brooks unprocess pipeline on
sRGB images) and the Multi_{Real,Sync,Mix}_Dataset combinators
(reference: data_process/__init__.py:42-141) — an 'indoor' base dataset mixed
with a second subset at a 1:4 crop ratio.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from pnnp_tpu.data.crops import CropPlanner
from pnnp_tpu.data.datasets import BaseRawDataset
from pnnp_tpu.data.io import dataload


class ImgDataset(BaseRawDataset):
    """sRGB image -> unprocessed raw training pairs (reference:
    syn_datasets.py:207-283). The unprocess + noise stages run on-device
    (pnnp_tpu.physics.unprocess / train.steps); the host only loads + crops
    sRGB images and hands them over as [n, p, p, 3] float."""

    def __init__(self, args=None, seed: int = 1997):
        super().__init__(args, seed)
        root = self.args.get("root_dir", ".")
        exts = (".png", ".jpg", ".jpeg", ".bmp", ".npy")
        self.files = sorted(
            p for p in glob.glob(os.path.join(root, "**", "*"), recursive=True)
            if os.path.splitext(p)[-1].lower() in exts
        )
        self.length = len(self.files)

    def __getitem__(self, idx):
        img = np.asarray(dataload(self.files[idx]), np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        if img.ndim == 2:  # grayscale -> 3-channel
            img = np.stack([img] * 3, axis=-1)
        p = self.args["patch_size"] * 2  # sRGB-space patch (mosaic halves it)
        H, W = img.shape[:2]
        if H < p or W < p:  # reflect-pad small images up to the patch size
            img = np.pad(img, ((0, max(p - H, 0)), (0, max(p - W, 0)), (0, 0)),
                         mode="reflect")
            H, W = img.shape[:2]
        n = self.args["crop_per_image"]
        crops = np.empty((n, p, p, 3), np.float32)
        for i in range(n):
            h0 = int(self.rng.integers(0, H - p + 1))
            w0 = int(self.rng.integers(0, W - p + 1))
            patch = img[h0 : h0 + p, w0 : w0 + p, :3]
            # syn-family 8-mode aug (rot90 allowed: noise comes later,
            # reference syn_datasets.py:75,101-107)
            crops[i] = CropPlanner.augment(patch, int(self.rng.integers(8)),
                                           aug_modes=8)
        return {
            "srgb": crops,
            "name": os.path.basename(self.files[idx]),
            "ratio": np.ones(n, np.float32),
        }


class MixedSubsetDataset:
    """indoor + X mixer: full sampling of the indoor base, 1/4-rate sampling
    of the second subset (reference: Multi_Real/Mix_Dataset semantics).

    The reference builds the extra subset with ``crop_per_image // rate``
    (data_process/__init__.py:76-87) so concatenating ``rate`` extra items
    restores the base per-item crop count; mixed batches then have a single
    leading dim (one jit signature). When both datasets expose a
    ``crop_per_image`` arg, this constructor enforces that contract —
    adjusting the extra dataset in place when the base count divides evenly,
    raising otherwise (ragged crop counts would force per-shape recompiles
    and skew sampling weight toward extra items)."""

    def __init__(self, base, extra, extra_rate: int = 4):
        self.base = base
        self.extra = extra
        self.extra_rate = extra_rate
        ba = getattr(base, "args", None)
        ea = getattr(extra, "args", None)
        if (isinstance(ba, dict) and isinstance(ea, dict)
                and "crop_per_image" in ba and "crop_per_image" in ea
                and ea["crop_per_image"] * extra_rate != ba["crop_per_image"]):
            if ba["crop_per_image"] % extra_rate != 0:
                raise ValueError(
                    f"base crop_per_image={ba['crop_per_image']} is not "
                    f"divisible by extra_rate={extra_rate}; build the extra "
                    "dataset with crop_per_image = base // extra_rate "
                    "(reference: data_process/__init__.py:76-87)")
            ea["crop_per_image"] = ba["crop_per_image"] // extra_rate
        self.l1 = len(base)
        self.l2 = len(extra)

    def __len__(self):
        return self.l1 + self.l2 // self.extra_rate

    def __getitem__(self, idx):
        if idx < self.l1:
            return self.base[idx]
        # one mixed sample concatenates extra_rate consecutive extra items
        # (the reference's Multi_Sync concat, data_process/__init__.py:76-87)
        # so ALL extra items are covered, at 1/extra_rate sampling weight
        j = (idx - self.l1) * self.extra_rate
        items = [self.extra[(j + k) % self.l2] for k in range(self.extra_rate)]
        out = dict(items[0])
        for key, v in items[0].items():
            if isinstance(v, np.ndarray) and v.ndim >= 1:
                out[key] = np.concatenate(
                    [np.atleast_1d(i[key]) for i in items], axis=0)
        return out

    def reseed_worker(self, seed: int, epoch: int, worker: int):
        for d in (self.base, self.extra):
            if hasattr(d, "reseed_worker"):
                d.reseed_worker(seed, epoch, worker)
