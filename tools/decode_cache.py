"""Offline RAW decode cache builder.

Decodes ARW/DNG files once (on a machine with rawpy/LibRaw) into ``.npy``
mosaics + ``.json`` metadata sidecars next to the originals, so the training
hosts never need LibRaw at __getitem__ time (the reference decoded with rawpy
on every access — utils/utils.py:247).

Usage: python tools/decode_cache.py <dir> [--pattern '*.ARW'] [--meta-only]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def decode_one(path: str, meta_only: bool = False) -> bool:
    try:
        import rawpy
    except ImportError:
        print("rawpy is required for decoding; install LibRaw+rawpy", file=sys.stderr)
        return False
    npy_path = path + ".npy"
    json_path = os.path.splitext(path)[0] + ".json"
    with rawpy.imread(path) as raw:
        if not meta_only and not os.path.exists(npy_path):
            np.save(npy_path, raw.raw_image_visible.astype(np.uint16))
        if not os.path.exists(json_path):
            wb = np.array(raw.camera_whitebalance, np.float32)
            wb = wb / wb[1]
            ccm = raw.color_matrix[:3, :3].astype(np.float32)
            if ccm[0, 0] == 0:
                ccm = np.eye(3, dtype=np.float32)
            meta = {
                "wb": wb[:4].tolist(),
                "ccm": ccm.tolist(),
                "black_level_per_channel": list(map(int, raw.black_level_per_channel)),
            }
            try:
                import exifread

                with open(path, "rb") as f:
                    tags = exifread.process_file(f, details=False)
                meta["ISO"] = int(str(tags.get("EXIF ISOSpeedRatings", 100)))
                expo = str(tags.get("EXIF ExposureTime", "0.1"))
                meta["ExposureTime"] = (
                    float(expo.split("/")[0]) / float(expo.split("/")[1])
                    if "/" in expo else float(expo)
                )
            except ImportError:
                pass
            with open(json_path, "w") as f:
                json.dump(meta, f)
    return True


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("--pattern", default="**/*.ARW")
    p.add_argument("--meta-only", action="store_true")
    a = p.parse_args(argv)
    files = glob.glob(os.path.join(a.root, a.pattern), recursive=True)
    ok = 0
    for i, f in enumerate(sorted(files)):
        if decode_one(f, a.meta_only):
            ok += 1
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{len(files)}")
    print(f"decoded {ok}/{len(files)}")


if __name__ == "__main__":
    main()
