"""Dataset info index builder CLI (reference: get_dataset_infos.py:204-222).

Usage:
  python tools/get_dataset_infos.py --dstname SID  --root_dir /data/SID  --mode train
  python tools/get_dataset_infos.py --dstname ELD  --root_dir /data/ELD
  python tools/get_dataset_infos.py --dstname LRID --root_dir /data/LRID --subset indoor_x5
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pnnp_tpu.data.infos import get_sid_info, get_eld_info, get_lrid_info


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dstname", required=True, choices=["SID", "ELD", "LRID"])
    p.add_argument("--root_dir", required=True)
    p.add_argument("--mode", default="train")
    p.add_argument("--subset", default="indoor_x5")
    p.add_argument("--out_dir", default="infos")
    p.add_argument("--pair_list", default=None, help="SID pair list txt")
    a = p.parse_args(argv)
    os.makedirs(a.out_dir, exist_ok=True)
    if a.dstname == "SID":
        get_sid_info(a.root_dir, os.path.join(a.out_dir, f"SID_{a.mode}.info"),
                     mode=a.mode, pair_list=a.pair_list)
    elif a.dstname == "ELD":
        get_eld_info(a.root_dir, os.path.join(a.out_dir, "ELD_SonyA7S2.info"))
    else:
        get_lrid_info(a.root_dir, os.path.join(a.out_dir, f"{a.subset}_GT_align_ours.info"),
                      dstname=a.subset)


if __name__ == "__main__":
    main()
