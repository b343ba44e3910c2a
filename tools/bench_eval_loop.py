"""End-to-end PRODUCTION eval-loop benchmark on the real TPU.

Unlike tools/eval_fullres.py (which times the fused step with frames already
resident on device), this drives the full serving loop the way Trainer.eval
does: DataLoader prefetch workers (host pack) -> host->device transfer ->
fused eval step -> host metric readback, per frame. The delta vs the in-jit
step time is the host/tunnel overhead the loop really pays.

Modes:
  --sync      (default trainer behavior) read metrics back every frame
  --pipeline  defer each frame's readback until the NEXT frame is dispatched
              — jax's async dispatch then overlaps frame k's compute with
              frame k+1's host transfer, hiding the tunnel round-trip.

Usage: python tools/bench_eval_loop.py [--frames 8] [--camera SonyA7S2]
  -> one JSON line per mode.

MEASURED (v5e via axon tunnel, 2026-08-17): 3396 ms/frame sync, 3776
pipelined — vs 38.5 ms for the in-jit step (tools/eval_fullres.py
--packed). The gap is ENTIRELY the tunnel's host->device path (~92 MB of
frames per iteration at tunnel bandwidth); the transfer blocks inside
jnp.asarray, so deferred readback cannot overlap it and the pipelined mode
only adds variance. On a directly-attached TPU host (PCIe/DMA, ~GB/s) the
transfer term is ~3-5 ms and the loop sits within a few ms of the in-jit
number. Deployment-representative serving throughput is therefore what
bench.py / eval_fullres.py measure (device-resident frames, chained jit);
this tool exists to keep the loop-overhead claim honest and re-measurable.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = {"SonyA7S2": (2848, 4256), "IMX686": (3472, 4624)}


class SyntheticEvalDataset:
    """Minimal eval-shaped dataset: full-res lr/hr pairs in host memory."""

    def __init__(self, n, h, w):
        rng = np.random.default_rng(0)
        # one shared buffer per role: the loop cost does not depend on pixel
        # values, and n full frames of fresh entropy would be slow to build
        self.lr = rng.uniform(0, 0.3, (1, h, w, 4)).astype(np.float32)
        self.hr = rng.uniform(0, 1.0, (1, h, w, 4)).astype(np.float32)
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"lr": self.lr.copy(), "hr": self.hr,
                "ratio": np.float32(1.0), "name": f"f{i:03d}"}


def run_loop(step, tp, loader, pipeline: bool):
    results = []
    pending = None  # (name, metrics dict) awaiting readback
    t0 = time.perf_counter()
    for batch in loader:
        lr = jnp.asarray(batch["lr"])
        hr = jnp.asarray(batch["hr"])
        ratio = jnp.asarray(batch["ratio"]).reshape(-1)[0]
        dnf, m = step(tp, lr, hr, ratio, ori=False, correct=True,
                      with_inputs=False)
        name = batch["name"][0]
        if pipeline:
            if pending is not None:
                results.append((pending[0], float(pending[1]["psnr"]),
                                float(pending[1]["ssim"])))
            pending = (name, m)
        else:
            results.append((name, float(m["psnr"]), float(m["ssim"])))
    if pending is not None:
        results.append((pending[0], float(pending[1]["psnr"]),
                        float(pending[1]["ssim"])))
    dt = time.perf_counter() - t0
    return dt, results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--camera", default="SonyA7S2", choices=list(SHAPES))
    ap.add_argument("--workers", type=int, default=3)
    a = ap.parse_args()

    from pnnp_tpu.data.loader import DataLoader
    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import pack_frame_np, transform_params_hybrid
    from pnnp_tpu.train import create_train_state
    from pnnp_tpu.train.steps import make_eval_metrics_step

    H, W = SHAPES[a.camera]
    h, w = H // 2, W // 2
    model = UNetSeeInDark(nf=32)
    state = create_train_state(jax.random.key(0), model,
                               jnp.zeros((1, 64, 64, 4)))
    tp = jax.jit(lambda p: transform_params_hybrid(p))(state.params)
    step = make_eval_metrics_step(model)

    ds = SyntheticEvalDataset(a.frames, h, w)

    def _pack(batch):
        batch["lr"] = pack_frame_np(np.asarray(batch["lr"]))
        return batch

    def make_loader():
        return DataLoader(ds, batch_size=1, shuffle=False,
                          num_workers=a.workers, transform=_pack)

    # warm both traced shapes once (compile outside the timed region)
    dt, base = run_loop(step, tp, make_loader(), pipeline=False)
    for pipeline in (False, True):
        best = 1e9
        for _ in range(3):
            dt, res = run_loop(step, tp, make_loader(), pipeline=pipeline)
            best = min(best, dt / a.frames)
        assert [r[0] for r in res] == [r[0] for r in base]
        assert all(abs(x[1] - y[1]) < 1e-5 for x, y in zip(res, base))
        mpix = H * W / 1e6
        print(json.dumps({
            "camera": a.camera,
            "mode": "pipelined" if pipeline else "sync",
            "ms_per_frame": round(best * 1e3, 2),
            "mpix_s": round(mpix / best, 1),
            "includes": "loader(pack)+h2d+fused step+metric readback",
        }))


if __name__ == "__main__":
    main()
