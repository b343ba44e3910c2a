"""Trainer: runfile-driven training/evaluation orchestration.

The TPU-native counterpart of the reference trainer layer (reference:
base_trainer.py + trainer_SID.py): same CLI surface
(``python -m pnnp_tpu.trainer -f runfile --mode {train,eval,test,evaltest,
trainonly,dump}``), same YAML runfiles, same log/metric/checkpoint contract
— 'train' evaluates with the best weights after finishing (trainer_SID.py:
521-534), 'eval'/'test'/'evaltest' sweep dst_eval / dst_test / both, 'dump'
saves denoised outputs (the reference test() method), 'trainonly' trains
without the eval leg — but
the hot path is one jitted XLA program (loader -> on-device noise synth ->
fwd -> bwd -> Adam) over a data-parallel mesh, and eval metrics (PSNR/SSIM,
brightness correction, device ISP) never leave the chip.
"""

from __future__ import annotations

import argparse
import os
import pickle
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pnnp_tpu.config import command_of, load_runfile
from pnnp_tpu.data import build_dataset, DataLoader
from pnnp_tpu.models import build_model, PixelWiseISOProxy, NoiseFlow
from pnnp_tpu.models.registry import example_input_channels
from pnnp_tpu.ops import illuminance_correct, psnr as psnr_fn, ssim as ssim_fn, fast_isp
from pnnp_tpu.ops.metrics import rgb_quality
from pnnp_tpu.parallel import (
    make_eval_metrics_step_sharded,
    make_mesh,
    make_sharded_train_step,
    replicate,
    shard_batch,
    spatial_eval_auto,
)
from pnnp_tpu.train import (
    CheckpointManager,
    build_lr_schedule,
    create_train_state,
    identity_synth,
    load_any,
    make_eval_metrics_step,
    make_eval_step,
    make_mix_synth,
    make_proxy_synth,
    make_raw_synth,
    make_raw_synth_packed,
    make_train_step,
    pack_synth,
)
from pnnp_tpu.utils.logging import AverageMeter, StepTimer, log


def _render_sample(imgs, jpg_path, png_path):
    """Build + save the 3-panel figure and the denoised PNG (thread-safe:
    object-oriented matplotlib only, no pyplot state)."""
    try:
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.image as mpimg
        from matplotlib.figure import Figure
    except ImportError:
        return
    mpimg.imsave(png_path, np.clip(imgs[1], 0.0, 1.0))
    fig = Figure(figsize=(15, 5))
    axes = fig.subplots(1, 3)
    for ax, img, title in zip(axes, imgs, ("noisy", "denoised", "gt")):
        ax.imshow(np.clip(img, 0, 1))
        ax.set_title(title)
        ax.axis("off")
    fig.savefig(jpg_path, bbox_inches="tight", dpi=60)


class Parser:
    """CLI surface of the reference BaseParser (base_trainer.py:6-17)."""

    @staticmethod
    def parse(argv=None):
        p = argparse.ArgumentParser()
        p.add_argument("--runfile", "-f", default="runfiles/SonyA7S2/PNNP.yml")
        p.add_argument("--mode", "-m", default=None)
        p.add_argument("--debug", action="store_true")
        p.add_argument("--nofig", action="store_true")
        # Accepted for reference CLI parity, intentionally inert: the
        # reference's --nohost disables its hostname->data-root remap
        # (utils/utils.py:204-219); our runfiles carry explicit roots and
        # config.load_runfile(root_prefix=...) covers remapping.
        p.add_argument("--nohost", action="store_true")
        p.add_argument("--gpu", default="0")  # accepted for CLI parity; unused on TPU
        # Beyond-parity: serve eval/test forwards through the W8A8 int8 path
        # (models/unet_s2d_int8.py; accuracy-neutral at the validated default
        # calibration, tools/validate_int8.py). Requires the fused eval path.
        p.add_argument("--int8", action="store_true")
        return p.parse_args(argv)


class Trainer:
    def __init__(self, runfile: str, mode: Optional[str] = None, nofig: bool = False,
                 debug: bool = False, root_prefix: Optional[str] = None, seed: int = 1997,
                 int8: bool = False):
        self.args = load_runfile(runfile, mode=mode, root_prefix=root_prefix)
        self.mode = self.args["mode"]
        self.dst = self.args["dst"]
        self.hyper = self.args["hyper"]
        self.arch = self.args["arch"]
        self.model_name = self.args["model_name"]
        self.save_plot = not nofig
        self.int8_eval = bool(int8)
        # W8A8 eval calibration traffic (frames). One frame measured -0.10 dB
        # mean vs the validated multi-frame recipe on the same checkpoint
        # (tools/validate_int8.py: one-frame-from-eval -0.174 vs disjoint-x3
        # -0.073 at pct 99.95), so the trainer buffers the first N eval
        # frames — serving them through the exact bf16 fused step — and
        # calibrates once at frame N.
        self.int8_cal_frames = int(self.args.get("int8_cal_frames", 3))
        self.debug = debug
        self.seed = seed
        self.rng = jax.random.key(seed)
        self._plot_pool = None  # lazy ThreadPoolExecutor for figure renders
        self._plot_futures = []

        self.logfile = f"./logs/log_{self.model_name}.log"
        self.sample_dir = os.path.join(self.args.get("result_dir", "images"),
                                       f"samples-{self.model_name}")
        os.makedirs(self.sample_dir, exist_ok=True)
        os.makedirs("./logs", exist_ok=True)
        os.makedirs("./metrics", exist_ok=True)

        # --- model ---------------------------------------------------------
        self.model = build_model(self.arch)
        patch = int(self.dst.get("patch_size", 512))
        example = jnp.zeros((1, patch, patch, example_input_channels(self.arch)))
        self.state = create_train_state(jax.random.key(seed), self.model, example)
        self.lr_schedule = build_lr_schedule(self.hyper)

        # --- proxy (PNNP / NoiseFlow) -------------------------------------
        self.proxy = None
        self.proxy_vars = None
        arch_proxy = self.args.get("arch_proxy")
        if arch_proxy and self.mode in ("train", "trainonly"):
            self._init_proxy(arch_proxy)

        # --- checkpoints ---------------------------------------------------
        self.ckpt = CheckpointManager(
            self.args.get("fast_ckpt", "checkpoints"),
            self.args.get("checkpoint", "saved_model"),
            self.model_name,
            save_freq=self.hyper.get("save_freq", 10),
        )
        self.ckpt.best_psnr = self.hyper.get("best_psnr", 0)
        self.last_epoch = int(self.hyper.get("last_epoch", 0))
        if self.last_epoch > 0 or self.mode != "train":
            self._try_restore()

        # --- datasets ------------------------------------------------------
        self.dst_train = self.args.get("dst_train")
        self.dst_eval = self.args.get("dst_eval")
        self.dst_test = self.args.get("dst_test")
        self.dataset_train = None
        self.dataset_eval = None
        if self.mode in ("train", "trainonly") and self.dst_train:
            self.dataset_train = build_dataset(self.dst_train, seed=seed)
        if self.dst_eval and self.mode != "trainonly":
            self.dataset_eval = build_dataset(self.dst_eval, seed=seed)

        # --- mesh + steps --------------------------------------------------
        # Training: all devices on the 'data' axis (gradients psum'ed by XLA,
        # the SPMD analog of the reference's DataParallel wrap,
        # base_trainer.py:115-118). Eval: all devices on 'spatial' — full
        # frames width-sharded with halo exchange over ICI.
        n_dev = jax.device_count()
        self.spatial_halo = int(self.args.get("spatial_halo", 96))
        # `mesh_spatial: K` in the runfile carves a combined 2-D mesh
        # (data = n_dev/K, spatial = K): the data-parallel train step and the
        # width-sharded eval then coexist on ONE mesh instead of two
        # device-disjoint views (train batch shards over 'data' and
        # replicates over 'spatial'; eval frames shard over 'spatial' and
        # replicate over 'data').
        n_sp = int(self.args.get("mesh_spatial", 0) or 0)
        if n_sp > 1 and n_dev % n_sp == 0 and n_dev > n_sp:
            self.mesh = make_mesh(n_data=n_dev // n_sp, n_spatial=n_sp)
            self.mesh_spatial = self.mesh
        else:
            self.mesh = make_mesh()
            self.mesh_spatial = (
                make_mesh(n_data=1, n_spatial=n_dev) if n_dev > 1 else None
            )
        self.n_data = self.mesh.shape["data"]
        # UNetSeeInDark trains/evals through the exact dense-s2d fast path
        # (3x train step, 1.5x eval on v5e; gradient parity tested).
        use_fast = (
            self.arch.get("name") == "UNetSeeInDark"
            and not self.arch.get("use_dpsv", False)
            and not self.args.get("disable_fast_path", False)
        )
        # Physics-synth training additionally runs fully in the packed layout
        # (synth + fwd + bwd + loss, no per-step s2d/d2s relayouts): 88 -> 63
        # ms/step on v5e at the reference shape. Parity tested
        # (tests/test_parity_and_sharding.py::test_packed_train_step_matches_fast).
        self._use_packed = (
            use_fast
            and bool((self.args.get("dst_train") or {}).get("dataset"))
            and not self.args.get("disable_packed_step", False)
        )
        self.train_step = make_train_step(
            self.model, self.lr_schedule, self._make_synth(),
            clip_mode=self.dst.get("clip", 0),
            deep_supervision=bool(self.arch.get("use_dpsv", False)),
            fast="packed" if self._use_packed else use_fast,
        )
        self._base_train_step = self.train_step  # unsharded (parity tests)
        if self.n_data > 1:
            self.train_step = make_sharded_train_step(self.mesh, self.train_step)
        self.eval_step = make_eval_step(self.model, fast=use_fast)
        # Full-frame eval fuses forward + clip + illuminance correct +
        # PSNR/SSIM into ONE layout-aware jit (flat lane-dense views,
        # channel-banded Pallas SSIM): the unfused [H, W, 4] metric stage
        # costs ~2x the UNet forward in padded-lane HBM traffic. On a
        # multi-chip mesh the same fusion runs width-sharded with halo
        # exchange + psum'ed metric partials (parallel/mesh.py).
        if use_fast and not self.args.get("disable_fused_eval", False):
            self._fused_eval = (
                make_eval_metrics_step(self.model)
                if self.mesh_spatial is None else
                make_eval_metrics_step_sharded(
                    self.model, self.mesh_spatial, halo=self.spatial_halo)
            )
        else:
            self._fused_eval = None
        self._fused_tp_cache = {"params": None, "tp": None}
        self._int8_cache = {"params": None, "step": None, "cal": []}
        self._place_state()

        # --- meters --------------------------------------------------------
        self.train_psnr = AverageMeter("PSNR", ":2f")
        self.eval_psnr = AverageMeter("PSNR", ":2f")
        self.eval_ssim = AverageMeter("SSIM", ":4f")
        self.eval_psnr_lr = AverageMeter("PSNR", ":2f")
        self.eval_ssim_lr = AverageMeter("SSIM", ":4f")
        self.eval_psnr_dn = AverageMeter("PSNR", ":2f")
        self.eval_ssim_dn = AverageMeter("SSIM", ":4f")
        self.timer = StepTimer()
        self._print_model_log()

    # ------------------------------------------------------------------
    def _print_model_log(self):
        log(f"Model Name:\t{self.model_name}", logfile=self.logfile, notime=True)
        log(f"Architecture:\t{self.arch['name']}", logfile=self.logfile, notime=True)
        if self.args.get("dst_train"):
            log(f"TrainDataset:\t{self.args['dst_train']['dataset']}", logfile=self.logfile, notime=True)
        if self.args.get("dst_eval"):
            log(f"EvalDataset:\t{self.args['dst_eval']['dataset']}", logfile=self.logfile, notime=True)
        log(f"CameraType:\t{self.dst.get('camera_type')}", logfile=self.logfile, notime=True)
        log(f"num_channels:\t{self.arch.get('nf')}", logfile=self.logfile, notime=True)
        log(f"BatchSize:\t{self.hyper.get('batch_size')}", logfile=self.logfile, notime=True)
        log(f"PatchSize:\t{self.dst.get('patch_size')}", logfile=self.logfile, notime=True)
        log(f"LearningRate:\t{self.hyper.get('learning_rate')}", logfile=self.logfile, notime=True)
        log(f"Epoch:\t\t{self.hyper.get('stop_epoch')}", logfile=self.logfile, notime=True)
        cmd = command_of(self.dst)
        log(f"Command:\t{cmd.raw} (flags: {sorted(cmd.flags()) or '-'})",
            logfile=self.logfile, notime=True)
        log(f"Devices:\t{jax.device_count()} ({jax.devices()[0].platform})",
            logfile=self.logfile, notime=True)

    def _init_proxy(self, arch_proxy: dict):
        name = arch_proxy.get("name", "")
        if "pw_iso" in name:
            self.proxy = PixelWiseISOProxy(
                iso2k=tuple(arch_proxy.get("ISO2K", (0.0009546, -0.00193))),
                nf=int(arch_proxy.get("nf", 16)),
                nb=int(arch_proxy.get("nb", 2)),
                d=int(arch_proxy.get("d", 1024)),
                mode=arch_proxy.get("mode", "2stage+iso"),
                wp=float(self.dst.get("wp", 16383)),
                bl=float(self.dst.get("bl", 512)),
                lookup=arch_proxy.get("lookup", "dot"),
                smooth_s0=float(arch_proxy.get("smooth_s0", 0.3)),
            )
            clean = jnp.zeros((1, 8, 8, 4))
            self.proxy_vars = self.proxy.init(
                {"params": jax.random.key(0), "sample": jax.random.key(1)},
                clean, jnp.ones((1,)) * 1600.0,
            )
        elif "NoiseFlow" in name or "noise_flow" in name:
            self.proxy = NoiseFlow(
                x_shape=(int(self.dst.get("patch_size", 256)),) * 2 + (4,),
                arch=arch_proxy.get("arch", NoiseFlow.arch),
            )
            patch = int(self.dst.get("patch_size", 256))
            z = jnp.zeros((1, patch, patch, 4))
            self.proxy_vars = self.proxy.init(jax.random.key(0), z, clean=z, iso=1600.0)
        proxy_ckpt = self.args.get("proxy_checkpoint")
        if proxy_ckpt and os.path.exists(proxy_ckpt):
            loaded = load_any(proxy_ckpt)
            self.proxy_vars = {"params": loaded["params"], **(
                {"batch_stats": loaded["batch_stats"]} if loaded.get("batch_stats") else {}
            )}
            log(f"Loaded proxy checkpoint {proxy_ckpt}")

    def _make_synth(self):
        """Pick the on-device synthesis stage from the train dataset name
        (the jit-fused analog of the reference preprocess dispatch,
        trainer_SID.py:428-472)."""
        if not self.args.get("dst_train") or self.mode not in ("train", "trainonly"):
            return identity_synth
        name = self.args["dst_train"]["dataset"]
        cam = self.dst.get("camera_type", "SonyA7S2")
        code = self.dst.get("noise_code", "p")
        ori = bool(self.dst.get("ori", False))
        clip = self.dst.get("clip", 0)
        # dataset-level flags live in the dst_train block (falling back to
        # the shared dst block); either may be an explicit empty string
        command = (self.args["dst_train"].get("command")
                   or self.dst.get("command") or "")
        if name in ("Raw_Dataset", "IMX686_Raw_Dataset"):
            gtdn = "GTdn" in command
            # IMX686 (trainer_LRID.py:399-418): point ISO-6400 calibration
            # with only-K jitter and linear ratio ~ U(1,16) — NOT the generic
            # regression/exp-uniform law the Sony path uses
            lrid = name == "IMX686_Raw_Dataset"
            iso_pt = int(self.dst.get("iso", 6400)) if lrid else None
            mk = (make_raw_synth_packed if getattr(self, "_use_packed", False)
                  else make_raw_synth)
            # user-recalibrated h5 noiseparam, loaded by the phone dataset at
            # init (reference trainer_LRID.py:405-407 reads it off the
            # dataset — dsts[0] under MultiDataset)
            nps = None
            if lrid:
                dst_obj = getattr(self, "dataset_train", None)
                if dst_obj is not None and hasattr(dst_obj, "datasets"):
                    dst_obj = dst_obj.datasets[0]
                nps = getattr(dst_obj, "noiseparam", {}).get(iso_pt)
            return mk(cam, code, ori, clip, gtdn=gtdn, iso=iso_pt, lrid=lrid,
                      noiseparam=nps)
        if name in ("NF_Syn_Dataset", "Proxy_Dataset", "IMX686_NF_Syn_Dataset",
                    "IMX686_Proxy_Dataset"):
            if self.proxy is None:
                # silently falling through to identity_synth would train the
                # net on noise-free pairs (lr == hr) for the whole run
                raise RuntimeError(
                    f"{name} requires a proxy network: set arch_proxy in the "
                    "runfile (and make its checkpoint loadable)")
            proxy, proxy_vars = self.proxy, self.proxy_vars

            def sample_fn(rng, clean, iso):
                if isinstance(proxy, NoiseFlow):
                    return proxy.apply(proxy_vars, rng, clean=clean, iso=iso,
                                       method=proxy.sample)
                return proxy.apply(proxy_vars, clean, iso, rngs={"sample": rng},
                                   mode="sample")

            if name.startswith("IMX686"):
                # IMX686 law (reference trainer_LRID.py:419-427): one
                # discrete dgain per batch from the LRID ladder, ISO from the
                # batch's own dataset ISO (the proxy's calibration point)
                synth = make_proxy_synth(sample_fn, ori=ori,
                                         ratio_ladder=(1, 2, 4, 8, 16),
                                         iso_from_batch=True)
            else:
                # Sony law (reference trainer_SID.py:463-472): per-example
                # ratio ~ U(100, 300), one legal-ladder ISO per batch
                synth = make_proxy_synth(sample_fn, ori=ori,
                                         ratio_range=(100.0, 300.0))
            return pack_synth(synth) if self._use_packed else synth
        if name in ("Mix_Dataset", "IMX686_Mix_Dataset"):
            command = command or "augv5"
            hbr_map = None
            if name == "IMX686_Mix_Dataset" and "HB" in command:
                # LRID bias pasting defers the HighBitRecovery remap to the
                # device synth (phone.py emits raw bias crops; the LRID bias
                # library is pinned at ISO 6400 — reference
                # phone_datasets.py:631). Sony's Mix_Dataset applies HBR on
                # the HOST with the per-sample nearest-ISO LUT
                # (datasets.py:412-414, reference real_datasets.py:471-473);
                # a second device remap would re-dither with the wrong ISO.
                from pnnp_tpu.physics import HighBitRecovery

                iso = int(self.dst.get("iso", 6400))
                hbr = HighBitRecovery(camera_type=cam, noise_code=code)
                hbr.get_lut([iso])
                hbr_map = lambda k, x: hbr.map(k, x, iso=iso)
            # the IMX686 Mix loader inherits the paired loader's host-side
            # lr*dgain amplification (phone.py); Sony's Mix loader does not
            # amplify (the synth does it, like the reference's preprocess)
            synth = make_mix_synth(cam, command, ori=ori, hbr_map=hbr_map,
                                   host_amplified=name == "IMX686_Mix_Dataset")
            return pack_synth(synth) if self._use_packed else synth
        if name in ("SFRN_Dataset", "IMX686_SFRN_Raw_Dataset"):
            # black-frame mode: shot-only synthesis (noise_code+'b') on the GT
            # plus the real bias-frame read-noise layer, matching the
            # amplification convention (reference: syn_datasets.py:465-579).
            packed = getattr(self, "_use_packed", False)
            make = make_raw_synth_packed if packed else make_raw_synth
            raw = make(cam, code + "b", ori, clip)

            def synth(key, batch):
                lr_shot, hr, ratio = raw(key, batch)
                read_layer = batch["lr"]
                if packed:
                    from pnnp_tpu.models.unet_s2d import s2d

                    read_layer = s2d(read_layer)
                if not ori:
                    read_layer = read_layer * ratio.reshape(-1, 1, 1, 1)
                return lr_shot + read_layer, hr, ratio

            return synth
        if getattr(self, "_use_packed", False):
            return pack_synth(identity_synth)
        return identity_synth

    def _place_state(self):
        """Replicate the train state across the data mesh (no-op on 1 device).

        Called after init and every checkpoint (re)load so restored params —
        which land as single-device arrays — get the replicated sharding the
        donated sharded step expects."""
        if getattr(self, "n_data", 1) > 1:
            self.state = replicate(self.mesh, self.state)

    def _place_batch(self, batch: dict):
        """Host batch -> device: sharded over 'data' when the mesh has >1
        device (wrap-padding a partial final batch to a multiple of n_data,
        like DataParallel's uneven scatter), plain transfer otherwise."""
        if self.n_data <= 1:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        n = len(batch.get("hr", next(iter(batch.values()))))
        pad = (-n) % self.n_data
        if pad:
            idx = np.arange(n + pad) % n
            batch = {
                k: (np.asarray(v)[idx] if np.asarray(v).shape[:1] == (n,) else v)
                for k, v in batch.items()
            }
        return shard_batch(self.mesh, batch, batch_dim_size=n + pad)

    def _fused_tp(self):
        """Transformed weights for the fused eval step, cached by param-tree
        identity (same contract as make_eval_step's cache)."""
        c = self._fused_tp_cache
        if c["params"] is not self.state.params:
            from pnnp_tpu.models.unet_s2d import transform_params_hybrid

            c["params"] = self.state.params
            c["tp"] = jax.jit(transform_params_hybrid)(self.state.params)
        return c["tp"]

    def _int8_eval_step(self, lr_frame):
        """Fused eval step served through the W8A8 path (--int8).

        Static per-tensor scales are a serving-traffic property; ONE frame
        measured -0.10 dB mean vs the validated multi-frame recipe on the
        same checkpoint (tools/validate_int8.py --cal-from-eval: -0.174 vs
        disjoint-x3 -0.073 at pct 99.95), so calibration buffers the first
        ``int8_cal_frames`` eval frames (default 3, runfile-overridable) and
        quantizes once at frame N at the validated percentile. Returns None
        while buffering — the caller serves those frames through the exact
        bf16 fused step (their metrics are the reference path's own). Evals
        shorter than N frames therefore run entirely bf16.
        """
        c = self._int8_cache
        if c["params"] is not self.state.params:
            c.update(params=self.state.params, step=None, cal=[])
        if c["step"] is not None:
            return c["step"]

        from pnnp_tpu.models.unet_s2d import s2d
        from pnnp_tpu.models.unet_s2d_int8 import (
            calibrate_act_scales,
            quantize_params_int8,
        )
        from pnnp_tpu.train.steps import pad_to_multiple

        x = lr_frame
        if x.ndim == 3:  # flat [1, H, W*4] host view
            x = x.reshape(1, x.shape[1], -1, 4)
        if x.shape[-1] == 16 and getattr(self.model, "in_nc", 4) == 4:
            g1 = x  # loader already pre-packed the frame
        else:
            g1 = s2d(pad_to_multiple(x, 16)[0])
        c["cal"].append(g1)
        if len(c["cal"]) < max(self.int8_cal_frames, 1):
            return None  # keep serving bf16 while calibration traffic accrues

        tp = self._fused_tp()
        qp = quantize_params_int8(
            tp, calibrate_act_scales(tp, c["cal"], pct=99.95))
        c["cal"] = []
        c["step"] = (
            make_eval_metrics_step(self.model, qparams=qp)
            if self.mesh_spatial is None else
            make_eval_metrics_step_sharded(
                self.model, self.mesh_spatial, halo=self.spatial_halo,
                qparams=qp))
        return c["step"]

    def _forward_full(self, lr):
        """Full-frame denoise: width-sharded with halo exchange over the
        spatial mesh when >1 device, single-device eval step otherwise."""
        if self.mesh_spatial is not None:
            return spatial_eval_auto(
                self.mesh_spatial, lambda t: self.eval_step(self.state, t),
                lr, halo=self.spatial_halo,
            )
        return self.eval_step(self.state, lr)

    def _recover_state(self):
        """Rebuild a usable train state after a failed (donated) step."""
        patch = int(self.dst.get("patch_size", 512))
        example = jnp.zeros((1, patch, patch, example_input_channels(self.arch)))
        self.state = create_train_state(jax.random.key(self.seed), self.model, example)
        restored = self.ckpt.restore("last")
        if restored is not None:
            self.state = self.state.replace(
                params=jax.tree.map(jnp.asarray, restored["params"]),
                batch_stats=restored.get("batch_stats"),
            )
            log(f"Recovered params from last checkpoint "
                f"(epoch {restored['meta'].get('epoch')})")
        else:
            log("No checkpoint to recover from; re-initialized fresh params")
        self._place_state()

    def _try_restore(self):
        # trainonly is a training mode: resume from 'last' like 'train'
        # (eval modes want the best-PSNR weights instead)
        restored = self.ckpt.restore(
            "last" if self.mode in ("train", "trainonly") else "best")
        if restored is not None:
            self.state = self.state.replace(
                params=jax.tree.map(jnp.asarray, restored["params"]),
                batch_stats=restored.get("batch_stats"),
            )
            log(f"Restored checkpoint (epoch {restored['meta'].get('epoch')})")
        else:
            log("No checkpoint found; using fresh init")

    def load_torch_checkpoint(self, path: str):
        loaded = load_any(path)
        self.state = self.state.replace(params=jax.tree.map(jnp.asarray, loaded["params"]))
        self._place_state()
        log(f"Loaded torch checkpoint {path}")

    # ------------------------------------------------------------------
    def train(self):
        assert self.dataset_train is not None
        bs = int(self.hyper.get("batch_size", 1))
        loader = DataLoader(
            self.dataset_train, batch_size=bs, shuffle=True,
            num_workers=0 if self.debug else int(self.args.get("num_workers", 2)),
            seed=self.seed,
        )
        stop_epoch = int(self.hyper.get("stop_epoch", 100))
        plot_freq = int(self.hyper.get("plot_freq", 50))
        rng = jax.random.key(self.seed)

        for epoch in range(self.last_epoch + 1, stop_epoch + 1):
            self.train_psnr.reset()
            self.timer.reset()
            loader.set_epoch(epoch)
            t0 = time.time()
            try:
                for batch in loader:
                    self.timer.tick("loader")
                    rng, step_key = jax.random.split(rng)
                    dev_batch = self._place_batch({
                        k: v for k, v in batch.items()
                        if isinstance(v, np.ndarray) and v.dtype != object
                    })
                    self.state, metrics = self.train_step(self.state, dev_batch, step_key, epoch)
                    self.timer.tick("net")
                    self.train_psnr.update(float(metrics["psnr"]))
            except RuntimeError as e:
                # Fault tolerance: log and continue with the next epoch (the
                # reference does the same for OOM-class failures,
                # trainer_LRID.py:131-135). The LR is a pure function of the
                # epoch, so skipping a partial epoch is safe — but unlike the
                # reference's torch module, our jitted step DONATES the state
                # buffers, so after a failed step self.state may alias freed
                # memory. Rebuild it from the last checkpoint (fresh init if
                # none) before continuing.
                log(f"Epoch {epoch} aborted by RuntimeError: {e}; recovering state")
                self._recover_state()
            self.train_psnr.record()
            shares = self.timer.shares()
            log(
                f"Epoch {epoch}: loss ok, train_psnr={self.train_psnr.avg:.2f}, "
                f"lr={float(self.lr_schedule(epoch)):.2e}, "
                f"time={time.time() - t0:.1f}s "
                f"[loader {shares.get('loader', 0):.0%} net {shares.get('net', 0):.0%}]"
            )

            eval_psnr = None
            if self.dataset_eval is not None and epoch % plot_freq == 0:
                if hasattr(self.dataset_eval, "fast_eval"):
                    self.dataset_eval.fast_eval(True)
                self.eval(epoch)
                eval_psnr = self.eval_psnr.avg
                if hasattr(self.dataset_eval, "fast_eval"):
                    self.dataset_eval.fast_eval(False)
            is_best = self.ckpt.save(epoch, self.state.params, self.state.batch_stats,
                                     eval_psnr)
            if is_best:
                log(f"Best PSNR is {self.ckpt.best_psnr:.2f} now!!")

            # SGDR period boundary: reload best (reference: trainer_SID.py:169-179)
            T = self.hyper.get("T", 1)
            period = max((stop_epoch - self.last_epoch) // max(T, 1), 1)
            if epoch % period == 0 and epoch < stop_epoch:
                restored = self.ckpt.restore("best")
                if restored is not None:
                    self.state = self.state.replace(
                        params=jax.tree.map(jnp.asarray, restored["params"])
                    )
                    self._place_state()
                    log("Period boundary: reloaded best checkpoint")

    # ------------------------------------------------------------------
    def eval(self, epoch: int = -1):
        """Eval loop with the reference's metric/log contract
        (trainer_SID.py:181-320), metrics fully on-device."""
        assert self.dataset_eval is not None
        for m in (self.eval_psnr, self.eval_ssim, self.eval_psnr_lr,
                  self.eval_ssim_lr, self.eval_psnr_dn, self.eval_ssim_dn):
            m.reset()
        metrics_path = f"./metrics/{self.model_name}_metrics.pkl"
        metrics = {}
        if os.path.exists(metrics_path):
            with open(metrics_path, "rb") as f:
                metrics = pickle.load(f)

        brightness_correct = bool(self.args.get("brightness_correct", True))
        # The reference's LRID trainer constructs IlluminanceCorrect but
        # never calls it in eval (trainer_LRID.py:62 vs :195-319 — the
        # runfile flag is inert there), so the published IMX686 numbers are
        # UNcorrected; only the SID/ELD eval corrects (trainer_SID.py:238).
        # trainer_LED *does* correct on the same data (trainer_LED.py:122),
        # so LEDTrainer overrides _phone_eval_corrects.
        if (str(self.dst_eval.get("dataset", "")).startswith("IMX686")
                and not getattr(self, "_phone_eval_corrects", False)):
            brightness_correct = False
        ori = bool(self.dst_eval.get("ori", self.dst.get("ori", False)))
        self.rgb_metrics = bool(self.args.get("rgb_metrics", False))
        if self.int8_eval and (self._fused_eval is None or self.rgb_metrics):
            raise ValueError(
                "--int8 eval serves through the fused raw-domain path: it "
                "requires the fast UNetSeeInDark arch, no "
                "disable_fused_eval, and no rgb_metrics")

        # When the fused step will consume the frames and no plots need the
        # unpacked input, prefetch workers pre-pack lr (%16 reflect pad +
        # s2d) so the ~7 ms on-device input relayout leaves the critical
        # path; the fused step's packed branch recovers crop dims from hr.
        pack_eval = (
            self._fused_eval is not None and not self.rgb_metrics
            # plotting sweeps keep the packed branch too: the fused step
            # returns the (ori-scaled, clipped) input panel via with_inputs
        )
        if pack_eval and self.mesh_spatial is not None:
            # multi-chip: pre-pack at the SHARDED pad geometry (%16*nsp
            # cols) with host-computed edge-reflect halos; interior halos
            # ride ICI as packed ppermutes (parallel/mesh.py packed branch)
            from pnnp_tpu.models.unet_s2d import pack_frame_sharded_np

            _nsp = self.mesh_spatial.shape["spatial"]
            _halo = self.spatial_halo

            def _pack(batch):
                g, hl, hr_ = pack_frame_sharded_np(
                    np.asarray(batch["lr"]), _nsp, halo=_halo)
                batch["lr"] = g
                batch["lr_halos"] = (hl, hr_)
                return batch
        elif pack_eval:
            from pnnp_tpu.models.unet_s2d import pack_frame_np

            def _pack(batch):
                batch["lr"] = pack_frame_np(np.asarray(batch["lr"]))
                return batch
        loader = DataLoader(self.dataset_eval, batch_size=1, shuffle=False,
                            num_workers=0 if self.debug else (3 if pack_eval else 2),
                            transform=_pack if pack_eval else None)
        for k, batch in enumerate(loader):
            lr = jnp.asarray(batch["lr"])
            hr = jnp.asarray(batch["hr"])
            ratio = jnp.asarray(batch["ratio"]).reshape(-1, 1, 1, 1)
            name = batch["name"][0] if isinstance(batch["name"], list) else batch["name"]

            fused = self._fused_eval is not None and not self.rgb_metrics
            if fused:
                # the fused step pads/packs internally and returns the
                # corrected frame channel-interleaved flat [1, H, W*4]
                step_fn = ((self._int8_eval_step(lr) or self._fused_eval)
                           if self.int8_eval else self._fused_eval)
                kw = {}
                if "lr_halos" in batch:  # sharded pre-pack: edge halos
                    kw["halos"] = tuple(
                        jnp.asarray(h) for h in batch["lr_halos"])
                out = step_fn(
                    self._fused_tp(), lr, hr,
                    jnp.asarray(batch["ratio"]).reshape(-1)[0],
                    ori=ori, correct=bool(brightness_correct and epoch < 0),
                    with_inputs=self.save_plot, **kw,
                )
                dnf, m = out[:2]
                p, s = float(m["psnr"]), float(m["ssim"])
                p_in_f = float(m.get("psnr_in", 0.0))
                s_in_f = float(m.get("ssim_in", 0.0))
                if self.save_plot and epoch < 0:
                    # panels from the step itself (ori-scaled, clipped) —
                    # works whether the loader handed frames packed or not
                    dn = dnf.reshape(1, hr.shape[1], hr.shape[2], 4)
                    lr = out[2].reshape(1, hr.shape[1], hr.shape[2], 4)
            else:
                dn = self._forward_full(lr)
                if ori:
                    lr = lr * ratio
                    dn = dn * ratio
                lr = jnp.clip(lr, 0, 1)
                dn = jnp.clip(dn, 0, 1)
                if brightness_correct and epoch < 0:
                    dn = illuminance_correct(dn, hr)

                out255 = dn[0] * 255.0
                tgt255 = jnp.clip(hr[0], 0, 1) * 255.0
                in255 = lr[0] * 255.0
                p = float(psnr_fn(out255, tgt255))
                s = float(ssim_fn(out255, tgt255))
            self.eval_psnr.update(p)
            self.eval_ssim.update(s)
            metrics[name] = [p, s]
            if self.save_plot:
                # The reference's ACTIVE path fills psnrs_lr/psnrs_dn with
                # raw-domain numbers: both plot branches pass res=raw_metrics
                # into plot_sample (trainer_SID.py:277,339 + visualization.py:
                # 64-66), so the rawpy sRGB render is figure-only. The RGB
                # variant exists upstream but is commented out
                # (trainer_SID.py:272); `rgb_metrics: true` enables it here,
                # computed through the device ISP instead of rawpy.
                if self.rgb_metrics:
                    hrc = jnp.clip(hr, 0, 1)
                    wb, ccm = self._sample_wb_ccm(batch)
                    p_in, s_in = rgb_quality(lr[0], hrc[0], wb, ccm)
                    p_dn, s_dn = rgb_quality(dn[0], hrc[0], wb, ccm)
                    p_in, s_in = float(p_in), float(s_in)
                    p_dn, s_dn = float(p_dn), float(s_dn)
                    if epoch < 0:
                        metrics[name] = [p_dn, s_dn]
                elif fused:
                    p_in, s_in = p_in_f, s_in_f
                    p_dn, s_dn = p, s
                else:
                    p_in = float(psnr_fn(in255, tgt255))
                    s_in = float(ssim_fn(in255, tgt255))
                    p_dn, s_dn = p, s
                self.eval_psnr_lr.update(p_in)
                self.eval_ssim_lr.update(s_in)
                self.eval_psnr_dn.update(p_dn)
                self.eval_ssim_dn.update(s_dn)
                if epoch < 0:
                    self._plot_sample(lr[0], dn[0], hr[0], batch, name, epoch)
            log(f"[{k + 1}/{len(loader)}] {name}: PSNR={p:.2f} SSIM={s:.4f}")

        if not self.save_plot:
            self.eval_psnr_dn, self.eval_ssim_dn = self.eval_psnr, self.eval_ssim
        log(
            f"Epoch {epoch}: PSNR={self.eval_psnr.avg:.2f}\n"
            f"psnrs_lr={self.eval_psnr_lr.avg:.2f}, psnrs_dn={self.eval_psnr_dn.avg:.2f}\n"
            f"ssims_lr={self.eval_ssim_lr.avg:.4f}, ssims_dn={self.eval_ssim_dn.avg:.4f}",
            logfile=self.logfile,
        )
        if epoch < 0:
            with open(metrics_path, "wb") as f:
                pickle.dump(metrics, f)
        self._drain_plots()

    @staticmethod
    def _sample_wb_ccm(batch):
        """Per-sample WB gains + CCM from a batch-of-1 eval batch."""
        wb = np.asarray(batch.get("wb", np.array([2.0, 1.0, 1.6, 1.0])), np.float32)
        if wb.ndim > 1:
            wb = wb[0]
        ccm = batch.get("ccm")
        if ccm is not None:
            ccm = np.asarray(ccm, np.float32).reshape(-1, 3, 3)[0]
        return wb, ccm

    def _plot_sample(self, lr, dn, hr, batch, name, epoch):
        """3-panel comparison via the on-device ISP, rendered ASYNC.

        The device ISP runs inline (it is jitted and fast); the matplotlib
        figure build + JPEG encode — the slow part — is submitted to a small
        thread pool so an LRID ratio sweep with ``save_plot`` doesn't
        serialize ~40 renders on the eval critical path (the reference uses
        a ProcessPoolExecutor for the same reason, trainer_SID.py:194,
        273-279). Rendering uses the object-oriented matplotlib API (no
        pyplot global state), which is thread-safe with the Agg canvas.
        Also persists the reference's denoised-PNG contract
        (visualization.py:90-91) alongside the 3-panel jpg."""
        wb, ccm = self._sample_wb_ccm(batch)
        imgs = [np.asarray(fast_isp(x, wb=wb, ccm=ccm)) for x in (lr, dn, hr)]
        jpg = os.path.join(self.sample_dir, f"{name}_epoch{epoch}.jpg")
        png = os.path.join(self.sample_dir, f"{name}_denoised.png")
        if self._plot_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._plot_pool = ThreadPoolExecutor(
                max_workers=4, thread_name_prefix="figrender")
            self._plot_futures = []
        self._plot_futures.append(
            self._plot_pool.submit(_render_sample, imgs, jpg, png))

    def _drain_plots(self):
        """Block until pending figure renders finish; surface failures as
        warnings (a broken render must not fail the eval)."""
        futures, self._plot_futures = getattr(self, "_plot_futures", []), []
        for f in futures:
            err = f.exception()
            if err is not None:
                log(f"WARNING: figure render failed: {err!r}")

    # ------------------------------------------------------------------
    def test(self, out_dir: Optional[str] = None):
        """Denoise the test split and save outputs as .npy (+ optional JPG
        previews), the reference's ``test`` mode (trainer_SID.py:362-420)."""
        dst = self.dst_test or self.dst_eval
        assert dst is not None, "no dst_test/dst_eval block in runfile"
        dataset = build_dataset(dict(dst, mode="eval"), seed=self.seed)
        out_dir = out_dir or os.path.join(self.sample_dir, "test")
        os.makedirs(out_dir, exist_ok=True)
        correct = bool(self.args.get("brightness_correct", True))
        if (str(dst.get("dataset", "")).startswith("IMX686")
                and not getattr(self, "_phone_eval_corrects", False)):
            correct = False  # same gate as eval(): trainer_LRID never corrects
        ori = bool(dst.get("ori", self.dst.get("ori", False)))

        def dump_split():
            loader = DataLoader(dataset, batch_size=1, shuffle=False,
                                num_workers=0)
            for k, batch in enumerate(loader):
                lr = jnp.asarray(batch["lr"])
                dn = self._forward_full(lr)
                if ori and "ratio" in batch:  # brighten before clamp
                    dn = dn * jnp.asarray(batch["ratio"]).reshape(-1, 1, 1, 1)
                dn = jnp.clip(dn, 0, 1)
                # the reference's output pass corrects against the GT before
                # saving (trainer_SID.py:396-397)
                if correct and "hr" in batch:
                    dn = illuminance_correct(dn, jnp.asarray(batch["hr"]))
                name = batch["name"][0] if isinstance(batch["name"], list) else str(batch["name"])
                np.save(os.path.join(out_dir, f"{name}_dn.npy"), np.asarray(dn[0]))
                if self.save_plot:
                    lr_p = lr
                    if ori and "ratio" in batch:  # brighten the input panel
                        lr_p = lr * jnp.asarray(batch["ratio"]).reshape(-1, 1, 1, 1)
                    self._plot_sample(jnp.clip(lr_p, 0, 1)[0], dn[0],
                                      jnp.asarray(batch["hr"])[0], batch, name, -1)
                log(f"[test {k + 1}/{len(loader)}] saved {name}")

        # ratio-split datasets (SID/phone) expose only one split at a time;
        # walk the configured ladder so every frame is dumped
        ratios = [r for r in (dst.get("ratio_list") or []) if r is not None]
        if hasattr(dataset, "change_eval_ratio") and ratios:
            for r in ratios:
                dataset.change_eval_ratio(r)
                dump_split()
        else:
            dump_split()
        self._drain_plots()

    def predict(self, raw_mosaic: np.ndarray, name: str | None = "ds",
                patch_size: int = 512, base: int = 64):
        """Memory-bounded tiled full-frame inference on a black-subtracted
        mosaic, saved as ``{name}.npy`` (reference: trainer_SID.py:345-360,
        which packs ``raw + bl`` and np.saves the denoised bayer stack).
        Pass ``name=None`` to skip the save."""
        from pnnp_tpu.ops import tiled_apply
        from pnnp_tpu.data.io import pack_raw_np

        bl = self.dst.get("bl", 512)
        packed = pack_raw_np(np.asarray(raw_mosaic, np.float32) + bl,
                             self.dst.get("wp", 16383), bl)
        fn = lambda tiles: self.eval_step(self.state, tiles)
        out = tiled_apply(fn, jnp.asarray(packed), patch_size, base, tile_batch=4)
        out = np.asarray(out)
        if name:
            np.save(f"{name}.npy", out)
        return out


def eval_sweep(trainer, ds, ratios):
    """Ratio/dgain sweep over an eval dataset, dispatching on its API.

    change_eval_ratio takes precedence: SID ratio splits
    (trainer_SID.py:551-562) and the LRID dgain ladder
    (trainer_LRID.py:489-504) both sweep through it — phone datasets read
    self.dgain, so assigning ratio_list directly would silently keep the
    default ratio. ELD-style grids (ratio_list + recheck_length) come next.
    Shared by trainer and trainer_led mains."""
    ratios = [r for r in (ratios or []) if r is not None]
    if hasattr(ds, "change_eval_ratio") and ratios:
        for ratio in ratios:
            ds.change_eval_ratio(ratio)
            log(f"Dgain: {ratio}")
            trainer.eval(-1)
    elif hasattr(ds, "ratio_list") and hasattr(ds, "recheck_length") and ratios:
        for dgain in ratios:
            ds.ratio_list = [dgain]
            ds.recheck_length()
            log(f"Dgain: {dgain}")
            trainer.eval(-1)
    else:
        trainer.eval(-1)


def main(argv=None):
    p = Parser.parse(argv)
    trainer = Trainer(p.runfile, mode=p.mode, nofig=p.nofig, debug=p.debug,
                      int8=p.int8)
    mode = trainer.mode
    if mode in ("train", "trainonly"):
        trainer.train()
        if mode == "train":
            # reference: a finished training run reloads the BEST weights and
            # falls through to the full evaltest sweep (trainer_SID.py:521-534)
            restored = trainer.ckpt.restore("best")
            if restored is not None:
                trainer.state = trainer.state.replace(
                    params=jax.tree.map(jnp.asarray, restored["params"]),
                    batch_stats=restored.get("batch_stats"),
                )
                trainer._place_state()
            mode = "evaltest"
    if mode == "dump":
        # output-saving denoise pass over the test split — the reference's
        # test() METHOD, reached upstream via --mode trainonly
        # (trainer_SID.py:535-537, :362-420); distinct from --mode test,
        # which is a metrics sweep (README "SID only")
        trainer.test()
    if mode in ("eval", "evaltest", "test"):
        # ELD-style dgain sweep over dst_eval ('eval' / 'evaltest';
        # reference trainer_SID.py:538-549 dispatches on substring too)
        if mode in ("eval", "evaltest") or trainer.dst_test is None:
            eval_sweep(trainer, trainer.dataset_eval,
                       list(trainer.dst_eval.get("ratio_list", [])))
        # 'test' is the dst_test metrics sweep on its own (README: "SID
        # only: --mode test", trainer_SID.py:551-562); evaltest runs both
        if trainer.dst_test and (
            mode == "test"
            or (mode == "evaltest" and trainer.dst_test.get("dataset")
                != trainer.dst_eval.get("dataset"))
        ):
            # eval() reads ori/brightness settings from dst_eval, so swap the
            # whole block (not just the dataset) for the test-split sweep
            trainer.dst_eval = dict(trainer.dst_test, mode="evaltest")
            trainer.dataset_eval = build_dataset(trainer.dst_eval, seed=trainer.seed)
            eval_sweep(trainer, trainer.dataset_eval,
                       list(trainer.dst_test.get("ratio_list", [100, 250, 300])))


if __name__ == "__main__":
    main()
