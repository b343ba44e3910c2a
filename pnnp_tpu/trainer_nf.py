"""Noise-model (NoiseFlow / PNNP proxy) trainer.

Counterpart of reference trainer_NF_SID.py / trainer_NF_LRID.py: trains a
noise model on *real* noise residuals from paired data — per-dim NLL of
``(lr - hr) / ratio`` conditioned on ``(clean, iso)`` — with the per-epoch
KLD sanity check between sampled and real noise histograms
(reference: trainer_NF_SID.py:117-123, 163-180).

The whole NLL step (residual extraction -> bijector chain -> Adam) is one
jitted program; KLD runs on-device via ``kl_div_norm_device``.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pnnp_tpu.config import load_runfile
from pnnp_tpu.data import build_dataset, DataLoader
from pnnp_tpu.models import NoiseFlow, PixelWiseISOProxy
from pnnp_tpu.ops.kld import kl_div_norm_device
from pnnp_tpu.parallel import make_mesh, make_sharded_noise_step, replicate, shard_batch
from pnnp_tpu.train import CheckpointManager, build_lr_schedule
from pnnp_tpu.train.state import make_adam_direction, apply_scaled_updates, TrainState
from pnnp_tpu.utils.logging import AverageMeter, log


def make_nf_train_step(nf: NoiseFlow, lr_schedule):
    """step(state, lr_img, hr_img, ratio, iso, epoch) -> (state, metrics)."""

    def loss_fn(params, batch_stats, lr_img, hr_img, ratio, iso):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        rb = ratio.reshape(-1, 1, 1, 1)
        noise = (lr_img - hr_img) / rb
        clean = hr_img / rb
        outs = nf.apply(
            variables, noise, clean=clean, iso=iso, train=True,
            method=nf.loss, mutable=["batch_stats"] if batch_stats else [],
        )
        (nll, sd_z), new_stats = outs if isinstance(outs, tuple) and len(outs) == 2 else (outs, {})
        return nll, (sd_z, new_stats)

    def step(state: TrainState, lr_img, hr_img, ratio, iso, epoch):
        (nll, (sd_z, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, lr_img, hr_img, ratio, iso
        )
        lr = lr_schedule(epoch)
        state = apply_scaled_updates(state, grads, lr)
        if new_stats:
            state = state.replace(batch_stats=new_stats.get("batch_stats", state.batch_stats))
        # reported NLL is in the UNscaled noise domain (change of variables:
        # + log ratio), matching the reference meter trainer_NF_SID.py:131;
        # the gradient uses the plain nll above, also like the reference
        metrics = {"nll": nll + jnp.mean(jnp.log(ratio)),
                   "sd_z": sd_z * jnp.mean(ratio), "lr": lr}
        return state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_proxy_train_step(proxy: PixelWiseISOProxy, lr_schedule,
                          dark_thresh: float = 2.0):
    """Train the pw_iso_2stage proxy by NLL on real noise residuals.

    The proxy's learned heads model signal-INDEPENDENT dark noise — its
    sample() re-adds exact Poisson shot on the clean signal — so on paired
    data the NLL is masked to pixels whose clean signal is below
    ``dark_thresh`` ADU (otherwise the pixel head would absorb the shot
    component and sampling would double-count it). Dark-frame batches
    (clean ~= 0) get an all-ones mask, i.e. the paper's dark-frame recipe.
    """
    span = proxy.wp - proxy.bl

    def loss_fn(params, lr_img, hr_img, ratio, iso):
        rb = ratio.reshape(-1, 1, 1, 1)
        noise = (lr_img - hr_img) / rb
        weight = (hr_img / rb * span < dark_thresh).astype(jnp.float32)
        nll, aux = proxy.apply({"params": params}, noise, iso, mode="loss",
                               weight=weight)
        return nll, aux

    def step(state: TrainState, lr_img, hr_img, ratio, iso, epoch):
        (nll, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, lr_img, hr_img, ratio, iso
        )
        lr = lr_schedule(epoch)
        state = apply_scaled_updates(state, grads, lr)
        return state, {"nll": nll, "lr": lr, **aux}

    return jax.jit(step, donate_argnums=(0,))


class NFTrainer:
    """Noise-model training harness with the reference's last/best + KLD loop."""

    def __init__(self, runfile: str, mode: Optional[str] = None, seed: int = 1997,
                 model_kind: str = "noise_flow"):
        self.args = load_runfile(runfile, mode=mode)
        self.mode = self.args["mode"]
        self.dst = self.args["dst"]
        self.hyper = self.args["hyper"]
        self.model_name = self.args["model_name"]
        self.seed = seed
        self.logfile = f"./logs/log_{self.model_name}.log"
        patch = int(self.dst.get("patch_size", 256))

        arch = self.args.get("arch", {})
        arch_proxy = self.args.get("arch_proxy", {}) or {}
        # PNNP-style runfiles describe the proxy in `arch_proxy` (the `arch`
        # block is the denoiser); prefer it when training a proxy.
        if "pw_iso" not in arch.get("name", "") and "pw_iso" in arch_proxy.get("name", ""):
            if model_kind == "proxy" or "NoiseFlow" not in arch.get("name", ""):
                arch = arch_proxy
        if model_kind == "proxy" or "pw_iso" in arch.get("name", ""):
            self.kind = "proxy"
            self.model = PixelWiseISOProxy(
                iso2k=tuple(arch.get("ISO2K", (0.0009546, -0.00193))),
                nf=int(arch.get("nf", 16)), nb=int(arch.get("nb", 2)),
                d=int(arch.get("d", 1024)), mode=arch.get("mode", "2stage+iso"),
                wp=float(self.dst.get("wp", 16383)), bl=float(self.dst.get("bl", 512)),
                lookup=arch.get("lookup", "dot"),
                smooth_s0=float(arch.get("smooth_s0", 0.3)),
            )
            clean = jnp.zeros((1, patch, patch, 4))
            variables = self.model.init(
                {"params": jax.random.key(seed), "sample": jax.random.key(seed + 1)},
                clean, jnp.ones((1,)) * 1600.0,
            )
        else:
            self.kind = "noise_flow"
            self.model = NoiseFlow(
                x_shape=(patch, patch, 4),
                arch=arch.get("arch", NoiseFlow.arch),
                flow_permutation=int(arch.get("flow_permutation", 1)),
            )
            z = jnp.zeros((1, patch, patch, 4))
            variables = self.model.init(jax.random.key(seed), z, clean=z, iso=1600.0)

        self.state = TrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            # opt-in global-norm gradient clipping via hyper.clip_norm
            tx=make_adam_direction(
                clip_norm=(float(self.hyper["clip_norm"])
                           if self.hyper.get("clip_norm") else None)),
            batch_stats=variables.get("batch_stats", {}),
        )
        self.lr_schedule = build_lr_schedule(self.hyper)
        self.train_step = (
            make_proxy_train_step(
                self.model, self.lr_schedule,
                dark_thresh=float(self.hyper.get("dark_thresh", 2.0)))
            if self.kind == "proxy"
            else make_nf_train_step(self.model, self.lr_schedule)
        )
        # Data-parallel mesh (reference DataParallel-wraps the NF net too,
        # trainer_NF_SID.py:82-87): batch shards over 'data', params
        # replicate, XLA psums the gradients. Single device -> no mesh.
        n_dev = jax.device_count()
        self.mesh = make_mesh(n_data=n_dev, n_spatial=1) if n_dev > 1 else None
        self._base_train_step = self.train_step  # unsharded (parity tests)
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)
            self.train_step = make_sharded_noise_step(self.mesh, self.train_step)
        self.ckpt = CheckpointManager(
            self.args.get("fast_ckpt", "checkpoints"),
            self.args.get("checkpoint", "saved_model"),
            self.model_name, save_freq=self.hyper.get("save_freq", 10),
        )
        self._dataset_train = None
        self.nll_meter = AverageMeter("NLL", ":4f")

    @property
    def dataset_train(self):
        """Built lazily: the model/trainer are usable (sampling, conversion)
        without the training data tree present."""
        if self._dataset_train is None and self.args.get("dst_train"):
            self._dataset_train = build_dataset(self.args["dst_train"], seed=self.seed)
        return self._dataset_train

    def sample_noise(self, rng, clean, iso):
        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        if self.kind == "proxy":
            return self.model.apply(variables, clean, iso, rngs={"sample": rng},
                                    mode="sample")
        return self.model.apply(variables, rng, clean=clean, iso=iso,
                                method=self.model.sample)

    def kld_check(self, rng, lr_img, hr_img, ratio, iso, wp=16383, bl=512):
        """Sampled-vs-real noise histogram KLD (reference: trainer_NF_SID.py:163-180)."""
        rb = ratio.reshape(-1, 1, 1, 1)
        real = (lr_img - hr_img)  # ADU-normalized residual at eval brightness
        fake = self.sample_noise(rng, hr_img / rb, iso) * rb
        span = wp - bl
        return kl_div_norm_device(real * span, fake * span, bl=bl, wp=wp)

    def train(self):
        assert self.dataset_train is not None
        # Noise-model training needs REAL residuals: the Syn/Proxy loaders
        # emit lr == hr (their noise is synthesized downstream), so (lr-hr)
        # would be identically zero and the NLL degenerate.
        ds_name = self.args.get("dst_train", {}).get("dataset", "")
        if ds_name in ("NF_Syn_Dataset", "Proxy_Dataset",
                       "IMX686_NF_Syn_Dataset", "IMX686_Proxy_Dataset"):
            raise RuntimeError(
                f"dst_train dataset {ds_name} yields lr == hr; point it at a "
                "paired dataset (SID_Dataset / IMX686_Dataset) or a "
                "bias-frame dataset for noise-model training")
        loader = DataLoader(
            self.dataset_train, batch_size=int(self.hyper.get("batch_size", 1)),
            num_workers=int(self.args.get("num_workers", 2)), seed=self.seed,
        )
        stop_epoch = int(self.hyper.get("stop_epoch", 100))
        rng = jax.random.key(self.seed)
        wp = float(self.dst.get("wp", 16383))
        bl = float(self.dst.get("bl", 512))

        def to_device(batch):
            lr_img = np.asarray(batch["lr"])
            hr_img = np.asarray(batch["hr"])
            ratio = np.asarray(batch["ratio"]).reshape(-1)
            if "iso" in batch:
                iso = np.asarray(batch["iso"]).reshape(-1)
            else:  # datasets without per-item ISO: the dst block's value
                default_iso = float(self.dst.get("iso") or (
                    6400.0 if "IMX686" in str(self.dst.get("camera_type"))
                    else 1600.0))
                iso = np.full((ratio.shape[0],), default_iso, np.float32)
            tree = (lr_img, hr_img, ratio, iso)
            if self.mesh is not None:  # batch-shard over the data axis
                return shard_batch(self.mesh, tree,
                                   batch_dim_size=ratio.shape[0])
            return jax.tree.map(jnp.asarray, tree)

        # Fixed HELD-OUT scoring batch: epoch 0 is never a training epoch, so
        # its first batch gives a deterministic sample the per-epoch ordering
        # never re-shuffles. Scoring every checkpoint against the SAME batch
        # makes the best-KLD selection an apples-to-apples comparison
        # (reference scores each save_plot epoch against the same held-out
        # batch shape, trainer_NF_SID.py:163-180) — unlike the last train
        # batch, which varies per epoch.
        loader.set_epoch(0)
        heldout = to_device(next(iter(loader)))

        for epoch in range(1, stop_epoch + 1):
            self.nll_meter.reset()
            loader.set_epoch(epoch)
            t0 = time.time()
            for batch in loader:
                lr_img, hr_img, ratio, iso = to_device(batch)
                self.state, m = self.train_step(self.state, lr_img, hr_img, ratio, iso, epoch)
                self.nll_meter.update(float(m["nll"]))
            log(f"Epoch {epoch}: nll/dim={self.nll_meter.avg:.4f} "
                f"({time.time() - t0:.1f}s)", logfile=self.logfile)
            # Score EVERY saved checkpoint: `best` must never be written (or
            # skipped) on an unscored epoch.
            rng, k = jax.random.split(rng)
            kld = self.kld_check(k, *heldout, wp=wp, bl=bl)
            if epoch % int(self.hyper.get("plot_freq", 10)) == 0:
                log(f"Epoch {epoch}: KLD fwd={float(kld['kl_fwd']):.4f} "
                    f"inv={float(kld['kl_inv']):.4f} sym={float(kld['kl_sym']):.4f}",
                    logfile=self.logfile)
            self.ckpt.save(epoch, self.state.params, self.state.batch_stats,
                           eval_psnr=-float(kld["kl_sym"]))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--runfile", "-f", required=True)
    p.add_argument("--mode", "-m", default="train")
    p.add_argument("--kind", default="noise_flow", choices=["noise_flow", "proxy"])
    a = p.parse_args(argv)
    NFTrainer(a.runfile, mode=a.mode, model_kind=a.kind).train()


if __name__ == "__main__":
    main()
