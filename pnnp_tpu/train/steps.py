"""Jitted train/eval steps with on-device noise synthesis.

The reference synthesizes training noise in per-crop Python loops inside
``preprocess`` (reference: trainer_SID.py:421-505); here synthesis is a
batched "synth" stage fused into the compiled train step, so the whole
loader->synth->fwd->bwd->Adam pipeline is one XLA program and the host only
feeds clean GT crops.

Synth stages (pick per dataset family):
  * ``make_raw_synth``   — physics P-G/ELD sampling (Raw_Dataset branch,
    reference: trainer_SID.py:449-462)
  * ``make_proxy_synth`` — learned proxy / NoiseFlow sampling (NF_Syn and
    Proxy branches, reference: trainer_SID.py:463-472)
  * ``make_mix_synth``   — PMN-style SNA on real pairs (Mix_Dataset branch,
    reference: trainer_SID.py:430-447)

Each returns ``synth(key, batch) -> (lr, hr, ratio)`` with NHWC images.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from pnnp_tpu.physics import generate_noisy, sample_params_max, sna, get_aug_param
from pnnp_tpu.physics.calibration import HALF_CLIP, LEGAL_ISO
from pnnp_tpu.train.losses import unet_loss, unet_dpsv_loss
from pnnp_tpu.train.state import TrainState, apply_scaled_updates


def clip_lr_hr(lr, hr, clip_mode):
    """Reference clip semantics (trainer_SID.py:481-485): clip=2 (HALF_CLIP)
    keeps the sensor's negative read-noise floor on lr; clip=1 clamps to 0."""
    if clip_mode:
        lb = -jnp.inf if clip_mode == HALF_CLIP else 0.0
        lr = jnp.clip(lr, lb, 1.0)
        hr = jnp.clip(hr, 0.0, 1.0)
    return lr, hr


def _gtdn_ratio(key, n):
    """'GTdn' command ratio law: max(U(-3, 4), 1) per example — mostly 1
    (GT-denoising mode), occasionally up to 4 (reference syn_datasets.py:334)."""
    return jnp.maximum(jax.random.uniform(key, (n,), minval=-3.0, maxval=4.0), 1.0)


def _noiseparam_table(camera_type, iso, noiseparam):
    """ISO-table override from a user noiseparam-iso-N.h5 dict (or None)."""
    if noiseparam is None or iso is None:
        return None
    from pnnp_tpu.physics.calibration import table_with_noiseparam

    return table_with_noiseparam(camera_type, iso, noiseparam)


def _raw_synth_params(key, camera_type, n, iso, ratio, gtdn, lrid, table=None):
    """Shared parameter draw for the raw-synth builders.

    ``lrid=True`` applies the trainer_LRID.py:399-418 IMX686 law: the
    dataset's point-calibrated ISO params with ONLY K jittered (sigmas at
    their means) and a per-example LINEAR ``ratio ~ U(1, 16)`` — distinct
    from process.py:344-348's generic exp-uniform law.
    """
    k1, k3, k4 = jax.random.split(key, 3)
    if lrid:
        ratio = jax.random.uniform(k4, (n,), minval=1.0, maxval=16.0)
    params = sample_params_max(k1, camera_type, n=n, ratio=ratio, iso=iso,
                               jitter_sigmas=not lrid, table=table)
    if gtdn:
        params = dict(params, ratio=_gtdn_ratio(k3, n))
    return params


def make_raw_synth(camera_type: str, noise_code: str, ori: bool, clip: bool,
                   iso=None, ratio=None, gtdn: bool = False,
                   lrid: bool = False, noiseparam: dict = None):
    """Physics noise synthesis on clean GT crops, fully batched.

    ``noiseparam``: user-supplied per-ISO calibration (the reference's
    ``noiseparam-iso-N.h5`` ingestion, phone_datasets.py:99-112) overriding
    the baked table row for ``iso``."""
    table = _noiseparam_table(camera_type, iso, noiseparam)

    def synth(key, batch):
        hr = batch["hr"]
        n = hr.shape[0]
        kp, k2 = jax.random.split(key)
        params = _raw_synth_params(kp, camera_type, n, iso, ratio, gtdn, lrid,
                                   table)
        lr = generate_noisy(k2, hr, params, noise_code, ori=ori, clip=bool(clip))
        return lr, hr, params["ratio"]

    return synth


def make_raw_synth_packed(camera_type: str, noise_code: str, ori: bool, clip: bool,
                          iso=None, ratio=None, gtdn: bool = False,
                          lrid: bool = False, noiseparam: dict = None):
    """Physics synthesis directly in the 4x4-superpixel packed layout.

    Same distribution as :func:`make_raw_synth` (row banding exact), but lr/hr
    come out ``[n, h/2, w/2, 16]`` for :func:`make_train_step` with
    ``fast="packed"`` — the whole train step then runs relayout-free.
    Accepts ``batch["hr"]`` either unpacked ``[n,h,w,4]`` (packed once, no
    gradient flows through it) or already packed.
    """
    from pnnp_tpu.models.unet_s2d import s2d
    from pnnp_tpu.physics.noise import generate_noisy_packed

    table = _noiseparam_table(camera_type, iso, noiseparam)

    def synth(key, batch):
        hr = batch["hr"]
        if hr.shape[-1] == 4:
            hr = s2d(hr)
        n = hr.shape[0]
        kp, k2 = jax.random.split(key)
        params = _raw_synth_params(kp, camera_type, n, iso, ratio, gtdn, lrid,
                                   table)
        lr = generate_noisy_packed(k2, hr, params, noise_code, ori=ori, clip=bool(clip))
        return lr, hr, params["ratio"]

    return synth


def make_proxy_synth(sample_fn: Callable, ori: bool = False,
                     ratio_range=(100.0, 300.0), ratio_ladder=None,
                     iso_from_batch: bool = False):
    """Noise from a learned proxy: ``sample_fn(rng, clean, iso) -> noise``.

    Two reference sampling laws:

    * Sony (trainer_SID.py:463-472): per-example ``ratio ~ U(ratio_range)``
      and ONE ISO per batch drawn uniformly from the Sony legal-ISO ladder.
    * IMX686 (trainer_LRID.py:419-427): ONE *discrete* ratio per batch drawn
      uniformly from ``ratio_ladder`` (the LRID dgain ladder [1,2,4,8,16])
      and ISO taken from the batch's own dataset ISO (``data['ISO'][0]`` —
      the proxy is conditioned on the ISO it was calibrated at, e.g. 6400,
      not on a foreign camera's ISO ladder).

    Pass ``ratio_ladder``/``iso_from_batch`` for the IMX686 law; defaults
    give the Sony law.
    """
    ladder = (None if ratio_ladder is None
              else jnp.asarray(ratio_ladder, jnp.float32))

    def synth(key, batch):
        hr = batch["hr"]
        n = hr.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        if ladder is not None:
            ridx = jax.random.randint(k1, (), 0, len(ladder))
            ratio = jnp.full((n,), ladder[ridx])
        else:
            ratio = jax.random.uniform(k1, (n,), minval=ratio_range[0],
                                       maxval=ratio_range[1])
        if iso_from_batch:
            iso = jnp.asarray(batch["iso"], jnp.float32).reshape(-1)[0]
        else:
            iso_idx = jax.random.randint(k2, (), 0, len(LEGAL_ISO))
            iso = jnp.asarray(LEGAL_ISO)[iso_idx]
        rb = ratio.reshape(-1, 1, 1, 1)
        noise = sample_fn(k3, hr / rb, iso)
        # ori=True keeps lr at the dark (unamplified) exposure, consistent
        # with generate_noisy's ori branch: dark signal + dark-scale noise.
        lr = hr + noise * rb if not ori else hr / rb + noise
        return lr, hr, ratio

    return synth


def make_mix_synth(camera_type: str, command: str = "augv5", ori: bool = False,
                   hbr_map: Callable | None = None, host_amplified: bool = False):
    """PMN-style SNA over *real* noisy/clean pairs.

    batch needs: hr, lr, ratio [n], iso [n], wb [n, 4], and optionally
    black_lr — a python bool or per-example [n] 0/1 array marking crops whose
    lr is a pasted real bias frame (reference: trainer_SID.py:430-447,
    phone_datasets.py:585-640). ``hbr_map(key, lr) -> lr`` is the
    HighBitRecovery remap applied to the bias-frame crops (quantized read
    noise -> continuous, reference: phone_datasets.py:632).

    ``host_amplified``: the loader already multiplied lr by ratio (the IMX686
    loaders do, inheriting the paired path); skip the device-side multiply so
    the amplification happens exactly once.
    """

    def synth(key, batch):
        hr, lr = batch["hr"], batch["lr"]
        n = hr.shape[0]
        ratio = batch["ratio"].reshape(-1)
        k1, k2, k3 = jax.random.split(key, 3)
        aug_r, aug_g, aug_b = get_aug_param(k1, batch["wb"], n, command, camera_type)
        aug_wb = jnp.stack([aug_r, aug_g, aug_b, aug_g], axis=1)
        black = jnp.broadcast_to(
            jnp.asarray(batch.get("black_lr", False), jnp.float32), (n,)
        )
        aug_wb = aug_wb + black[:, None]
        if hbr_map is not None:
            # The HBR LUT addresses UNAMPLIFIED ADU bins (the reference
            # remaps raw bias crops before the preprocess multiplies by
            # dgain, phone_datasets.py:631 then trainer_LRID.py:378). When
            # the loader host-amplified lr, unamplify around the remap.
            mask = black.reshape(-1, 1, 1, 1)
            rb = ratio.reshape(-1, 1, 1, 1)
            amp = rb if (host_amplified and not ori) else 1.0
            lr = jnp.where(mask > 0, hbr_map(k3, lr / amp) * amp, lr)
        lr = lr if (ori or host_amplified) else lr * ratio.reshape(-1, 1, 1, 1)
        dn, dy = sna(k2, hr, aug_wb, camera_type=camera_type, ratio=ratio,
                     iso=batch.get("iso"), black_lr=black, ori=ori)
        return lr + dn, hr + dy, ratio

    return synth


def identity_synth(key, batch):
    """Real paired data (eval / paired training): no synthesis."""
    return batch["lr"], batch["hr"], batch.get("ratio", jnp.ones(batch["hr"].shape[0]))


def pack_synth(synth: Callable) -> Callable:
    """Adapt an unpacked synth stage to the ``fast="packed"`` train step.

    Packs lr/hr to the 4x4-superpixel layout once, after synthesis. Both
    relayouts are forward-only (no gradient flows through data) and replace
    the boundary d2s(pred)/s2d(grad) pair — measured performance-neutral on
    v5e (72 ms/step either way for the SNA mix path at the reference shape),
    so this exists to keep every UNetSeeInDark training family on the one
    packed step; the real 1.4x win needs native packed synthesis
    (:func:`make_raw_synth_packed`).
    """
    from pnnp_tpu.models.unet_s2d import s2d

    def packed(key, batch):
        lr, hr, ratio = synth(key, batch)
        if lr.shape[-1] == 4:
            lr, hr = s2d(lr), s2d(hr)
        return lr, hr, ratio

    return packed


def make_train_step(
    model,
    lr_schedule: Callable,
    synth: Callable = identity_synth,
    clip_mode=0,
    deep_supervision: bool = False,
    donate: bool = True,
    fast: bool = False,
    remat: bool = False,
):
    """Build the fused jitted train step.

    step(state, batch, key, epoch) -> (state, metrics)

    ``fast=True`` (UNetSeeInDark, no deep supervision) trains through the
    exact dense-s2d forward (pnnp_tpu.models.unet_s2d) in bf16 — the weight
    transform is differentiable and exact, so gradients match the standard
    path up to bf16 rounding while the step runs ~3x faster on v5e.

    ``fast="packed"`` additionally keeps the whole step in the 4x4-superpixel
    packed layout: synth must yield packed lr/hr (``make_raw_synth_packed``,
    or ``identity_synth`` over a pre-packed batch) and the loss is computed
    in packed space (L1 and MSE are permutation-invariant, so loss/psnr
    match the unpacked step exactly). This removes the boundary s2d/d2s
    relayouts (forward AND backward) from every step.

    ``remat=True`` wraps the forward in ``jax.checkpoint``: activations are
    rematerialized in the backward pass, trading ~30% FLOPs for roughly half
    the activation HBM — use for large crops/batches.
    """

    if fast and not deep_supervision:
        from pnnp_tpu.models.unet_s2d import (
            transform_params_hybrid,
            unet_hybrid_forward,
            unet_hybrid_forward_packed,
        )

        res = bool(getattr(model, "res", False))
        if fast == "packed":
            fwd_p = unet_hybrid_forward_packed
            if remat:
                fwd_p = jax.checkpoint(unet_hybrid_forward_packed)

            def loss_fn(params, batch_stats, lr_img, hr_img):
                tp = transform_params_hybrid(params)
                pred = fwd_p(tp, lr_img, lr_img if res else None)
                return unet_loss(pred, hr_img), pred

        else:
            fwd = unet_hybrid_forward
            if remat:
                fwd = jax.checkpoint(unet_hybrid_forward, static_argnums=(2,))

            def loss_fn(params, batch_stats, lr_img, hr_img):
                tp = transform_params_hybrid(params)
                pred = fwd(tp, lr_img, res)
                return unet_loss(pred, hr_img), pred

    else:

        def apply_model(variables, lr_img, mutable):
            kwargs = {"train": True} if deep_supervision else {}
            if mutable:
                return model.apply(variables, lr_img, mutable=mutable, **kwargs)
            return model.apply(variables, lr_img, **kwargs), {}

        if remat:
            apply_model = jax.checkpoint(apply_model, static_argnums=(2,))

        def loss_fn(params, batch_stats, lr_img, hr_img):
            variables = {"params": params}
            # BatchNorm-bearing models must run with mutable batch_stats
            # during training or flax errors (or silently freezes the
            # running stats at init); structure is static at trace time.
            mutable = ("batch_stats",) if batch_stats else ()
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            if deep_supervision:
                outs, updates = apply_model(variables, lr_img, mutable)
                loss = unet_dpsv_loss(outs, hr_img)
                pred = outs[0]
            else:
                pred, updates = apply_model(variables, lr_img, mutable)
                loss = unet_loss(pred, hr_img)
            return loss, (pred, updates)

    def step(state: TrainState, batch, key, epoch):
        lr_img, hr_img, ratio = synth(key, batch)
        lr_img, hr_img = clip_lr_hr(lr_img, hr_img, clip_mode)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, lr_img, hr_img
        )
        pred, updates = aux if isinstance(aux, tuple) else (aux, {})
        lr = lr_schedule(epoch)
        state = apply_scaled_updates(state, grads, lr)
        if isinstance(updates, dict) and updates.get("batch_stats"):
            state = state.replace(batch_stats=updates["batch_stats"])
        mse = jnp.mean((jnp.clip(pred, 0, 1) - jnp.clip(hr_img, 0, 1)) ** 2)
        metrics = {
            "loss": loss,
            "psnr": 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12)),
            "lr": lr,
        }
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def pad_split(n: int, mult: int = 16):
    """(lo, hi) symmetric split of the pad needed to reach %mult — the
    general form of the reference's fixed ``F.pad(p2d=(4,4,4,4))``
    (trainer_SID.py:221-226 / trainer_LRID.py:224-229: both camera shapes
    have residue 8, i.e. 4 per side). Must stay in lockstep with the host
    mirror in pnnp_tpu.models.unet_s2d.pack_frame_np."""
    p = (-n) % mult
    return p // 2, p - p // 2


def pad_to_multiple(x: jnp.ndarray, mult: int = 16):
    """Symmetric reflect-pad H/W up to a multiple (reference pads 4 per side
    before the UNet and center-crops after, trainer_SID.py:221-226).
    Returns (padded, (oy, ox, H, W)); crop the output with
    ``pred[:, oy:oy+H, ox:ox+W, :]``."""
    H, W = x.shape[-3], x.shape[-2]
    (pt, pb), (pl, pr) = pad_split(H, mult), pad_split(W, mult)
    if pt or pb or pl or pr:
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode="reflect")
    return x, (pt, pl, H, W)


def make_eval_metrics_step(model, qparams: dict | None = None):
    """Fused full-frame eval: forward + ALL metrics in ONE jit, layout-aware.

    ``qparams`` (from ``pnnp_tpu.models.unet_s2d_int8.quantize_params_int8``)
    swaps the forward for the opt-in W8A8 int8 serving path — metrics and
    correction stay f32; validate the per-checkpoint PSNR delta first
    (tools/validate_int8.py).

    The reference computes eval metrics on CPU via skimage
    (trainer_SID.py:242-248); the round-2 rebuild moved them on-device but
    as separate calls over ``[H, W, 4]`` tensors — a layout whose padded
    tiling and relayouts measured ~2x the UNet forward at full frame. Here
    the frame flows through ONE jit in cheap layouts end to end:

      * inputs arrive channel-interleaved FLAT ``[1, H, W*4]`` (a free
        numpy reshape on the host side — [1, H, W, 4] is also accepted);
      * %16 symmetric reflect pad (reference p2d=(4,4,4,4) + center crop,
        trainer_SID.py:221-226) + s2d fuse into the packed forward's input
        relayout
        — OR the host hands ``lr`` already packed ``[1, H'/2, W'/2, 16]``
        (:func:`pnnp_tpu.models.unet_s2d.pack_frame_np` in a prefetch
        worker), which skips the ~7 ms on-device input relayout entirely;
        crop dims then come from ``hr``'s (unpacked) shape;
      * the denoised frame comes back as ONE fused d2s+crop+flatten;
      * clip / illuminance correction / PSNR are sums over the flat views;
      * SSIM runs through the Pallas tiled-reduction kernel directly on the
        flat layout (lane rolls of C — no transposes; XLA fallback off-TPU).

    step(tparams, lr, hr, ratio) -> (dn_flat [1, H, W*4] corrected+clipped,
    metrics dict with psnr/ssim[/psnr_in/ssim_in]). Reference eval semantics
    (trainer_SID.py:221-248): ori amplification, clip, correct dn against
    hr, score at data_range 255.
    """
    from pnnp_tpu.kernels.ssim import ssim_flat
    from pnnp_tpu.models.unet_s2d import d2s, s2d

    res = bool(getattr(model, "res", False))
    if qparams is None:
        from pnnp_tpu.models.unet_s2d import unet_hybrid_forward_packed as fwd
    else:
        assert not res, "int8 serving path has no residual-input support"
        from pnnp_tpu.models.unet_s2d_int8 import (
            unet_hybrid_forward_packed_int8,
        )

        def fwd(tp, g1, res_x=None):
            return unet_hybrid_forward_packed_int8(tp, qparams, g1)

    def step(tparams, lr, hr, ratio, *, ori=False, correct=True,
             with_inputs=False):
        if lr.ndim == 3:  # flat [1, H, W*4] -> logical 4-channel view
            lr = lr.reshape(1, lr.shape[1], -1, 4)
        if hr.ndim == 3:
            hr = hr.reshape(1, hr.shape[1], -1, 4)
        # host pre-packed (%16 pad + s2d) — only unambiguous when the model
        # consumes 4-channel frames (a 16-channel lr on an in_nc=16
        # multi-frame model is a legitimate UNPACKED input)
        packed = lr.shape[-1] == 16 and getattr(model, "in_nc", 4) == 4
        if packed:
            H, W = hr.shape[1], hr.shape[2]
            oy, ox = pad_split(H)[0], pad_split(W)[0]
            g1 = lr
        else:
            x, (oy, ox, H, W) = pad_to_multiple(lr, 16)
            g1 = s2d(x)
        dnp = fwd(tparams, g1, g1 if res else None)
        # one fused transpose: packed -> unpacked -> crop -> flat f32
        dn = d2s(dnp)[:, oy:oy + H, ox:ox + W, :].astype(jnp.float32)

        flat = lambda t: t.reshape(t.shape[-3], -1)  # [H, W*4] dense view
        dnf = flat(dn[0])
        if with_inputs:  # the only consumer of the unpacked input frame
            lr_un = d2s(lr)[:, oy:oy + H, ox:ox + W, :] if packed else lr
            lrf = flat(lr_un[0].astype(jnp.float32))
        if ori:
            r = jnp.asarray(ratio, jnp.float32).reshape(())
            dnf = dnf * r
            if with_inputs:
                lrf = lrf * r
        dnf = jnp.clip(dnf, 0.0, 1.0)
        if with_inputs:
            lrf = jnp.clip(lrf, 0.0, 1.0)
        hrf = flat(hr[0].astype(jnp.float32))
        hrc = jnp.clip(hrf, 0.0, 1.0)
        scale = jnp.float32(1.0)
        if correct:
            w = (hrf != 1.0).astype(jnp.float32)
            num = jnp.sum(dnf * hrf * w)
            den = jnp.sum(dnf * dnf * w)
            scale = jnp.where(den > 0, num / jnp.maximum(den, 1e-20), 1.0)
            dnf = scale * dnf

        def psnr_of(a, b):
            mse = jnp.mean((a * 255.0 - b * 255.0) ** 2)
            return 10.0 * jnp.log10(255.0**2 / jnp.maximum(mse, 1e-12))

        metrics = {
            "psnr": psnr_of(dnf, hrc),
            "ssim": ssim_flat(dnf * 255.0, hrc * 255.0),
        }
        if with_inputs:  # the save_plot meters (trainer_SID.py:291-297)
            metrics["psnr_in"] = psnr_of(lrf, hrc)
            metrics["ssim_in"] = ssim_flat(lrf * 255.0, hrc * 255.0)
            # also hand back the (ori-scaled, clipped) input panel so the
            # host can plot it even when the loader pre-packed the frame —
            # the plot path no longer forces packing off
            return dnf[None], metrics, lrf[None]
        # corrected, clipped flat frame — what the reference plots/saves
        return dnf[None], metrics

    return jax.jit(step, static_argnames=("ori", "correct", "with_inputs"))


def make_eval_step(model, fast: bool = False):
    """eval_step(state, lr_img) -> denoised, with %16 reflect padding.

    ``fast=True`` (UNetSeeInDark only) evaluates through the exact dense-s2d
    level-1 path in bf16 (pnnp_tpu.models.unet_s2d) — ~1.6x frame throughput
    on v5e with identical outputs up to bf16 rounding.
    """
    if fast:
        from pnnp_tpu.models.unet_s2d import (
            transform_params_hybrid,
            unet_hybrid_forward,
        )

        transform = jax.jit(transform_params_hybrid)

        @jax.jit
        def fast_step(tparams, lr_img):
            x, (oy, ox, H, W) = pad_to_multiple(lr_img, 16)
            pred = unet_hybrid_forward(tparams, x, res=getattr(model, "res", False))
            return pred[:, oy:oy + H, ox:ox + W, :]

        cache = {"params": None, "tp": None}

        def step(state: TrainState, lr_img):
            # Cache the transformed weights by param-tree identity. Holding
            # the reference keeps `is` sound (no id reuse after GC), and a
            # restored checkpoint is always a new tree — unlike the previous
            # step-count key, which aliased two different checkpoints loaded
            # at the same step.
            if cache["params"] is not state.params:
                cache["params"] = state.params
                cache["tp"] = transform(state.params)
            return fast_step(cache["tp"], lr_img)

        return step

    @jax.jit
    def step(state: TrainState, lr_img):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        x, (oy, ox, H, W) = pad_to_multiple(lr_img, 16)
        pred = model.apply(variables, x)
        return pred[:, oy:oy + H, ox:ox + W, :]

    return step
