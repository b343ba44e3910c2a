"""Device mesh + sharding: the TPU-native parallelism layer.

The reference's only parallelism is single-process ``nn.DataParallel``
(reference: base_trainer.py:115-118). Here parallelism is SPMD over a
``jax.sharding.Mesh`` with two axes:

  * ``data``    — batch sharding for training (gradients psum'ed by XLA)
  * ``spatial`` — width sharding for full-frame eval (halo exchange via
    ``ppermute`` inside ``shard_map``), the honest ICI story for a conv UNet
    on 2848x4256 / 3472x4624 frames (SURVEY.md §5 long-context analog).

Everything works unchanged on a single device (mesh of size 1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_spatial
    devices = devices[: n_data * n_spatial].reshape(n_data, n_spatial)
    return Mesh(devices, ("data", "spatial"))


def shard_batch(mesh: Mesh, batch, batch_dim_size: Optional[int] = None):
    """Place a host batch with leading dim sharded over the data axis.

    ``batch_dim_size``: when given, only arrays whose dim 0 equals it are
    sharded; everything else (per-sample metadata with odd collation, e.g.
    ccm matrices) is replicated.
    """
    n = mesh.shape["data"]

    def put(x):
        sharded = (
            getattr(x, "ndim", 0) >= 1
            and (batch_dim_size is None or x.shape[0] == batch_dim_size)
            and x.shape[0] % n == 0  # replicate odd-collated metadata (ccm etc.)
        )
        spec = P("data") if sharded else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def make_sharded_train_step(mesh: Mesh, train_step):
    """Constrain the batch to the data axis; XLA inserts the gradient psum.

    ``train_step`` is the jitted step from :func:`pnnp_tpu.train.steps.make_train_step`;
    with batch inputs sharded over ``data`` and params replicated, jit's SPMD
    partitioner emits the all-reduce over ICI automatically.
    """

    def step(state, batch, key, epoch):
        # Per-leaf specs mirroring shard_batch: rank-0 leaves and
        # replicated odd-collation metadata (e.g. a [3,3] ccm) stay
        # replicated; only batch-major leaves shard over 'data'.
        n = mesh.shape["data"]

        def constrain(x):
            sharded = getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0
            spec = P("data") if sharded else P()
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

        batch = jax.tree.map(constrain, batch)
        return train_step(state, batch, key, epoch)

    return jax.jit(step, donate_argnums=(0,))


def make_sharded_noise_step(mesh: Mesh, step):
    """Data-parallel wrapper for the NF/proxy train steps (trainer_nf.py).

    Same contract as :func:`make_sharded_train_step` but for the noise-model
    step signature ``step(state, lr, hr, ratio, iso, epoch)``: batch-major
    inputs are constrained to the ``data`` axis, params stay replicated, and
    XLA's SPMD partitioner inserts the gradient psum — the TPU analog of the
    reference's DataParallel wrap of the NF net
    (reference: trainer_NF_SID.py:82-87). Odd-sized batches (not divisible
    by the axis) replicate rather than shard, matching shard_batch.
    """
    n = mesh.shape["data"]

    def constrain(x):
        sharded = getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0
        spec = P("data") if sharded else P()
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def wrapped(state, lr_img, hr_img, ratio, iso, epoch):
        lr_img, hr_img, ratio, iso = (
            constrain(lr_img), constrain(hr_img), constrain(ratio),
            constrain(iso))
        return step(state, lr_img, hr_img, ratio, iso, epoch)

    return jax.jit(wrapped, donate_argnums=(0,))


def spatial_eval(mesh: Mesh, apply_fn, image: jnp.ndarray, halo: int = 32):
    """Full-frame eval with the W axis sharded over the mesh's spatial axis.

    Each shard reflect-pads its slice with ``halo`` columns exchanged from its
    ring neighbours via ``ppermute`` (ICI), runs the model, and drops the
    halo — the SPMD generalization of the reference's overlap-tile predict
    (reference: trainer_SID.py:345-360, halo d=32).

    ``image``: [n, H, W, C] with W divisible by the spatial axis size.
    ``apply_fn``: [n, H, w_local, C] -> same shape.
    """
    from jax import shard_map

    axis = "spatial"
    nsp = mesh.shape[axis]
    if nsp == 1:
        return apply_fn(image)
    if halo == 0:
        # no halo exchange: shard-local eval ('-0:' slices would grab whole
        # shards and the final de-halo slice would be empty)
        from jax import shard_map as _sm

        return _sm(apply_fn, mesh=mesh, in_specs=P(None, None, axis, None),
                   out_specs=P(None, None, axis, None))(image)

    def worker(img):
        # img: [n, H, W/nsp, C] local shard
        idx = jax.lax.axis_index(axis)
        left_edge = img[:, :, :halo, :]
        right_edge = img[:, :, -halo:, :]
        # Receive neighbour edges (ring ppermute; ends reflect-pad locally).
        from_left = jax.lax.ppermute(
            right_edge, axis, [(i, (i + 1) % nsp) for i in range(nsp)]
        )
        from_right = jax.lax.ppermute(
            left_edge, axis, [(i, (i - 1) % nsp) for i in range(nsp)]
        )
        # First/last shard: reflect own border instead of wrapped neighbour
        # (edge-excluding reflect, matching jnp.pad mode='reflect').
        reflect_l = img[:, :, 1 : halo + 1, :][:, :, ::-1, :]
        reflect_r = img[:, :, -halo - 1 : -1, :][:, :, ::-1, :]
        from_left = jnp.where(idx == 0, reflect_l, from_left)
        from_right = jnp.where(idx == nsp - 1, reflect_r, from_right)
        padded = jnp.concatenate([from_left, img, from_right], axis=2)
        out = apply_fn(padded)
        return out[:, :, halo:-halo, :]

    fn = shard_map(
        worker,
        mesh=mesh,
        in_specs=P(None, None, "spatial", None),
        out_specs=P(None, None, "spatial", None),
    )
    return fn(image)


def make_eval_metrics_step_sharded(model, mesh: Mesh, halo: int = 96,
                                   qparams: dict | None = None):
    """Width-sharded fused full-frame eval: forward + illuminance correction
    + PSNR + SSIM in ONE jit over the mesh's ``spatial`` axis.

    Signature-compatible with :func:`pnnp_tpu.train.steps.make_eval_metrics_step`
    (``step(tparams, lr, hr, ratio, *, ori, correct, with_inputs)`` returning
    the corrected flat frame + replicated metric scalars), so the trainer's
    eval loop runs unchanged on a multi-chip mesh instead of abandoning the
    fused path (round-3 gap: the 3.6x fused eval win and the Pallas SSIM
    kernel were single-device only).

    How each stage shards:
      * forward — reflect/ppermute halo exchange of ``halo`` columns (the
        :func:`spatial_eval` geometry), packed s2d forward shard-local;
      * illuminance correction — num/den partial sums psum'ed before the
        global scale (reference ELD correction, data_process/__init__.py:
        144-175, exact across shards);
      * PSNR — masked squared-error partial sums psum'ed (pad columns in the
        edge shards excluded);
      * SSIM — each shard runs the SSIM kernel over a slab of its own
        columns + 6 halo columns from its right neighbour, which makes the
        kernel's valid-window sum EXACTLY the shard's owned window starts;
        window starts touching the global pad columns (left: ``pl`` starts
        on shard 0; right: ``pr + 6`` starts on the last shard, whose
        windows read pad or ring-wrapped halo values) are subtracted via
        tiny XLA-path corrections on the same slab values, then one psum +
        global normalize reproduces the exact full-frame skimage mean.

    ``halo`` must be a multiple of 8 and >= the model's receptive-field
    radius (UNetSeeInDark ~94 -> default 96). Frames too narrow to shard
    fall back to the single-device fused step at trace time.
    """
    from jax import shard_map

    from pnnp_tpu.kernels.ssim import ssim_flat_sum
    from pnnp_tpu.models.unet_s2d import d2s, s2d
    from pnnp_tpu.ops.metrics import ssim_sum as ssim_sum_xla
    from pnnp_tpu.train.steps import make_eval_metrics_step, pad_split

    axis = "spatial"
    nsp = mesh.shape[axis]
    assert halo % 8 == 0, halo
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

    fallback = make_eval_metrics_step(model, qparams=qparams)

    def step(tparams, lr, hr, ratio, *, ori=False, correct=True,
             with_inputs=False, halos=None):
        if lr.ndim == 3:
            lr = lr.reshape(1, lr.shape[1], -1, 4)
        if hr.ndim == 3:
            hr = hr.reshape(1, hr.shape[1], -1, 4)
        # Host pre-packed input (models/unet_s2d.pack_frame_sharded_np):
        # lr arrives s2d-packed at the SHARDED pad geometry (%16 rows,
        # %(16*nsp) cols) with the two edge-reflect halo blocks computed on
        # the host — the multi-chip version of the single-device loader
        # pre-pack (the ~7 ms/frame on-device input relayout leaves the
        # critical path; interior halos ride ICI as packed ppermutes, which
        # are exact because shard boundaries align to superpixels).
        packed = lr.shape[-1] == 16
        if packed:
            assert halos is not None, (
                "pre-packed sharded input requires the host edge halos "
                "(pack_frame_sharded_np returns them)")
            H, W = int(hr.shape[1]), int(hr.shape[2])
        else:
            H, W = int(lr.shape[1]), int(lr.shape[2])
        pt, pb = pad_split(H, 16)
        pl, pr = pad_split(W, 16 * nsp)
        Hp, Wp = H + pt + pb, W + pl + pr
        wloc = Wp // nsp
        viable = (
            nsp > 1 and wloc > 2 * halo and H > 8 and W > 8
            and wloc >= pl + 6 and wloc >= pr + 12  # correction slices fit
            and Wp - W < W and Hp - H < H           # reflect pad legal
        )
        if not viable:
            if packed:  # rare: recover the unpacked frame for the fallback
                lr = d2s(lr)[:, pt:pt + H, pl:pl + W, :]
            return fallback(tparams, lr, hr, ratio, ori=ori, correct=correct,
                            with_inputs=with_inputs)

        pad = ((0, 0), (pt, pb), (pl, pr), (0, 0))
        if packed:
            assert lr.shape == (1, Hp // 2, Wp // 2, 16), (
                lr.shape, (1, Hp // 2, Wp // 2, 16),
                "pre-packed frame does not match the sharded pad geometry")
            lrp = lr
        else:
            lrp = (jnp.pad(lr, pad, mode="reflect")
                   if (pt or pb or pl or pr) else lr)
        hrp = jnp.pad(hr, pad, mode="reflect") if (pt or pb or pl or pr) else hr
        r = jnp.asarray(ratio, jnp.float32).reshape(())
        ring_left = [(i, (i + 1) % nsp) for i in range(nsp)]
        ring_right = [(i, (i - 1) % nsp) for i in range(nsp)]
        npx = jnp.float32(H * W * 4)
        nwin = jnp.float32((H - 6) * (W - 6) * 4)

        def with_right_halo(t4):
            # own columns + 6 columns from the right neighbour ([1,H,wloc+6,4]);
            # the last shard receives ring-wrapped values, excluded exactly by
            # the right border correction below
            recv = jax.lax.ppermute(t4[:, :, :6, :], axis, ring_right)
            return jnp.concatenate([t4, recv], axis=2)

        def ssim_shard_sum(idx, a4, b4):
            # a4/b4: [1, H, wloc+6, 4] slabs in [0,1]; returns this shard's
            # contribution to the global SSIM map sum
            flat = lambda t: (t * 255.0).reshape(t.shape[1], -1)
            total = ssim_flat_sum(flat(a4), flat(b4), C=4)
            if pl > 0:  # shard 0: starts [0, pl) read left pad columns
                cl = ssim_sum_xla(a4[0, :, :pl + 6] * 255.0,
                                  b4[0, :, :pl + 6] * 255.0)
                total = total - jnp.where(idx == 0, cl, 0.0)
            # last shard: starts [wloc-pr-6, wloc) read right pad and/or
            # ring-wrapped halo columns — always pr+6 invalid starts
            cr = ssim_sum_xla(a4[0, :, wloc - pr - 6:] * 255.0,
                              b4[0, :, wloc - pr - 6:] * 255.0)
            return total - jnp.where(idx == nsp - 1, cr, 0.0)

        def tail(idx, dn4, hr_s, lr_in4, r_):
            """Shared metric tail: dn4 [1, H, wloc, 4] (cropped), hr_s the
            padded unpacked shard, lr_in4 [1, H, wloc, 4] or None."""
            hr4 = hr_s[:, pt:pt + H].astype(jnp.float32)
            flat = lambda t: t.reshape(t.shape[1], -1)  # [H, wloc*4]
            dnf, hrf = flat(dn4), flat(hr4)
            # pixel-column validity (pad columns excluded from the sums)
            gcol = idx * wloc + jnp.arange(wloc)
            m = jnp.repeat(((gcol >= pl) & (gcol < pl + W))
                           .astype(jnp.float32), 4)[None, :]
            if with_inputs:
                lrf = flat(lr_in4.astype(jnp.float32))
            if ori:
                dnf = dnf * r_
                if with_inputs:
                    lrf = lrf * r_
            dnf = jnp.clip(dnf, 0.0, 1.0)
            if with_inputs:
                lrf = jnp.clip(lrf, 0.0, 1.0)
            hrc = jnp.clip(hrf, 0.0, 1.0)
            if correct:
                w = (hrf != 1.0).astype(jnp.float32) * m
                num = jax.lax.psum(jnp.sum(dnf * hrf * w), axis)
                den = jax.lax.psum(jnp.sum(dnf * dnf * w), axis)
                scale = jnp.where(den > 0, num / jnp.maximum(den, 1e-20), 1.0)
                dnf = scale * dnf

            def psnr_of(a, b):
                se = jax.lax.psum(jnp.sum(((a - b) * 255.0) ** 2 * m), axis)
                return 10.0 * jnp.log10(
                    255.0**2 / jnp.maximum(se / npx, 1e-12))

            dn4c = dnf.reshape(1, H, wloc, 4)
            hr4c = hrc.reshape(1, H, wloc, 4)
            sd, sh = with_right_halo(dn4c), with_right_halo(hr4c)
            metrics = {
                "psnr": psnr_of(dnf, hrc),
                "ssim": jax.lax.psum(ssim_shard_sum(idx, sd, sh), axis) / nwin,
            }
            lr4c = None
            if with_inputs:  # the save_plot meters (trainer_SID.py:291-297)
                metrics["psnr_in"] = psnr_of(lrf, hrc)
                lr4c = lrf.reshape(1, H, wloc, 4)
                metrics["ssim_in"] = jax.lax.psum(
                    ssim_shard_sum(idx, with_right_halo(lr4c), sh), axis) / nwin
            if with_inputs:
                return dn4c, metrics, lr4c
            return dn4c, metrics

        def worker(tp, lr_s, hr_s, r_):
            """Unpacked input: on-device reflect/ppermute halo + s2d."""
            idx = jax.lax.axis_index(axis)
            from_left = jax.lax.ppermute(lr_s[:, :, -halo:, :], axis, ring_left)
            from_right = jax.lax.ppermute(lr_s[:, :, :halo, :], axis, ring_right)
            reflect_l = lr_s[:, :, 1:halo + 1, :][:, :, ::-1, :]
            reflect_r = lr_s[:, :, -halo - 1:-1, :][:, :, ::-1, :]
            from_left = jnp.where(idx == 0, reflect_l, from_left)
            from_right = jnp.where(idx == nsp - 1, reflect_r, from_right)
            slab = jnp.concatenate([from_left, lr_s, from_right], axis=2)
            g1 = s2d(slab)
            dnp = fwd(tp, g1, g1 if res else None)
            dn4 = d2s(dnp).astype(jnp.float32)[:, pt:pt + H, halo:-halo, :]
            lr_in4 = lr_s[:, pt:pt + H] if with_inputs else None
            return tail(idx, dn4, hr_s, lr_in4, r_)

        def worker_packed(tp, g_s, hr_s, hl_, hr_halo_, r_):
            """Pre-packed input: packed ppermute halos (exact — shard
            boundaries align to 2x2 superpixels), host-computed edge
            reflect halos, ZERO on-device input relayout."""
            idx = jax.lax.axis_index(axis)
            hc = halo // 2
            from_left = jax.lax.ppermute(g_s[:, :, -hc:, :], axis, ring_left)
            from_right = jax.lax.ppermute(g_s[:, :, :hc, :], axis, ring_right)
            from_left = jnp.where(idx == 0, hl_, from_left)
            from_right = jnp.where(idx == nsp - 1, hr_halo_, from_right)
            g1 = jnp.concatenate([from_left, g_s, from_right], axis=2)
            dnp = fwd(tp, g1, g1 if res else None)
            dn4 = d2s(dnp).astype(jnp.float32)[:, pt:pt + H, halo:-halo, :]
            # the input panel (plot sweeps only) pays a shard-local d2s
            lr_in4 = (d2s(g_s)[:, pt:pt + H] if with_inputs else None)
            return tail(idx, dn4, hr_s, lr_in4, r_)

        sp = P(None, None, axis, None)
        out_specs = (sp, P(), sp) if with_inputs else (sp, P())
        if packed:
            hl_, hr_halo_ = halos
            outs = shard_map(
                worker_packed, mesh=mesh,
                in_specs=(P(), sp, sp, P(), P(), P()),
                out_specs=out_specs,
            )(tparams, lrp, hrp, hl_, hr_halo_, r)
        else:
            outs = shard_map(
                worker, mesh=mesh,
                in_specs=(P(), sp, sp, P()),
                out_specs=out_specs,
            )(tparams, lrp, hrp, r)
        if with_inputs:
            dn, metrics, lr_out = outs
        else:
            dn, metrics = outs
        dn = dn[:, :, pl:pl + W, :]  # rows were cropped shard-local
        dnf = dn.reshape(1, H, W * 4)
        if with_inputs:
            lrf_out = lr_out[:, :, pl:pl + W, :].reshape(1, H, W * 4)
            return dnf, metrics, lrf_out
        return dnf, metrics

    return jax.jit(step, static_argnames=("ori", "correct", "with_inputs"))


def spatial_eval_auto(mesh: Mesh, apply_fn, image: jnp.ndarray,
                      halo: int = 96, align: int = 16):
    """Production wrapper around :func:`spatial_eval` for arbitrary frames.

    Reflect-pads H to a multiple of ``align`` and W to a multiple of
    ``nsp * align`` so each width shard (plus its 2*halo columns) is already
    %align and the model never pads internally, runs the halo-exchanged
    sharded eval, and crops back. Falls back to plain ``apply_fn`` when the
    frame is too narrow to shard (local width <= halo) — tiny eval crops in
    tests, thumbnails.

    With ``halo >= receptive-field radius`` (UNetSeeInDark: ~94 px, so the
    default 96) the result equals the single-device full-frame eval up to
    float roundoff (tested in tests/test_spatial_eval.py).
    """
    nsp = mesh.shape["spatial"]
    if nsp == 1:
        return apply_fn(image)
    H, W = int(image.shape[1]), int(image.shape[2])
    Hp = -(-H // align) * align
    Wp = -(-W // (nsp * align)) * (nsp * align)
    if Wp // nsp <= halo or Wp - W >= W or Hp - H >= H:
        return apply_fn(image)
    img = image
    # symmetric split, matching the single-device eval's pad placement
    # (reference p2d=(4,4,4,4) center-crop, trainer_SID.py:221-226 — see
    # train.steps.pad_split); the W pad is larger here (%nsp*align), so
    # border pixels still see more reflect context than single-device, but
    # the placement convention is the same on all four sides
    pt, pb = (Hp - H) // 2, Hp - H - (Hp - H) // 2
    pl, pr = (Wp - W) // 2, Wp - W - (Wp - W) // 2
    if Hp != H or Wp != W:
        img = jnp.pad(img, ((0, 0), (pt, pb), (pl, pr), (0, 0)),
                      mode="reflect")
    out = spatial_eval(mesh, apply_fn, img, halo=halo)
    return out[:, pt:pt + H, pl:pl + W, :]
