"""Space-to-depth fast path for UNetSeeInDark — exact, MXU-shaped.

Motivation (measured on v5e): a 3x3 conv with 32 channels at 1424x2128 runs
at ~14 TFLOP/s (the 128-lane MXU is mostly idle), while the same FLOPs at
128+ channels run at 70-110 TFLOP/s. This module evaluates the *identical*
network function in a space-to-depth representation where every level's
feature map is stored as ``[H/2, W/2, 4C]`` (channel groups = the 4 Bayer-like
sub-positions), so all convolutions have >=128 channels:

  * 3x3 conv on ``[H, W, C]``  ==  2x2 conv on the s2d tensor with a
    block-structured kernel + per-output-group shifted slices (exact; 1.78x
    raw FLOPs — kept as the reference construction; the production path below
    uses the slice-free dense-3x3 form because XLA's lane-offset slices are
    expensive composed)
  * 2x2 max-pool  ==  elementwise max over the 4 sub-position groups (VPU)
  * 2x2-stride-2 transposed conv  ==  a 1x1 conv producing all 4 sub-position
    groups at once (pure matmul)
  * the 1x1 head is block-diagonal over groups

Weights are transformed on the fly from the standard ``UNetSeeInDark`` param
tree (`pnnp_tpu.models.unet`), so checkpoints are shared between the paths;
equivalence is covered by tests/test_unet_s2d.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def s2d(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H/2, W/2, 4C], group-major channels (g = 2*aH + aW)."""
    n, H, W, c = x.shape
    x = x.reshape(n, H // 2, 2, W // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, H // 2, W // 2, 4 * c)


def d2s(g: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`s2d`."""
    n, h, w, c4 = g.shape
    c = c4 // 4
    x = g.reshape(n, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h, 2 * w, c)


def s2d_np(x):
    """Host (numpy) mirror of :func:`s2d` — used by the eval loader workers
    to pre-pack full frames off the device critical path (the on-device s2d
    of an unpacked full frame costs ~7 ms on v5e; in a prefetch worker it
    hides behind the previous frame's eval step)."""
    n, H, W, c = x.shape
    x = x.reshape(n, H // 2, 2, W // 2, 2, c)
    x = np.ascontiguousarray(x.transpose(0, 1, 3, 2, 4, 5))
    return x.reshape(n, H // 2, W // 2, 4 * c)


def d2s_np(g):
    """Host (numpy) mirror of :func:`d2s`."""
    n, h, w, c4 = g.shape
    c = c4 // 4
    x = g.reshape(n, h, w, 2, 2, c)
    x = np.ascontiguousarray(x.transpose(0, 1, 3, 2, 4, 5))
    return x.reshape(n, 2 * h, 2 * w, c)


def pack_frame_sharded_np(x, nsp: int, halo: int = 96, mult: int = 16):
    """Host pre-pack for the WIDTH-SHARDED fused eval (parallel/mesh.py).

    Pads ``[N, H, W, 4]`` symmetrically to ``%mult`` rows and ``%(mult*nsp)``
    columns (the sharded step's own pad geometry, pad_split-lockstep), packs
    with :func:`s2d_np`, and also returns the two PACKED edge-reflect halo
    blocks (``halo`` unpacked columns each) the edge shards need — interior
    halos travel between shards as packed ppermutes (exact: shard boundaries
    align to 2x2 superpixels), but the mirror reflection at the frame edges
    is superpixel-breaking, so the host computes it where the relayout is
    free. Returns ``(g, halo_left, halo_right)``.
    """
    from pnnp_tpu.train.steps import pad_split

    assert halo % 2 == 0, halo
    H, W = x.shape[1], x.shape[2]
    pt, pb = pad_split(H, mult)
    pl, pr = pad_split(W, mult * nsp)
    xp = np.asarray(x)
    if pt or pb or pl or pr:
        xp = np.pad(xp, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode="reflect")
    g = s2d_np(xp)
    hl = s2d_np(np.ascontiguousarray(xp[:, :, 1:halo + 1][:, :, ::-1]))
    hr = s2d_np(np.ascontiguousarray(xp[:, :, -halo - 1:-1][:, :, ::-1]))
    return g, hl, hr


def pack_frame_np(x, mult: int = 16):
    """Symmetric-reflect-pad ``[N, H, W, 4]`` to ``%mult`` and s2d-pack to
    ``[N, H'/2, W'/2, 16]`` — the host mirror of the fused eval step's
    on-device ``pad_to_multiple + s2d`` input stage (bit-exact in f32, so
    the step's packed branch produces identical outputs; the pad split must
    stay in lockstep with ``pnnp_tpu.train.steps.pad_split``). Run in
    loader prefetch workers to take the input relayout off the device
    critical path."""
    H, W = x.shape[1], x.shape[2]
    ph, pw = (-H) % mult, (-W) % mult
    if ph or pw:
        x = np.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                       (pw // 2, pw - pw // 2), (0, 0)), mode="reflect")
    return s2d_np(np.asarray(x))


def _transform_conv3_kernel(k3: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, D] -> s2d-form [2, 2, 4C, 4D] block kernel.

    Entry rule (per spatial dim): tap t and input group a contribute the
    original tap ``dy = 2*(a' + t - 1) + a - a'`` to output group a' when
    |dy| <= 1, else zero. (Derivation in the module docstring of the design.)
    """
    C, D = k3.shape[2], k3.shape[3]
    k_out = jnp.zeros((2, 2, 4 * C, 4 * D), k3.dtype)
    for a_h in (0, 1):
        for a_w in (0, 1):
            for t_h in (0, 1):
                for t_w in (0, 1):
                    for ap_h in (0, 1):
                        for ap_w in (0, 1):
                            dy = 2 * (ap_h + t_h - 1) + a_h - ap_h
                            dx = 2 * (ap_w + t_w - 1) + a_w - ap_w
                            if abs(dy) <= 1 and abs(dx) <= 1:
                                gi = 2 * a_h + a_w
                                go = 2 * ap_h + ap_w
                                k_out = k_out.at[
                                    t_h, t_w, gi * C : (gi + 1) * C, go * D : (go + 1) * D
                                ].set(k3[dy + 1, dx + 1])
    return k_out


def transform_params(params: dict, dtype: Any = jnp.bfloat16) -> dict:
    """Pre-transform a standard UNetSeeInDark param tree for the s2d path.

    Call once per checkpoint (outside the step): the 3x3 kernels become their
    2x2 block-structured s2d forms and the ConvTranspose kernels their 1x1
    forms, so the hot forward does no weight shuffling.
    """
    out = {}
    for name, leaf in params.items():
        k = jnp.asarray(leaf["kernel"], dtype)
        b = jnp.asarray(leaf["bias"], dtype)
        if name.startswith("upv"):
            w1 = jnp.concatenate(
                [k[1 - a_h, 1 - a_w] for a_h in (0, 1) for a_w in (0, 1)], axis=-1
            )
            out[name] = {"kernel": w1, "bias": jnp.tile(b, 4)}
        elif name.startswith("conv5_") or name == "conv10_1":
            out[name] = {"kernel": k, "bias": b}
        else:
            out[name] = {"kernel": _transform_conv3_kernel(k),
                         "bias": jnp.tile(b, 4)}
    return out


def _s2d_conv_pre(g: jnp.ndarray, kp: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """2x2 s2d-form conv with a pre-transformed kernel (+ pre-tiled bias)."""
    D = kp.shape[3] // 4
    n, h, w, _ = g.shape
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    o = jax.lax.conv_general_dilated(
        gp, kp, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    groups = []
    for ap_h in (0, 1):
        for ap_w in (0, 1):
            go = 2 * ap_h + ap_w
            groups.append(
                jax.lax.slice(
                    o, (0, ap_h, ap_w, go * D), (n, ap_h + h, ap_w + w, (go + 1) * D)
                )
            )
    return jnp.concatenate(groups, axis=-1) + bias


def _group_max(g: jnp.ndarray) -> jnp.ndarray:
    """2x2 max-pool (full-res semantics): max over the 4 sub-position groups.

    Written as maxes of static lane slices rather than a reshape+reduce: the
    reshape form makes XLA relayout the lane dim (measured +1.4 ms/frame on
    the composed SID-shape forward), while block-aligned lane slices fuse
    into the preceding conv.
    """
    cg = g.shape[-1] // 4
    return jnp.maximum(
        jnp.maximum(g[..., :cg], g[..., cg : 2 * cg]),
        jnp.maximum(g[..., 2 * cg : 3 * cg], g[..., 3 * cg :]),
    )


def _up_as_1x1(f: jnp.ndarray, kt: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """2x2-stride-2 ConvTranspose -> s2d form of the upsampled tensor.

    ``kt`` is the flax ConvTranspose kernel [2, 2, Cin, Cout]; each input pixel
    populates its whole 2x2 output block. flax (lax.conv_transpose) applies
    the kernel spatially flipped, so output group (a_h, a_w) takes tap
    (1-a_h, 1-a_w).
    """
    w1 = jnp.concatenate(
        [kt[1 - a_h, 1 - a_w] for a_h in (0, 1) for a_w in (0, 1)], axis=-1
    )  # [Cin, 4*Cout]
    out = jnp.einsum("nhwc,cd->nhwd", f, w1)
    return out + jnp.tile(bias, 4)


def _group_concat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Channel concat in full-res semantics: concat within each group."""
    n, h, w, ca = a.shape
    cb = b.shape[-1]
    ar = a.reshape(n, h, w, 4, ca // 4)
    br = b.reshape(n, h, w, 4, cb // 4)
    return jnp.concatenate([ar, br], axis=-1).reshape(n, h, w, ca + cb)


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def unet_s2d_forward_pre(tparams: dict, x: jnp.ndarray, res: bool = False,
                         dtype: Any = jnp.bfloat16) -> jnp.ndarray:
    """s2d forward from pre-transformed params (:func:`transform_params`).

    This is the hot path: weight shuffling happens once per checkpoint, the
    per-step program is pure conv/matmul/relayout.
    """
    k = lambda name: tparams[name]["kernel"]
    b = lambda name: tparams[name]["bias"]
    xl = x.astype(dtype)
    conv = lambda g, name: _lrelu(_s2d_conv_pre(g, k(name), b(name)))

    g1 = s2d(xl)
    c1 = conv(conv(g1, "conv1_1"), "conv1_2")
    g2 = s2d(_group_max(c1))
    c2 = conv(conv(g2, "conv2_1"), "conv2_2")
    g3 = s2d(_group_max(c2))
    c3 = conv(conv(g3, "conv3_1"), "conv3_2")
    g4 = s2d(_group_max(c3))
    c4 = conv(conv(g4, "conv4_1"), "conv4_2")
    f5 = _group_max(c4)

    std_conv = lambda t, name: _lrelu(
        jax.lax.conv_general_dilated(
            t, k(name), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + b(name)
    )
    c5 = std_conv(std_conv(f5, "conv5_1"), "conv5_2")

    up = lambda f, name: jnp.einsum("nhwc,cd->nhwd", f, k(name)) + b(name)
    u6 = _group_concat(up(c5, "upv6"), c4)
    c6 = conv(conv(u6, "conv6_1"), "conv6_2")
    u7 = _group_concat(up(d2s(c6), "upv7"), c3)
    c7 = conv(conv(u7, "conv7_1"), "conv7_2")
    u8 = _group_concat(up(d2s(c7), "upv8"), c2)
    c8 = conv(conv(u8, "conv8_1"), "conv8_2")
    u9 = _group_concat(up(d2s(c8), "upv9"), c1)
    c9 = conv(conv(u9, "conv9_1"), "conv9_2")

    kh = k("conv10_1")[0, 0]
    n_, h_, w_, c4_ = c9.shape
    head = jnp.einsum(
        "nhwgc,cd->nhwgd", c9.reshape(n_, h_, w_, 4, c4_ // 4), kh
    ) + b("conv10_1")
    out = d2s(head.reshape(n_, h_, w_, -1))
    if res:
        out = out + xl
    return out.astype(jnp.float32)


def unet_s2d_forward(params: dict, x: jnp.ndarray, res: bool = False,
                     dtype: Any = jnp.bfloat16) -> jnp.ndarray:
    """Evaluate UNetSeeInDark (standard flax params) via the s2d fast path.

    ``x``: [N, H, W, 4] with H, W divisible by 32. Returns float32.
    Convenience wrapper: transforms weights inline and delegates to
    :func:`unet_s2d_forward_pre` (use that pair directly in hot loops).
    """
    return unet_s2d_forward_pre(
        transform_params(params, dtype), x, res=res, dtype=dtype)


# ---------------------------------------------------------------------------
# Hybrid fast path: dense-s2d 3x3 at level 1 only.
#
# Measured (v5e, bf16, full SID frame): XLA's 3x3 convs at 32 output channels
# run at 8-14 TFLOP/s (both matmul dims padded to the 128-lane MXU), so level
# 1 costs ~29 ms of the ~49 ms frame. In the s2d representation a 3x3 conv
# becomes a 3x3 conv over [H/2, W/2, 4C] with a block-structured kernel
# (structural zeros, 4x raw FLOPs) — but at 128+ channels it runs at ~108
# TFLOP/s, ~3x faster end-to-end, and composes with NO per-layer slicing:
# output group offsets are absorbed by the kernel index map. Deeper levels
# already have >=64 channels where the direct conv is acceptable.
# ---------------------------------------------------------------------------


def transform_conv3_dense(k3: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, D] -> dense s2d-form [3, 3, 4C, 4D] (structural zeros).

    Entry rule per spatial dim: tap p and groups (a_in, a_out) carry the
    original tap ``dy = 2p + a_in - a_out`` when |dy| <= 1.
    """
    C, D = k3.shape[2], k3.shape[3]
    k_out = jnp.zeros((3, 3, 4 * C, 4 * D), k3.dtype)
    for p in (-1, 0, 1):
        for q in (-1, 0, 1):
            for a_i in (0, 1):
                for a_w in (0, 1):
                    for o_i in (0, 1):
                        for o_w in (0, 1):
                            dy = 2 * p + a_i - o_i
                            dx = 2 * q + a_w - o_w
                            if abs(dy) <= 1 and abs(dx) <= 1:
                                gi = 2 * a_i + a_w
                                go = 2 * o_i + o_w
                                k_out = k_out.at[
                                    p + 1, q + 1,
                                    gi * C : (gi + 1) * C,
                                    go * D : (go + 1) * D,
                                ].set(k3[dy + 1, dx + 1])
    return k_out


def _fold_conv91(params: dict):
    """f32 dense-s2d fold of upv9 into conv9_1 (shared by the hybrid and
    Winograd transforms). Returns (kf [3,3,2nf,4nf] up-path, k_sk
    [3,3,4nf,4nf] skip-path, kb_row [3,3,4nf] ones-channel kernel carrying
    upv9's bias with exact SAME borders, b91 [4nf])."""
    k91 = jnp.asarray(params["conv9_1"]["kernel"], jnp.float32)  # [3,3,2nf,nf]
    b91 = jnp.asarray(params["conv9_1"]["bias"], jnp.float32)
    kt = jnp.asarray(params["upv9"]["kernel"], jnp.float32)      # [2,2,2nf,nf]
    bup = jnp.asarray(params["upv9"]["bias"], jnp.float32)
    nf = k91.shape[-1]
    k91d = transform_conv3_dense(k91)                            # [3,3,8nf,4nf]
    rows = np.arange(8 * nf).reshape(4, 2 * nf)
    k_up = k91d[:, :, rows[:, :nf].reshape(-1)]                  # [3,3,4nf,4nf]
    k_sk = k91d[:, :, rows[:, nf:].reshape(-1)]
    # upv9's s2d 1x1: output group (a_h, a_w) takes ConvTranspose tap
    # (1-a_h, 1-a_w) (flax applies the kernel spatially flipped).
    w1 = jnp.concatenate(
        [kt[1 - a_h, 1 - a_w] for a_h in (0, 1) for a_w in (0, 1)], axis=-1
    )                                                            # [2nf, 4nf]
    kf = jnp.einsum("cd,pqde->pqce", w1, k_up)                   # [3,3,2nf,4nf]
    kb_row = jnp.einsum("d,pqde->pqe", jnp.tile(bup, 4), k_up)   # [3,3,4nf]
    tiled_b91 = jnp.tile(b91, 4)
    return kf, k_sk, kb_row, tiled_b91


def transform_params_hybrid(params: dict, dtype: Any = jnp.bfloat16) -> dict:
    """Pre-transform for :func:`unet_hybrid_forward`: L1/L9 convs to dense-s2d
    form, the rest cast to ``dtype`` unchanged.

    upv9 is FOLDED into conv9_1's up-path kernel: upv9's s2d form is a pure
    per-pixel 1x1 (each input pixel fills its 2x2 output block), and a 1x1
    commutes with the following conv — so conv9_1(upv9(c8) || c1g) becomes
    one conv over [c8 | ones] (the appended ones-channel carries upv9's bias
    and inherits SAME zero padding, keeping frame borders exact) plus the
    skip conv. This removes the upv9 einsum and the full-frame g_up tensor
    round-trip (measured -2.3 ms/frame composed). All folds run in f32 and
    cast to ``dtype`` once; the fold is differentiable, so the packed train
    step calls this inside the jitted step and grads flow to the standard
    param tree.
    """
    out = {}
    for name, leaf in params.items():
        k = jnp.asarray(leaf["kernel"], jnp.float32)
        b = jnp.asarray(leaf["bias"], jnp.float32)
        if name in ("conv1_1", "conv1_2", "conv9_2"):
            out[name] = {"kernel": transform_conv3_dense(k).astype(dtype),
                         "bias": jnp.tile(b, 4).astype(dtype)}
        elif name in ("conv9_1", "upv9"):
            continue  # folded jointly below
        else:
            out[name] = {"kernel": k.astype(dtype), "bias": b.astype(dtype)}

    kf, k_sk, kb_row, b91 = _fold_conv91(params)
    out["conv9_1"] = {
        "kernel_up": jnp.concatenate(
            [kf, kb_row[:, :, None, :]], axis=2).astype(dtype),  # [3,3,2nf+1,4nf]
        "kernel_skip": k_sk.astype(dtype),
        "bias": b91.astype(dtype),  # _fold_conv91 returns the tiled bias
    }
    return out


def _conv_same(t, kk):
    return jax.lax.conv_general_dilated(
        t, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _mid_levels(tparams: dict, p1: jnp.ndarray) -> jnp.ndarray:
    """Levels 2-8 of the packed forward (true-layout XLA convs): p1 -> c8.

    Factored out so alternative head/tail implementations (e.g. the removed
    Pallas fused chains, kernels/__init__.py post-mortem) can share it."""
    k = lambda name: tparams[name]["kernel"]
    b = lambda name: tparams[name]["bias"]
    conv = lambda t, name: _lrelu(_conv_same(t, k(name)) + b(name))
    up = lambda t, name: jax.lax.conv_transpose(
        t, k(name), (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b(name)
    pool = lambda t: jax.lax.reduce_window(
        t, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )

    def dec_conv(up_t, skip, name):
        # split-add: conv the upsampled and skip halves separately (avoids
        # materializing the channel concat)
        kk = k(name)
        cu = up_t.shape[-1]
        h = _conv_same(up_t, kk[:, :, :cu]) + _conv_same(skip, kk[:, :, cu:])
        return _lrelu(h + b(name))

    c2 = conv(conv(p1, "conv2_1"), "conv2_2")
    c3 = conv(conv(pool(c2), "conv3_1"), "conv3_2")
    c4 = conv(conv(pool(c3), "conv4_1"), "conv4_2")
    c5 = conv(conv(pool(c4), "conv5_1"), "conv5_2")
    c6 = conv(dec_conv(up(c5, "upv6"), c4, "conv6_1"), "conv6_2")
    c7 = conv(dec_conv(up(c6, "upv7"), c3, "conv7_1"), "conv7_2")
    return conv(dec_conv(up(c7, "upv8"), c2, "conv8_1"), "conv8_2")


def unet_hybrid_forward_packed(tparams: dict, g1: jnp.ndarray,
                               res_x: jnp.ndarray | None = None,
                               dtype: Any = jnp.bfloat16) -> jnp.ndarray:
    """Hybrid forward over s2d-PACKED input/output — the production layout.

    ``g1`` is the frame in 4x4-superpixel packing ``[N, H/2, W/2, 16]``
    (= ``s2d(packed_rggb)``; the native host packer emits it directly, see
    native/rawproc.cpp pnnp_pack_s2d). Returns the denoised frame in the same
    packed layout. Avoiding the boundary s2d/d2s relayouts on the 4-lane
    tensors is worth ~20% frame time on v5e (narrow-lane relayouts are
    bandwidth-hostile). ``res_x`` adds the residual input if the model has
    ``res=True``.
    """
    k = lambda name: tparams[name]["kernel"]
    b = lambda name: tparams[name]["bias"]
    g1 = g1.astype(dtype)
    conv = lambda t, name: _lrelu(_conv_same(t, k(name)) + b(name))

    c1g = conv(conv(g1, "conv1_1"), "conv1_2")
    p1 = _group_max(c1g)
    c8 = _mid_levels(tparams, p1)

    # upv9 is folded into conv9_1's up-path kernel (transform_params_hybrid);
    # the ones-channel carries upv9's bias with exact SAME-padding borders.
    ones = jnp.ones(c8.shape[:-1] + (1,), c8.dtype)
    h9 = _lrelu(
        _conv_same(jnp.concatenate([c8, ones], axis=-1),
                   tparams["conv9_1"]["kernel_up"])
        + _conv_same(c1g, tparams["conv9_1"]["kernel_skip"])
        + b("conv9_1")
    )
    c9g = conv(h9, "conv9_2")

    kh = k("conv10_1")[0, 0]
    n_, h_, w_, c4_ = c9g.shape
    head = jnp.einsum(
        "nhwgc,cd->nhwgd", c9g.reshape(n_, h_, w_, 4, c4_ // 4), kh
    ) + b("conv10_1")
    out = head.reshape(n_, h_, w_, -1)
    if res_x is not None:
        out = out + res_x.astype(dtype)
    return out


def unet_hybrid_forward(tparams: dict, x: jnp.ndarray, res: bool = False,
                        dtype: Any = jnp.bfloat16) -> jnp.ndarray:
    """UNetSeeInDark forward with the dense-s2d level-1 fast path, HWC I/O.

    ``tparams`` from :func:`transform_params_hybrid`; exact-equivalent to the
    standard model (tests/test_unet_s2d.py). Thin wrapper over the packed
    production path: s2d pack -> :func:`unet_hybrid_forward_packed` -> d2s.
    """
    xl = x.astype(dtype)
    out = unet_hybrid_forward_packed(
        tparams, s2d(xl), res_x=s2d(xl) if res else None, dtype=dtype
    )
    return d2s(out).astype(jnp.float32)
