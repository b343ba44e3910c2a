"""Opt-in W8A8 int8 serving path for the packed UNet forward.

v5e's MXU runs s8 x s8 -> s32 at ~2x the bf16 rate; the exact bf16 serving
path sits at a measured compute roofline (kernels/__init__.py post-mortem
#5: 21.1 ms/frame = ~19.5 ms conv at XLA's dense rates + ~1.5 ms loop
floor), so halving the MAC cost of the interior convs is the one remaining
lever that changes the *math* rather than re-scheduling it. This module
follows the post-mortem lessons: stride-1 NHWC convs only, zero layout
changes — quantize/dequantize are elementwise ops XLA fuses into the conv
prologue/epilogue.

Scheme (standard production W8A8):
  * weights: per-output-channel symmetric int8 (scale = maxabs/127);
  * activations: per-tensor static scales from a calibration pass
    (:func:`calibrate_act_scales` records per-conv-input maxabs over
    representative frames);
  * conv: ``lax.conv_general_dilated(s8, s8, preferred_element_type=s32)``,
    dequantized by the fused per-channel multiplier ``m = s_act * s_w``.

Quantized layers: the interior 3x3 convs (conv1_2, conv2_1 .. conv8_2,
conv9_1 up+skip, conv9_2) — where ~all the FLOPs are. Kept bf16: conv1_1
(16-channel input; quantizing the raw frame at 8 bits would swamp the noise
signal the net must read), the upvN 2x2 transposes, group_max/pool, and the
1x1 output head (negligible FLOPs, full output fidelity).

Accuracy note: these are EXACT integer kernels (tested against an f64
oracle), but W8A8 is a lossy representation — the PSNR delta of a trained
checkpoint must be validated per-model before production use (this
environment has no real SID/ELD data; see tests for the synthetic-weights
deviation analysis). The bf16 path (`unet_s2d.py`) remains the default and
the parity reference.

Reference parity: the reference has no quantized path (torch fp32,
README.md:18); this is a beyond-parity serving feature.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
from jax import lax

from pnnp_tpu.models.unet_s2d import (
    _group_max,
    _lrelu,
    transform_params_hybrid,
)

# Conv inputs that get a static activation scale (order = forward order).
QUANT_LAYERS = (
    "conv1_2",
    "conv2_1", "conv2_2", "conv3_1", "conv3_2", "conv4_1", "conv4_2",
    "conv5_1", "conv5_2",
    "conv6_1u", "conv6_1s", "conv6_2", "conv7_1u", "conv7_1s", "conv7_2",
    "conv8_1u", "conv8_1s", "conv8_2",
    "conv9_1u", "conv9_1s", "conv9_2",
)
# Layers quantizable on request but OFF in the default serving set
# (tools/ablate_int8_quantset.py probes them composed): conv1_1 reads the
# raw 16-ch packed frame (quantizing it is both an accuracy risk and —
# measured isolated — SLOWER: narrow 16->128 int8 runs 0.72x bf16); the
# 2x2 transposes are bf16 glue between quantized bands.
OPTIONAL_QUANT = ("conv1_1", "upv6", "upv7", "upv8")


def _conv_same(t, kk, prefer=None):
    return lax.conv_general_dilated(
        t, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=prefer,
    )


def _walk(tparams, g1, dtype, record=None, qparams=None, record_pct=100.0):
    """Shared forward skeleton.

    ``record``: dict to fill with per-quant-input maxabs (calibration mode).
    ``qparams``: quantized params (int8 mode). Exactly one of the two modes
    is active; with both None this reproduces the bf16 hybrid forward.
    """
    k = lambda name: tparams[name]["kernel"]
    b = lambda name: tparams[name]["bias"]

    def q(x, name):
        """Observe (calibration) or quantize (int8) a conv input."""
        if record is not None:
            ax = jnp.abs(x.astype(jnp.float32))
            v = (jnp.max(ax) if record_pct >= 100.0
                 else jnp.percentile(ax.ravel(), record_pct))
            record[name] = jnp.maximum(record.get(name, 0.0), v)
        if qparams is not None and name in qparams["act_scale"]:
            s = qparams["act_scale"][name]
            return jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                            -127, 127).astype(jnp.int8)
        return x

    def conv_q(x, name, qname=None):
        """3x3 SAME conv + bias + LeakyReLU, int8 when quantized."""
        qname = qname or name
        xq = q(x, qname)
        if qparams is not None and qname in qparams["act_scale"]:
            layer = qparams["layers"][qname]
            acc = _conv_same(xq, layer["kq"], prefer=jnp.int32)
            y = acc.astype(jnp.float32) * layer["m"] + layer["bias"]
            return _lrelu(y).astype(dtype)
        return _lrelu(_conv_same(x, k(name)) + b(name))

    def dec_conv_q(up_t, skip, name):
        """Split-add decoder conv; the two halves quantize separately.

        Each half's dequant multiply is cast to ``dtype`` BEFORE the
        combine: the compiled HLO (tools/hlo_int8_report.py) showed the
        halves materializing in HBM between their conv fusion and the
        combine fusion — as raw s32 accumulators (389/194 MB at the level-1
        shapes) or f32 products — because XLA keeps the boundary at the
        conv output's widest dtype. A bf16 partial shrinks that boundary
        4x (s32) / 2x (f32); the added rounding (~2^-9 relative per
        partial) is an order below the int8 quantization error itself.
        """
        if qparams is not None and (name + "u") in qparams["act_scale"]:
            lu = qparams["layers"][name + "u"]
            ls = qparams["layers"][name + "s"]
            acc_u = _conv_same(q(up_t, name + "u"), lu["kq"], prefer=jnp.int32)
            acc_s = _conv_same(q(skip, name + "s"), ls["kq"], prefer=jnp.int32)
            pu = (acc_u.astype(jnp.float32) * lu["m"]).astype(dtype)
            ps = (acc_s.astype(jnp.float32) * ls["m"]).astype(dtype)
            y = (pu.astype(jnp.float32) + ps.astype(jnp.float32)
                 + lu["bias"])
            return _lrelu(y).astype(dtype)
        kk = k(name)
        cu = up_t.shape[-1]
        q(up_t, name + "u")
        q(skip, name + "s")
        h = _conv_same(up_t, kk[:, :, :cu]) + _conv_same(skip, kk[:, :, cu:])
        return _lrelu(h + b(name))

    def up(t, name):
        """2x2 stride-2 transpose, int8 on request (OPTIONAL_QUANT probe)."""
        tq = q(t, name)
        if qparams is not None and name in qparams["act_scale"]:
            layer = qparams["layers"][name]
            acc = lax.conv_transpose(
                tq, layer["kq"], (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * layer["m"]
                    + layer["bias"]).astype(dtype)
        return lax.conv_transpose(
            t, k(name), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b(name)

    pool = lambda t: lax.reduce_window(
        t, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    g1 = g1.astype(dtype)
    c1g = conv_q(conv_q(g1, "conv1_1"), "conv1_2")
    p1 = _group_max(c1g)

    c2 = conv_q(conv_q(p1, "conv2_1"), "conv2_2")
    c3 = conv_q(conv_q(pool(c2), "conv3_1"), "conv3_2")
    c4 = conv_q(conv_q(pool(c3), "conv4_1"), "conv4_2")
    c5 = conv_q(conv_q(pool(c4), "conv5_1"), "conv5_2")
    c6 = conv_q(dec_conv_q(up(c5, "upv6"), c4, "conv6_1"), "conv6_2")
    c7 = conv_q(dec_conv_q(up(c6, "upv7"), c3, "conv7_1"), "conv7_2")
    c8 = conv_q(dec_conv_q(up(c7, "upv8"), c2, "conv8_1"), "conv8_2")

    ones = jnp.ones(c8.shape[:-1] + (1,), c8.dtype)
    up9_in = jnp.concatenate([c8, ones], axis=-1)
    if qparams is not None and "conv9_1u" in qparams["act_scale"]:
        lu = qparams["layers"]["conv9_1u"]
        ls = qparams["layers"]["conv9_1s"]
        acc_u = _conv_same(q(up9_in, "conv9_1u"), lu["kq"], prefer=jnp.int32)
        acc_s = _conv_same(q(c1g, "conv9_1s"), ls["kq"], prefer=jnp.int32)
        # bf16 partials before the combine — see dec_conv_q's HBM note
        pu = (acc_u.astype(jnp.float32) * lu["m"]).astype(dtype)
        ps = (acc_s.astype(jnp.float32) * ls["m"]).astype(dtype)
        h9 = _lrelu(pu.astype(jnp.float32) + ps.astype(jnp.float32)
                    + lu["bias"]).astype(dtype)
    else:
        q(up9_in, "conv9_1u")
        q(c1g, "conv9_1s")
        h9 = _lrelu(
            _conv_same(up9_in, tparams["conv9_1"]["kernel_up"])
            + _conv_same(c1g, tparams["conv9_1"]["kernel_skip"])
            + b("conv9_1"))
    c9g = conv_q(h9, "conv9_2")

    kh = k("conv10_1")[0, 0]
    n_, h_, w_, c4_ = c9g.shape
    head = jnp.einsum(
        "nhwgc,cd->nhwgd", c9g.reshape(n_, h_, w_, 4, c4_ // 4), kh
    ) + b("conv10_1")
    return head.reshape(n_, h_, w_, -1)


def calibrate_act_scales(tparams: dict, frames: Iterable[jnp.ndarray],
                         dtype: Any = jnp.bfloat16,
                         pct: float = 100.0,
                         combine: str = "max") -> dict:
    """Per-quant-input activation scales over packed frames.

    ``tparams`` from ``transform_params_hybrid``; ``frames`` an iterable of
    packed ``[n, H/2, W/2, 16]`` inputs representative of serving traffic
    (H, W = RGGB-frame dims, the ``unet_s2d.s2d`` convention).
    ``pct``: the |x| percentile mapped to 127 (100 = maxabs). Percentile
    clipping trades outlier fidelity for bulk resolution. Measured on a
    trained checkpoint (tools/validate_int8.py, 2000-step physics-synth
    SID recipe, held-out frames, ratios {100,250,300}): maxabs loses
    -0.16 dB mean / -0.28 dB worst vs bf16, while pct 99.95 is
    +0.019 / +0.005 dB — i.e. accuracy-neutral. 99.95 is the serving
    default (:func:`build_int8_server`); this low-level fn keeps maxabs so
    exactness-style tests see the full range.
    """
    record: dict = {}
    n = 0
    for g1 in frames:
        rec: dict = {}
        _walk(tparams, g1, dtype, record=rec, record_pct=pct)
        n += 1
        for name, v in rec.items():
            if combine == "mean":
                record[name] = record.get(name, 0.0) + float(v)
            else:
                record[name] = max(record.get(name, 0.0), float(v))
    if combine == "mean" and n:
        # mean of per-frame percentiles: one hot frame no longer dictates
        # every tensor's scale (with max-combining, 3 eval frames measured
        # IDENTICAL to their single hottest frame; smaller scales
        # consistently beat larger on trained checkpoints — see the pct
        # sweep in the docstring)
        record = {name: v / n for name, v in record.items()}
    # every observed input (QUANT_LAYERS + OPTIONAL_QUANT) gets a scale;
    # quantize_params_int8's `quant` set decides what actually quantizes
    return {name: max(v, 1e-12) / 127.0 for name, v in record.items()}


def quantize_params_int8(tparams: dict, act_scales: dict,
                         quant: Iterable[str] = QUANT_LAYERS) -> dict:
    """Per-output-channel int8 weights + fused dequant multipliers.

    Returns a qparams dict consumed by :func:`unet_hybrid_forward_packed_int8`;
    ``quant`` restricts which layers quantize (ablation knob).
    """
    quant = set(quant)
    layers = {}
    scales = {}

    def add(qname, kern, bias):
        kern = jnp.asarray(kern, jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(kern), axis=(0, 1, 2)), 1e-12) / 127.0
        sa = float(act_scales[qname])
        layers[qname] = {
            "kq": jnp.clip(jnp.round(kern / sw), -127, 127).astype(jnp.int8),
            "m": (sw * sa).astype(jnp.float32),          # [Cout]
            "bias": jnp.asarray(bias, jnp.float32),
        }
        scales[qname] = sa

    for name in quant:
        if name.startswith("conv9_1"):
            if name == "conv9_1u":
                add("conv9_1u", tparams["conv9_1"]["kernel_up"],
                    tparams["conv9_1"]["bias"])
            else:
                add("conv9_1s", tparams["conv9_1"]["kernel_skip"],
                    jnp.zeros_like(jnp.asarray(tparams["conv9_1"]["bias"])))
        elif name[-1] in ("u", "s") and name[:-1] in tparams:
            base = name[:-1]
            kk = jnp.asarray(tparams[base]["kernel"], jnp.float32)
            cu = kk.shape[2] // 2  # split-add: up half = skip half width
            if name.endswith("u"):
                add(name, kk[:, :, :cu], tparams[base]["bias"])
            else:
                add(name, kk[:, :, cu:],
                    jnp.zeros_like(jnp.asarray(tparams[base]["bias"])))
        else:
            add(name, tparams[name]["kernel"], tparams[name]["bias"])
    return {"layers": layers, "act_scale": scales}


def unet_hybrid_forward_packed_int8(tparams: dict, qparams: dict,
                                    g1: jnp.ndarray,
                                    dtype: Any = jnp.bfloat16) -> jnp.ndarray:
    """W8A8 packed serving forward; same I/O contract as the bf16 path."""
    return _walk(tparams, g1, dtype, qparams=qparams)


def unet_hybrid_forward_packed_ref(tparams: dict, g1: jnp.ndarray,
                                   dtype: Any = jnp.bfloat16) -> jnp.ndarray:
    """The _walk skeleton with no quantization — must equal
    ``unet_s2d.unet_hybrid_forward_packed`` exactly (skeleton-parity test)."""
    return _walk(tparams, g1, dtype)


def build_int8_server(params: dict, cal_frames: Iterable[jnp.ndarray],
                      dtype: Any = jnp.bfloat16, pct: float = 99.95):
    """One-call serving constructor: raw model params -> jitted packed fn.

    ``params``: UNetSeeInDark variables['params'] (as trained / converted);
    ``cal_frames``: packed ``[n, H/2, W/2, 16]`` frames representative of
    serving traffic (a handful is enough for the per-tensor static scales).
    Returns ``serve(g1) -> denoised`` in the packed layout, jitted, with the
    calibration and weight quantization done once here.

    Accuracy must be validated per checkpoint (tools/validate_int8.py
    measures the PSNR delta vs the exact bf16 path on held-out frames).
    At the default 99.95-percentile calibration, a trained physics-synth
    checkpoint measured +0.019 dB mean (+0.005 worst ratio) vs bf16 across
    the SID ratio sweep — accuracy-neutral; maxabs (pct=100) measured
    -0.16/-0.28 dB on the same checkpoint.
    """
    from pnnp_tpu.models.unet_s2d import transform_params_hybrid

    tparams = jax.jit(lambda p: transform_params_hybrid(p, dtype))(params)
    qparams = quantize_params_int8(
        tparams, calibrate_act_scales(tparams, cal_frames, dtype, pct))

    @jax.jit
    def serve(g1: jnp.ndarray) -> jnp.ndarray:
        return unet_hybrid_forward_packed_int8(tparams, qparams, g1, dtype)

    return serve
