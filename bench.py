"""Benchmark: UNet raw-denoise throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric is megapixels of Bayer mosaic denoised per second per chip
(H*W*4 packed pixels count as the 2H x 2W mosaic, i.e. 4*h*w pix/frame),
measured on the flagship UNetSeeInDark in bfloat16 at full-frame-equivalent
tiling. Baseline: 500 Mpix/s/chip (BASELINE.md rebuild target).

``python bench.py --train`` instead measures the production TRAINING step
(packed physics synth 'pgrq' + fwd + bwd + Adam, all in the 4x4-superpixel
layout) at the reference SID recipe shape — batch 1 x 8 crops x 512^2
(runfiles/SonyA7S2/ELD.yml:18-22,62) — reporting ms/step. This makes the
round-2 63 ms/step claim (and future regressions) reproducible by one
command. Baseline: the 88 ms/step pre-packing step of round 2.

The default serving measurement is the W8A8 int8 path
(models/unet_s2d_int8.py; interior convs in s8 x s8 -> s32 on the MXU —
measured 1.92x bf16 at the dominant 128-ch dense-s2d conv shape), with the
exact-bf16 path measured in the same run and reported as ``bf16_mpix_s``.
Accuracy contract wired into the claim: tools/validate_int8.py measured the
trained-checkpoint PSNR delta vs the exact bf16 path at the default
pct=99.95 calibration as +0.019 dB mean / +0.005 dB worst-ratio across the
SID ratio sweep (accuracy-neutral; see STATUS.md round-3 table).
``python bench.py --bf16`` reports the exact path as the headline instead;
``--int8`` skips the bf16 A/B and reports int8 alone.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_MPIX_S = 500.0
BASELINE_TRAIN_MS = 88.0  # round-2 unpacked train step at the same recipe


def main(mode: str = "serve"):
    """mode: 'serve' = int8 headline + bf16 A/B in one line;
    'bf16' = exact path headline; 'int8' = int8 alone."""
    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import (
        transform_params_hybrid,
        unet_hybrid_forward_packed,
    )

    model = UNetSeeInDark(nf=32)
    # SID full frame is the 2848x4256 mosaic; the production pipeline feeds it
    # in the 4x4-superpixel (s2d) packing emitted by the native host packer
    # (native/rawproc.cpp pnnp_pack_s2d): [712, 1064, 16]. The forward is the
    # exact UNetSeeInDark function in that layout (tests/test_unet_s2d.py).
    B, H, W = 1, 1424, 2128
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 4)))["params"]
    tparams = jax.jit(lambda p: transform_params_hybrid(p, jnp.bfloat16))(params)
    jax.block_until_ready(tparams)

    # Serving loop: K distinct frames processed sequentially inside ONE jit
    # (lax.map) — per-frame cost without dispatch overhead or feedback-cast
    # artifacts, f32 in / f32 out; the final sum forces a host readback
    # (block_until_ready alone is not reliable through remote-device tunnels).
    K = 24
    frames = jnp.zeros((K, B, H // 2, W // 2, 16), jnp.float32)
    mpix = B * H * W * 4 / 1e6  # Bayer mosaic megapixels per frame

    def measure(fwd):
        @jax.jit
        def run(tp, frames):
            return jax.lax.map(
                lambda g: fwd(tp, g).astype(jnp.float32), frames)

        y = run(tparams, frames)
        float(jnp.sum(y))  # warmup + compile
        # Best-of over repeats: the axon tunnel adds occasional multi-ms
        # hiccups; each repeat is itself a 24-frame average, best-of-8
        # reports steady-state.
        dt = 1e9
        for _ in range(8):
            t0 = time.perf_counter()
            y = run(tparams, frames)
            float(jnp.sum(y))
            dt = min(dt, (time.perf_counter() - t0) / K)
        return mpix / dt

    def int8_fwd():
        from pnnp_tpu.models.unet_s2d_int8 import (
            calibrate_act_scales,
            quantize_params_int8,
            unet_hybrid_forward_packed_int8,
        )

        cal = jax.random.uniform(jax.random.key(3), frames.shape[1:]) * 0.3
        qparams = quantize_params_int8(
            tparams, calibrate_act_scales(tparams, [cal], pct=99.95))
        return lambda tp, g: unet_hybrid_forward_packed_int8(tp, qparams, g)

    out = {"metric": "unet_denoise_throughput", "unit": "Mpix/s/chip"}
    if mode == "bf16":
        out["value"] = round(measure(unet_hybrid_forward_packed), 2)
        out["quant"] = "none"
    else:
        out["value"] = round(measure(int8_fwd()), 2)
        # accuracy gate for the quantized headline (tools/validate_int8.py,
        # trained checkpoint, held-out frames, SID ratio sweep)
        out["quant"] = "w8a8_pct99.95"
        out["accuracy_gate"] = "+0.019 dB mean vs bf16 (validate_int8)"
        if mode == "serve":
            out["bf16_mpix_s"] = round(measure(unet_hybrid_forward_packed), 2)
    out["vs_baseline"] = round(out["value"] / BASELINE_MPIX_S, 3)
    print(json.dumps(out))


def main_train(proxy: bool = False):
    """``proxy=True`` measures the PNNP flagship config instead: the same
    recipe with the learned pw_iso_2stage proxy as the synth stage
    (runfiles/SonyA7S2/PNNP.yml — make_proxy_synth, Sony law), at the
    runfile's d=1024. The proxy's per-pixel PWL lookup rides the MXU
    (models/proxy.py lookup='dot'); the 'gather' fallback measured ~34
    ms/step slower on v5e (tools/profile_proxy_synth.py)."""
    from pnnp_tpu.models import UNetSeeInDark
    from pnnp_tpu.train import build_lr_schedule, create_train_state, make_train_step
    from pnnp_tpu.train.steps import make_raw_synth_packed

    model = UNetSeeInDark(nf=32)
    sched = build_lr_schedule(
        {"lr_scheduler": "fixed", "learning_rate": 1e-4, "stop_epoch": 10,
         "last_epoch": 0})
    if proxy:
        from pnnp_tpu.models import PixelWiseISOProxy
        from pnnp_tpu.train.steps import make_proxy_synth, pack_synth

        pw = PixelWiseISOProxy(d=1024)
        clean0 = jnp.zeros((1, 8, 8, 4))
        pvars = pw.init({"params": jax.random.key(5),
                         "sample": jax.random.key(6)}, clean0,
                        jnp.ones((1,)) * 1600.0)
        sample_fn = lambda rng, clean, iso: pw.apply(
            pvars, clean, iso, rngs={"sample": rng}, mode="sample")
        synth = pack_synth(make_proxy_synth(sample_fn,
                                            ratio_range=(100.0, 300.0)))
    else:
        synth = make_raw_synth_packed("SonyA7S2", "pgrq", ori=False,
                                      clip=False)
    step = make_train_step(model, sched, synth, clip_mode=2, donate=False,
                           fast="packed")
    state = create_train_state(jax.random.key(0), model,
                               jnp.zeros((1, 64, 64, 4)))
    # reference SID recipe: batch_size 1 x crop_per_image 8 x 512^2 packed
    # crops; hr pre-packed like the production loader feeds it (the proxy
    # synth samples in the unpacked layout the reference law defines, so it
    # takes unpacked hr)
    hr = (jax.random.uniform(jax.random.key(1), (8, 256, 256, 16)) * 0.02
          ).astype(jnp.float32)
    if proxy:
        from pnnp_tpu.models.unet_s2d import d2s

        hr = d2s(hr)
    batch = {"hr": hr}

    # Chain K steps inside one jit (lax.scan over PRNG keys, state threaded)
    # so the per-step time excludes tunnel dispatch; the final loss sum
    # forces a host readback (block_until_ready is unreliable through the
    # axon tunnel).
    K = 8

    @jax.jit
    def run(state, keys):
        def body(st, k):
            st, m = step(st, batch, k, 1)  # nested jit inlines under trace
            return st, m["loss"]

        return jax.lax.scan(body, state, keys)

    keys = jax.random.split(jax.random.key(2), K)
    st, losses = run(state, keys)
    float(jnp.sum(losses))  # warmup + compile

    n_iter = 8
    dt = 1e9
    for _ in range(n_iter):
        t0 = time.perf_counter()
        st, losses = run(state, keys)
        float(jnp.sum(losses))
        dt = min(dt, (time.perf_counter() - t0) / K)

    ms = dt * 1e3
    print(json.dumps({
        "metric": "proxy_train_step" if proxy else "packed_train_step",
        "value": round(ms, 2),
        "unit": "ms/step",
        "vs_baseline": round(BASELINE_TRAIN_MS / ms, 3),  # >1 = faster
    }))


def _probe_device(timeout_s: float = 300.0) -> bool:
    """Fail fast when the axon tunnel is down (observed outages up to 8+ h):
    a trivial op hangs forever, which would stall the whole bench run."""
    import threading

    ok = []

    def probe():
        ok.append(float(jnp.sum(jnp.ones((8, 8)))) == 64.0)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok and ok[0])


def _probe_with_retry(window_s: float = 1500.0, each_s: float = 120.0,
                      sleep_s: float = 30.0) -> bool:
    """The tunnel FLAPS as well as dies (probe log: minutes-long dropouts
    between UP windows) — retry the probe across a bounded window before
    declaring the round's bench unreachable. A probe thread left hanging is
    daemonized, so piling a few up while waiting is harmless."""
    deadline = time.monotonic() + window_s
    attempt = 0
    while True:
        attempt += 1
        if _probe_device(each_s):
            return True
        if time.monotonic() >= deadline:
            return False
        print(f"bench: tunnel probe {attempt} timed out; retrying "
              f"({deadline - time.monotonic():.0f}s left in window)",
              file=sys.stderr)
        time.sleep(sleep_s)


if __name__ == "__main__":
    if not _probe_with_retry():
        print(json.dumps({
            "metric": "unet_denoise_throughput", "value": 0.0,
            "unit": "Mpix/s/chip", "vs_baseline": 0.0,
            "error": "accelerator unreachable (tunnel probe timed out); "
                     "rerun when the device responds",
        }))
        sys.exit(1)
    if "--train-proxy" in sys.argv:
        main_train(proxy=True)
    elif "--train" in sys.argv:
        main_train()
    elif "--bf16" in sys.argv:
        main("bf16")
    elif "--int8" in sys.argv:
        main("int8")
    else:
        main("serve")
