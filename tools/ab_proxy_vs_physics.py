"""PNNP's core claim at recipe scale: proxy-trained ~= physics-trained.

Trains the pw_iso_2stage proxy on physics-engine dark frames over the ISO
ladder (the ground-truth law), then trains TWO UNetSeeInDark denoisers with
identical recipes (reference runfiles/SonyA7S2/PNNP.yml: patch 512, batch 8,
WarmupCosine) differing ONLY in the noise-synthesis stage:

  * physics arm — exact point-calibration noise (the Raw_Dataset branch,
    reference trainer_SID.py:449-462);
  * proxy arm  — noise from the trained proxy (the Proxy_Dataset branch,
    reference trainer_SID.py:463-472: noise = sample(clean/ratio, iso),
    lr = hr + noise*ratio).

Both arms draw ISO per batch from the proxy's ladder (+ the held-out
interpolation ISO) and ratio ~ U(100, 300), then eval on the SAME held-out
physics-noised frames at fixed (ISO, ratio) points. The paper's claim is a
PSNR gap within ~0.1 dB.

Usage (TPU): python tools/ab_proxy_vs_physics.py --proxy-steps 20000
             --unet-steps 4000 --patch 512
CPU smoke:   ... --proxy-steps 200 --unet-steps 50 --patch 64 --cpu
Prints a per-(ISO, ratio) PSNR table + one JSON line for STATUS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--proxy-steps", type=int, default=20000)
    # Proxy-training crop geometry. Wide rows at constant pixel budget are
    # the measured lever for the row stage (STATUS r4: the per-row-mean
    # contamination std scales as sigma_px/sqrt(W); W=128 took the ISO-12800
    # row KLD from 12x to 2.9x its sampling floor) — and an under-trained
    # row law is exactly what the denoiser A/B is most sensitive to at
    # high ISO x ratio (banding that survives amplification).
    ap.add_argument("--proxy-patch", type=int, default=8)
    ap.add_argument("--proxy-patch-w", type=int, default=128)
    ap.add_argument("--unet-steps", type=int, default=4000)
    ap.add_argument("--patch", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--nf", type=int, default=32)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--eval-frames", type=int, default=8)
    ap.add_argument("--proxy-ckpt", default="",
                    help="load/save the trained proxy params here")
    ap.add_argument("--state-dir", default="",
                    help="host-snapshot each arm's train state after every "
                    "chunk and resume from the snapshot on restart — the "
                    "axon tunnel can die mid-run (outages observed 1-8+ h); "
                    "device buffers do not survive, a host pickle does")
    ap.add_argument("--pool", type=int, default=64,
                    help="device-resident clean-scene pool size (scenes are "
                    "uploaded ONCE; each step gathers a batch by index so "
                    "the whole arm scan-chunks on device — per-step host "
                    "round-trips through the tunnel would dominate)")
    ap.add_argument("--cpu", action="store_true")
    # NULL CONTROL (VERDICT r4 #2): train BOTH arms on the physics law —
    # identical recipe/init/scene stream, the second arm's noise keys folded
    # to fresh values — and push the deltas through the exact same eval. If
    # the real A/B's uniform +0.039 dB proxy advantage were harness scatter,
    # this control scatters just as wide; if the control reads ~0.000, the
    # proxy advantage is a real systematic. No proxy is trained in this mode.
    ap.add_argument("--smooth-iso", type=float, default=0.0,
                    help="ISO-curvature smoothness weight for the proxy "
                         "(models/proxy.py smooth_iso_w)")
    ap.add_argument("--null", action="store_true",
                    help="physics-vs-physics control: arm B = same law, "
                    "different noise keys; measures the harness's own "
                    "delta scatter")
    a = ap.parse_args(argv)

    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from pnnp_tpu.models import PixelWiseISOProxy, UNetSeeInDark
    from pnnp_tpu.ops import psnr
    from pnnp_tpu.physics import calibration as calib, generate_noisy
    from pnnp_tpu.train import (
        build_lr_schedule,
        create_train_state,
        make_eval_step,
        make_proxy_synth,
        make_train_step,
    )
    from pnnp_tpu.train.state import (
        TrainState,
        apply_scaled_updates,
        make_adam_direction,
    )
    from tools.demo_train import synthetic_scenes

    TRAIN_ISOS = (800, 1600, 3200, 12800)
    HELDOUT_ISO = 6400
    AB_ISOS = TRAIN_ISOS + (HELDOUT_ISO,)
    t = calib.ISO_TABLES["SonyA7S2"]

    def params_at(iso_val, n, ratio):
        i = int(np.where(t["iso"] == iso_val)[0][0])
        rep = lambda v: jnp.full((n,), jnp.asarray(v, jnp.float32))
        return dict(
            K=rep(t["Kmax"][i]), sigTL=rep(t["sigTL"][i]),
            sigR=rep(t["sigR"][i]), sigGs=rep(t["sigGs"][i]),
            bias=jnp.zeros((n, 4)), lam=rep(t["lam"][i]), q=rep(t["q"]),
            ratio=(ratio if hasattr(ratio, "shape") else rep(ratio)),
            wp=rep(t["wp"]), bl=rep(t["bl"]),
        )

    # gatherable rows for on-device per-batch ISO draws
    iso_arr = jnp.asarray(AB_ISOS, jnp.float32)
    tidx = [int(np.where(t["iso"] == v)[0][0]) for v in AB_ISOS]
    prow = {name: jnp.asarray([float(t[name][i]) for i in tidx])
            for name in ("Kmax", "sigTL", "sigR", "sigGs", "lam")}

    def params_from_idx(idx, n, ratio):
        rep = lambda v: jnp.full((n,), v[idx])
        return dict(
            K=rep(prow["Kmax"]), sigTL=rep(prow["sigTL"]),
            sigR=rep(prow["sigR"]), sigGs=rep(prow["sigGs"]),
            bias=jnp.zeros((n, 4)), lam=rep(prow["lam"]),
            q=jnp.full((n,), float(t["q"])), ratio=ratio,
            wp=jnp.full((n,), float(t["wp"])),
            bl=jnp.full((n,), float(t["bl"])),
        )

    # ------------- stage 1: proxy on the ISO ladder (trained ISOs only) ----
    proxy = PixelWiseISOProxy(d=a.d, nf=16, nb=2, smooth_iso_w=a.smooth_iso)
    pvars = proxy.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 32, 32, 4)), jnp.full((1,), 1600.0))
    pparams = pvars["params"]
    loaded = False
    if a.proxy_ckpt:
        try:
            with open(a.proxy_ckpt, "rb") as f:
                pparams = pickle.load(f)
            loaded = True
            print(f"[proxy] loaded {a.proxy_ckpt}", file=sys.stderr)
        except FileNotFoundError:
            pass
    if a.null:
        loaded = True  # no proxy in the control; arm B is physics re-keyed
    if not loaded:
        pstate = TrainState.create(apply_fn=proxy.apply, params=pparams,
                                   tx=make_adam_direction())
        n_tr = len(TRAIN_ISOS)

        pp, pw = a.proxy_patch, a.proxy_patch_w

        @jax.jit
        def proxy_chunk(state, keys):
            def body(st, k):
                k1, k2 = jax.random.split(k)
                idx = jax.random.randint(k1, (), 0, n_tr)
                noise = generate_noisy(
                    k2, jnp.zeros((8, pp, pw, 4)),
                    params_from_idx(idx, 8, jnp.ones((8,))), "pgrq", ori=True)

                def loss_fn(params):
                    return proxy.apply({"params": params}, noise,
                                       jnp.full((8,), iso_arr[idx]),
                                       mode="loss")

                (nll, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(st.params)
                return apply_scaled_updates(st, grads, 5e-4), nll

            state, nlls = jax.lax.scan(body, state, keys)
            return state, nlls[-1]

        key = jax.random.key(7)
        done = 0
        t0 = time.time()
        while done < a.proxy_steps:
            n = min(a.chunk, a.proxy_steps - done)
            key, sub = jax.random.split(key)
            pstate, nll = proxy_chunk(pstate, jax.random.split(sub, n))
            done += n
            print(f"[proxy] step {done}: nll={float(nll):.4f}",
                  file=sys.stderr)
        pparams = pstate.params
        print(f"[proxy] trained {a.proxy_steps} steps in "
              f"{time.time() - t0:.0f}s", file=sys.stderr)
        if a.proxy_ckpt:
            with open(a.proxy_ckpt, "wb") as f:
                pickle.dump(jax.tree.map(np.asarray, pparams), f)

    # ------------- stage 2: two denoisers, one recipe -----------------------
    def proxy_sample(rng_, clean, iso_):
        return proxy.apply({"params": pparams}, clean, iso_,
                           rngs={"sample": rng_}, mode="sample")

    synth_proxy = _ladder_proxy_synth(jnp, jax, make_proxy_synth,
                                      proxy_sample, iso_arr)

    def synth_physics(key, batch):
        # the Raw_Dataset branch restricted to the same ladder: one ISO per
        # batch, ratio ~ U(100, 300) per example, exact point params
        hr = batch["hr"]
        n = hr.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        idx = jax.random.randint(k1, (), 0, len(iso_arr))
        ratio = jax.random.uniform(k2, (n,), minval=100.0, maxval=300.0)
        # no clip here: make_train_step(clip_mode=2) applies the reference
        # HALF_CLIP semantics identically to both arms
        lr = generate_noisy(k3, hr, params_from_idx(idx, n, ratio), "pgrq",
                            ori=False)
        return lr, hr, ratio

    hyper = {"lr_scheduler": "WarmupCosine", "learning_rate": 1e-4,
             "stop_epoch": max(a.unet_steps, 2), "last_epoch": 0,
             "step_size": 10, "T": 2}

    # ONE clean-scene pool, uploaded once, shared by both arms (the SAME
    # scene stream both arms — now by construction: same pool, same index
    # key stream). Steps gather batches by index and the whole arm runs in
    # lax.scan chunks — one dispatch per chunk instead of a ~33 MB h2d per
    # step through the tunnel.
    pool = jnp.asarray(
        synthetic_scenes(np.random.default_rng(1997), a.pool, a.patch))

    def train_arm(name, synth, seed):
        model = UNetSeeInDark(nf=a.nf)
        state = create_train_state(jax.random.key(seed), model,
                                   jnp.zeros((1, a.patch, a.patch, 4)))
        lr_s = build_lr_schedule(hyper)
        step = make_train_step(model, lr_s, synth, clip_mode=2, fast=True,
                               donate=False)

        snap = f"{a.state_dir}/arm_{name}.pkl" if a.state_dir else None
        done = 0
        if snap:
            try:
                with open(snap, "rb") as f:
                    rec = pickle.load(f)
                done = rec["done"]
                state = state.replace(
                    step=jnp.asarray(rec["step"]),
                    params=jax.tree.map(jnp.asarray, rec["params"]),
                    opt_state=jax.tree.map(jnp.asarray, rec["opt_state"]))
                print(f"[{name}] resumed at step {done} from {snap}",
                      file=sys.stderr)
            except FileNotFoundError:
                pass

        def save_snap(st, n_done):
            if not snap:
                return
            host = jax.tree.map(np.asarray,
                                {"step": st.step, "params": st.params,
                                 "opt_state": st.opt_state})
            host["done"] = n_done
            with open(snap + ".tmp", "wb") as f:
                pickle.dump(host, f)
            os.replace(snap + ".tmp", snap)

        # NOTE: pool is an explicit jit ARGUMENT, not a closure capture — a
        # closed-over device array is serialized into the remote_compile
        # request as a constant, and at recipe scale (64 x 512^2 x 4 f32 =
        # 256 MB) the axon tunnel rejects it with HTTP 413. As an argument
        # it is a device buffer reference: uploaded once by jnp.asarray,
        # zero-copy per chunk call.
        @jax.jit
        def chunk(state, keys, offset, pool_):
            def body(st, kv):
                k, it = kv
                ki, ks = jax.random.split(k)
                idx = jax.random.randint(ki, (a.batch,), 0, a.pool)
                # the schedule is step-granular here: global step = "epoch"
                st, m = step(st, {"hr": pool_[idx]}, ks, offset + it)
                return st, m["loss"]

            its = jnp.arange(keys.shape[0])
            state, losses = jax.lax.scan(body, state, (keys, its))
            return state, losses[-1]

        key = jax.random.key(100 + seed)  # SAME index/noise stream both arms
        t0 = time.time()
        at = 0  # chunk-boundary walker: resume needs the same --chunk
        while at < a.unet_steps:
            n = min(a.chunk, a.unet_steps - at)
            key, sub = jax.random.split(key)
            if at < done:  # already in the snapshot: keep the key stream
                at += n
                continue
            state, loss = chunk(state, jax.random.split(sub, n),
                                jnp.asarray(at, jnp.float32), pool)
            at += n
            save_snap(state, at)
            print(f"[{name}] step {at}/{a.unet_steps}: "
                  f"loss={float(loss):.4f} "
                  f"({(time.time() - t0) / max(at - done, 1) * 1e3:.0f} "
                  f"ms/step)", file=sys.stderr)
        return model, state

    if a.null:
        # Arm B: identical physics law, every synth key folded to a fresh
        # value — different noise realizations, same distribution. The batch
        # index stream (drawn before the synth key inside the chunk body)
        # stays identical, so the ONLY difference is the noise draw.
        def synth_physics_b(key, batch):
            return synth_physics(jax.random.fold_in(key, 0x9E3779B9), batch)

        arm_b_name, arm_b_synth = "physics2", synth_physics_b
    else:
        arm_b_name, arm_b_synth = "proxy", synth_proxy

    model_p, state_p = train_arm("physics", synth_physics, seed=11)
    model_x, state_x = train_arm(arm_b_name, arm_b_synth, seed=11)

    # ------------- held-out A/B eval ----------------------------------------
    es = make_eval_step(model_p, fast=True)
    rng = np.random.default_rng(31337)  # disjoint from the training stream
    p_eval = min(a.patch, 256)
    eval_hr = jnp.asarray(synthetic_scenes(rng, a.eval_frames, p_eval))

    def arm_psnr(state, lr_img, hr_img):
        dn = jnp.clip(es(state, lr_img), 0, 1)
        return float(psnr(dn * 255.0, jnp.clip(hr_img, 0, 1) * 255.0))

    rows = []
    for iso_v in (800, 3200, 12800, HELDOUT_ISO):
        for ratio_v in (100.0, 300.0):
            # amplified (ori=False) inputs, like training; HALF_CLIP like
            # the eval loop's input contract
            lr_img = jnp.clip(generate_noisy(
                jax.random.key(int(iso_v * 7 + ratio_v)), eval_hr,
                params_at(iso_v, a.eval_frames, ratio_v), "pgrq",
                ori=False), -jnp.inf, 1.0)
            p_phys = arm_psnr(state_p, lr_img, eval_hr)
            p_prox = arm_psnr(state_x, lr_img, eval_hr)
            p_in = float(psnr(jnp.clip(lr_img, 0, 1) * 255.0,
                              jnp.clip(eval_hr, 0, 1) * 255.0))
            rows.append({"iso": iso_v, "ratio": int(ratio_v),
                         "input_psnr": round(p_in, 3),
                         "physics_psnr": round(p_phys, 3),
                         "proxy_psnr": round(p_prox, 3),
                         "delta": round(p_prox - p_phys, 3),
                         "heldout_iso": iso_v == HELDOUT_ISO})

    deltas = [r["delta"] for r in rows]
    arm_b = "physics2 (null control)" if a.null else f"proxy ({a.proxy_steps} steps, d={a.d})"
    print(f"\nA/B at recipe patch={a.patch} batch={a.batch} "
          f"steps={a.unet_steps}; arm B = {arm_b}")
    print(f"{'ISO':>7} {'ratio':>6} | {'physics':>8} {'arm B':>8} {'delta':>7}")
    for r in rows:
        note = " (held-out ISO)" if r["heldout_iso"] else ""
        print(f"{r['iso']:>7} {r['ratio']:>6} | {r['physics_psnr']:>8.3f} "
              f"{r['proxy_psnr']:>8.3f} {r['delta']:>+7.3f}{note}")
    mean_d = float(np.mean(deltas))
    worst_d = float(np.min(deltas))
    print(f"mean delta {mean_d:+.3f} dB, worst {worst_d:+.3f} dB")
    print(json.dumps({"metric": ("ab_null_control" if a.null
                                 else "ab_proxy_vs_physics"),
                      "mean_delta_db": round(mean_d, 3),
                      "worst_delta_db": round(worst_d, 3),
                      "ok": bool(worst_d > -0.15), "rows": rows}))
    return rows


def _ladder_proxy_synth(jnp, jax, make_proxy_synth, sample_fn, iso_arr):
    """Sony proxy law with the ISO draw restricted to the proxy's ladder
    (make_proxy_synth draws from the full 31-ISO legal ladder; the controlled
    A/B keeps both arms on the same support)."""

    def synth(key, batch):
        hr = batch["hr"]
        n = hr.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        ratio = jax.random.uniform(k1, (n,), minval=100.0, maxval=300.0)
        idx = jax.random.randint(k2, (), 0, len(iso_arr))
        rb = ratio.reshape(-1, 1, 1, 1)
        noise = sample_fn(k3, hr / rb, iso_arr[idx])
        # no clip here: make_train_step(clip_mode=2) clips both arms alike
        lr = hr + noise * rb
        return lr, hr, ratio

    return synth


if __name__ == "__main__":
    main()
