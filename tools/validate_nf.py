"""NoiseFlow convergence + KLD parity across the ISO ladder (VERDICT r3 #3).

Trains the FULL production arch string
(``sdn|unc|unc|unc|unc|giso|unc|unc|unc|unc`` — runfiles/SonyA7S2/
NoiseFlow.yml:49) on physics-engine noise residuals conditioned on
(clean, iso), the way the reference NF trainer consumes real pairs
(``noise=(lr-hr)/ratio, clean=hr/ratio, iso`` — reference
trainer_NF_SID.py:117-123), then reports per ISO:

  * sampled-vs-real symmetric KLD at integer-ADU binning (the reference's
    per-epoch noise-model quality metric, trainer_NF_SID.py:163-180 /
    utils/kld_div.py:163) with a real-vs-real sampling floor — acceptance
    bar <= 0.1 (BASELINE.md target 3);
  * a held-out-ISO interpolation probe (GainISO/SignalDependantISO
    interpolate over the legal-ISO ladder);
  * the KLD trajectory on a FIXED held-out batch per training chunk —
    asserting the min-KLD chunk is at (or near) the end, the property the
    NF trainer's best-checkpoint contract keys on.

Usage: python tools/validate_nf.py [--steps 10000] [--cpu]
Prints a table + one JSON line; paste the table into STATUS.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--patch", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--eval-frames", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args(argv)

    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from pnnp_tpu.models import NoiseFlow
    from pnnp_tpu.ops.kld import kl_div_norm_device
    from pnnp_tpu.physics import calibration as calib, generate_noisy
    from pnnp_tpu.train.state import (
        TrainState,
        apply_scaled_updates,
        make_adam_direction,
    )

    TRAIN_ISOS = (800, 1600, 3200, 12800)
    HELDOUT_ISO = 6400
    t = calib.ISO_TABLES["SonyA7S2"]
    span = float(t["wp"] - t["bl"])

    iso_arr = jnp.asarray(TRAIN_ISOS, jnp.float32)
    tidx = [int(np.where(t["iso"] == iso)[0][0]) for iso in TRAIN_ISOS]
    prow = {name: jnp.asarray([float(t[name][i]) for i in tidx])
            for name in ("Kmax", "sigTL", "sigR", "sigGs", "lam")}

    def params_from_idx(idx, n):
        rep = lambda v: jnp.full((n,), v[idx])
        return dict(
            K=rep(prow["Kmax"]), sigTL=rep(prow["sigTL"]),
            sigR=rep(prow["sigR"]), sigGs=rep(prow["sigGs"]),
            bias=jnp.zeros((n, 4)), lam=rep(prow["lam"]),
            q=jnp.full((n,), float(t["q"])), ratio=jnp.ones((n,)),
            wp=jnp.full((n,), float(t["wp"])), bl=jnp.full((n,), float(t["bl"])),
        )

    def params_at(iso, n):
        i = int(np.where(t["iso"] == iso)[0][0])
        rep = lambda v: jnp.full((n,), float(v))
        return dict(
            K=rep(t["Kmax"][i]), sigTL=rep(t["sigTL"][i]),
            sigR=rep(t["sigR"][i]), sigGs=rep(t["sigGs"][i]),
            bias=jnp.zeros((n, 4)), lam=rep(t["lam"][i]), q=rep(t["q"]),
            ratio=rep(1.0), wp=rep(t["wp"]), bl=rep(t["bl"]),
        )

    def clean_batch(key, n, p):
        # dark-scene clean signal in [0, 0.25]: the shot-noise (sdn) stage
        # must see clean-level variety to fit beta1*clean/gain + beta2
        return jax.random.uniform(key, (n, p, p, 4), maxval=0.25)

    def noise_given(key, clean, params, ):
        lr = generate_noisy(key, clean, params, "pgrq", ori=True)
        return lr - clean

    nf = NoiseFlow(x_shape=(a.patch, a.patch, 4))
    nvars = nf.init(jax.random.key(0),
                    jnp.zeros((1, a.patch, a.patch, 4)),
                    clean=jnp.zeros((1, a.patch, a.patch, 4)),
                    iso=jnp.full((1,), 1600.0))
    state = TrainState.create(apply_fn=nf.apply, params=nvars["params"],
                              tx=make_adam_direction(),
                              batch_stats=nvars.get("batch_stats", {}))

    def loss_fn(params, batch_stats, noise, clean, iso):
        # coupling nets carry BatchNorm (reference affine_coupling.py:
        # 245-295); train mode mutates the running stats
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        (nll, _), new_stats = nf.apply(
            variables, noise, clean=clean, iso=iso, train=True,
            method=nf.loss, mutable=["batch_stats"] if batch_stats else [])
        return nll, new_stats

    @jax.jit
    def train_chunk(state, keys):
        def body(st, k):
            k1, k2, k3 = jax.random.split(k, 3)
            idx = jax.random.randint(k1, (), 0, len(TRAIN_ISOS))
            clean = clean_batch(k2, a.batch, a.patch)
            noise = noise_given(k3, clean, params_from_idx(idx, a.batch))
            iso = jnp.full((a.batch,), iso_arr[idx])
            (nll, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params, st.batch_stats, noise,
                                       clean, iso)
            st = apply_scaled_updates(st, grads, a.lr)
            if st.batch_stats:
                st = st.replace(
                    batch_stats=new_stats.get("batch_stats", st.batch_stats))
            return st, nll

        state, nlls = jax.lax.scan(body, state, keys)
        return state, nlls[-1]

    # fixed held-out scoring batch (epoch-0 ordering analog): one clean set +
    # one real noise draw, re-scored every chunk
    kfix = jax.random.key(99)
    kc, kn, ks = jax.random.split(kfix, 3)
    p_eval = a.patch * 2
    fix_clean = clean_batch(kc, a.eval_frames, p_eval)
    fix_iso = 3200

    def _vars(st):
        v = {"params": st.params}
        if st.batch_stats:
            v["batch_stats"] = st.batch_stats
        return v

    def kld_of_state(st, key):
        real = noise_given(kn, fix_clean, params_at(fix_iso, a.eval_frames))
        fake = nf.apply(_vars(st), key, clean=fix_clean,
                        iso=jnp.full((a.eval_frames,), float(fix_iso)),
                        method=nf.sample)
        if not bool(jnp.all(jnp.isfinite(fake))):
            return float("nan")
        return float(kl_div_norm_device(real * span, fake * span,
                                        bl=t["bl"], wp=t["wp"])["kl_sym"])

    t0 = time.time()
    key = jax.random.key(7)
    nll = float("nan")
    done = 0
    traj = []
    while done < a.steps:
        n = min(a.chunk, a.steps - done)
        key, sub, ksc = jax.random.split(key, 3)
        state, nll = train_chunk(state, jax.random.split(sub, n))
        done += n
        traj.append(round(kld_of_state(state, ks), 4))
        print(f"  step {done}: nll/dim={float(nll):.4f} "
              f"fixed-batch KLD={traj[-1]:.4f}", file=sys.stderr)

    def score(iso, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        n, p = a.eval_frames, p_eval
        clean = clean_batch(k4, n, p)
        real = noise_given(k1, clean, params_at(iso, n))
        real2 = noise_given(k3, clean, params_at(iso, n))
        fake = nf.apply(_vars(state), k2, clean=clean,
                        iso=jnp.full((n,), float(iso)), method=nf.sample)
        if not bool(jnp.all(jnp.isfinite(fake))):
            return float("nan"), 0.0
        kl = lambda x, y: float(kl_div_norm_device(
            x * span, y * span, bl=t["bl"], wp=t["wp"])["kl_sym"])
        return kl(real, fake), kl(real, real2)

    rows = []
    for iso in TRAIN_ISOS + (HELDOUT_ISO,):
        kf, kf0 = score(iso, jax.random.key(2000 + iso))
        rows.append({"iso": iso, "kld": round(kf, 4),
                     "kld_floor": round(kf0, 4),
                     "heldout": iso == HELDOUT_ISO})

    # best == min-KLD should be (near) the last chunk: monotone-ish descent
    best_chunk = int(np.nanargmin(traj))
    print(f"\nNoiseFlow '{nf.arch}' trained {a.steps} steps on ISOs "
          f"{TRAIN_ISOS} ({time.time() - t0:.0f}s); final nll/dim="
          f"{float(nll):.4f}")
    print(f"fixed-batch KLD trajectory (per {a.chunk}-step chunk): {traj}")
    print(f"{'ISO':>7} | {'KLD(sym)':>9} {'floor':>7} | note")
    for r in rows:
        note = "held-out (interpolation)" if r["heldout"] else ""
        print(f"{r['iso']:>7} | {r['kld']:>9.4f} {r['kld_floor']:>7.4f} | {note}")
    ok = (np.isfinite(float(nll))
          and all(np.isfinite(r["kld"]) and r["kld"] <= 0.1 for r in rows
                  if not r["heldout"])
          and best_chunk >= len(traj) - max(2, len(traj) // 4))
    print(json.dumps({"metric": "nf_kld_parity", "ok": bool(ok), "rows": rows,
                      "nll": round(float(nll), 4), "kld_traj": traj,
                      "best_chunk": best_chunk, "n_chunks": len(traj)}))
    return rows


if __name__ == "__main__":
    main()
