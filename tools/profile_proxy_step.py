"""Composed-prefix profile of the FULL proxy train step (VERDICT r4 #7).

`bench.py --train-proxy` reports the PNNP flagship train step at 57.6
ms/step vs 44.4 for the physics-synth step, and tools/profile_proxy_synth.py
attributes ~7.4 ms of the ~13 ms gap to the (already MXU-fixed) PWL sampler
at the 8x256^2 probe shape — but nothing composes the whole step
(synth -> clip -> fwd -> bwd -> Adam) at the true recipe geometry, so ~6 ms
was unattributed. This tool runs successively longer prefixes of the exact
`make_train_step(fast="packed")` program (same chained-jit + host-readback
methodology as tools/profile_prefix.py), marginal column per stage, with a
physics-synth control column at identical shapes:

  sample     per-example ratio/ISO draws + proxy.sample(hr/ratio, iso)
  synth      + lr/hr composition and the s2d pack (pack_synth)
  fwd        + clip_lr_hr + weight transform + packed forward + loss
  bwd        + value_and_grad (grads consumed by a full reduction)
  step       the production train step (Adam update + metrics)

Usage (repo root, real TPU):  python tools/profile_proxy_step.py
CPU smoke:                    ... --cpu --small --iters 2
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--scan", type=int, default=8, help="steps chained per jit")
    ap.add_argument("--d", type=int, default=1024,
                    help="proxy quantile bins (runfile PNNP.yml d=1024)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="8x(64^2) crops instead of the 8x(512^2) recipe")
    a = ap.parse_args(argv)

    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from pnnp_tpu.models import PixelWiseISOProxy, UNetSeeInDark
    from pnnp_tpu.models.unet_s2d import d2s, transform_params_hybrid, unet_hybrid_forward_packed
    from pnnp_tpu.train import build_lr_schedule, create_train_state, make_train_step
    from pnnp_tpu.train.steps import (
        LEGAL_ISO,
        clip_lr_hr,
        make_proxy_synth,
        make_raw_synth_packed,
        pack_synth,
        unet_loss,
    )

    hw = 32 if a.small else 256  # packed 16-ch H/W; unpacked crop is 2*hw
    model = UNetSeeInDark(nf=32)
    sched = build_lr_schedule(
        {"lr_scheduler": "fixed", "learning_rate": 1e-4, "stop_epoch": 10,
         "last_epoch": 0})
    state = create_train_state(jax.random.key(0), model,
                               jnp.zeros((1, 64, 64, 4)))

    pw = PixelWiseISOProxy(d=a.d)
    clean0 = jnp.zeros((1, 8, 8, 4))
    pvars = pw.init({"params": jax.random.key(5), "sample": jax.random.key(6)},
                    clean0, jnp.ones((1,)) * 1600.0)

    def sample_fn(rng, clean, iso):
        return pw.apply(pvars, clean, iso, rngs={"sample": rng}, mode="sample")

    synth = pack_synth(make_proxy_synth(sample_fn, ratio_range=(100.0, 300.0)))
    hr_packed = (jax.random.uniform(jax.random.key(1), (8, hw, hw, 16)) * 0.02
                 ).astype(jnp.float32)
    batch = {"hr": d2s(hr_packed)}  # proxy synth samples in unpacked layout

    # --- prefix programs -------------------------------------------------
    # Each returns ONE scalar; chained a.scan times per jit dispatch with the
    # scalar folded into the carry (forces sequencing), host readback at end.
    def prog_sample(key, _state):
        hr = batch["hr"]
        n = hr.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        ratio = jax.random.uniform(k1, (n,), minval=100.0, maxval=300.0)
        iso = jnp.asarray(LEGAL_ISO)[jax.random.randint(k2, (), 0, len(LEGAL_ISO))]
        noise = sample_fn(k3, hr / ratio.reshape(-1, 1, 1, 1), iso)
        return jnp.sum(noise), _state

    def prog_synth(key, _state):
        lr, hr, ratio = synth(key, batch)
        return jnp.sum(lr) + jnp.sum(hr), _state

    def make_loss_prog(grad: bool):
        def loss_val(params, lr_img, hr_img):
            tp = transform_params_hybrid(params)
            pred = unet_hybrid_forward_packed(tp, lr_img, None)
            return unet_loss(pred, hr_img)

        def prog(key, _state):
            lr, hr, ratio = synth(key, batch)
            lr, hr = clip_lr_hr(lr, hr, 2)
            if grad:
                loss, grads = jax.value_and_grad(loss_val)(
                    _state.params, lr, hr)
                # consume every grad leaf (cheap full reductions) so nothing
                # is dead-code-eliminated out of the backward pass
                gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
                return loss + 0.0 * gsum, _state
            return loss_val(_state.params, lr, hr), _state

        return prog

    step = make_train_step(model, sched, synth, clip_mode=2, donate=False,
                           fast="packed")

    def prog_step(key, st):
        st, m = step(st, batch, key, 1)
        return m["loss"], st

    # physics control at identical shapes (the 44.4 ms/step baseline)
    synth_phys = make_raw_synth_packed("SonyA7S2", "pgrq", ori=False,
                                       clip=False)
    step_phys = make_train_step(model, sched, synth_phys, clip_mode=2,
                                donate=False, fast="packed")
    batch_phys = {"hr": hr_packed}

    def prog_step_phys(key, st):
        st, m = step_phys(st, batch_phys, key, 1)
        return m["loss"], st

    def time_prog(prog):
        @jax.jit
        def run(st, keys):
            def body(carry, k):
                st, acc = carry
                v, st = prog(k, st)
                return (st, acc + v), ()

            (st, acc), _ = jax.lax.scan(body, (st, jnp.float32(0.0)), keys)
            return st, acc

        keys = jax.random.split(jax.random.key(2), a.scan)
        st, acc = run(state, keys)
        float(acc)  # compile + warmup
        best = 1e9
        for _ in range(a.iters):
            t0 = time.perf_counter()
            st, acc = run(state, keys)
            float(acc)
            best = min(best, (time.perf_counter() - t0) / a.scan)
        return best * 1e3

    rows, prev = [], 0.0
    for name, prog in [("sample", prog_sample), ("synth", prog_synth),
                       ("fwd", make_loss_prog(False)),
                       ("bwd", make_loss_prog(True)),
                       ("step", prog_step)]:
        ms = time_prog(prog)
        rows.append({"prefix": name, "cum_ms": round(ms, 2),
                     "marginal_ms": round(ms - prev, 2)})
        prev = ms
        print(f"{name:>7}: cum {ms:7.2f} ms  marginal {rows[-1]['marginal_ms']:+7.2f} ms")

    phys = time_prog(prog_step_phys)
    print(f"physics: cum {phys:7.2f} ms  (control, full step)")
    print(json.dumps({"metric": "proxy_step_profile", "d": a.d,
                      "rows": rows, "physics_step_ms": round(phys, 2),
                      "gap_ms": round(rows[-1]["cum_ms"] - phys, 2)}))


if __name__ == "__main__":
    main()
