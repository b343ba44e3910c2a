"""Composed-marginal cost profile of the pw_iso proxy synth stage.

The recipe-scale A/B (tools/ab_proxy_vs_physics.py) measured the proxy arm
at ~240 ms/step vs ~100 ms for the physics arm on v5e — the difference is
the synth stage (`make_proxy_synth` -> PixelWiseISOProxy._sample). This
harness decomposes that cost with the same chained-jit methodology as
tools/profile_prefix.py: ablation variants of the sample program, each
composed with a host readback, marginal column = what each mechanism costs.

Variants (cumulative mechanisms):
  u        uniforms only (u_px + c_px + row draws)
  shot     + exact Poisson shot (ops/poisson.py hybrid sampler)
  core     + PWL core lookup (the per-pixel double knot gather + lerp)
  full     + Laplace tail mixing + row stage (the production sample)
  fixedk   full, but the gather indices replaced with a constant (isolates
           the GATHER specifically: full - fixedk ~= gather cost)
  dot      full, with the PWL lookup done as a two-hot matmul (MXU) instead
           of take_along_axis — the candidate fix if the gather dominates

Usage (repo root, real TPU):  python tools/profile_proxy_synth.py
CPU smoke:                    ... --cpu --small --iters 2
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true", help="8x32x32x4 clean")
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    a = ap.parse_args(argv)

    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax import lax

    from pnnp_tpu.models.proxy import PixelWiseISOProxy, QuantileHead
    from pnnp_tpu.ops.poisson import poisson_sample

    n = a.batch
    hw = 32 if a.small else 256
    clean = jax.random.uniform(jax.random.key(0), (n, hw, hw, 4),
                               jnp.float32, 0.0, 0.3)

    proxy = PixelWiseISOProxy(d=a.d)
    pvars = proxy.init(jax.random.key(1), clean, 1600.0,
                       rng=jax.random.key(2), mode="sample")
    iso = jnp.float32(1600.0)

    span = proxy.wp - proxy.bl

    def sample_full(key, clean):
        return proxy.apply(pvars, clean, iso, rng=key, mode="sample")

    # Ablations rebuild the sample math outside flax from extracted params
    # (mirrors PixelWiseISOProxy._sample; exactness probed at the end).
    from flax.core import unfreeze

    p = unfreeze(pvars)["params"]

    def mlp(feat, scope):
        h = feat
        for i in range(proxy.nb):
            w_ = p[scope][f"fc{i}"]["kernel"]
            b_ = p[scope][f"fc{i}"]["bias"]
            h = jax.nn.swish(h @ w_ + b_)
        raw = h @ p[scope]["bins"]["kernel"] + p[scope]["bins"]["bias"]
        d = proxy.d
        heights = jax.nn.softmax(raw[..., :d], axis=-1)
        log_scale = jnp.clip(raw[..., d:d + 1] + QuantileHead.LOG_SCALE_INIT,
                             *QuantileHead.LOG_SCALE_RANGE)
        tail_pi = jax.nn.sigmoid(raw[..., d + 1:d + 2]
                                 + QuantileHead.TAIL_LOGIT_INIT)
        tail_b = jnp.exp(jnp.clip(raw[..., d + 2:d + 3]
                                  + QuantileHead.LOG_SCALE_INIT,
                                  *QuantileHead.LOG_TAIL_RANGE))
        cum = jnp.cumsum(heights, axis=-1)
        cum = jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum], axis=-1)
        knots = jnp.exp(log_scale) * (2.0 * cum - 1.0)
        from pnnp_tpu.models.proxy import HeadParams
        return HeadParams(knots, log_scale, tail_pi, tail_b)

    def iso_feat(nb):
        k = proxy.iso2k[0] * iso + proxy.iso2k[1]
        f = jnp.stack([k, jnp.log(iso / 1600.0)])
        return jnp.broadcast_to(f, (nb, 2))

    # the production two-hot MXU lookup (models/proxy.py)
    quantile_dot = QuantileHead.quantile_dot

    def build(which):
        def f(key, clean):
            k_shot, k_px, k_pxc, k_row, k_rowc = jax.random.split(key, 5)
            nb, h, w, c = clean.shape
            feat = iso_feat(nb)
            hp_px = mlp(feat, "pixel_stage")
            hp_row = mlp(feat, "row_stage")
            K = feat[:, 0].reshape(nb, 1, 1, 1)
            u_px = jax.random.uniform(k_px, clean.shape, minval=1e-6,
                                      maxval=1 - 1e-6)
            c_px = jax.random.uniform(k_pxc, clean.shape)
            u_row = jax.random.uniform(k_row, (nb, h, 1, c), minval=1e-6,
                                       maxval=1 - 1e-6)
            c_row = jax.random.uniform(k_rowc, (nb, h, 1, c))
            total = u_px * 0.0
            if which in ("shot", "core", "full", "fixedk", "dot"):
                clean_adu = jnp.maximum(clean, 0.0) * span
                shot = (poisson_sample(k_shot,
                                       clean_adu / jnp.maximum(K, 1e-6)) * K
                        - clean_adu)
                total = total + shot
            if which == "core":
                total = total + QuantileHead.quantile(hp_px, u_px, None)
            elif which in ("full", "fixedk"):
                if which == "fixedk":
                    # freeze the gather indices: same ops minus data-dependent
                    # gather (XLA folds take_along_axis with iota-free constant
                    # indices into a broadcast slice)
                    u_q = jnp.full_like(u_px, 0.5)
                    read = QuantileHead.quantile(hp_px, u_q, c_px)
                    total = total + read + u_px * 1e-20
                else:
                    total = total + QuantileHead.quantile(hp_px, u_px, c_px)
                total = total + QuantileHead.quantile(
                    hp_row, u_row, c_row if which == "full" else None)
            elif which == "dot":
                total = total + quantile_dot(hp_px, u_px, c_px)
                total = total + QuantileHead.quantile(hp_row, u_row, c_row)
            else:
                total = total + u_px + c_px + u_row + c_row  # consume RNG
            return total / span

        return f

    def time_fn(fn, iters):
        @jax.jit
        def run(key, clean):
            def body(carry, _):
                key, acc = carry
                key, sub = jax.random.split(key)
                out = fn(sub, clean)
                return (key, acc + jnp.sum(out)), None

            (_, acc), _ = lax.scan(body, (key, jnp.float32(0.0)), None,
                                   length=iters)
            return acc

        float(run(jax.random.key(9), clean))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(jax.random.key(9), clean))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    # production sample through the flax module, for reference
    t_prod = time_fn(lambda k, c: sample_full(k, c), a.iters)
    print(f"production proxy.sample           : {t_prod*1e3:7.2f} ms")

    prev = 0.0
    for which in ("u", "shot", "core", "full", "fixedk", "dot"):
        t = time_fn(build(which), a.iters)
        print(f"variant {which:7s}: {t*1e3:7.2f} ms   "
              f"(marginal vs prev {1e3*(t-prev):+7.2f})")
        prev = t

    # exactness probe: dot vs gather core on the same draws
    key = jax.random.key(3)
    feat = iso_feat(n)
    hp = mlp(feat, "pixel_stage")
    u = jax.random.uniform(jax.random.key(4), clean.shape, minval=1e-6,
                           maxval=1 - 1e-6)
    c_ = jax.random.uniform(jax.random.key(5), clean.shape)
    g = QuantileHead.quantile(hp, u, c_)
    dte = quantile_dot(hp, u, c_)
    err = jnp.max(jnp.abs(g - dte)) / (jnp.max(jnp.abs(g)) + 1e-9)
    print(f"dot-vs-gather max rel err: {float(err):.3e} "
          f"(bf16 knot rounding bound ~2e-3)")


if __name__ == "__main__":
    main()
