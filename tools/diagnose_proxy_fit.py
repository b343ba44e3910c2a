"""Post-hoc inspection of a trained pw_iso_2stage fit (params pickled by
``tools/validate_proxy.py --save``): is the ROW head's learned law right?

Prints, per ISO:
  * pixel head: closed-form model variance (+ s0^2 the sampler adds) vs the
    empirical variance of 10^6 true residual draws (TL + quant) — this is
    exactly the ``var_px`` the row deconvolution divides by W, so a biased
    value here over/under-deconvolves the row stage;
  * row head: std of 10^6 direct head draws vs the calibrated sigR, plus a
    direct KLD of head draws vs N(0, sigR) at the validate binning — the
    row stage judged on its OWN law, no pixel contamination in the metric;
  * the heads' tail_pi / tail_b / support scale.

Usage: python tools/validate_proxy.py ... --save /tmp/p.pkl
       python tools/diagnose_proxy_fit.py /tmp/p.pkl [--d 256] [--cpu]
"""

from __future__ import annotations

import argparse
import pickle
import sys

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("params")
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--mode", default="2stage+iso")
    ap.add_argument("--s0", type=float, default=0.3)
    ap.add_argument("--no-zero-mean", action="store_true",
                    help="do NOT center the heads (pre-fix fits; production "
                         "default centers — models/proxy.py zero_mean)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--isos", type=int, nargs="*",
                    default=[800, 1600, 3200, 12800, 6400])
    a = ap.parse_args(argv)

    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from pnnp_tpu.models import PixelWiseISOProxy
    from pnnp_tpu.models.proxy import QuantileHead
    from pnnp_tpu.ops.kld import kl_div_norm_device
    from pnnp_tpu.ops.tukey import tukeylambda_sample
    from pnnp_tpu.physics import calibration as calib

    with open(a.params, "rb") as f:
        params = jax.tree.map(jnp.asarray, pickle.load(f))

    proxy = PixelWiseISOProxy(d=a.d, nf=16, nb=2, mode=a.mode, smooth_s0=a.s0)
    t = calib.ISO_TABLES["SonyA7S2"]
    span = float(t["wp"] - t["bl"])
    q_adu = float(t["q"]) * span

    def heads_at(iso):
        """HeadParams for both stages at one ISO (mirror of __call__)."""
        feat = proxy._iso_feat(jnp.asarray([float(iso)]))

        def run(p, c, i):
            return proxy.apply({"params": p}, c, i, mode="loss")

        # pull the heads via a module-level apply of each QuantileHead
        px = QuantileHead(a.d, 16, 2).apply(
            {"params": params["pixel_stage"]}, feat)
        row = QuantileHead(a.d, 16, 2).apply(
            {"params": params["row_stage"]}, feat)
        if not a.no_zero_mean:
            px, row = QuantileHead.center(px), QuantileHead.center(row)
        return px, row

    M = 1 << 20
    print(f"{'ISO':>7} | {'px var model':>12} {'px var true':>11} {'ratio':>6}"
          f" | {'row std model':>13} {'sigR':>6} {'ratio':>6} {'row KLD':>8}"
          f" | px(pi,b)    row(pi,b)")
    for iso in a.isos:
        i = int(np.where(t["iso"] == iso)[0][0])
        lam, sigTL, sigR = (float(t["lam"][i]), float(t["sigTL"][i]),
                            float(t["sigR"][i]))
        hp_px, hp_row = heads_at(iso)

        v_model = float(QuantileHead.variance(hp_px)[0, 0]) + a.s0 ** 2
        k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(iso), 5)
        true = (tukeylambda_sample(k1, jnp.float32(lam), jnp.float32(sigTL),
                                   (M,))
                + (jax.random.uniform(k2, (M,)) - 0.5) * q_adu)
        v_true = float(jnp.var(true))

        u = jax.random.uniform(k3, (1, M), minval=1e-6, maxval=1 - 1e-6)
        c = jax.random.uniform(k4, (1, M))
        row_draw = QuantileHead.quantile(hp_row, u, c)[0]
        row_std = float(jnp.std(row_draw))
        row_ref = jax.random.normal(k5, (M,)) * sigR
        kld = float(kl_div_norm_device(row_ref, row_draw, bl=t["bl"],
                                       wp=t["wp"])["kl_sym"])
        pxp = (float(hp_px.tail_pi[0, 0]), float(hp_px.tail_b[0, 0]))
        rwp = (float(hp_row.tail_pi[0, 0]), float(hp_row.tail_b[0, 0]))
        # location: ML barely pins it, the ratio-amplified synth punishes it
        # (round-5 A/B autopsy: -0.52 ADU at 12800 was the -4.5 dB cell)
        m_px = float(QuantileHead.mean(hp_px)[0, 0])
        m_row = float(QuantileHead.mean(hp_row)[0, 0])
        print(f"{iso:>7} | {v_model:12.2f} {v_true:11.2f} "
              f"{v_model / max(v_true, 1e-9):6.3f} | {row_std:13.3f} "
              f"{sigR:6.3f} {row_std / sigR:6.3f} {kld:8.4f} | "
              f"({pxp[0]:.3f},{pxp[1]:.1f}) ({rwp[0]:.3f},{rwp[1]:.1f}) | "
              f"mean px {m_px:+.4f} row {m_row:+.4f} ADU")
        # pixel tail mass: model (full sampling path incl. s0) vs physics —
        # the amplified-ratio training regime lives in these quantiles
        k6, k7, k8 = jax.random.split(jax.random.key(iso + 9), 3)
        um = jax.random.uniform(k6, (1, M), minval=1e-6, maxval=1 - 1e-6)
        cm = jax.random.uniform(k7, (1, M))
        px_draw = (QuantileHead.quantile(hp_px, um, cm)[0]
                   + a.s0 * jax.random.normal(k8, (M,)))
        sig = float(jnp.sqrt(jnp.maximum(v_true, 1e-9)))
        tails = []
        for kk in (3.0, 5.0, 10.0):
            pm = float(jnp.mean((jnp.abs(px_draw) > kk * sig)))
            pt_ = float(jnp.mean((jnp.abs(true) > kk * sig)))
            tails.append(f"P>|{kk:.0f}s|: model {pm:.2e} true {pt_:.2e}")
        print(f"{'':>7}   tail   " + "   ".join(tails))


if __name__ == "__main__":
    main()
