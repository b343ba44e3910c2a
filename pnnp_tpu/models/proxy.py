"""PNNP proxy network ``pw_iso_2stage`` — re-designed (withheld upstream).

The reference ships only this model's config (reference:
runfiles/SonyA7S2/PNNP.yml:47-59 — pixel-wise, ISO-conditioned, 2-stage,
nf=16, nb=2, d=1024 bins, swish, ISO2K linear gain map) and its call contract
``proxy_net.sample(clean, iso) -> noise`` (reference: trainer_SID.py:463-472);
the implementation is withheld (archs/__init__.py:10). This is a from-scratch
design guided by the PNNP paper's "physics-guided noise neural proxy" idea
(arXiv:2310.09126): keep the physics where physics is exact, learn only the
dark/read-noise distribution.

Architecture:
  * **Physics part** (no parameters): shot noise is exact Poisson with system
    gain ``K(iso) = ISO2K[0]*iso + ISO2K[1]``.
  * **Stage 1 — pixel proxy**: a learned inverse-CDF (quantile function) over
    ``d`` uniform probability bins, parameterized by an ISO-conditioned MLP
    (``nb`` hidden layers of width ``nf``, swish). Sampling is a single
    per-pixel gather: ``u ~ U(0,1) -> Q_theta(u | iso)`` — a TPU-friendly,
    fully vectorized generator with an exact tractable density (piecewise
    constant), so the proxy trains by maximum likelihood on real dark frames.
  * **Stage 2 — row proxy** (mode '2stage'): an identical quantile head whose
    samples are drawn per (row, channel) and broadcast along the row, modeling
    banding noise.

All shapes NHWC; ``iso`` is a scalar or per-example [n] array.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pnnp_tpu.ops.poisson import poisson_sample

Swish = nn.swish


class HeadParams(NamedTuple):
    """Per-example distribution parameters emitted by :class:`QuantileHead`."""

    knots: jnp.ndarray      # [n, d+1] monotone PWL quantile knots (ADU)
    log_scale: jnp.ndarray  # [n, 1] log support half-width
    tail_pi: jnp.ndarray    # [n, 1] Laplace tail mixture weight in (0, 1)
    tail_b: jnp.ndarray     # [n, 1] Laplace tail scale (ADU)


class QuantileHead(nn.Module):
    """ISO-conditioned monotone PWL quantile core + Laplace mixture tail.

    The distribution is ``p(x) = (1-pi) * p_pwl(x) + pi * Laplace(x; mu, b)``
    with ``p_pwl`` the piecewise-constant density of a learned inverse-CDF on
    ``d`` uniform probability bins and ``mu`` the support midpoint. The
    explicit tail is what keeps maximum-likelihood training stable on
    heavy-tailed (Tukey-lambda) dark-frame noise: out-of-support samples get
    bounded log-density through the Laplace component instead of dragging the
    learned support scale outward (the round-1 divergence mode — pixel NLL
    3.3->6.3 by step 400 without it).
    """

    d: int = 1024
    nf: int = 16
    nb: int = 2

    # Init/clip for the learned support half-width (ADU): starts at e^2~7.4
    # (typical read-noise span) and stays in [e^-2, e^6] for stability.
    LOG_SCALE_INIT = 2.0
    LOG_SCALE_RANGE = (-2.0, 6.0)
    # Tail mixture init: sigmoid(-2.5) ~ 7.6% (the measured out-of-support
    # Tukey-lambda mass), Laplace scale init e^2 ADU, clipped to [e^-2, e^8].
    TAIL_LOGIT_INIT = -2.5
    LOG_TAIL_RANGE = (-2.0, 8.0)

    @nn.compact
    def __call__(self, iso_feat: jnp.ndarray,
                 log_anchor: jnp.ndarray | None = None,
                 return_raw: bool = False) -> HeadParams:
        """iso_feat [n, f] -> HeadParams (or the raw pre-activation MLP
        output [n, d+3] with ``return_raw`` — used by the ISO-curvature
        smoothness penalty, which needs the unconstrained coordinates).

        ``log_anchor`` [n, 1] (optional): a physics-informed additive shift
        on the support/tail log-scales — e.g. ``log(K(iso)/K(1600))``, the
        ELD-style log-linear read-noise law. MEASURED NEGATIVE for held-out
        ISO interpolation on the SonyA7S2 ladder (60k steps, W=128 rows,
        d=256): trained ISOs unchanged at their floors, but held-out 6400
        KLD 0.0103 -> 0.0346 (row 0.0104 -> 0.0724) — the true ADU scale
        laws are not proportional to K, so the residual the anchor forces
        the MLP to learn varies across ISO and anchor+residual disagree
        between ladder points. Kept opt-in ('+anchor' mode token) for
        extrapolation experiments; default off.
        """
        h = iso_feat
        for i in range(self.nb):
            h = Swish(nn.Dense(self.nf, name=f"fc{i}")(h))
        # d bin heights + log support scale + tail logit + log tail scale
        raw = nn.Dense(self.d + 3, name="bins")(h)
        if return_raw:
            return raw
        shift = 0.0 if log_anchor is None else log_anchor
        heights = nn.softmax(raw[..., : self.d], axis=-1)
        log_scale = jnp.clip(
            raw[..., self.d : self.d + 1] + self.LOG_SCALE_INIT + shift,
            *self.LOG_SCALE_RANGE,
        )
        tail_pi = nn.sigmoid(raw[..., self.d + 1 : self.d + 2] + self.TAIL_LOGIT_INIT)
        tail_b = jnp.exp(jnp.clip(
            raw[..., self.d + 2 : self.d + 3] + self.LOG_SCALE_INIT + shift,
            *self.LOG_TAIL_RANGE,
        ))
        # Monotone knots on [-1, 1], scaled: v_k = scale * (2*cum_k - 1).
        cum = jnp.cumsum(heights, axis=-1)
        cum = jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum], axis=-1)
        knots = jnp.exp(log_scale) * (2.0 * cum - 1.0)
        return HeadParams(knots, log_scale, tail_pi, tail_b)

    @staticmethod
    def _mix_tail(hp: HeadParams, u: jnp.ndarray, u_choice: jnp.ndarray,
                  core: jnp.ndarray) -> jnp.ndarray:
        """Mix the PWL ``core`` draw with the Laplace tail (prob ``tail_pi``,
        chosen by ``u_choice``; the tail draw reuses the same ``u``)."""
        knots = hp.knots
        bshape = (u.shape[0],) + (1,) * (u.ndim - 1)
        mu = 0.5 * (knots[:, 0] + knots[:, -1]).reshape(bshape)
        b = hp.tail_b.reshape(bshape)
        pi = hp.tail_pi.reshape(bshape)
        # Laplace inverse CDF on v = u - 1/2 (clipped away from +-1/2).
        v = jnp.clip(u - 0.5, -0.5 + 1e-7, 0.5 - 1e-7)
        lap = mu - b * jnp.sign(v) * jnp.log1p(-2.0 * jnp.abs(v))
        return jnp.where(u_choice < pi, lap, core)

    @staticmethod
    def quantile(hp: HeadParams, u: jnp.ndarray,
                 u_choice: jnp.ndarray | None = None) -> jnp.ndarray:
        """Draw from the mixture: PWL inverse-CDF at ``u``, or (with prob
        ``tail_pi``, chosen by ``u_choice``) a Laplace tail draw derived from
        the same ``u``. ``u_choice=None`` disables the tail (core only)."""
        knots = hp.knots
        d = knots.shape[-1] - 1
        t = u * d
        k = jnp.clip(t.astype(jnp.int32), 0, d - 1)
        frac = t - k

        kf = k.reshape(k.shape[0], -1)
        lo = jnp.take_along_axis(knots, kf, axis=-1).reshape(u.shape)
        hi = jnp.take_along_axis(knots, kf + 1, axis=-1).reshape(u.shape)
        core = lo + frac * (hi - lo)
        if u_choice is None:
            return core
        return QuantileHead._mix_tail(hp, u, u_choice, core)

    @staticmethod
    def quantile_dot(hp: HeadParams, u: jnp.ndarray,
                     u_choice: jnp.ndarray | None = None) -> jnp.ndarray:
        """:meth:`quantile` with the PWL knot lookup as a two-hot batched
        matmul instead of ``take_along_axis`` — the MXU-friendly form for
        per-pixel draw counts (TPU lowers minor-dim gathers to slow
        scalar/dynamic-slice loops; a ``[P, d] @ [d, 2]`` one-hot contraction
        rides the MXU and the one-hot never needs more than the dot's own
        operand traffic). One-hot rows are exact, so the only deviation from
        :meth:`quantile` is the knots' f32->bf16 rounding inside the dot
        (<= 2^-9 relative — far below the learned law's own KLD floor;
        measured ~5e-5 max relative on trained heads). Tail semantics are
        shared via :meth:`_mix_tail`.
        """
        knots = hp.knots
        d = knots.shape[-1] - 1
        n = knots.shape[0]
        t = u * d
        k = jnp.clip(t.astype(jnp.int32), 0, d - 1)
        frac = (t - k).astype(jnp.float32)
        oh = jax.nn.one_hot(k.reshape(n, -1), d, dtype=jnp.bfloat16)
        tab = jnp.stack([knots[:, :-1], knots[:, 1:]],
                        axis=-1).astype(jnp.bfloat16)        # [n, d, 2]
        lohi = jax.lax.dot_general(
            oh, tab, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # [n, P, 2]
        lo = lohi[..., 0].reshape(u.shape)
        hi = lohi[..., 1].reshape(u.shape)
        core = lo + frac * (hi - lo)
        if u_choice is None:
            return core
        return QuantileHead._mix_tail(hp, u, u_choice, core)

    @staticmethod
    def mean(hp: HeadParams) -> jnp.ndarray:
        """Closed-form mean of the PWL+Laplace mixture, [n, 1] (ADU)."""
        v = hp.knots
        m1_core = jnp.mean(0.5 * (v[:, :-1] + v[:, 1:]), axis=-1,
                           keepdims=True)
        mu = 0.5 * (v[:, :1] + v[:, -1:])
        return (1.0 - hp.tail_pi) * m1_core + hp.tail_pi * mu

    @staticmethod
    def center(hp: HeadParams) -> HeadParams:
        """Shift the law so its mixture mean is exactly zero.

        The mean is LINEAR in the knots (core midpoints and the Laplace
        center mu both shift 1:1 with them), so subtracting the closed-form
        mean from every knot zeroes it in one exact step. Physics-guided
        constraint (round-5 A/B autopsy): dark read noise after black-level
        subtraction is zero-mean BY CALIBRATION — but maximum likelihood
        barely pins the location of a wide law (a 0.5 ADU shift on a
        14-ADU-sigma law costs ~1e-4 nats and is invisible at integer-ADU
        KLD binning), and the ratio-amplified synth turns exactly that
        drift into a global brightness bias the denoiser learns: the
        measured -0.52 ADU pixel-mean drift at ISO 12800 predicted the
        recipe A/B's -4.5 dB cell at ratio 300 to within 0.1 dB. The mean
        is physics; only shape and scale are learned.
        """
        return hp._replace(knots=hp.knots - QuantileHead.mean(hp))

    @staticmethod
    def variance(hp: HeadParams) -> jnp.ndarray:
        """Closed-form variance of the PWL+Laplace mixture, [n, 1] (ADU^2).

        The PWL core is Q(u) linear on d equal-probability bins, so its first
        two moments are exact sums over knot segments: E[X] = mean of segment
        midpoints, E[X^2] = mean of (v_k^2 + v_k v_{k+1} + v_{k+1}^2)/3. The
        Laplace tail contributes mu = support midpoint and var 2 b^2.
        """
        v = hp.knots
        lo, hi = v[:, :-1], v[:, 1:]
        m1_core = jnp.mean(0.5 * (lo + hi), axis=-1, keepdims=True)
        m2_core = jnp.mean((lo * lo + lo * hi + hi * hi) / 3.0, axis=-1,
                           keepdims=True)
        mu = 0.5 * (v[:, :1] + v[:, -1:])
        pi = hp.tail_pi
        m1 = (1.0 - pi) * m1_core + pi * mu
        m2 = (1.0 - pi) * m2_core + pi * (mu * mu + 2.0 * hp.tail_b ** 2)
        return jnp.maximum(m2 - m1 * m1, 0.0)

    @staticmethod
    def log_prob_conv_gaussian(hp: HeadParams, x: jnp.ndarray,
                               s: jnp.ndarray) -> jnp.ndarray:
        """Exact log-density of (mixture convolved with N(0, s^2)) at x.

        Both mixture components convolve in closed form:
          * PWL core (piecewise-constant density): sum over the d bins of
            bin_mass(x) / (d * width_k) with bin_mass = Phi((v_{k+1}-x)/s)
            - Phi((v_k-x)/s).
          * Laplace tail: the two-sided exponentially-modified Gaussian,
            (1/4b) e^{r^2} [e^{-t} erfc(r-u) + e^{t} erfc(r+u)] with
            t=(x-mu)/b, r=s/(b sqrt2), u=(x-mu)/(s sqrt2); evaluated via
            log_ndtr so large r (heavily-masked rows) stays finite.

        ``s`` broadcasts against ``x``; s -> 0 recovers :meth:`log_prob`.
        """
        knots = hp.knots
        d = knots.shape[-1] - 1
        n = knots.shape[0]
        mu = 0.5 * (knots[:, :1] + knots[:, -1:])
        sq2 = np.sqrt(2.0)
        s = jnp.maximum(jnp.broadcast_to(jnp.asarray(s, x.dtype), x.shape),
                        1e-12)

        def per_example(kn, xe, se, mu_e, b_e, pi_e):
            z = (kn[None, :] - xe[:, None]) / se[:, None]        # [m, d+1]
            cdf = jax.scipy.special.ndtr(z)
            width = jnp.maximum(kn[1:] - kn[:-1], 1e-8)[None, :]
            core = jnp.sum((cdf[:, 1:] - cdf[:, :-1]) / width, axis=-1) / d
            # Density floor 1e-10 (lp ~ -23): without it, samples far outside
            # the core support leave core at f32-denormal magnitudes and the
            # log VJP's 1/core overflows (inf * 0 -> NaN grads, then Adam's
            # g^2 overflows — observed on the first unseen-ISO batch).
            # maximum() gives those samples an exactly-zero core cotangent;
            # the mixture's tail owns them, as it should.
            lp_core = jnp.log(jnp.maximum(core, 1e-10))
            t = (xe - mu_e) / b_e
            r = se / (b_e * sq2)
            u = (xe - mu_e) / (se * sq2)
            log2 = np.log(2.0)
            log_erfc_rpu = log2 + jax.scipy.special.log_ndtr(-(r + u) * sq2)
            log_erfc_rmu = log2 + jax.scipy.special.log_ndtr(-(r - u) * sq2)
            lp_tail = (-jnp.log(4.0 * b_e) + r * r
                       + jnp.logaddexp(t + log_erfc_rpu, -t + log_erfc_rmu))
            return jnp.logaddexp(jnp.log1p(-pi_e) + lp_core,
                                 jnp.log(pi_e) + lp_tail)

        pi = jnp.clip(hp.tail_pi, 1e-5, 1.0 - 1e-5)
        return jax.vmap(per_example)(
            knots, x.reshape(n, -1), s.reshape(n, -1),
            mu[:, 0], hp.tail_b[:, 0], pi[:, 0],
        ).reshape(x.shape)

    @staticmethod
    def log_prob(hp: HeadParams, x: jnp.ndarray) -> jnp.ndarray:
        """Exact log-density of the PWL+Laplace mixture at x (ADU)."""
        knots = hp.knots
        d = knots.shape[-1] - 1
        n = knots.shape[0]
        bshape = (n, 1)
        mu = 0.5 * (knots[:, :1] + knots[:, -1:])
        b = hp.tail_b.reshape(bshape)
        pi = jnp.clip(hp.tail_pi.reshape(bshape), 1e-5, 1.0 - 1e-5)

        def per_example(kn, xs, mu_e, b_e, pi_e):
            idx = jnp.clip(jnp.searchsorted(kn, xs, side="right") - 1, 0, d - 1)
            width = jnp.maximum(kn[idx + 1] - kn[idx], 1e-8)
            inside = (xs >= kn[0]) & (xs <= kn[-1])
            lp_core = jnp.where(inside, -jnp.log(d * width), -1e30)
            lp_tail = -jnp.log(2.0 * b_e) - jnp.abs(xs - mu_e) / b_e
            return jnp.logaddexp(
                jnp.log1p(-pi_e) + lp_core, jnp.log(pi_e) + lp_tail
            )

        return jax.vmap(per_example)(
            knots, x.reshape(n, -1), mu[:, 0], b[:, 0], pi[:, 0]
        ).reshape(x.shape)


class PixelWiseISOProxy(nn.Module):
    """``pw_iso_2stage``: physics shot + learned pixel/row dark-noise proxies."""

    iso2k: Sequence[float] = (0.0009546, -0.00193)
    nf: int = 16
    nb: int = 2
    d: int = 1024
    mode: str = "2stage+iso"
    wp: float = 16383.0
    bl: float = 512.0
    # Per-pixel PWL lookup implementation for sample(): 'dot' (two-hot MXU
    # matmul, QuantileHead.quantile_dot) or 'gather' (take_along_axis) —
    # identical distribution to bf16 knot rounding. Measured on v5e at the
    # recipe shape (8x256x256x4, tools/profile_proxy_synth.py): the gather
    # lowers to a ~34 ms scalar loop regardless of d; the dot form runs the
    # whole sample in 6.7-7.4 ms (d=256/1024) — 5.3-5.7x. The row stage
    # always uses 'gather' (one draw per (row, channel) is tiny).
    lookup: str = "dot"
    # Gaussian smoothing (ADU) of the PIXEL stage's modeled law: the pixel
    # head represents (PWL+Laplace mixture) convolved with N(0, smooth_s0) —
    # NLL through log_prob_conv_gaussian, sampling adds the matching normal.
    # This is the fix for the round-4 full-noise KLD plateau (~0.013,
    # 20-100x above the sampling floor, flat in steps and d): the raw PWL
    # log_prob is a density CLIFF at the learned support edge, so its
    # autodiff gradient w.r.t. log_scale is structurally biased (+~1 per
    # in-core sample; the cost of samples falling off the edge is invisible
    # to autodiff through the discrete bin assignment) — measured as a
    # monotone NLL INCREASE under Adam from a near-optimal quantile
    # construction (tools/oracle_proxy_family.py). Convolving with a small
    # Gaussian makes the edge gradient exact while staying in-family and
    # exactly consistent between loss and sampling; 0.3 ADU is invisible
    # under the integer-ADU KLD binning. The ROW stage already trains
    # through the convolved likelihood (contamination deconvolution) and
    # reached its sampling floor in round 3 — the measured contrast that
    # pinned this diagnosis. 0.0 restores the raw (cliff-gradient) NLL.
    smooth_s0: float = 0.3
    # Row-deconvolution contamination variance source: 'model' (the pixel
    # head's closed-form variance + s0^2, stop-grad, EM-style) or
    # 'empirical' (the batch's weighted mean resid^2, stop-grad) — the
    # latter removes the circular dependence on the pixel fit (a biased
    # model variance over/under-deconvolves the row law, and an UNDER-
    # dispersed row law is the catastrophic direction downstream: the
    # denoiser never learns to remove real-strength banding).
    contam: str = "model"
    # ISO-curvature smoothness penalty (opt-in, weight 0 = off): the exact
    # per-ISO fits the smooth_s0 likelihood reaches leave the conditioning
    # MLP free to sag BETWEEN ladder anchors — measured on the SonyA7S2
    # 4-ISO ladder (tools/diagnose_proxy_fit.py): held-out 6400 pixel
    # variance 0.65-0.85x true, row std 0.80-0.89x, tails 2-4x light, while
    # every trained ISO sits at 0.98-1.04x. Under-dispersed interpolation is
    # the catastrophic direction downstream (the denoiser never sees
    # real-strength noise at interpolated ISOs). The penalty is the mean
    # squared second difference of each head's RAW MLP output along a
    # uniform log-ISO grid (heights-logits mean-centered first — softmax
    # gauge), pushing the conditioning toward log-linear interpolation
    # between anchors (log-linear lands the 6400 variance ~10% OVER — the
    # benign side). Grid must be uniform in log-ISO; default spans the Sony
    # trained ladder at half-octave spacing.
    smooth_iso_w: float = 0.0
    smooth_iso_grid: Sequence[float] = (
        800.0, 1131.4, 1600.0, 2262.7, 3200.0, 4525.5, 6400.0, 9050.9,
        12800.0)
    # Zero-mean constraint on both heads (QuantileHead.center): dark read
    # noise after black subtraction is zero-mean by physics; ML alone lets
    # the location drift ~0.5 ADU at high ISO (invisible to NLL and KLD,
    # catastrophic after ratio amplification — see center()'s docstring).
    # Default ON; opt out only for A/B forensics of the drift itself.
    zero_mean: bool = True

    def _iso_feat(self, iso: jnp.ndarray) -> jnp.ndarray:
        """Normalized ISO features: [K(iso), log-ISO] — the '+iso' conditioning."""
        iso = jnp.atleast_1d(jnp.asarray(iso, jnp.float32))
        k = self.iso2k[0] * iso + self.iso2k[1]
        if "iso" in self.mode:
            return jnp.stack([k, jnp.log(iso / 1600.0)], axis=-1)
        return k[:, None]

    @nn.compact
    def __call__(self, clean, iso, rng=None, mode: str = "sample",
                 weight=None):
        """mode='sample' -> noise draw; mode='loss' -> (nll, aux).

        ``weight`` (loss mode): per-pixel 0/1 (or soft) mask — fit the NLL
        only where it is set. The learned heads model signal-INDEPENDENT dark
        noise (sample() re-adds exact Poisson shot), so residuals from paired
        data must be masked to dark pixels; dark-frame data uses all-ones.
        """
        pixel_head = QuantileHead(self.d, self.nf, self.nb, name="pixel_stage")
        row_head = (
            QuantileHead(self.d, self.nf, self.nb, name="row_stage")
            if "2stage" in self.mode
            else None
        )
        feat = self._iso_feat(iso)
        n = clean.shape[0]
        feat = jnp.broadcast_to(feat, (n, feat.shape[-1]))
        # '+anchor': shift the heads' log-scales by log(K(iso)/K(1600)).
        # Opt-in, measured WORSE for held-out-ISO interpolation (see
        # QuantileHead.__call__ docstring); default mode omits it.
        log_anchor = None
        if "anchor" in self.mode:
            k1600 = self.iso2k[0] * 1600.0 + self.iso2k[1]
            log_anchor = jnp.log(feat[:, :1] / k1600)
        hp_px = pixel_head(feat, log_anchor)
        hp_row = row_head(feat, log_anchor) if row_head is not None else None
        if self.zero_mean:
            hp_px = QuantileHead.center(hp_px)
            hp_row = (QuantileHead.center(hp_row)
                      if hp_row is not None else None)

        if mode == "sample":
            if rng is None:
                rng = self.make_rng("sample")
            return self._sample(rng, clean, feat, hp_px, hp_row)
        nll, aux = self._loss(clean, iso, hp_px, hp_row, weight)
        if self.smooth_iso_w > 0:
            pen = self._iso_curvature(pixel_head, row_head)
            nll = nll + self.smooth_iso_w * pen
            aux = dict(aux, iso_curvature=pen)
        return nll, aux

    def _iso_curvature(self, pixel_head, row_head):
        """Mean-square second difference of the heads' raw outputs along the
        (uniform in log-ISO) ``smooth_iso_grid`` — see ``smooth_iso_w``."""
        grid = jnp.asarray(self.smooth_iso_grid, jnp.float32)
        feat_g = self._iso_feat(grid)

        def curv(head):
            raw = head(feat_g, return_raw=True)          # [G, d+3]
            hl = raw[:, : self.d]
            hl = hl - jnp.mean(hl, axis=-1, keepdims=True)  # softmax gauge
            y = jnp.concatenate([hl, raw[:, self.d:]], axis=-1)
            d2 = y[2:] - 2.0 * y[1:-1] + y[:-2]
            return jnp.mean(d2 ** 2)

        pen = curv(pixel_head)
        if row_head is not None:
            pen = pen + curv(row_head)
        return pen

    def _sample(self, rng, clean, feat, hp_px, hp_row):
        k_shot, k_px, k_pxc, k_row, k_rowc, k_s0 = jax.random.split(rng, 6)
        n, h, w, c = clean.shape
        span = self.wp - self.bl
        K = feat[:, 0].reshape(n, 1, 1, 1)
        clean_adu = jnp.maximum(clean, 0.0) * span
        shot = (
            poisson_sample(k_shot, clean_adu / jnp.maximum(K, 1e-6)) * K
            - clean_adu
        )
        u_px = jax.random.uniform(k_px, clean.shape, minval=1e-6, maxval=1 - 1e-6)
        c_px = jax.random.uniform(k_pxc, clean.shape)
        qfn = (QuantileHead.quantile_dot if self.lookup == "dot"
               else QuantileHead.quantile)
        read = qfn(hp_px, u_px, c_px)
        if self.smooth_s0 > 0:
            # The pixel law is (mixture conv N(0, s0)): add the matching
            # normal so sampling and the training likelihood agree exactly.
            read = read + self.smooth_s0 * jax.random.normal(k_s0, clean.shape)
        total = shot + read
        if hp_row is not None:
            u_row = jax.random.uniform(k_row, (n, h, 1, c), minval=1e-6, maxval=1 - 1e-6)
            c_row = jax.random.uniform(k_rowc, (n, h, 1, c))
            total = total + QuantileHead.quantile(hp_row, u_row, c_row)
        return total / span

    def _loss(self, noise, iso, hp_px, hp_row, weight=None):
        """NLL of observed noise (ADU) decomposed into row + pixel components.

        Row component is estimated as the per-(row, channel) (weighted) mean;
        the pixel head models the residual — matching how the physics
        pipeline calibrates sigR vs sigGs from dark frames. In 1-stage mode
        (no row head) the pixel head models the full noise: subtracting an
        unmodeled row mean would silently delete the banding component.

        The observed row mean over W pixels is contaminated by the pixel
        noise's own mean: m = r + eps, eps ~= N(0, var_px / W) by CLT — and
        at the calibrated SonyA7S2 ISOs var_px/32 is 1.2-4x var_row, so a
        row head fit directly on m learns a systematically over-dispersed
        row law (sampling then re-adds pixel noise, double-counting the
        contamination; measured as a ~0.1 row-marginal-KLD floor). The row
        NLL therefore scores m under the row mixture CONVOLVED with the
        contamination Gaussian (var_px from the pixel head's own closed-form
        variance, stop-gradient, EM-style) — the head itself learns the
        deconvolved law and sampling stays exactly consistent. The pixel
        residual's complementary bias (var deficit 1 - 1/W, shared row mean)
        gets the matching sqrt(W/(W-1)) scale correction.
        """
        span = self.wp - self.bl
        x = noise * span
        w = (jnp.ones_like(x) if weight is None
             else jnp.broadcast_to(weight.astype(x.dtype), x.shape))
        if hp_row is not None:
            wsum_row = jnp.maximum(jnp.sum(w, axis=2, keepdims=True), 1e-6)
            row_mean = jnp.sum(x * w, axis=2, keepdims=True) / wsum_row
            resid = (x - row_mean) * jnp.sqrt(
                wsum_row / jnp.maximum(wsum_row - 1.0, 1.0))
        else:
            row_mean = None
            resid = x
        if self.smooth_s0 > 0:
            # Pixel NLL through the s0-convolved likelihood: the raw PWL
            # log_prob's support edge is a density cliff whose autodiff
            # scale gradient is biased (see ``smooth_s0``); the convolved
            # form sees the edge smoothly and matches _sample's added noise.
            lp_px = QuantileHead.log_prob_conv_gaussian(
                hp_px, resid, jnp.float32(self.smooth_s0))
        else:
            lp_px = QuantileHead.log_prob(hp_px, resid)
        nll_px = -jnp.sum(lp_px * w) / jnp.maximum(jnp.sum(w), 1e-6)
        if hp_row is not None:
            n = x.shape[0]
            if self.contam == "empirical":
                # batch-empirical pixel variance: resid is already the
                # sqrt(W/(W-1))-corrected residual, so its weighted mean
                # square estimates the OBSERVED pixel-noise variance
                # directly, without trusting the pixel fit
                var_px = jax.lax.stop_gradient(
                    jnp.sum(resid ** 2 * w, axis=(1, 2, 3), keepdims=True)
                    / jnp.maximum(jnp.sum(w, axis=(1, 2, 3), keepdims=True),
                                  1.0))
            else:
                # Pixel-law variance incl. the s0 smoothing the sampler adds.
                var_px = jax.lax.stop_gradient(
                    QuantileHead.variance(hp_px)).reshape(n, 1, 1, 1
                    ) + self.smooth_s0 ** 2
            s_contam = jnp.sqrt(var_px / wsum_row)
            lp_row = QuantileHead.log_prob_conv_gaussian(
                hp_row, row_mean, s_contam)
            w_rows = jnp.mean(w, axis=2, keepdims=True)
            nll_row = -jnp.sum(lp_row * w_rows) / jnp.maximum(jnp.sum(w_rows), 1e-6)
        else:
            nll_row = 0.0
        # Weight the row term by its dimensionality share (one draw per
        # (row, channel) vs one per pixel).
        w_row = 1.0 / max(noise.shape[2], 1)
        return nll_px + w_row * nll_row, {"nll_px": nll_px, "nll_row": nll_row}

    def sample(self, clean, iso, rng=None):
        return self(clean, iso, rng=rng, mode="sample")

    def loss(self, noise, iso):
        return self(noise, iso, mode="loss")
