"""Model-family tests: torch numerical parity, converter, flow invertibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnnp_tpu.models import (
    UNetSeeInDark,
    ResUNet,
    NoiseFlow,
    PixelWiseISOProxy,
    build_model,
    torch_state_to_flax,
    flax_to_torch_state,
)


@pytest.fixture(scope="module")
def small_unet():
    model = UNetSeeInDark(nf=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 4)))
    # Rescale away from the tiny N(0, 0.02) init: parity errors (e.g. a
    # mis-mapped ConvTranspose tap) must not vanish below tolerance.
    params = jax.tree.map(lambda a: a * 5.0, params)
    return model, params


def test_unet_shapes(small_unet):
    model, params = small_unet
    x = jnp.ones((2, 32, 32, 4))
    y = model.apply(params, x)
    assert y.shape == (2, 32, 32, 4)


def test_unet_torch_parity(small_unet):
    """Exact forward parity against a torch-functional oracle of the SID UNet.

    Builds the same graph with torch.nn.functional ops from our converted
    weights — validating both the architecture semantics and the torch->flax
    weight mapping (incl. ConvTranspose kernel layout).
    """
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    model, params = small_unet
    state = flax_to_torch_state(params["params"])
    t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}

    x = np.random.default_rng(0).standard_normal((1, 16, 16, 4)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    def conv(h, name):
        return F.leaky_relu(F.conv2d(h, t[f"{name}.weight"], t[f"{name}.bias"], padding=1), 0.2)

    def up(h, name):
        return F.conv_transpose2d(h, t[f"{name}.weight"], t[f"{name}.bias"], stride=2)

    h1 = conv(conv(xt, "conv1_1"), "conv1_2")
    p1 = F.max_pool2d(h1, 2)
    h2 = conv(conv(p1, "conv2_1"), "conv2_2")
    p2 = F.max_pool2d(h2, 2)
    h3 = conv(conv(p2, "conv3_1"), "conv3_2")
    p3 = F.max_pool2d(h3, 2)
    h4 = conv(conv(p3, "conv4_1"), "conv4_2")
    p4 = F.max_pool2d(h4, 2)
    h5 = conv(conv(p4, "conv5_1"), "conv5_2")
    u6 = torch.cat([up(h5, "upv6"), h4], 1)
    h6 = conv(conv(u6, "conv6_1"), "conv6_2")
    u7 = torch.cat([up(h6, "upv7"), h3], 1)
    h7 = conv(conv(u7, "conv7_1"), "conv7_2")
    u8 = torch.cat([up(h7, "upv8"), h2], 1)
    h8 = conv(conv(u8, "conv8_1"), "conv8_2")
    u9 = torch.cat([up(h8, "upv9"), h1], 1)
    h9 = conv(conv(u9, "conv9_1"), "conv9_2")
    out_t = F.conv2d(h9, t["conv10_1.weight"], t["conv10_1.bias"]).numpy().transpose(0, 2, 3, 1)

    out_j = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-5)


def test_torch_roundtrip_conversion(small_unet):
    model, params = small_unet
    state = flax_to_torch_state(params["params"])
    back = torch_state_to_flax(state)
    flat_a = jax.tree_util.tree_leaves(params["params"])
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_registry_builds():
    m = build_model({"name": "UNetSeeInDark", "in_nc": 4, "out_nc": 4, "nf": 8, "res": False})
    assert isinstance(m, UNetSeeInDark)
    m2 = build_model({"name": "ResUnet", "nf": 8})
    assert isinstance(m2, ResUNet)


def test_resunet_forward():
    model = ResUNet(nf=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 4)))
    y = model.apply(params, jnp.ones((1, 16, 16, 4)))
    assert y.shape == (1, 16, 16, 4)


def test_noise_flow_invertible_and_nll():
    nf = NoiseFlow(x_shape=(8, 8, 4), arch="sdn|unc|giso|unc")
    rng = jax.random.key(0)
    noise = 0.01 * jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    clean = jnp.full((2, 8, 8, 4), 0.02)
    iso = jnp.float32(1600.0)
    variables = nf.init(rng, noise, clean=clean, iso=iso)

    z, ldj = nf.apply(variables, noise, clean=clean, iso=iso, method=nf.forward)
    back = nf.apply(variables, z, clean=clean, iso=iso, method=nf.inverse)
    np.testing.assert_allclose(np.asarray(back), np.asarray(noise), rtol=1e-3, atol=1e-5)

    nll, sd_z = nf.apply(variables, noise, clean=clean, iso=iso, method=nf.loss)
    assert np.isfinite(float(nll)) and float(sd_z) > 0

    sample = nf.apply(
        variables, jax.random.key(2), clean=clean, iso=iso, method=nf.sample
    )
    assert sample.shape == clean.shape and np.isfinite(np.asarray(sample)).all()


def test_conv1x1_ldj_matches_slogdet():
    from pnnp_tpu.models.flows import InvertibleConv1x1

    layer = InvertibleConv1x1(num_channels=4)
    x = jax.random.normal(jax.random.key(3), (2, 6, 6, 4))
    v = layer.init(jax.random.key(4), x, method=layer.forward_ldj)
    z, ldj = layer.apply(v, x, method=layer.forward_ldj)
    lu = v["params"]["lu"]
    w = np.asarray(lu["p"]) @ (np.tril(np.asarray(lu["l"]), -1) + np.eye(4)) @ (
        np.triu(np.asarray(lu["u"]), 1)
        + np.diag(np.asarray(lu["sign_s"]) * np.exp(np.asarray(lu["log_s"])))
    )
    expected = np.linalg.slogdet(w)[1] * 36
    np.testing.assert_allclose(np.asarray(ldj), expected, atol=1e-3)
    # invertibility
    back = layer.apply(v, z, method=layer.inverse)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-3, atol=1e-5)


def test_proxy_sample_and_loss():
    proxy = PixelWiseISOProxy(d=64, nf=8, nb=2)
    clean = jnp.full((2, 16, 16, 4), 0.01)
    iso = jnp.full((2,), 1600.0)
    variables = proxy.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, clean, iso
    )
    noise = proxy.apply(
        variables, clean, iso, rngs={"sample": jax.random.key(2)}, mode="sample"
    )
    assert noise.shape == clean.shape
    assert np.isfinite(np.asarray(noise)).all()
    # noise roughly zero-mean at sample level
    assert abs(float(jnp.mean(noise))) < 0.01

    nll, aux = proxy.apply(variables, noise, iso, mode="loss")
    assert np.isfinite(float(nll))


def test_proxy_zero_mean_centering():
    """QuantileHead.center zeroes the mixture mean exactly (the mean is
    linear in the knots), and the default proxy samples a zero-mean law —
    the round-5 physics constraint: ML leaves ~0.5 ADU location drift at
    high ISO that ratio amplification turns into a -4.5 dB A/B failure."""
    from pnnp_tpu.models.proxy import HeadParams, QuantileHead

    # deliberately asymmetric head: support [-3, +9], heavy off-center tail
    knots = jnp.linspace(-3.0, 9.0, 33)[None, :]
    hp = HeadParams(knots, jnp.log(jnp.array([[6.0]])),
                    jnp.array([[0.4]]), jnp.array([[2.0]]))
    m0 = float(QuantileHead.mean(hp)[0, 0])
    assert abs(m0) > 1.0  # the raw law really is off-center
    hc = QuantileHead.center(hp)
    assert abs(float(QuantileHead.mean(hc)[0, 0])) < 1e-5
    # variance is shift-invariant
    assert np.isclose(float(QuantileHead.variance(hc)[0, 0]),
                      float(QuantileHead.variance(hp)[0, 0]), rtol=1e-5)
    # sampled mean agrees with the closed form (centering is the SAMPLED law)
    u = jax.random.uniform(jax.random.key(0), (1, 200_000),
                           minval=1e-6, maxval=1 - 1e-6)
    c = jax.random.uniform(jax.random.key(1), (1, 200_000))
    draw = QuantileHead.quantile(hc, u, c)
    assert abs(float(jnp.mean(draw))) < 0.05  # MC err ~ sigma/sqrt(N)

    # the default proxy (zero_mean=True) emits zero-mean read noise; the
    # opt-out reproduces whatever the raw heads say
    proxy = PixelWiseISOProxy(d=32, nf=8, nb=2)
    clean = jnp.zeros((2, 32, 32, 4))
    iso = jnp.full((2,), 12800.0)
    v = proxy.init({"params": jax.random.key(3), "sample": jax.random.key(4)},
                   clean, iso)
    noise = proxy.apply(v, clean, iso, rngs={"sample": jax.random.key(5)},
                        mode="sample")
    span = proxy.wp - proxy.bl
    assert abs(float(jnp.mean(noise)) * span) < 0.15  # ADU; MC-limited
    nll, _ = proxy.apply(v, noise, iso, mode="loss")
    assert np.isfinite(float(nll))


def test_proxy_iso_curvature_penalty():
    """smooth_iso_w: zero for ISO-constant conditioning (zeroed MLP), >0 on
    a random init, differentiable, and reported in aux."""
    kw = dict(d=32, nf=8, nb=2)
    proxy = PixelWiseISOProxy(**kw, smooth_iso_w=1.0)
    clean = jnp.full((2, 8, 8, 4), 0.01)
    iso = jnp.full((2,), 1600.0)
    variables = proxy.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, clean, iso
    )
    noise = proxy.apply(
        variables, clean, iso, rngs={"sample": jax.random.key(2)}, mode="sample"
    )
    nll, aux = proxy.apply(variables, noise, iso, mode="loss")
    pen = float(aux["iso_curvature"])
    assert np.isfinite(float(nll)) and pen > 0.0

    # zero every MLP kernel: raw = bias, constant across the ISO grid, so
    # the curvature must vanish exactly (softmax-gauge centering included)
    import jax as _jax

    flat = variables["params"]
    zeroed = _jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.zeros_like(x)
        if any(getattr(p, "key", None) == "kernel" for p in path) else x,
        flat)
    _, aux0 = proxy.apply({"params": zeroed}, noise, iso, mode="loss")
    assert float(aux0["iso_curvature"]) == 0.0

    # the penalty is trainable: its gradient w.r.t. params is finite
    def loss_fn(p):
        nll_, _ = proxy.apply({"params": p}, noise, iso, mode="loss")
        return nll_

    g = _jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in _jax.tree.leaves(g))

    # baseline (weight 0) reports no penalty key and a matching base NLL
    base = PixelWiseISOProxy(**kw)
    nll_b, aux_b = base.apply(variables, noise, iso, mode="loss")
    assert "iso_curvature" not in aux_b
    assert abs(float(nll) - proxy.smooth_iso_w * pen - float(nll_b)) < 1e-5


def test_proxy_anchor_mode_scales_with_iso():
    """'+anchor' shifts the heads' log-scales by log(K(iso)/K(1600)): at
    init the dark-noise draw spread must grow with ISO (the physics prior),
    and the loss path must stay finite. Without the anchor the init heads
    are ISO-constant."""
    kw = dict(d=64, nf=8, nb=2)
    clean = jnp.zeros((2, 16, 16, 4))
    iso = jnp.asarray([800.0, 12800.0])
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}

    anchored = PixelWiseISOProxy(**kw, mode="2stage+iso+anchor")
    av = anchored.init(rngs, clean, iso)
    s = anchored.apply(av, clean, iso, rngs={"sample": jax.random.key(2)},
                       mode="sample")
    lo, hi = float(jnp.std(s[0])), float(jnp.std(s[1]))
    assert np.isfinite([lo, hi]).all()
    # K(12800)/K(800) ~ 16.1 — require a decisive spread ratio at init
    assert hi > 4.0 * lo, (lo, hi)

    nll, _ = anchored.apply(av, s, iso, mode="loss")
    assert np.isfinite(float(nll))

    plain = PixelWiseISOProxy(**kw)
    pv = plain.init(rngs, clean, iso)
    sp = plain.apply(pv, clean, iso, rngs={"sample": jax.random.key(2)},
                     mode="sample")
    r = float(jnp.std(sp[1])) / max(float(jnp.std(sp[0])), 1e-12)
    assert r < 4.0, r  # un-anchored init heads are near ISO-constant


def test_quantile_dot_matches_gather():
    """quantile_dot (two-hot MXU lookup) == quantile to bf16 knot rounding,
    with and without the Laplace tail, on trained-shaped heads."""
    from pnnp_tpu.models.proxy import QuantileHead

    proxy = PixelWiseISOProxy(d=96, nf=8, nb=2)
    clean = jnp.full((3, 8, 8, 4), 0.01)
    iso = jnp.full((3,), 1600.0)
    variables = proxy.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, clean, iso
    )
    feat = jnp.stack([0.0009546 * iso - 0.00193, jnp.log(iso / 1600.0)], -1)
    hp = QuantileHead(96, 8, 2).apply(
        {"params": variables["params"]["pixel_stage"]}, feat)
    u = jax.random.uniform(jax.random.key(2), (3, 8, 8, 4), minval=1e-6,
                           maxval=1 - 1e-6)
    c = jax.random.uniform(jax.random.key(3), (3, 8, 8, 4))
    scale = float(jnp.max(jnp.abs(hp.knots))) + 1e-9
    for ch in (None, c):
        g = QuantileHead.quantile(hp, u, ch)
        d_ = QuantileHead.quantile_dot(hp, u, ch)
        np.testing.assert_allclose(np.asarray(d_), np.asarray(g),
                                   atol=3e-3 * scale)


def test_proxy_lookup_dot_sample_matches_gather():
    """The lookup='dot' module samples the same noise as 'gather' under the
    same rng (to bf16 knot rounding) — the opt-in is drop-in."""
    kw = dict(d=96, nf=8, nb=2)
    pg = PixelWiseISOProxy(**kw)
    pd = PixelWiseISOProxy(**kw, lookup="dot")
    clean = jnp.full((2, 16, 16, 4), 0.02)
    iso = jnp.full((2,), 3200.0)
    variables = pg.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, clean, iso
    )
    ng = pg.apply(variables, clean, iso, rngs={"sample": jax.random.key(7)},
                  mode="sample")
    nd = pd.apply(variables, clean, iso, rngs={"sample": jax.random.key(7)},
                  mode="sample")
    scale = float(jnp.max(jnp.abs(ng))) + 1e-9
    np.testing.assert_allclose(np.asarray(nd), np.asarray(ng),
                               atol=3e-3 * scale)


def test_torch_pth_checkpoint_roundtrip(tmp_path, small_unet):
    """Save flax params as a torch .pth; load through load_any; outputs match."""
    torch = pytest.importorskip("torch")
    from pnnp_tpu.train.checkpoint import load_any

    model, params = small_unet
    state = flax_to_torch_state(params["params"])
    pth = str(tmp_path / "model.pth")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}, pth)

    loaded = load_any(pth)
    x = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (1, 16, 16, 4)).astype(np.float32))
    ref = model.apply(params, x)
    out = model.apply({"params": jax.tree.map(jnp.asarray, loaded["params"])}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_eld_checkpoint_format(tmp_path, small_unet):
    torch = pytest.importorskip("torch")
    from pnnp_tpu.models import eld_checkpoint_to_flax

    model, params = small_unet
    state = flax_to_torch_state(params["params"])
    pth = str(tmp_path / "eld.pt")
    torch.save({"netG": {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in state.items()}}, pth)
    loaded = eld_checkpoint_to_flax(pth)
    for a, b in zip(jax.tree.leaves(params["params"]), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_convert_linear_bn_and_roundtrip():
    """Linear weights transpose ([out,in] -> [in,out]), BatchNorm maps to
    scale/bias + batch_stats, and the flax->torch export restores both
    (regression: BN keys crashed, Linear landed transposed, scale dropped)."""
    import numpy as np
    from pnnp_tpu.models.convert import (
        flax_to_torch_state, torch_state_to_flax_full)

    rng = np.random.default_rng(0)
    sd = {
        "fc.weight": rng.standard_normal((6, 3)).astype(np.float32),
        "fc.bias": rng.standard_normal(6).astype(np.float32),
        "bn.weight": rng.standard_normal(4).astype(np.float32),
        "bn.bias": rng.standard_normal(4).astype(np.float32),
        "bn.running_mean": rng.standard_normal(4).astype(np.float32),
        "bn.running_var": rng.random(4).astype(np.float32),
        "bn.num_batches_tracked": np.asarray(7),
        "conv.weight": rng.standard_normal((5, 3, 3, 3)).astype(np.float32),
        "conv.bias": rng.standard_normal(5).astype(np.float32),
    }
    params, stats = torch_state_to_flax_full(sd)
    assert params["fc"]["kernel"].shape == (3, 6)
    np.testing.assert_array_equal(params["fc"]["kernel"], sd["fc.weight"].T)
    np.testing.assert_array_equal(params["bn"]["scale"], sd["bn.weight"])
    np.testing.assert_array_equal(stats["bn"]["mean"], sd["bn.running_mean"])
    np.testing.assert_array_equal(stats["bn"]["var"], sd["bn.running_var"])
    assert params["conv"]["kernel"].shape == (3, 3, 3, 5)

    back = flax_to_torch_state(params)
    for k in ("fc.weight", "fc.bias", "bn.weight", "bn.bias",
              "conv.weight", "conv.bias"):
        np.testing.assert_allclose(back[k], sd[k], rtol=1e-6)


def test_checkpoint_best_psnr_survives_resume(tmp_path):
    """restore() recovers the best-PSNR watermark from the best checkpoint's
    meta, so a resumed run's first (worse) eval can't clobber the best
    weights (regression: best_psnr reset to -inf on every restart)."""
    import numpy as np
    from pnnp_tpu.train.checkpoint import CheckpointManager

    params_best = {"w": np.full(3, 1.0, np.float32)}
    params_worse = {"w": np.full(3, 2.0, np.float32)}
    m1 = CheckpointManager(str(tmp_path / "fast"), str(tmp_path / "slow"), "M")
    assert m1.save(1, params_best, None, eval_psnr=35.0)

    m2 = CheckpointManager(str(tmp_path / "fast"), str(tmp_path / "slow"), "M")
    m2.restore("last")
    assert m2.best_psnr == 35.0
    assert not m2.save(2, params_worse, None, eval_psnr=30.0)
    import pickle

    with open(m2.best_path(), "rb") as f:
        best = pickle.load(f)
    np.testing.assert_array_equal(best["params"]["w"], params_best["w"])


def test_pixel_shuffle_matches_torch():
    """pixel_(un)shuffle must use torch's C-major channel order so converted
    torch.PixelShuffle checkpoints stay spatially coherent (regression: the
    r-major reshape scrambled 2x2 superpixels)."""
    import os

    os.environ.setdefault("OMP_NUM_THREADS", "1")
    import numpy as np
    import torch
    import jax.numpy as jnp

    from pnnp_tpu.models.blocks import pixel_shuffle, pixel_unshuffle

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 6, 12)).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    ref = torch.pixel_shuffle(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours, ref)

    y = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    ours_u = np.asarray(pixel_unshuffle(jnp.asarray(y), 2))
    ref_u = torch.pixel_unshuffle(
        torch.from_numpy(y.transpose(0, 3, 1, 2)), 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours_u, ref_u)


def test_quantile_head_variance_closed_form():
    """QuantileHead.variance matches Monte-Carlo over the full mixture."""
    from pnnp_tpu.models.proxy import HeadParams, QuantileHead

    d = 64
    # non-uniform monotone knots + a real tail share
    heights = np.linspace(1.0, 3.0, d)
    cum = np.concatenate([[0.0], np.cumsum(heights / heights.sum())])
    knots = jnp.asarray(4.0 * (2.0 * cum - 1.0))[None, :]
    hp = HeadParams(knots, jnp.log(jnp.full((1, 1), 4.0)),
                    jnp.full((1, 1), 0.08), jnp.full((1, 1), 3.0))
    u = jax.random.uniform(jax.random.key(0), (1, 400000),
                           minval=1e-6, maxval=1 - 1e-6)
    c = jax.random.uniform(jax.random.key(1), (1, 400000))
    mc = float(jnp.var(QuantileHead.quantile(hp, u, c)))
    closed = float(QuantileHead.variance(hp)[0, 0])
    assert abs(closed - mc) / mc < 0.05, (closed, mc)


def test_log_prob_conv_gaussian_exact():
    """Closed-form Gaussian-convolved density: s->0 limit + analytic check."""
    from scipy.stats import norm

    from pnnp_tpu.models.proxy import HeadParams, QuantileHead

    d = 64
    a, s, b, pi = 3.0, 0.8, 2.0, 1e-5
    knots = jnp.linspace(-a, a, d + 1)[None, :]  # uniform core on [-a, a]
    hp = HeadParams(knots, jnp.log(jnp.full((1, 1), a)),
                    jnp.full((1, 1), pi), jnp.full((1, 1), b))

    x = jnp.asarray([[-2.5, -1.0, 0.0, 1.7, 2.9]])
    np.testing.assert_allclose(
        np.asarray(QuantileHead.log_prob_conv_gaussian(hp, x, jnp.asarray(1e-9))),
        np.asarray(QuantileHead.log_prob(hp, x)), atol=1e-4)

    # uniform ⊛ N(0, s²) has the closed form (Φ((a−x)/s) − Φ((−a−x)/s)) / 2a;
    # at pi=1e-5 the tail term only matters far outside the support
    xs = np.array([[-3.5, -2.0, 0.0, 2.0, 2.9, 3.5]])
    got = np.asarray(QuantileHead.log_prob_conv_gaussian(
        hp, jnp.asarray(xs), jnp.asarray(s)))
    want = np.log(
        (1 - pi) * (norm.cdf((a - xs) / s) - norm.cdf((-a - xs) / s)) / (2 * a)
        + pi * np.exp(-np.abs(xs) / b) / (2 * b))
    np.testing.assert_allclose(got, want, atol=5e-3)

    # gradient path (row-head training) stays finite, incl. huge-s rows
    def f(kn):
        hp2 = HeadParams(kn, hp.log_scale, hp.tail_pi, hp.tail_b)
        return jnp.sum(QuantileHead.log_prob_conv_gaussian(hp2, x, jnp.asarray(0.7)))

    assert bool(jnp.all(jnp.isfinite(jax.grad(f)(knots))))
    assert bool(jnp.all(jnp.isfinite(
        QuantileHead.log_prob_conv_gaussian(hp, x, jnp.asarray(4000.0)))))


def test_proxy_row_loss_deconvolves_contamination():
    """The row NLL must favor the TRUE row law over the contaminated one.

    Build synthetic frames x = r + p with known Gaussian row/pixel stds where
    the pixel-mean contamination var_px/W exceeds var_row (the SonyA7S2
    regime, see _loss docstring). The deconvolved loss evaluated with the
    row head pinned near the TRUE row scale must beat the same head pinned
    at the contaminated scale sqrt(var_row + var_px/W) — the pre-fix
    optimum.
    """
    from pnnp_tpu.models.proxy import HeadParams, PixelWiseISOProxy, QuantileHead

    rng = np.random.default_rng(0)
    n, h, w, c = 4, 64, 32, 4
    sig_row, sig_px = 1.0, 8.0
    span = 16383.0 - 512.0
    r = rng.normal(0, sig_row, (n, h, 1, c))
    x = (r + rng.normal(0, sig_px, (n, h, w, c))).astype(np.float32) / span

    proxy = PixelWiseISOProxy(d=128, nf=8, nb=1)
    pvars = proxy.init({"params": jax.random.key(0), "sample": jax.random.key(1)},
                       jnp.zeros((1, h, w, 4)), jnp.full((1,), 1600.0))

    def gauss_head_knots(sig, d=128):
        # PWL quantile of N(0, sig) on d uniform bins (clipped tails)
        from scipy.stats import norm as snorm
        u = np.linspace(1e-4, 1 - 1e-4, d + 1)
        return jnp.asarray(snorm.ppf(u) * sig, jnp.float32)[None, :]

    def row_nll_with_scale(sig):
        # pin both heads analytically: pixel head at sig_px, row head at sig
        hp_px = HeadParams(jnp.tile(gauss_head_knots(sig_px), (n, 1)),
                           jnp.zeros((n, 1)), jnp.full((n, 1), 1e-4),
                           jnp.full((n, 1), 5.0))
        hp_row = HeadParams(jnp.tile(gauss_head_knots(sig), (n, 1)),
                            jnp.zeros((n, 1)), jnp.full((n, 1), 1e-4),
                            jnp.full((n, 1), 5.0))
        bound = proxy.bind(pvars)
        _, aux = bound._loss(jnp.asarray(x), jnp.full((n,), 1600.0),
                             hp_px, hp_row)
        return float(aux["nll_row"])

    sig_contaminated = float(np.sqrt(sig_row ** 2 + sig_px ** 2 / w))
    assert row_nll_with_scale(sig_row) < row_nll_with_scale(sig_contaminated), (
        row_nll_with_scale(sig_row), row_nll_with_scale(sig_contaminated))
