"""Numerical parity of the eval pipeline + multi-device consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import uniform_filter

from pnnp_tpu.models import UNetSeeInDark
from pnnp_tpu.ops import illuminance_correct, psnr, ssim
from pnnp_tpu.train import create_train_state, make_eval_step


def oracle_ssim(x, y, data_range=255.0, win=7):
    n = win * win
    cov_norm = n / (n - 1)
    total = 0.0
    for c in range(x.shape[-1]):
        xc, yc = x[..., c].astype(np.float64), y[..., c].astype(np.float64)
        f = lambda im: uniform_filter(im, size=win)
        ux, uy = f(xc), f(yc)
        vx = cov_norm * (f(xc * xc) - ux * ux)
        vy = cov_norm * (f(yc * yc) - uy * uy)
        vxy = cov_norm * (f(xc * yc) - ux * uy)
        c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
        pad = (win - 1) // 2
        total += s[pad:-pad, pad:-pad].mean()
    return total / x.shape[-1]


def test_eval_pipeline_matches_numpy_oracle(rng):
    """pad-to-16 -> UNet -> clamp -> illuminance correct -> PSNR/SSIM, device
    vs a NumPy re-derivation (the reference's eval semantics,
    trainer_SID.py:221-248)."""
    model = UNetSeeInDark(nf=4)
    state = create_train_state(jax.random.key(0), model, jnp.zeros((1, 16, 16, 4)))
    es = make_eval_step(model)

    lr = rng.uniform(0, 1, (1, 30, 44, 4)).astype(np.float32)
    hr = rng.uniform(0, 1, (1, 30, 44, 4)).astype(np.float32)

    dn = es(state, jnp.asarray(lr))
    dn = jnp.clip(dn, 0, 1)
    dn = illuminance_correct(dn, jnp.asarray(hr))
    p = float(psnr(dn[0] * 255.0, jnp.asarray(hr[0]) * 255.0))
    s = float(ssim(dn[0] * 255.0, jnp.asarray(hr[0]) * 255.0))

    # numpy oracle of the same post-processing on the same network output
    dn_np = np.asarray(es(state, jnp.asarray(lr)))
    dn_np = np.clip(dn_np, 0, 1)
    mask = hr[0] != 1
    num = np.dot(dn_np[0][mask], hr[0][mask])
    den = np.dot(dn_np[0][mask], dn_np[0][mask])
    corr = num / den * dn_np[0]
    mse = np.mean((corr * 255.0 - hr[0] * 255.0) ** 2)
    p_ref = 10 * np.log10(255.0**2 / mse)
    s_ref = oracle_ssim(corr * 255.0, hr[0] * 255.0)

    assert abs(p - p_ref) < 1e-3, (p, p_ref)
    assert abs(s - s_ref) < 1e-4, (s, s_ref)


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    """Data-parallel train step over the 8-device mesh computes the same
    update as single-device (same key, same batch)."""
    from pnnp_tpu.parallel import make_mesh, shard_batch
    from pnnp_tpu.train import build_lr_schedule, make_train_step, make_raw_synth
    from jax.sharding import NamedSharding, PartitionSpec as P

    model = UNetSeeInDark(nf=4)
    lr_schedule = build_lr_schedule(
        {"lr_scheduler": "fixed", "learning_rate": 1e-3, "stop_epoch": 10, "last_epoch": 0}
    )
    synth = make_raw_synth("SonyA7S2", "p", ori=False, clip=False)
    step = make_train_step(model, lr_schedule, synth, clip_mode=2, donate=False)

    hr = np.random.default_rng(0).uniform(0, 0.05, (8, 16, 16, 4)).astype(np.float32)
    batch = {"hr": jnp.asarray(hr)}
    key = jax.random.key(42)

    state1 = create_train_state(jax.random.key(0), model, jnp.zeros((1, 16, 16, 4)))
    state1, m1 = step(state1, batch, key, 1)

    mesh = make_mesh(n_data=8, n_spatial=1)
    state2 = create_train_state(jax.random.key(0), model, jnp.zeros((1, 16, 16, 4)))
    state2 = jax.device_put(state2, NamedSharding(mesh, P()))
    sharded = shard_batch(mesh, {"hr": hr})
    state2, m2 = step(state2, sharded, key, 1)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    a = jax.tree.leaves(state1.params)
    b = jax.tree.leaves(state2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fast_train_step_grads_match():
    """Gradients through the dense-s2d training path equal the standard path
    (f32; the transform is exact and linear in the weights)."""
    from pnnp_tpu.train import build_lr_schedule, make_train_step

    model = UNetSeeInDark(nf=4)
    lr_schedule = build_lr_schedule(
        {"lr_scheduler": "fixed", "learning_rate": 1e-3, "stop_epoch": 10, "last_epoch": 0}
    )
    hr = np.random.default_rng(1).uniform(0, 0.5, (2, 16, 16, 4)).astype(np.float32)
    lr_img = np.clip(hr + np.random.default_rng(2).normal(0, 0.05, hr.shape), 0, 1).astype(np.float32)
    batch = {"hr": jnp.asarray(hr), "lr": jnp.asarray(lr_img), "ratio": jnp.ones(2)}
    key = jax.random.key(3)

    def run(fast):
        from pnnp_tpu.train.steps import identity_synth

        step = make_train_step(model, lr_schedule, identity_synth,
                               clip_mode=0, donate=False, fast=fast)
        state = create_train_state(jax.random.key(0), model, jnp.zeros((1, 16, 16, 4)))
        state, m = step(state, batch, key, 1)
        return state, float(m["loss"])

    s1, l1 = run(False)
    # fast path in bf16: losses should agree to bf16 precision
    s2, l2 = run(True)
    assert abs(l1 - l2) < 2e-3, (l1, l2)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


@pytest.mark.slow
def test_packed_train_step_matches_fast():
    """fast="packed" (relayout-free, loss in packed space) must produce the
    SAME params and loss as fast=True — the layouts are permutations and
    forward math is identical bf16."""
    from pnnp_tpu.models.unet_s2d import s2d
    from pnnp_tpu.train import build_lr_schedule, make_train_step
    from pnnp_tpu.train.steps import identity_synth

    model = UNetSeeInDark(nf=4)
    lr_schedule = build_lr_schedule(
        {"lr_scheduler": "fixed", "learning_rate": 1e-3, "stop_epoch": 10, "last_epoch": 0}
    )
    hr = np.random.default_rng(1).uniform(0, 0.5, (2, 16, 16, 4)).astype(np.float32)
    lr_img = np.clip(hr + np.random.default_rng(2).normal(0, 0.05, hr.shape), 0, 1).astype(np.float32)
    key = jax.random.key(3)

    def run(fast, batch):
        step = make_train_step(model, lr_schedule, identity_synth,
                               clip_mode=0, donate=False, fast=fast)
        state = create_train_state(jax.random.key(0), model, jnp.zeros((1, 16, 16, 4)))
        state, m = step(state, batch, key, 1)
        return state, float(m["loss"]), float(m["psnr"])

    batch_u = {"hr": jnp.asarray(hr), "lr": jnp.asarray(lr_img), "ratio": jnp.ones(2)}
    batch_p = {"hr": s2d(batch_u["hr"]), "lr": s2d(batch_u["lr"]), "ratio": jnp.ones(2)}
    s1, l1, p1 = run(True, batch_u)
    s2, l2, p2 = run("packed", batch_p)
    assert abs(l1 - l2) < 1e-5, (l1, l2)
    assert abs(p1 - p2) < 1e-3, (p1, p2)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_packed_raw_synth_shapes_and_stats():
    from pnnp_tpu.train.steps import make_raw_synth, make_raw_synth_packed

    hr = jnp.asarray(
        np.random.default_rng(0).uniform(0, 0.01, (2, 32, 32, 4)).astype(np.float32)
    )
    synth_p = make_raw_synth_packed("SonyA7S2", "pgrq", ori=False, clip=False)
    lr_p, hr_p, ratio = synth_p(jax.random.key(5), {"hr": hr})
    assert lr_p.shape == hr_p.shape == (2, 16, 16, 16)
    synth_u = make_raw_synth("SonyA7S2", "pgrq", ori=False, clip=False)
    lr_u, _, _ = synth_u(jax.random.key(5), {"hr": hr})
    # same params key -> same ratio; distributions agree in moments
    assert abs(float(lr_p.mean()) - float(lr_u.mean())) < 0.02
    assert abs(float(lr_p.std()) / float(lr_u.std()) - 1.0) < 0.05


def _make_trainer(tmp_path, **kw):
    import yaml

    from pnnp_tpu.data.fixtures import make_sid_fixture, make_sid_runfile
    from pnnp_tpu.trainer import Trainer

    make_sid_fixture(tmp_path, n_scenes=4)
    runfile = make_sid_runfile(tmp_path, batch_size=4, **kw)  # x2 crops = 8
    path = str(tmp_path / "run.yml")
    with open(path, "w") as f:
        yaml.safe_dump(runfile, f)
    return Trainer(path, mode="train", nofig=True, debug=True)


@pytest.mark.slow
def test_trainer_sharded_step_matches_base(tmp_path, monkeypatch):
    """The PRODUCTION Trainer's data-parallel step (mesh-sharded batch,
    psum by XLA) computes the same update as its unsharded base step."""
    monkeypatch.chdir(tmp_path)
    from pnnp_tpu.data import DataLoader

    t = _make_trainer(tmp_path)
    assert t.n_data == 8, "conftest should expose 8 virtual devices"

    loader = DataLoader(t.dataset_train, batch_size=4, shuffle=True,
                        num_workers=0, seed=t.seed)
    loader.set_epoch(1)
    batch = next(iter(loader))
    host = {k: v for k, v in batch.items()
            if isinstance(v, np.ndarray) and v.dtype != object}
    n = len(next(iter(host.values())))
    assert n % t.n_data == 0, "test batch must split evenly for exact parity"
    key = jax.random.key(7)

    from pnnp_tpu.parallel import replicate

    s1 = jax.tree.map(jnp.array, t.state)
    s2 = replicate(t.mesh, jax.tree.map(jnp.array, t.state))
    s1, m1 = t._base_train_step(s1, {k: jnp.asarray(v) for k, v in host.items()},
                                key, 1)
    s2, m2 = t.train_step(s2, t._place_batch(host), key, 1)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # The step must apply a REAL update: the fixture previously trained at
    # lr=0 (WarmupCosine with stop_epoch=1, T=1), which made the param
    # comparison below init-vs-init and thus unfalsifiable.
    assert float(t.lr_schedule(1)) > 0
    moved = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(t.state.params))
    )
    assert moved > 0, "base step did not move the params (lr=0 fixture?)"
    # bf16 packed step: cross-device psum reduction order differs, and Adam
    # normalizes grads (g/(sqrt(v)+eps)) so a bf16-scale grad diff on a
    # near-zero-grad entry moves that param by a fraction of lr=1e-3 —
    # atol=1e-4 bounds the divergence at 10% of one Adam step per entry.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)


@pytest.mark.slow
def test_trainer_spatial_eval_matches_single_device(tmp_path, monkeypatch):
    """Trainer._forward_full (width-sharded, halo=96 >= UNet receptive field)
    equals the plain single-device eval step on a full frame."""
    monkeypatch.chdir(tmp_path)
    t = _make_trainer(tmp_path)
    nsp = t.mesh_spatial.shape["spatial"]
    frame = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (1, 32, 128 * nsp, 4)).astype(np.float32)
    )
    full = t.eval_step(t.state, frame)
    sharded = t._forward_full(frame)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(full),
                               rtol=2e-3, atol=2e-3)  # bf16 fast eval path


def test_sharded_packed_step_matches_single_device():
    """The packed production step composes with the data-parallel mesh:
    sharded result == single-device result."""
    from pnnp_tpu.parallel import make_mesh, make_sharded_train_step, shard_batch
    from pnnp_tpu.train import build_lr_schedule, make_train_step
    from pnnp_tpu.train.steps import make_raw_synth_packed

    model = UNetSeeInDark(nf=4)
    sched = build_lr_schedule(
        {"lr_scheduler": "fixed", "learning_rate": 1e-3, "stop_epoch": 10, "last_epoch": 0}
    )
    synth = make_raw_synth_packed("SonyA7S2", "prq", ori=False, clip=False)
    step = make_train_step(model, sched, synth, clip_mode=2, donate=False,
                           fast="packed")
    hr = np.random.default_rng(0).uniform(0, 0.1, (8, 16, 16, 4)).astype(np.float32)
    batch = {"hr": jnp.asarray(hr)}
    key = jax.random.key(9)

    state1 = create_train_state(jax.random.key(0), model, jnp.zeros((1, 16, 16, 4)))
    state1, m1 = step(state1, batch, key, 1)

    mesh = make_mesh(n_data=4, n_spatial=2)
    sstep = make_sharded_train_step(mesh, step)
    state2 = create_train_state(jax.random.key(0), model, jnp.zeros((1, 16, 16, 4)))
    with mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        state2 = jax.device_put(state2, NamedSharding(mesh, P()))
        state2, m2 = sstep(state2, shard_batch(mesh, batch), key, 1)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # bf16 forward/backward: cross-device psum reduction order differs from
    # the single-device reduce, so allow bf16-scale slack on the params.
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_sharded_step_tolerates_metadata_leaves():
    """make_sharded_train_step must not force P('data') onto replicated
    metadata leaves (odd-collated [3,3] ccm, rank-0 scalars) — shard_batch
    deliberately replicates those (regression: trace-time rank/divisibility
    crash on real mix-dataset batches)."""
    from pnnp_tpu.parallel import make_mesh, shard_batch
    from pnnp_tpu.parallel.mesh import make_sharded_train_step
    from pnnp_tpu.train import build_lr_schedule, make_train_step, make_raw_synth

    model = UNetSeeInDark(nf=4)
    lr_schedule = build_lr_schedule(
        {"lr_scheduler": "fixed", "learning_rate": 1e-3, "stop_epoch": 10,
         "last_epoch": 0}
    )
    synth = make_raw_synth("SonyA7S2", "p", ori=False, clip=False)
    base = make_train_step(model, lr_schedule, synth, clip_mode=2, donate=False)

    mesh = make_mesh(n_data=8, n_spatial=1)
    step = make_sharded_train_step(mesh, base)
    state = create_train_state(jax.random.key(0), model, jnp.zeros((1, 16, 16, 4)))
    from jax.sharding import NamedSharding, PartitionSpec as P
    state = jax.device_put(state, NamedSharding(mesh, P()))
    hr = np.random.default_rng(0).uniform(0, 0.05, (8, 16, 16, 4)).astype(np.float32)
    batch = shard_batch(mesh, {
        "hr": hr,
        "ccm": np.eye(3, dtype=np.float32),       # odd-collated metadata
        "iso": np.float32(1600.0),                # rank-0 scalar
    })
    state, metrics = step(state, batch, jax.random.key(1), 1)
    assert np.isfinite(float(metrics["loss"]))


def test_spatial_eval_halo_zero():
    """halo=0 runs shard-local eval (regression: '-0:' grabbed whole shards
    and the de-halo slice emptied the output)."""
    from pnnp_tpu.parallel import make_mesh
    from pnnp_tpu.parallel.mesh import spatial_eval

    mesh = make_mesh(n_data=1, n_spatial=8)
    img = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 8, 64, 4)).astype(np.float32))
    out = spatial_eval(mesh, lambda t: t * 2.0, img, halo=0)
    assert out.shape == img.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(img) * 2.0, rtol=1e-6)


def _make_nf_trainer(tmp_path, kind):
    """NFTrainer on the 8-virtual-device CPU mesh from a minimal runfile."""
    import yaml

    runfile = {
        "model_name": f"nfshard_{kind}", "mode": "train",
        "arch": {"name": "NoiseFlow", "arch": "sdn|unc|giso"},
        "arch_proxy": {"name": "pw_iso_2stage", "nf": 8, "nb": 1, "d": 32},
        "hyper": {"learning_rate": 1e-3, "lr_scheduler": "Fixed",
                  "stop_epoch": 2, "last_epoch": 0, "batch_size": 8},
        "dst": {"patch_size": 16, "wp": 16383, "bl": 512},
        "command": "",
    }
    yml = tmp_path / f"nf_{kind}.yml"
    yml.write_text(yaml.safe_dump(runfile))
    from pnnp_tpu.trainer_nf import NFTrainer

    return NFTrainer(str(yml), model_kind=kind)


@pytest.mark.parametrize("kind", ["proxy", "noise_flow"])
def test_nf_trainer_sharded_step_matches_base(tmp_path, monkeypatch, kind):
    """The NF/proxy trainers' data-parallel step (batch sharded over the
    mesh, gradient psum by XLA — the analog of the reference's DataParallel
    wrap of the NF net, trainer_NF_SID.py:82-87) computes the same update as
    the unsharded base step, and the update is real (params move)."""
    monkeypatch.chdir(tmp_path)
    t = _make_nf_trainer(tmp_path, kind)
    assert t.mesh is not None and t.mesh.shape["data"] == 8

    rng = np.random.default_rng(5)
    hr = rng.uniform(0, 0.02, (8, 16, 16, 4)).astype(np.float32)
    lr = hr + rng.normal(0, 5e-4, hr.shape).astype(np.float32)
    ratio = np.full((8,), 100.0, np.float32)
    iso = np.full((8,), 1600.0, np.float32)

    s_base = jax.tree.map(jnp.array, t.state)  # single-device copy
    init_params = jax.tree.map(jnp.array, t.state.params)  # pre-donation copy
    s_base, m1 = t._base_train_step(
        s_base, jnp.asarray(lr), jnp.asarray(hr), jnp.asarray(ratio),
        jnp.asarray(iso), 1)

    from pnnp_tpu.parallel import shard_batch

    args = shard_batch(t.mesh, (lr, hr, ratio, iso), batch_dim_size=8)
    s_sh, m2 = t.train_step(t.state, *args, 1)  # donates t.state

    np.testing.assert_allclose(float(m1["nll"]), float(m2["nll"]),
                               rtol=1e-5, atol=1e-6)
    # real update: post-step params differ from init
    base_moved = sum(
        float(jnp.abs(jnp.asarray(a, jnp.float32)
                      - jnp.asarray(b, jnp.float32)).sum())
        for a, b in zip(jax.tree.leaves(s_base.params),
                        jax.tree.leaves(init_params)))
    assert base_moved > 0, "step did not move the params (lr=0?)"
    for a, b in zip(jax.tree.leaves(s_base.params),
                    jax.tree.leaves(s_sh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)
