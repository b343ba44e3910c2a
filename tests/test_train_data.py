"""Training pipeline + data layer + multi-chip dry run."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnnp_tpu.data import SIDDataset, ELDDataset, DataLoader, MultiDataset, collate
from pnnp_tpu.models import UNetSeeInDark
from pnnp_tpu.train import (
    build_lr_schedule,
    cosine_warm_restart,
    create_train_state,
    make_raw_synth,
    make_train_step,
    make_eval_step,
    multistep,
    unet_dpsv_loss,
)


# ---------------------------------------------------------------- schedules
def ref_cos_lr(step, period=1000, peak=20, lr=1e-4, ratio=0.2):
    """NumPy oracle of the reference SGDR schedule (base_trainer.py:141-149)."""
    import math

    T = step // period
    decay = 2**T
    step = step % period
    if step <= peak and T > 0:
        mul = step / peak
    else:
        mul = (1 - ratio) * (np.cos((step - peak) / (period - peak) * math.pi) * 0.5 + 0.5) + ratio
    return lr * mul / decay


def test_cosine_schedule_matches_reference():
    for step in [0, 5, 19, 20, 21, 199, 200, 205, 399, 400, 750]:
        ours = float(cosine_warm_restart(step, period=200, peak=20, lr=1e-4))
        ref = ref_cos_lr(step, period=200, peak=20, lr=1e-4)
        assert abs(ours - ref) < 1e-10, (step, ours, ref)


def test_multistep_schedule():
    assert float(multistep(100, period=1000, lr=1e-4)) == pytest.approx(1e-4)
    assert float(multistep(600, period=1000, lr=1e-4)) == pytest.approx(5e-5)
    assert float(multistep(950, period=1000, lr=1e-4)) == pytest.approx(1e-5)


# ---------------------------------------------------------------- train step
@pytest.mark.slow
def test_train_step_learns_identity():
    model = UNetSeeInDark(nf=4)
    state = create_train_state(jax.random.key(0), model, jnp.zeros((1, 16, 16, 4)))
    lr_schedule = build_lr_schedule(
        {"lr_scheduler": "fixed", "learning_rate": 1e-3, "stop_epoch": 10, "last_epoch": 0}
    )
    synth = make_raw_synth("SonyA7S2", "prq", ori=False, clip=False)
    step = make_train_step(model, lr_schedule, synth, clip_mode=2)

    rng = np.random.default_rng(0)
    batch = {"hr": jnp.asarray(rng.uniform(0, 0.05, (4, 16, 16, 4)).astype(np.float32))}
    losses = []
    key = jax.random.key(1)
    for i in range(30):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k, 1)
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_eval_step_pads_to_16():
    model = UNetSeeInDark(nf=4)
    state = create_train_state(jax.random.key(0), model, jnp.zeros((1, 16, 16, 4)))
    es = make_eval_step(model)
    out = es(state, jnp.zeros((1, 30, 42, 4)))
    assert out.shape == (1, 30, 42, 4)


def test_dpsv_loss_shapes():
    # reference Unet_dpsv_Loss is an UNWEIGHTED SUM over scales
    # (base_loss.py:109-121, Pyramid_Loss rate=1 norm=False)
    outs = tuple(jnp.zeros((1, 16 // s, 16 // s, 4)) for s in (1, 2, 4, 8))
    loss = unet_dpsv_loss(outs, jnp.ones((1, 16, 16, 4)))
    assert float(loss) == pytest.approx(4.0, rel=1e-5)


def test_dpsv_losses_match_torch_oracle():
    """Both dpsv variants vs a torch replica of base_loss.py:109-133."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from pnnp_tpu.train.losses import unet_dpsv_up_loss

    def pyr_sample(img, max_scale):
        imgs, sample, power = [], img, 1
        while 2 ** power <= max_scale:
            sample = nn.AvgPool2d(2, 2)(sample)
            imgs.append(sample)
            power += 1
        return imgs

    def ref_dpsv(outs, target, up=False):
        if up:
            targets = [target, target] + pyr_sample(target, 2 ** (len(outs) - 2))
        else:
            targets = [target] + pyr_sample(target, 2 ** (len(outs) - 1))
        return sum(F.l1_loss(o, t) for o, t in zip(outs, targets))

    rng = np.random.default_rng(0)
    target = rng.random((2, 4, 32, 32)).astype(np.float32)
    outs = [rng.random((2, 4, 32 // 2 ** i, 32 // 2 ** i)).astype(np.float32)
            for i in range(4)]
    to_t = lambda xs: [torch.from_numpy(x) for x in xs]
    to_j = lambda xs: [jnp.asarray(x.transpose(0, 2, 3, 1)) for x in xs]

    want = float(ref_dpsv(to_t(outs), torch.from_numpy(target)))
    got = float(unet_dpsv_loss(to_j(outs), jnp.asarray(target.transpose(0, 2, 3, 1))))
    assert got == pytest.approx(want, abs=1e-5)

    outs_up = [outs[0]] + outs[:3]
    want = float(ref_dpsv(to_t(outs_up), torch.from_numpy(target), up=True))
    got = float(unet_dpsv_up_loss(to_j(outs_up), jnp.asarray(target.transpose(0, 2, 3, 1))))
    assert got == pytest.approx(want, abs=1e-5)


# ---------------------------------------------------------------- data layer
# Shared with the driver dryrun (pnnp_tpu/data/fixtures.py); re-exported here
# because several test modules import it from this one.
from pnnp_tpu.data.fixtures import make_sid_fixture  # noqa: E402,F401


def test_sid_dataset_train(tmp_path):
    make_sid_fixture(tmp_path)
    dst = dict(
        dataset="SID_Dataset", mode="train", H=32, W=48, patch_size=8,
        crop_per_image=2, croptype="random_crop", command="idremap",
        wp=16383, bl=512, ori=False, clip=2, infos_dir=str(tmp_path / "infos"),
    )
    ds = SIDDataset(dst)
    sample = ds[0]
    assert sample["hr"].shape == (2, 8, 8, 4)
    assert sample["lr"].shape == (2, 8, 8, 4)
    assert sample["hr"].min() >= 0 and sample["hr"].max() <= 1
    assert float(sample["ratio"][0]) in (100.0, 250.0, 300.0)
    # lr was amplified by ratio and half-clipped to <= 1
    assert sample["lr"].max() <= 1.0 + 1e-6


def test_sid_dataset_eval_splits(tmp_path):
    make_sid_fixture(tmp_path, n_scenes=2)
    # evaltest remap requires >= 80 entries normally; emulate by duplication
    with open(tmp_path / "infos" / "SID_evaltest.info", "rb") as f:
        infos = pickle.load(f)
    big = []
    for k in range(120):
        e = dict(infos[k % len(infos)])
        e["short"] = e["short"][0]
        e["ratio"] = e["ratio"][0]
        big.append(e)
    with open(tmp_path / "infos" / "SID_evaltest.info", "wb") as f:
        pickle.dump(big, f)
    dst = dict(
        dataset="SID_Dataset", mode="evaltest", H=32, W=48, patch_size=8,
        wp=16383, bl=512, ori=False, clip=2, command="",
        infos_dir=str(tmp_path / "infos"),
    )
    ds = SIDDataset(dst)
    ds.change_eval_ratio(100)
    assert len(ds) == 40
    s = ds[0]
    assert s["hr"].shape == (1, 16, 24, 4)


def test_loader_collate_and_prefetch(tmp_path):
    make_sid_fixture(tmp_path)
    dst = dict(
        dataset="SID_Dataset", mode="train", H=32, W=48, patch_size=8,
        crop_per_image=2, croptype="random_crop", command="", wp=16383, bl=512,
        ori=False, clip=2, infos_dir=str(tmp_path / "infos"),
    )
    ds = SIDDataset(dst)
    loader = DataLoader(ds, batch_size=2, num_workers=2, seed=7)
    batches = list(loader)
    assert len(batches) == 2  # 3 scenes, bs 2
    assert batches[0]["hr"].shape == (4, 8, 8, 4)  # 2 scenes x 2 crops
    assert batches[0]["ratio"].shape == (4,)


def test_loader_transform_runs_in_workers(tmp_path):
    """The transform hook is applied per batch in BOTH the worker and the
    num_workers=0 paths, and worker-side transform exceptions surface in the
    consumer like dataset exceptions do."""
    make_sid_fixture(tmp_path)
    dst = dict(
        dataset="SID_Dataset", mode="train", H=32, W=48, patch_size=8,
        crop_per_image=2, croptype="random_crop", command="", wp=16383, bl=512,
        ori=False, clip=2, infos_dir=str(tmp_path / "infos"),
    )
    ds = SIDDataset(dst)

    def mark(batch):
        batch["marked"] = batch["hr"].sum()
        return batch

    for nw in (0, 2):
        loader = DataLoader(ds, batch_size=2, num_workers=nw, seed=7,
                            shuffle=False, transform=mark)
        batches = list(loader)
        assert all("marked" in b for b in batches)

    def boom(batch):
        raise ValueError("transform boom")

    loader = DataLoader(ds, batch_size=2, num_workers=2, seed=7,
                        shuffle=False, transform=boom)
    import pytest

    with pytest.raises(ValueError, match="transform boom"):
        list(loader)


def test_multidataset_concat(tmp_path):
    make_sid_fixture(tmp_path)
    dst = dict(
        dataset="SID_Dataset", mode="train", H=32, W=48, patch_size=8,
        crop_per_image=1, croptype="random_crop", command="", wp=16383, bl=512,
        ori=False, clip=2, infos_dir=str(tmp_path / "infos"),
    )
    a, b = SIDDataset(dst), SIDDataset(dst)
    m = MultiDataset([a, b])
    assert len(m) == len(a) + len(b)
    assert m[len(a)]["hr"].shape == m[0]["hr"].shape


def test_eld_dataset(tmp_path):
    rng = np.random.default_rng(0)
    H, W = 32, 48
    scenes = []
    combos = [(i, r) for i in (800, 1600, 3200) for r in (100, 200)] * 2
    for s in range(2):
        entries = []
        ci = 0
        for img_id in range(1, 17):
            p = str(tmp_path / f"scene{s}_IMG_{img_id:04d}.npy")
            np.save(p, rng.integers(512, 16383, (H, W)).astype(np.float32))
            if img_id in (1, 6, 11, 16):
                iso, ratio = 100, 1
            else:
                iso, ratio = combos[ci]
                ci += 1
            entries.append({
                "name": f"IMG_{img_id:04d}", "data": p, "ISO": iso, "ratio": ratio,
                "ExposureTime": 1.0, "wb": np.array([2, 1, 1.5, 1], np.float32),
                "ccm": np.eye(3, dtype=np.float32),
            })
        scenes.append(entries)
    os.makedirs(tmp_path / "infos", exist_ok=True)
    with open(tmp_path / "infos" / "ELD_SonyA7S2.info", "wb") as f:
        pickle.dump(scenes, f)

    dst = dict(
        dataset="ELD_Dataset", mode="eval", H=H, W=W, wp=16383, bl=512,
        ori=False, clip=2, command="", infos_dir=str(tmp_path / "infos"),
        iso_list=[800, 1600, 3200], ratio_list=[100, 200], patch_size=8,
    )
    ds = ELDDataset(dst)
    assert len(ds) == 2 * 3 * 2
    s0 = ds[0]
    assert s0["hr"].shape == (1, H // 2, W // 2, 4)
    ds.fast_eval(True)
    assert len(ds) == 2 * 3 * 1
    ds.fast_eval(False)
    assert len(ds) == 12


# ---------------------------------------------------------------- multichip
@pytest.mark.slow
def test_dryrun_multichip_8dev():
    import __graft_entry__ as ge

    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    ge.dryrun_multichip(8)


def test_loader_multiworker_deterministic(tmp_path):
    """Static round-robin worker assignment + per-(epoch, worker) RNG reseed:
    two runs over the same epoch yield identical batches (the reference's
    worker_init_fn contract), and a different epoch differs."""
    make_sid_fixture(tmp_path, n_scenes=3, H=32, W=48)
    args = dict(dataset="SID_Dataset", mode="train", patch_size=8,
                crop_per_image=2, H=32, W=48, croptype="random_crop",
                infos_dir=str(tmp_path / "infos"))

    def run(epoch):
        ds = SIDDataset(args, seed=3)
        loader = DataLoader(ds, batch_size=2, num_workers=2, seed=7)
        loader.set_epoch(epoch)
        return [b["lr"].copy() for b in loader]

    a, b = run(1), run(1)
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = run(2)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_loader_more_workers_than_prefetch_no_deadlock():
    """num_workers > prefetch with jittered item latency must drain the whole
    epoch (regression: semaphore backpressure let out-of-order completions
    tie up every permit while the worker owning the next-needed batch parked
    on acquire — a permanent hang; the condition-based lead bound cannot
    starve the owner of batch `yielded`)."""
    import time as _time

    class Jitter:
        def __len__(self):
            return 40

        def __getitem__(self, i):
            _time.sleep(0.001 * ((i * 7) % 5))  # deterministic jitter
            return {"hr": np.full((1, 4, 4, 4), i, np.float32)}

    done = {}

    def run():
        loader = DataLoader(Jitter(), batch_size=2, num_workers=6,
                            prefetch=2, shuffle=False)
        done["batches"] = [b["hr"][0, 0, 0, 0] for b in loader]

    import threading
    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout=30)
    assert not th.is_alive(), "loader deadlocked with num_workers > prefetch"
    assert done["batches"] == [float(2 * i) for i in range(20)]  # in order


def test_loader_worker_exception_propagates(tmp_path):
    """An exception inside __getitem__ surfaces in the consumer instead of
    hanging the poll loop."""
    class Boom:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            if i == 3:
                raise ValueError("bad item")
            return {"hr": np.zeros((1, 4, 4, 4), np.float32)}

    loader = DataLoader(Boom(), batch_size=2, num_workers=2, shuffle=False)
    with np.testing.assert_raises(ValueError):
        for _ in loader:
            pass


def test_schedule_short_run_no_nan():
    """period = num_epochs // T could hit 0 near a resume boundary, making
    the cosine LR NaN/inf and silently NaN-ing the whole model."""
    from pnnp_tpu.train import build_lr_schedule

    fn = build_lr_schedule({"lr_scheduler": "WarmupCosine", "learning_rate": 1e-3,
                            "stop_epoch": 500, "last_epoch": 498, "T": 3,
                            "step_size": 2})
    for e in range(0, 4):
        v = float(fn(e))
        assert np.isfinite(v) and 0 <= v <= 1e-2


def test_bn_model_trains_running_stats():
    """The generic train step must run BatchNorm models with mutable
    batch_stats (regression: flax error with deep supervision, silently
    frozen stats otherwise)."""
    import flax.linen as nn
    import jax

    from pnnp_tpu.train import build_lr_schedule, make_train_step
    from pnnp_tpu.train.state import TrainState, make_adam_direction

    class BNNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=False)(x)
            return nn.Conv(4, (3, 3), padding="SAME")(x)

    m = BNNet()
    v = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)))
    state = TrainState.create(apply_fn=m.apply, params=v["params"],
                              tx=make_adam_direction(),
                              batch_stats=v["batch_stats"])
    fn = build_lr_schedule({"lr_scheduler": "fixed", "learning_rate": 1e-3,
                            "stop_epoch": 10, "last_epoch": 0})
    step = make_train_step(m, fn, donate=False)
    batch = {"lr": jnp.ones((2, 8, 8, 4)) * 0.3,
             "hr": jnp.ones((2, 8, 8, 4)) * 0.5}
    mean0 = np.asarray(jax.tree_util.tree_leaves(state.batch_stats)[0]).copy()
    state, metrics = step(state, batch, jax.random.key(1), 0)
    mean1 = np.asarray(jax.tree_util.tree_leaves(state.batch_stats)[0])
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(mean0, mean1)
