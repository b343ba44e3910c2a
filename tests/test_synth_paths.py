"""On-device synthesis stages: Mix (SNA), SFRN (black-frame), proxy."""

import jax
import jax.numpy as jnp
import numpy as np

from pnnp_tpu.models import UNetSeeInDark, PixelWiseISOProxy
from pnnp_tpu.train import (
    build_lr_schedule,
    create_train_state,
    make_mix_synth,
    make_proxy_synth,
    make_raw_synth,
    make_train_step,
)


def _batch(rng, n=4, p=16):
    hr = rng.uniform(0.05, 0.5, (n, p, p, 4)).astype(np.float32)
    lr = np.clip(hr / 100.0 + rng.normal(0, 0.002, hr.shape), -0.03, 1).astype(np.float32)
    return {
        "hr": jnp.asarray(hr),
        "lr": jnp.asarray(lr),
        "ratio": jnp.full((n,), 100.0),
        "iso": jnp.full((n,), 1600.0),
        "wb": jnp.tile(jnp.asarray([[2.0, 1.0, 1.6, 1.0]]), (n, 1)),
    }


def test_mix_synth_shapes_and_brightening(rng):
    batch = _batch(rng)
    synth = make_mix_synth("SonyA7S2", command="augv5", ori=False)
    lr, hr, ratio = synth(jax.random.key(0), batch)
    assert lr.shape == batch["hr"].shape and hr.shape == batch["hr"].shape
    # lr was amplified by ratio (ori=False): mean scale ~ratio x raw lr
    assert float(jnp.mean(lr)) > float(jnp.mean(batch["lr"])) * 10
    # SNA adds signal to BOTH lr and hr consistently: hr delta >= 0
    assert float(jnp.min(hr - batch["hr"])) > -1e-4


def test_sfrn_synth_adds_shot_over_black(rng):
    """SFRN: lr = real read-noise layer + on-device Poisson shot of the GT."""
    batch = _batch(rng)
    black = jnp.asarray(rng.normal(0, 0.0004, batch["hr"].shape).astype(np.float32))
    batch["lr"] = black
    raw = make_raw_synth("SonyA7S2", "pb", ori=False, clip=False)

    def synth(key, b):
        lr_shot, hr, ratio = raw(key, b)
        return lr_shot + b["lr"] - hr * 0, hr, ratio  # shot + read layer

    lr, hr, ratio = synth(jax.random.key(1), batch)
    # shot noise variance scales with signal: bright channels noisier
    noise = np.asarray(lr) / np.asarray(ratio).reshape(-1, 1, 1, 1) - np.asarray(
        batch["hr"]
    ) / np.asarray(ratio).reshape(-1, 1, 1, 1) * 0
    assert np.isfinite(noise).all()
    assert lr.shape == batch["hr"].shape


def test_proxy_synth_via_train_step(rng):
    proxy = PixelWiseISOProxy(d=32, nf=8, nb=1)
    clean0 = jnp.zeros((1, 16, 16, 4))
    pvars = proxy.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        clean0, jnp.ones((1,)) * 1600.0,
    )

    def sample_fn(rng_, clean, iso):
        return proxy.apply(pvars, clean, iso, rngs={"sample": rng_}, mode="sample")

    synth = make_proxy_synth(sample_fn, ori=False)
    model = UNetSeeInDark(nf=4)
    lr_schedule = build_lr_schedule(
        {"lr_scheduler": "fixed", "learning_rate": 1e-3, "stop_epoch": 5, "last_epoch": 0}
    )
    step = make_train_step(model, lr_schedule, synth, clip_mode=2, donate=False)
    state = create_train_state(jax.random.key(2), model, jnp.zeros((1, 16, 16, 4)))
    batch = _batch(rng)
    state, m = step(state, batch, jax.random.key(3), 1)
    assert np.isfinite(float(m["loss"]))
    # ratio sampled in U(100, 300)
    _, _, ratio = synth(jax.random.key(4), batch)
    r = np.asarray(ratio)
    assert r.min() >= 100 and r.max() <= 300


def test_proxy_synth_sampling_laws(rng):
    """The two reference proxy sampling laws (VERDICT r2 #2):
    Sony (trainer_SID.py:463-472) — per-example ratio ~ U(100,300), one
    legal-ladder ISO per batch; IMX686 (trainer_LRID.py:419-427) — ONE
    discrete dgain per batch from [1,2,4,8,16] and ISO from the batch's own
    dataset ISO, NOT the Sony ladder."""
    from pnnp_tpu.physics.calibration import LEGAL_ISO

    seen = {}

    def sample_fn(rng_, clean, iso):
        seen["iso"] = iso
        return jnp.zeros_like(clean)

    batch = {
        "hr": jnp.asarray(rng.uniform(0, 0.2, (4, 8, 8, 4)).astype(np.float32)),
        "iso": jnp.full((4,), 6400.0),
    }

    # --- IMX686 law
    synth = make_proxy_synth(sample_fn, ratio_ladder=(1, 2, 4, 8, 16),
                             iso_from_batch=True)
    support = set()
    for i in range(64):
        _, _, ratio = synth(jax.random.key(i), batch)
        r = np.asarray(ratio)
        assert len(np.unique(r)) == 1, "IMX686 draws ONE dgain per batch"
        support.add(float(r[0]))
        assert float(np.asarray(seen["iso"])) == 6400.0, \
            "IMX686 proxy must be conditioned on the dataset ISO"
    assert support == {1.0, 2.0, 4.0, 8.0, 16.0}, support

    # --- Sony law
    synth = make_proxy_synth(sample_fn)
    isos = set()
    for i in range(32):
        _, _, ratio = synth(jax.random.key(i), batch)
        r = np.asarray(ratio)
        assert r.min() >= 100 and r.max() <= 300
        assert len(np.unique(r)) == len(r), "Sony ratio is per-example"
        isos.add(float(np.asarray(seen["iso"])))
    assert isos <= set(float(i) for i in LEGAL_ISO)
    assert len(isos) > 3  # actually sweeps the ladder


def test_lrid_raw_synth_law(rng):
    """IMX686_Raw_Dataset synthesis (trainer_LRID.py:399-418): the dataset's
    point-calibrated ISO-6400 params with ONLY K jittered (+-1%), sigmas at
    their calibrated means, and a per-example LINEAR ratio ~ U(1,16) — not
    the generic exp-uniform law of process.py:344-348."""
    from pnnp_tpu.physics import calibration as calib
    from pnnp_tpu.physics.sampling import sample_params_max

    t = calib.ISO_TABLES["IMX686"]
    i6400 = calib.iso_index("IMX686", 6400)

    ratios, Ks = [], []
    for i in range(48):
        p = sample_params_max(jax.random.key(i), "IMX686", n=8, iso=6400,
                              jitter_sigmas=False)
        # sigmas pinned at the calibrated means, K jittered within +-1%
        np.testing.assert_array_equal(np.asarray(p["sigGs"]),
                                      np.full(8, t["sigGs"][i6400], np.float32))
        np.testing.assert_array_equal(np.asarray(p["sigTL"]),
                                      np.full(8, t["sigTL"][i6400], np.float32))
        np.testing.assert_array_equal(np.asarray(p["sigR"]),
                                      np.full(8, t["sigR"][i6400], np.float32))
        Ks.append(np.asarray(p["K"]))
    K = np.concatenate(Ks)
    K0 = t["Kmax"][i6400]
    assert (np.abs(K / K0 - 1.0) <= 0.01 + 1e-6).all()
    assert K.std() > 0  # jitter is live

    # the trainer dispatch draws LINEAR U(1,16) per example
    synth = make_raw_synth("IMX686", "prq", ori=False, clip=False,
                           iso=6400, lrid=True)
    batch = {"hr": jnp.asarray(rng.uniform(0.05, 0.3, (8, 16, 16, 4))
                               .astype(np.float32))}
    rs = []
    for i in range(64):
        _, _, ratio = synth(jax.random.key(i), batch)
        r = np.asarray(ratio)
        assert len(np.unique(r)) == len(r), "ratio is per-example"
        rs.append(r)
    r = np.concatenate(rs)
    assert r.min() >= 1.0 and r.max() <= 16.0
    # linear-uniform mean 8.5 (exp-uniform over the same support would be
    # ~(16-1)/ln(16) = 5.4); 512 draws: se ~ 0.19
    assert abs(r.mean() - 8.5) < 0.8, r.mean()


def test_sfrn_packed_synth_via_trainer_dispatch(rng, tmp_path, monkeypatch):
    """SFRN with the packed step: shot synth in packed space + s2d'd real read
    layer. With a zero GT the shot term vanishes (Poisson(0)=0), so lr must be
    EXACTLY the amplified read layer in packed layout."""
    import os
    import pickle
    import yaml

    from pnnp_tpu.models.unet_s2d import s2d
    from tests.test_train_data import make_sid_fixture

    monkeypatch.chdir(tmp_path)
    make_sid_fixture(tmp_path, n_scenes=2, H=32, W=48)
    runfile = {
        "mode": "trainonly", "checkpoint": "sm", "fast_ckpt": "ck",
        "model_name": "SFRN_packed_test", "num_workers": 0,
        "dst": {"dataset": "SFRN_Dataset", "dstname": "SID", "command": "",
                "camera_type": "SonyA7S2", "noise_code": "pr", "patch_size": 16,
                "H": 32, "W": 48, "crop_per_image": 1, "croptype": "random_crop",
                "wp": 16383, "bl": 512, "ori": False, "clip": 2,
                "infos_dir": str(tmp_path / "infos")},
        "arch": {"name": "UNetSeeInDark", "nf": 4, "nframes": 1},
        "hyper": {"lr_scheduler": "fixed", "learning_rate": 1e-4, "batch_size": 1,
                  "stop_epoch": 1, "last_epoch": 0, "save_freq": 1,
                  "plot_freq": 10, "best_psnr": 0},
    }
    runfile["dst_train"] = dict(runfile["dst"], mode="train")
    with open(tmp_path / "s.yml", "w") as f:
        yaml.safe_dump(runfile, f)

    from pnnp_tpu.trainer import Trainer

    t = Trainer(str(tmp_path / "s.yml"), mode="trainonly", debug=True)
    assert t._use_packed
    synth = t._make_synth()
    n = 2
    read = jnp.asarray(rng.normal(0, 0.0004, (n, 16, 16, 4)).astype(np.float32))
    batch = {"hr": jnp.zeros((n, 16, 16, 4)), "lr": read}
    lr, hr, ratio = synth(jax.random.key(2), batch)
    assert lr.shape == (n, 8, 8, 16) and hr.shape == (n, 8, 8, 16)
    expected = np.asarray(s2d(read)) * np.asarray(ratio).reshape(-1, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(lr), expected, rtol=1e-6, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(hr), 0.0)


def test_mix_synth_amplification_convention(rng):
    """Amplification must happen exactly once: the IMX686 Mix loaders
    host-amplify lr by dgain (inherited from the paired path), so the synth
    must skip its ratio multiply there (host_amplified=True); Sony's Mix
    loader emits unamplified lr and the synth multiplies. Regression: IMX686
    Mix training with ori:false fed the net dgain^2-scaled inputs."""
    base = rng.uniform(0, 0.01, (2, 8, 8, 4)).astype(np.float32)
    dgain = 8.0
    batch = {
        "hr": jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 4)).astype(np.float32)),
        "ratio": jnp.full((2,), dgain),
        "iso": jnp.full((2,), 6400.0),
        "wb": jnp.ones((2, 4)),
    }
    # command without augv2/augv5 -> aug_wb = 0 -> SNA terms are exactly 0
    synth_phone = make_mix_synth("IMX686", command="noaug", ori=False,
                                 host_amplified=True)
    lr, hr, _ = synth_phone(jax.random.key(0),
                            dict(batch, lr=jnp.asarray(base * dgain)))
    np.testing.assert_allclose(np.asarray(lr), base * dgain, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hr), np.asarray(batch["hr"]), rtol=1e-6)

    synth_sony = make_mix_synth("SonyA7S2", command="noaug", ori=False)
    lr2, _, _ = synth_sony(jax.random.key(0), dict(batch, lr=jnp.asarray(base)))
    np.testing.assert_allclose(np.asarray(lr2), base * dgain, rtol=1e-6)


def test_mix_dispatch_wiring(tmp_path, monkeypatch):
    """Trainer wires host_amplified + device-HBR per camera: IMX686 Mix gets
    host_amplified=True and a device hbr_map; Sony Mix gets neither (its
    loader host-applies HBR with the per-sample nearest-ISO LUT)."""
    import pickle
    import yaml

    import pnnp_tpu.trainer as trainer_mod
    from tests.test_train_data import make_sid_fixture
    from tests.test_phone_and_nf import make_lrid_fixture, phone_args

    captured = {}
    real = trainer_mod.make_mix_synth

    def spy(cam, command, ori=False, hbr_map=None, host_amplified=False):
        captured[cam] = dict(hbr=hbr_map is not None,
                             host_amplified=host_amplified)
        return real(cam, command, ori=ori, hbr_map=hbr_map,
                    host_amplified=host_amplified)

    monkeypatch.setattr(trainer_mod, "make_mix_synth", spy)
    monkeypatch.chdir(tmp_path)
    make_sid_fixture(tmp_path, n_scenes=2, H=32, W=48)
    runfile = {
        "mode": "trainonly", "checkpoint": "sm", "fast_ckpt": "ck",
        "model_name": "mixwire", "num_workers": 0,
        "dst": {"dataset": "Mix_Dataset", "dstname": "SID", "command": "HB augv5",
                "camera_type": "SonyA7S2", "noise_code": "p", "patch_size": 16,
                "H": 32, "W": 48, "crop_per_image": 1, "croptype": "random_crop",
                "wp": 16383, "bl": 512, "ori": False, "clip": 0,
                "infos_dir": str(tmp_path / "infos")},
        "arch": {"name": "UNetSeeInDark", "nf": 4, "nframes": 1},
        "hyper": {"lr_scheduler": "fixed", "learning_rate": 1e-4, "batch_size": 1,
                  "stop_epoch": 1, "last_epoch": 0, "save_freq": 1,
                  "plot_freq": 10, "best_psnr": 0},
    }
    runfile["dst_train"] = dict(runfile["dst"], mode="train")
    with open(tmp_path / "m.yml", "w") as f:
        yaml.safe_dump(runfile, f)
    t = trainer_mod.Trainer(str(tmp_path / "m.yml"), mode="trainonly", debug=True)
    t._make_synth()
    assert captured["SonyA7S2"] == {"hbr": False, "host_amplified": False}

    make_lrid_fixture(tmp_path)
    runfile["dst"]["dataset"] = "IMX686_Mix_Dataset"
    runfile["dst"].update(dstname="indoor_x5", camera_type="IMX686",
                          H=32, W=48, wp=1023, bl=64,
                          GT_type="GT_align_ours", ratio_list=[1, 2],
                          command="alldg HB")
    runfile["dst_train"] = dict(runfile["dst"], mode="train")
    runfile["model_name"] = "mixwire686"
    with open(tmp_path / "m2.yml", "w") as f:
        yaml.safe_dump(runfile, f)
    t2 = trainer_mod.Trainer(str(tmp_path / "m2.yml"), mode="trainonly", debug=True)
    t2._make_synth()
    assert captured["IMX686"] == {"hbr": True, "host_amplified": True}
