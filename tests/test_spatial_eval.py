"""Width-sharded eval with ppermute halo exchange: exactness on the CPU mesh."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnnp_tpu.parallel import make_mesh, spatial_eval


class SmallConvNet(nn.Module):
    """3 conv3x3 layers -> receptive field 7 << halo, so sharded == full."""

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.Conv(8 if i < 2 else 4, (3, 3), padding="SAME", name=f"c{i}")(x)
            x = nn.relu(x)
        return x


@pytest.mark.slow
def test_spatial_eval_matches_full_frame(rng):
    mesh = make_mesh(n_data=2, n_spatial=4)
    model = SmallConvNet()
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 64 * 4, 4)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    apply_fn = lambda t: model.apply(params, t)

    # spatial_eval's contract is the reference predict() semantics: reflect
    # halo at frame borders (real_datasets.py:139-189), i.e. equivalent to
    # running the model on a reflect-padded frame and cropping the halo.
    halo = 8
    xp = jnp.pad(x, ((0, 0), (0, 0), (halo, halo), (0, 0)), mode="reflect")
    full = apply_fn(xp)[:, :, halo:-halo, :]
    sharded = spatial_eval(mesh, apply_fn, x, halo=halo)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(full), rtol=1e-5, atol=1e-6)


def test_spatial_eval_single_device_passthrough(rng):
    mesh = make_mesh(n_data=8, n_spatial=1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 8, 16, 4)).astype(np.float32))
    out = spatial_eval(mesh, lambda t: t * 2.0, x, halo=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
