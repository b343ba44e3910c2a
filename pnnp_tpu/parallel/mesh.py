"""Device mesh + sharding: the TPU-native parallelism layer.

The reference's only parallelism is single-process ``nn.DataParallel``
(reference: base_trainer.py:115-118). Here parallelism is SPMD over a
``jax.sharding.Mesh`` with two axes:

  * ``data``    — batch sharding for training (gradients psum'ed by XLA)
  * ``spatial`` — width sharding for full-frame eval (halo exchange via
    ``ppermute`` inside ``shard_map``), the honest ICI story for a conv UNet
    on 2848x4256 / 3472x4624 frames (SURVEY.md §5 long-context analog).

Everything works unchanged on a single device (mesh of size 1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_spatial
    devices = devices[: n_data * n_spatial].reshape(n_data, n_spatial)
    return Mesh(devices, ("data", "spatial"))


def shard_batch(mesh: Mesh, batch, batch_dim_size: Optional[int] = None):
    """Place a host batch with leading dim sharded over the data axis.

    ``batch_dim_size``: when given, only arrays whose dim 0 equals it are
    sharded; everything else (per-sample metadata with odd collation, e.g.
    ccm matrices) is replicated.
    """
    n = mesh.shape["data"]

    def put(x):
        sharded = (
            getattr(x, "ndim", 0) >= 1
            and (batch_dim_size is None or x.shape[0] == batch_dim_size)
            and x.shape[0] % n == 0  # replicate odd-collated metadata (ccm etc.)
        )
        spec = P("data") if sharded else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def make_sharded_train_step(mesh: Mesh, train_step):
    """Constrain the batch to the data axis; XLA inserts the gradient psum.

    ``train_step`` is the jitted step from :func:`pnnp_tpu.train.steps.make_train_step`;
    with batch inputs sharded over ``data`` and params replicated, jit's SPMD
    partitioner emits the all-reduce over ICI automatically.
    """

    def step(state, batch, key, epoch):
        # Per-leaf specs mirroring shard_batch: rank-0 leaves and
        # replicated odd-collation metadata (e.g. a [3,3] ccm) stay
        # replicated; only batch-major leaves shard over 'data'.
        n = mesh.shape["data"]

        def constrain(x):
            sharded = getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0
            spec = P("data") if sharded else P()
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

        batch = jax.tree.map(constrain, batch)
        return train_step(state, batch, key, epoch)

    return jax.jit(step, donate_argnums=(0,))


def spatial_eval(mesh: Mesh, apply_fn, image: jnp.ndarray, halo: int = 32):
    """Full-frame eval with the W axis sharded over the mesh's spatial axis.

    Each shard reflect-pads its slice with ``halo`` columns exchanged from its
    ring neighbours via ``ppermute`` (ICI), runs the model, and drops the
    halo — the SPMD generalization of the reference's overlap-tile predict
    (reference: trainer_SID.py:345-360, halo d=32).

    ``image``: [n, H, W, C] with W divisible by the spatial axis size.
    ``apply_fn``: [n, H, w_local, C] -> same shape.
    """
    from jax import shard_map

    axis = "spatial"
    nsp = mesh.shape[axis]
    if nsp == 1:
        return apply_fn(image)
    if halo == 0:
        # no halo exchange: shard-local eval ('-0:' slices would grab whole
        # shards and the final de-halo slice would be empty)
        from jax import shard_map as _sm

        return _sm(apply_fn, mesh=mesh, in_specs=P(None, None, axis, None),
                   out_specs=P(None, None, axis, None))(image)

    def worker(img):
        # img: [n, H, W/nsp, C] local shard
        idx = jax.lax.axis_index(axis)
        left_edge = img[:, :, :halo, :]
        right_edge = img[:, :, -halo:, :]
        # Receive neighbour edges (ring ppermute; ends reflect-pad locally).
        from_left = jax.lax.ppermute(
            right_edge, axis, [(i, (i + 1) % nsp) for i in range(nsp)]
        )
        from_right = jax.lax.ppermute(
            left_edge, axis, [(i, (i - 1) % nsp) for i in range(nsp)]
        )
        # First/last shard: reflect own border instead of wrapped neighbour
        # (edge-excluding reflect, matching jnp.pad mode='reflect').
        reflect_l = img[:, :, 1 : halo + 1, :][:, :, ::-1, :]
        reflect_r = img[:, :, -halo - 1 : -1, :][:, :, ::-1, :]
        from_left = jnp.where(idx == 0, reflect_l, from_left)
        from_right = jnp.where(idx == nsp - 1, reflect_r, from_right)
        padded = jnp.concatenate([from_left, img, from_right], axis=2)
        out = apply_fn(padded)
        return out[:, :, halo:-halo, :]

    fn = shard_map(
        worker,
        mesh=mesh,
        in_specs=P(None, None, "spatial", None),
        out_specs=P(None, None, "spatial", None),
    )
    return fn(image)


def spatial_eval_auto(mesh: Mesh, apply_fn, image: jnp.ndarray,
                      halo: int = 96, align: int = 16):
    """Production wrapper around :func:`spatial_eval` for arbitrary frames.

    Reflect-pads H to a multiple of ``align`` and W to a multiple of
    ``nsp * align`` so each width shard (plus its 2*halo columns) is already
    %align and the model never pads internally, runs the halo-exchanged
    sharded eval, and crops back. Falls back to plain ``apply_fn`` when the
    frame is too narrow to shard (local width <= halo) — tiny eval crops in
    tests, thumbnails.

    With ``halo >= receptive-field radius`` (UNetSeeInDark: ~94 px, so the
    default 96) the result equals the single-device full-frame eval up to
    float roundoff (tested in tests/test_spatial_eval.py).
    """
    nsp = mesh.shape["spatial"]
    if nsp == 1:
        return apply_fn(image)
    H, W = int(image.shape[1]), int(image.shape[2])
    Hp = -(-H // align) * align
    Wp = -(-W // (nsp * align)) * (nsp * align)
    if Wp // nsp <= halo or Wp - W >= W or Hp - H >= H:
        return apply_fn(image)
    img = image
    # symmetric split, matching the single-device eval's pad placement
    # (reference p2d=(4,4,4,4) center-crop, trainer_SID.py:221-226 — see
    # train.steps.pad_split); the W pad is larger here (%nsp*align), so
    # border pixels still see more reflect context than single-device, but
    # the placement convention is the same on all four sides
    pt, pb = (Hp - H) // 2, Hp - H - (Hp - H) // 2
    pl, pr = (Wp - W) // 2, Wp - W - (Wp - W) // 2
    if Hp != H or Wp != W:
        img = jnp.pad(img, ((0, 0), (pt, pb), (pl, pr), (0, 0)),
                      mode="reflect")
    out = spatial_eval(mesh, apply_fn, img, halo=halo)
    return out[:, pt:pt + H, pl:pl + W, :]
