"""torch <-> flax checkpoint conversion for the denoiser family.

The reference trains NCHW torch models and stores plain ``state_dict`` .pth
files (reference: trainer_SID.py:131-136, utils/utils.py:148-192). Our models
are NHWC flax modules with matching submodule names, so conversion is a pure
name/layout mapping:

  * Conv2d        weight [O, I, kh, kw] -> kernel [kh, kw, I, O]
  * ConvTranspose weight [I, O, kh, kw] -> kernel [kh, kw, I, O]
  * biases map 1:1

``load_weights``-style tolerance (skip by name/shape with warnings) is
preserved for partially-matching checkpoints.
"""

from __future__ import annotations

import warnings
from typing import Any, Mapping

import numpy as np


def _set_nested(tree: dict, path: list[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_state_to_flax(
    state_dict: Mapping[str, Any],
    transpose_names: tuple[str, ...] = ("upv", "up", "deconv"),
) -> dict:
    """Convert a torch ``state_dict`` (tensors or ndarrays) to a flax param tree.

    Keys like ``conv1_1.weight`` become ``{'conv1_1': {'kernel': ...}}``;
    a ``module.`` prefix (DataParallel) is stripped, mirroring the reference's
    unwrap (trainer_SID.py:133). Submodule paths with dots nest naturally
    (``conv1.conv1.weight`` -> conv1/conv1/kernel for residual blocks).
    """
    params, stats = _torch_state_to_flax_full(state_dict, transpose_names)
    if stats:
        warnings.warn("checkpoint carries BatchNorm running stats; use "
                      "torch_state_to_flax_full to restore batch_stats")
    return params


def torch_state_to_flax_full(
    state_dict: Mapping[str, Any],
    transpose_names: tuple[str, ...] = ("upv", "up", "deconv"),
) -> tuple[dict, dict]:
    """Like :func:`torch_state_to_flax` but also returns the ``batch_stats``
    collection (BatchNorm running mean/var)."""
    return _torch_state_to_flax_full(state_dict, transpose_names)


def _torch_state_to_flax_full(state_dict, transpose_names):
    params: dict = {}
    stats: dict = {}
    for key, val in state_dict.items():
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        if key.startswith("module."):
            key = key[len("module."):]
        *path, leaf = key.split(".")
        if leaf == "num_batches_tracked":
            continue
        if leaf == "running_mean":
            _set_nested(stats, path + ["mean"], arr)
            continue
        if leaf == "running_var":
            _set_nested(stats, path + ["var"], arr)
            continue
        if leaf == "bias":
            _set_nested(params, path + ["bias"], arr)
            continue
        if leaf != "weight":
            warnings.warn(f"skipping unrecognized state_dict leaf {key}")
            continue
        if arr.ndim == 4:
            # prefix match on the module name: substring matching would
            # catch unrelated modules that merely contain 'up'
            if any(path[-1].startswith(t) for t in transpose_names):
                # torch ConvTranspose2d applies the kernel unflipped; flax
                # ConvTranspose (lax.conv_transpose) applies it spatially
                # flipped — so flip kh/kw in the mapping.
                arr = arr.transpose(2, 3, 0, 1)[::-1, ::-1]  # [I,O,kh,kw] -> [kh,kw,I,O]
            else:
                arr = arr.transpose(2, 3, 1, 0)  # [O,I,kh,kw] -> [kh,kw,I,O]
            _set_nested(params, path + ["kernel"], arr)
        elif arr.ndim == 2:
            # torch Linear [out, in] -> flax Dense kernel [in, out]
            _set_nested(params, path + ["kernel"], arr.T)
        elif arr.ndim == 1:
            # norm-layer weight -> flax 'scale'
            _set_nested(params, path + ["scale"], arr)
        else:
            _set_nested(params, path + ["kernel"], arr)
    return params, stats


def flax_to_torch_state(params: Mapping[str, Any],
                        transpose_names: tuple[str, ...] = ("upv", "up", "deconv")) -> dict:
    """Inverse mapping, for exporting checkpoints back to reference tooling."""
    out: dict = {}

    def walk(node, path):
        if isinstance(node, Mapping) and not (
            {"kernel", "bias", "scale"} & set(node.keys())
        ):
            for k, v in node.items():
                walk(v, path + [k])
            return
        name = ".".join(path)
        if "kernel" in node:
            arr = np.asarray(node["kernel"])
            if arr.ndim == 4:
                if any(path[-1].startswith(t) for t in transpose_names):
                    arr = arr[::-1, ::-1].transpose(2, 3, 0, 1)  # undo the flip
                else:
                    arr = arr.transpose(3, 2, 0, 1)
            elif arr.ndim == 2:
                arr = arr.T  # flax Dense [in, out] -> torch Linear [out, in]
            out[name + ".weight"] = arr
        if "scale" in node:  # norm-layer weight
            out[name + ".weight"] = np.asarray(node["scale"])
        if "bias" in node:
            out[name + ".bias"] = np.asarray(node["bias"])

    walk(params, [])
    return out


def eld_checkpoint_to_flax(path: str) -> dict:
    """Load an ELD-format torch checkpoint ({'netG': state_dict}) as flax params.

    The analog of the reference's pth_transfer tool (utils/utils.py:257-270):
    unwraps the 'netG' container then applies the standard layout mapping.
    """
    import torch

    state = torch.load(path, map_location="cpu")
    if isinstance(state, dict) and "netG" in state:
        state = state["netG"]
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return torch_state_to_flax(state)


def load_tolerant(target_params: dict, loaded_params: dict, by_name: bool = True) -> dict:
    """Name/shape-tolerant merge of ``loaded_params`` into ``target_params``.

    JAX analog of the reference's forgiving checkpoint loader
    (utils/utils.py:148-192): entries missing from the checkpoint or with
    mismatched shapes keep the target's values, with a warning.
    """
    import jax

    flat_t = {tuple(str(k.key) for k in p): v
              for p, v in jax.tree_util.tree_flatten_with_path(target_params)[0]}
    flat_l = {tuple(str(k.key) for k in p): v
              for p, v in jax.tree_util.tree_flatten_with_path(loaded_params)[0]}

    merged = {}
    for path, tv in flat_t.items():
        if path in flat_l and tuple(np.shape(flat_l[path])) == tuple(np.shape(tv)):
            merged[path] = np.asarray(flat_l[path], dtype=np.asarray(tv).dtype)
        else:
            if by_name and path in flat_l:
                warnings.warn(f"shape mismatch for {'/'.join(path)}; keeping init")
            elif path not in flat_l:
                warnings.warn(f"missing {'/'.join(path)} in checkpoint; keeping init")
            merged[path] = tv

    tree = {}
    for path, v in merged.items():
        _set_nested(tree, list(path), v)
    return tree
