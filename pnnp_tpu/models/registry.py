"""Model registry: YAML ``arch.name`` -> flax module.

Replaces the reference's ``globals()[arch['name']](arch)`` pattern
(reference: trainer_SID.py:17) with an explicit registry. Reference names and
our canonical names both resolve.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp

from pnnp_tpu.models.unet import UNetSeeInDark, DeepUNet, ResUNet, DeepResUNet

_REGISTRY = {
    "UNetSeeInDark": UNetSeeInDark,
    "DeepUnet": DeepUNet,
    "DeepUNet": DeepUNet,
    "ResUnet": ResUNet,
    "ResUNet": ResUNet,
    "DeepResUnet": DeepResUNet,
    "DeepResUNet": DeepResUNet,
}

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}


def register(name: str, cls) -> None:
    _REGISTRY[name] = cls


def build_model(arch: Mapping[str, Any]):
    """Instantiate a denoiser from a runfile ``arch`` block.

    Recognized keys: name, in_nc, out_nc, nf, res, nframes, dtype.
    ``nframes`` multiplies the input channel count (reference: Unet.py:16).
    """
    name = arch["name"]
    if name not in _REGISTRY:
        raise KeyError(f"unknown arch '{name}'; known: {sorted(_REGISTRY)}")
    cls = _REGISTRY[name]
    nframes = int(arch.get("nframes", 1))
    dtype_name = str(arch.get("dtype", "float32"))
    if dtype_name not in _DTYPES:
        raise KeyError(
            f"unknown dtype '{dtype_name}'; known: {sorted(_DTYPES)}")
    return cls(
        in_nc=int(arch.get("in_nc", 4)) * nframes,
        out_nc=int(arch.get("out_nc", 4)),
        nf=int(arch.get("nf", 32)),
        res=bool(arch.get("res", False)),
        dtype=_DTYPES[dtype_name],
    )


def example_input_channels(arch: dict) -> int:
    """Channels of the init/apply example: in_nc x nframes (multi-frame
    inputs stack along channels; flax infers conv widths from the traced
    example, so THIS — not the model's in_nc field — decides the kernels)."""
    return int(arch.get("in_nc", 4)) * int(arch.get("nframes", 1))
