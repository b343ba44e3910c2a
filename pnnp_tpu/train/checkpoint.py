"""Checkpointing: orbax last/best contract + torch interop.

Mirrors the reference's two-tier scheme (reference: trainer_SID.py:131-136,
303-307): periodic epoch checkpoints plus rolling ``last``/``best`` (best =
max eval PSNR). Optimizer state is *not* persisted — the LR is a pure
function of the epoch (reference: base_trainer.py:33-43) — so checkpoints are
just param/batch_stats trees, loadable across optimizer changes and
exportable to torch ``state_dict`` format via :mod:`pnnp_tpu.models.convert`.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import numpy as np

from pnnp_tpu.models.convert import torch_state_to_flax


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params, batch_stats=None, meta: Optional[dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": _to_numpy_tree(params),
        "batch_stats": _to_numpy_tree(batch_stats) if batch_stats is not None else None,
        "meta": meta or {},
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def save_checkpoint_orbax(path: str, params, batch_stats=None,
                          meta: Optional[dict] = None):
    """Orbax-backed checkpoint (sharding-aware, async-capable) for large runs.

    The pickle tier stays the default for the reference's small denoisers;
    orbax is the right backend once params are sharded across a mesh.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if batch_stats is not None:
        payload["batch_stats"] = batch_stats
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if meta:
        with open(path + ".meta", "wb") as f:
            pickle.dump(meta, f)


def load_checkpoint_orbax(path: str, template=None) -> dict:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path, template)
    meta = {}
    if os.path.exists(path + ".meta"):
        with open(path + ".meta", "rb") as f:
            meta = pickle.load(f)
    return {"params": payload.get("params"),
            "batch_stats": payload.get("batch_stats"), "meta": meta}


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def load_any(path: str) -> dict:
    """Load ours (.ckpt pickle) or a torch .pth state_dict, converting layout."""
    if path.endswith(".pth") or path.endswith(".pt"):
        import torch

        state = torch.load(path, map_location="cpu")
        if isinstance(state, dict) and "netG" in state:  # ELD container
            state = state["netG"]
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        from pnnp_tpu.models.convert import torch_state_to_flax_full

        params, stats = torch_state_to_flax_full(state)
        return {"params": params, "batch_stats": stats or None, "meta": {}}
    return load_checkpoint(path)


class CheckpointManager:
    """last/best rolling checkpoints + periodic saves (reference contract)."""

    def __init__(self, fast_dir: str, model_dir: str, model_name: str, save_freq: int = 10):
        self.fast_dir = fast_dir
        self.model_dir = model_dir
        self.model_name = model_name
        self.save_freq = save_freq
        self.best_psnr = -np.inf
        os.makedirs(fast_dir, exist_ok=True)
        os.makedirs(model_dir, exist_ok=True)

    def last_path(self):
        return os.path.join(self.fast_dir, f"{self.model_name}_last_model.ckpt")

    def best_path(self):
        return os.path.join(self.fast_dir, f"{self.model_name}_best_model.ckpt")

    def epoch_path(self, epoch: int):
        return os.path.join(self.model_dir, f"{self.model_name}_e{epoch:04d}.ckpt")

    def save(self, epoch: int, params, batch_stats=None, eval_psnr: Optional[float] = None):
        meta = {"epoch": epoch, "eval_psnr": eval_psnr}
        save_checkpoint(self.last_path(), params, batch_stats, meta)
        if epoch % self.save_freq == 0:
            save_checkpoint(self.epoch_path(epoch), params, batch_stats, meta)
        if eval_psnr is not None and eval_psnr > self.best_psnr:
            self.best_psnr = eval_psnr
            save_checkpoint(self.best_path(), params, batch_stats, meta)
            return True
        return False

    def restore(self, prefer: str = "best") -> Optional[dict]:
        """best -> last -> None fallback (reference: trainer_SID.py:19-31)."""
        order = [self.best_path(), self.last_path()]
        if prefer == "last":
            order.reverse()
        # Recover the best-PSNR watermark from the best checkpoint's meta so
        # a resumed run's first (possibly worse) eval cannot clobber it.
        if os.path.exists(self.best_path()):
            try:
                bmeta = load_checkpoint(self.best_path()).get("meta", {})
                if bmeta.get("eval_psnr") is not None:
                    self.best_psnr = max(self.best_psnr,
                                         float(bmeta["eval_psnr"]))
            except Exception:
                pass
        for p in order:
            if os.path.exists(p):
                try:
                    return load_checkpoint(p)
                except Exception:  # corrupted file: try the other tier
                    continue
        return None
