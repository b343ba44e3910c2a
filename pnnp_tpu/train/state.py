"""Train state: params + Adam + optional batch_stats, orbax-serializable.

The LR schedule is *not* baked into the optimizer: the reference drives its
LambdaLR per epoch as a pure function (base_trainer.py:33-43), so our train
step takes the epoch as a traced argument and scales the Adam direction by
``lr_schedule(epoch)`` — one compiled step serves the whole run.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_adam_direction(beta1: float = 0.9, beta2: float = 0.999,
                        clip_norm: float | None = None) -> optax.GradientTransformation:
    """Adam *direction* (descent, unit lr); the step scales it by lr(epoch).

    ``clip_norm`` prepends global-norm gradient clipping — use for density
    models (proxy / NoiseFlow NLL), whose tail terms can spike the gradient
    and diverge the quantile scales at fixed lr (observed: proxy KLD
    0.05 -> 2.1 between steps 200-400 without clipping).
    """
    steps = [optax.scale_by_adam(b1=beta1, b2=beta2), optax.scale(-1.0)]
    if clip_norm is not None:
        steps.insert(0, optax.clip_by_global_norm(clip_norm))
    return optax.chain(*steps)


def create_train_state(rng: jax.Array, model, example_input, **adam_kw) -> TrainState:
    variables = model.init(rng, example_input)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=make_adam_direction(**adam_kw),
        batch_stats=variables.get("batch_stats"),
    )


def apply_scaled_updates(state: TrainState, grads, lr) -> TrainState:
    """grads -> Adam direction -> scale by lr -> apply."""
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    updates = jax.tree.map(lambda u: u * lr, updates)
    new_params = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=new_params, opt_state=new_opt)
