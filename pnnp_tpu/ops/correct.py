"""ELD-style illuminance correction (reference: data_process/__init__.py:144-175).

Least-squares brightness alignment of a prediction against its noisy source,
compensating black-level error amplified by the exposure ratio. The reference
loops per image on GPU; here it is a masked reduction vmapped over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _correct_one(predict: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    predict = jnp.clip(predict, 0.0, 1.0)
    # The reference excludes saturated source pixels (source == 1) from the fit.
    w = (source != 1.0).astype(predict.dtype)
    num = jnp.sum(predict * source * w)
    den = jnp.sum(predict * predict * w)
    # degenerate fits (fully saturated source, or an all-zero clipped
    # prediction) leave the image unscaled instead of NaN-poisoning eval
    scale = jnp.where(den > 0, num / jnp.maximum(den, 1e-20), 1.0)
    return scale * predict


def illuminance_correct(predict: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    """Align ``predict`` to ``source`` in brightness. Shapes ``[..., H, W, C]``.

    Batched inputs are corrected per image; a single source broadcasts across
    the predict batch (reference semantics).
    """
    if predict.ndim == source.ndim == 3:
        return _correct_one(predict, source)
    if predict.ndim > 4:  # fold extra leading dims so the fit is per image
        lead = predict.shape[:-3]
        out = illuminance_correct(
            predict.reshape((-1,) + predict.shape[-3:]),
            jnp.broadcast_to(source, predict.shape).reshape(
                (-1,) + predict.shape[-3:]))
        return out.reshape(lead + predict.shape[-3:])
    if source.shape[0] == 1 and predict.shape[0] != 1:
        source = jnp.broadcast_to(source, predict.shape)
    return jax.vmap(_correct_one)(predict, source)
