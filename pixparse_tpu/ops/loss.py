"""Loss functions.

Parity: the reference trains with ``nn.CrossEntropyLoss(ignore_index=-100)``
over flattened logits (``task_cruller_pretrain.py:247-257``); here the same
mean-over-valid-tokens cross entropy, computed in fp32 regardless of compute
dtype, written as one fused XLA expression (no host-side flattening).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_ID = -100


def cross_entropy_loss(
    logits: jax.Array,  # (..., V)
    targets: jax.Array,  # (...), int ids with IGNORE_ID masked out
    ignore_id: int = IGNORE_ID,
):
    """Mean CE over non-ignored targets. Returns (loss, num_valid)."""
    logits = logits.astype(jnp.float32)
    valid = targets != ignore_id
    safe_targets = jnp.where(valid, targets, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(
        logits, safe_targets[..., None], axis=-1
    ).squeeze(-1)
    nll = (logz - true_logit) * valid
    num_valid = jnp.maximum(valid.sum(), 1)
    return nll.sum() / num_valid, valid.sum()
