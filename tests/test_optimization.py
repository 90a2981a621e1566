"""Opt-in optimizer-state dtype (framework/optimization.py).

``optimizer_state_dtype='bfloat16'`` stores BOTH Adam moments in bf16 —
halving optimizer-state HBM footprint and per-step update traffic (the
north-star lever named in docs/PERF.md's cruller_base ceiling accounting).
These tests pin (a) exactness of the custom transform against optax's adam
when the state dtype is fp32, and (b) the parity DELTA of the bf16 mode:
training trajectories must stay within bf16-rounding distance of fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixparse_tpu.framework.config import OptimizationCfg
from pixparse_tpu.framework.optimization import (
    create_optimizer,
    scale_by_adam_state_dtype,
)


def _loss(p, x, y):
    pred = x @ p["w"] + p["b"]
    return jnp.mean((pred - y) ** 2)


def _make_problem(seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(64, 16), jnp.float32)
    w_true = jnp.asarray(rng.randn(16, 4), jnp.float32)
    y = x @ w_true + 0.01 * jnp.asarray(rng.randn(64, 4), jnp.float32)
    params = {
        "w": jnp.asarray(rng.randn(16, 4) * 0.1, jnp.float32),
        "b": jnp.zeros((4,), jnp.float32),
    }
    return params, x, y


def _train(tx, params, x, y, steps=60):
    state = tx.init(params)
    losses = []
    for _ in range(steps):
        loss, grads = jax.value_and_grad(_loss)(params, x, y)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    return params, losses, state


def test_state_dtype_f32_matches_optax_exactly():
    """With fp32 state the custom transform must be bit-equal to optax's
    scale_by_adam (same math, same order)."""
    params, x, y = _make_problem()
    ours = scale_by_adam_state_dtype(0.9, 0.98, 1e-6, jnp.float32)
    ref = optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-6)
    p1, l1, _ = _train(ours, params, x, y, steps=20)
    p2, l2, _ = _train(ref, params, x, y, steps=20)
    np.testing.assert_array_equal(np.asarray(p1["w"]), np.asarray(p2["w"]))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_bf16_optimizer_state_parity():
    """The opt-in's pinned parity delta: bf16-moment training follows the
    fp32-moment trajectory to within bf16 rounding accumulation."""
    params, x, y = _make_problem()
    cfg32 = OptimizationCfg(
        learning_rate=1e-2, weight_decay=0.01, betas=(0.9, 0.98),
        clip_grad_value=1.0, clip_grad_mode="norm",
    )
    cfg16 = OptimizationCfg(
        learning_rate=1e-2, weight_decay=0.01, betas=(0.9, 0.98),
        clip_grad_value=1.0, clip_grad_mode="norm",
        optimizer_state_dtype="bfloat16",
    )
    tx32, _ = create_optimizer(cfg32, 10, 1, 6)
    tx16, _ = create_optimizer(cfg16, 10, 1, 6)
    p32, l32, _ = _train(tx32, params, x, y)
    p16, l16, s16 = _train(tx16, params, x, y)

    # the moments really are stored in bf16 (the claimed memory halving)
    adam_state = [
        s for s in jax.tree_util.tree_leaves(
            s16, is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState)
        )
        if isinstance(s, optax.ScaleByAdamState)
    ]
    assert adam_state, "no ScaleByAdamState in the chain"
    for leaf in jax.tree_util.tree_leaves(adam_state[0].mu) + \
            jax.tree_util.tree_leaves(adam_state[0].nu):
        assert leaf.dtype == jnp.bfloat16

    # trajectory parity: both make the same progress (the warmup+cosine
    # schedule over 60 tiny steps converges slowly — the bar here is
    # f32-vs-bf16 agreement, not absolute convergence)
    assert l32[-1] < 0.7 * l32[0] and l16[-1] < 0.7 * l16[0]
    ref = np.asarray(p32["w"])
    got = np.asarray(p16["w"])
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
    assert rel < 0.02, f"bf16-state divergence {rel:.4f}"
    assert abs(l16[-1] - l32[-1]) < 0.1 * max(l32[-1], 1e-6) + 1e-5
