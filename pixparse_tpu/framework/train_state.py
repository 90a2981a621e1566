"""Functional train state + jitted sharded step factories.

This is the TPU-native replacement for the reference's mutable Task fields +
DDP wrapping + NativeScaler (``task_cruller_pretrain.py:179-224,236-295`` in
/root/reference). One functional state pytree, one jitted train step:

- params/opt-state shardings come from the module's logical axis annotations
  mapped through the mesh rules (:mod:`pixparse_tpu.parallel.mesh`); the
  default rules give reference parity (params replicated, batch sharded over
  ``data``) and turning on ``fsdp``/``model`` mesh axes shards params with no
  model-code changes.
- state is initialized *inside* jit with sharding constraints on params —
  GSPMD propagates the same layout to the optimizer state, so adam moments /
  grad-accum buffers land sharded without hand-written opt-state specs.
- the gradient all-reduce the reference gets from DDP buckets is implicit:
  batch is sharded, params are replicated, so XLA inserts one fused
  all-reduce over ICI for the grads inside the compiled step.
- dropout rng is threaded per-step (``fold_in(step)``) — stateless, identical
  across restarts from a checkpoint at the same step.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pixparse_tpu.parallel.mesh import logical_sharding

_logger = logging.getLogger(__name__)


class TrainState(struct.PyTreeNode):
    step: jax.Array  # () int32 — optimizer updates completed (micro-steps when no accum)
    params: Any
    opt_state: Any
    rng: jax.Array  # base dropout key; per-step key = fold_in(rng, step)

    def lr(self, schedule: optax.Schedule, grad_accum_steps: int = 1) -> float:
        """Current learning rate (host-side, for logging)."""
        return float(schedule(int(self.step) // max(1, grad_accum_steps)))


def param_shardings(model: nn.Module, mesh: Mesh, init_fn: Callable) -> Any:
    """Evaluate module init shape-only and map logical axis names to mesh
    NamedShardings (unboxed tree)."""
    shapes = jax.eval_shape(init_fn)
    logical = nn.get_partition_spec(shapes)["params"]
    return jax.tree_util.tree_map(
        lambda spec: logical_sharding(spec, mesh)
        if isinstance(spec, P)
        else NamedSharding(mesh, P()),
        logical,
        is_leaf=lambda x: isinstance(x, P),
    )


def create_train_state(
    model: nn.Module,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    example_inputs: Tuple,
    seed: int = 0,
    init_kwargs: Optional[dict] = None,
) -> Tuple[TrainState, Any]:
    """Initialize a sharded TrainState on the mesh.

    Returns (state, param_shardings). Params are constrained to their logical
    shardings inside jit; optimizer state inherits layouts via propagation.
    """
    init_kwargs = init_kwargs or {}
    init_rng = jax.random.PRNGKey(seed)
    train_rng = jax.random.PRNGKey(seed + 1)

    def init_fn():
        return model.init(init_rng, *example_inputs, **init_kwargs)

    p_shardings = param_shardings(model, mesh, init_fn)

    params_treedef = jax.tree_util.tree_structure(
        jax.eval_shape(lambda: nn.unbox(init_fn()["params"]))
    )

    def constrain_opt_state(opt_state):
        """Pin param-shaped subtrees (adam moments, accum buffers) to the
        param shardings. Without this XLA replicates zeros_like-initialized
        moments (a constant broadcast has no layout pressure), silently
        defeating fsdp/ZeRO memory savings."""

        def is_param_tree(x):
            return (
                not isinstance(x, jax.Array)
                and jax.tree_util.tree_structure(x) == params_treedef
            )

        def fix(sub):
            if is_param_tree(sub):
                return jax.tree_util.tree_map(
                    jax.lax.with_sharding_constraint, sub, p_shardings
                )
            return sub

        return jax.tree_util.tree_map(fix, opt_state, is_leaf=is_param_tree)

    def make_state():
        variables = init_fn()
        params = nn.unbox(variables["params"])
        params = jax.lax.with_sharding_constraint(params, p_shardings)
        opt_state = constrain_opt_state(tx.init(params))
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            rng=train_rng,
        )

    with mesh:
        state = jax.jit(make_state)()
    return state, p_shardings


def make_train_step(
    loss_fn: Callable,  # (params, batch, rng) -> (loss, aux_dict)
    tx: optax.GradientTransformation,
    mesh: Mesh,
    donate: bool = True,
    skip_nonfinite: bool = True,
    grad_accum_steps: int = 1,
) -> Callable:
    """Build the jitted train step: grad, clip/decay/schedule via ``tx``,
    apply, metrics. ``loss_fn`` closes over the model apply.

    ``skip_nonfinite``: a NaN/inf gradient step is dropped (params/opt state
    unchanged, step still counts) and surfaced via ``metrics['nonfinite']`` —
    the NaN-guard SURVEY.md §5.2 calls for (the reference has none; one bad
    batch poisons the run).

    ``grad_accum_steps > 1``: the step consumes a STACKED batch — every leaf
    shaped (accum, micro_B, ...) (``shard_batch(..., stacked=True)``) — and
    accumulates mean gradients over the micro-batches with a ``lax.scan``
    inside the step before ONE optimizer update. Unlike ``optax.MultiSteps``
    this holds no persistent full-gradient accumulator in the optimizer
    state (~2.6 GB fp32 for cruller_large — the config where HBM is the
    binding constraint); the scan carry frees before the update applies.
    Reference semantics: ``task_cruller_pretrain.py:244-286`` (grad
    accumulation with DDP no_sync) — mean of micro-batch grads, LR schedule
    stepped per UPDATE."""

    def _step_key(state):
        # derive the per-step key from the stored raw key, then hand the
        # model an rbg-typed key: dropout masks over (B, L, 4D) activations
        # via threefry cost ~10 ms of xor-chain VPU fusions per cruller_base
        # step; RngBitGenerator is near-free and still deterministic per
        # (seed, step). The stored key may be threefry-shaped (2,) or — when
        # jax_default_prng_impl=rbg is set (app/train.py, bench.py) —
        # already rbg-shaped (4,).
        base_rng = jax.random.fold_in(state.rng, state.step)
        data = jnp.asarray(base_rng)
        if jnp.issubdtype(data.dtype, jax.dtypes.prng_key):
            return base_rng  # already a typed key
        if data.shape[-1] == 4:
            return jax.random.wrap_key_data(data, impl="rbg")
        return jax.random.wrap_key_data(jnp.tile(data, 2), impl="rbg")

    def train_step(state: TrainState, batch) -> Tuple[TrainState, dict]:
        step_rng = _step_key(state)
        if grad_accum_steps > 1:
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

            def micro(carry, xs):
                idx, mb = xs
                (l, aux), g = grad_fn(
                    state.params, mb, jax.random.fold_in(step_rng, idx)
                )
                loss_sum, grads_sum = carry
                return (
                    loss_sum + l,
                    jax.tree_util.tree_map(jnp.add, grads_sum, g),
                ), aux

            init = (
                jnp.zeros((), jnp.float32),
                jax.tree_util.tree_map(jnp.zeros_like, state.params),
            )
            (loss_sum, grads_sum), aux = jax.lax.scan(
                micro, init, (jnp.arange(grad_accum_steps), batch)
            )
            loss = loss_sum / grad_accum_steps
            grads = jax.tree_util.tree_map(
                lambda g: g / grad_accum_steps, grads_sum
            )
            aux = jax.tree_util.tree_map(lambda a: a[-1], aux)
        else:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, step_rng
            )
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(loss=loss, grad_norm=grad_norm)
        if skip_nonfinite:
            ok = jnp.isfinite(grad_norm) & jnp.isfinite(loss)
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_params, state.params
            )
            new_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old)
                if isinstance(new, jax.Array) and new.ndim == old.ndim
                else new,
                new_opt_state,
                state.opt_state,
            )
            metrics["nonfinite"] = (~ok).astype(jnp.int32)
        metrics.update(aux)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    jitted = jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def run(state, batch):
        with mesh:
            return jitted(state, batch)

    return run


def make_eval_step(apply_fn: Callable, mesh: Mesh) -> Callable:
    """Jitted deterministic forward for eval metrics: (params, batch) -> out."""
    jitted = jax.jit(apply_fn)

    def run(params, batch):
        with mesh:
            return jitted(params, batch)

    return run
