"""Optimization layer: optax equivalents of the reference's timm-built stack.

Parity targets (SURVEY.md §7 stage 5):

- ``timm.optim.create_optimizer_v2`` (``task_cruller_pretrain.py:196-203`` in
  /root/reference): adamw with betas/eps/weight-decay and **layer-wise LR
  decay** (CORD finetune uses ``layer_decay=0.75``), 1-d params and
  ``pos_embed``/``cls_token`` excluded from weight decay.
- ``timm.scheduler.create_scheduler_v2(sched='cosine', warmup_epochs=
  num_warmup_intervals, updates_per_epoch=batches//accum)`` stepped per
  *update* (``:214-224``): linear warmup from ``warmup_lr`` to ``lr`` then
  cosine decay to ``min_lr`` over the remaining updates.
- ``timm.utils.dispatch_clip_grad`` modes norm/value/agc (``:272-277``).
- grad accumulation (``grad_accum_steps``) — here ``optax.MultiSteps`` so the
  train step stays one jitted program; DDP ``no_sync`` has no analog (the
  all-reduce is implicit in the sharded update, and XLA only pays it when the
  inner update actually runs).

No GradScaler: TPU trains in bf16 compute, fp32 params/optimizer state, which
needs no loss scaling (the reference's ``NativeScaler`` is fp16-CUDA
machinery).

Layer-decay design note: the reference hands the *whole* Cruller to timm's
layer-decay grouping. We define the depth chain explicitly for the two-tower
model: encoder embeddings (depth 0) -> encoder blocks -> decoder embeddings ->
decoder layers -> final norms/head at max depth; scale = decay^(max - depth).
This matches timm's semantics (earlier layers get geometrically smaller LR)
with a deterministic first-party grouping.
"""

from __future__ import annotations

import logging
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

from pixparse_tpu.framework.config import OptimizationCfg

_logger = logging.getLogger(__name__)


# --------------------------------------------------------------------------
# schedule
# --------------------------------------------------------------------------

def create_scheduler(
    cfg: OptimizationCfg,
    num_intervals: int,
    num_warmup_intervals: int,
    updates_per_interval: int,
    min_lr: float = 0.0,
) -> optax.Schedule:
    """Cosine-with-warmup over *updates*, from interval math (parity:
    ``create_scheduler_v2`` call in ``task_cruller_pretrain.py:214-224``)."""
    warmup_steps = max(0, num_warmup_intervals * updates_per_interval)
    total_steps = max(1, num_intervals * updates_per_interval)
    decay_steps = max(1, total_steps - warmup_steps)
    if cfg.scheduler in ("cosine", None, ""):
        return optax.warmup_cosine_decay_schedule(
            init_value=cfg.warmup_learning_rate,
            peak_value=cfg.learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=warmup_steps + decay_steps,
            end_value=min_lr,
        )
    if cfg.scheduler == "constant":
        if warmup_steps:
            return optax.linear_schedule(
                cfg.warmup_learning_rate, cfg.learning_rate, warmup_steps
            )
        return optax.constant_schedule(cfg.learning_rate)
    if cfg.scheduler == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(
                    cfg.warmup_learning_rate, cfg.learning_rate, warmup_steps
                ),
                optax.linear_schedule(cfg.learning_rate, min_lr, decay_steps),
            ],
            [warmup_steps],
        )
    raise ValueError(f"unknown scheduler {cfg.scheduler!r}")


# --------------------------------------------------------------------------
# layer-wise LR decay
# --------------------------------------------------------------------------

def _path_names(path) -> Tuple[str, ...]:
    names = []
    for p in path:
        key = getattr(p, "key", None)
        if key is None:
            key = getattr(p, "name", str(p))
        names.append(str(key))
    return tuple(names)


def cruller_layer_depth(
    names: Tuple[str, ...], encoder_depth: int, decoder_layers: int
) -> int:
    """Depth id for a Cruller param path. 0 = input embeddings, max =
    decoder output side. Non-Cruller paths (e.g. a classification head) get
    max depth."""
    max_depth = encoder_depth + decoder_layers + 2
    if "image_encoder" in names:
        for n in names:
            if n.startswith("blocks_"):
                return int(n.split("_")[1]) + 1
            if n.startswith("layers_") and "_blocks_" in n:
                # Swin: layers_{stage}_blocks_{b} -> a coarse per-stage depth
                # spread over the encoder range (timm's coarse group_matcher
                # semantics; fine-grained per-block ids need stage depths)
                stage = int(n.split("_")[1])
                return min(1 + stage * max(1, encoder_depth // 4), encoder_depth)
        if any(n in ("patch_embed", "patch_norm", "cls_token", "pos_embed", "norm_pre") for n in names):
            return 0
        # final encoder norm sits atop the last block
        return encoder_depth + 1
    if "text_decoder" in names:
        base = encoder_depth + 1
        for n in names:
            if n.startswith("layers_"):
                return base + int(n.split("_")[1]) + 1
        if any(
            n in ("embed_tokens", "embed_positions", "layernorm_embedding")
            for n in names
        ):
            # decoder input embeddings: same depth as the decoder entry point.
            # NOTE: embed_tokens doubles as the tied LM head; timm would place
            # a head at max depth — the tie forces one choice, we pick input.
            return base
        return max_depth
    return max_depth


def layer_decay_scales(
    params: Any,
    layer_decay: float,
    encoder_depth: int,
    decoder_layers: int,
) -> Any:
    """Per-leaf LR multiplier tree: decay^(max_depth - depth)."""
    max_depth = encoder_depth + decoder_layers + 2

    def leaf_scale(path, _leaf):
        depth = cruller_layer_depth(_path_names(path), encoder_depth, decoder_layers)
        return layer_decay ** (max_depth - depth)

    return jax.tree_util.tree_map_with_path(leaf_scale, params)


def scale_by_layer_decay(
    layer_decay: float, encoder_depth: int, decoder_layers: int
) -> optax.GradientTransformation:
    """Stateless per-leaf update scaling by parameter-path depth. Path-based
    (computed on the update tree itself), so the transformation can be built
    before params exist."""
    max_depth = encoder_depth + decoder_layers + 2

    def leaf_scale(path, u):
        depth = cruller_layer_depth(_path_names(path), encoder_depth, decoder_layers)
        return u * (layer_decay ** (max_depth - depth))

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree_util.tree_map_with_path(leaf_scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


# --------------------------------------------------------------------------
# Adam with reduced-precision stored moments (opt-in)
# --------------------------------------------------------------------------

def scale_by_adam_state_dtype(
    b1: float, b2: float, eps: float, state_dtype
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with BOTH moments stored in ``state_dtype``.

    bf16 moments halve optimizer-state HBM — footprint AND the per-step
    update traffic (the Adam update is bandwidth-bound: reads p/m/v/g and
    writes p/m/v; see docs/PERF.md cruller_base ceiling accounting). The
    update math runs in fp32 on upcast moments; only the carried state is
    rounded, so the perturbation is bf16 quantization noise on m/v — the
    parity delta is pinned in tests/test_optimization.py. optax's own
    ``mu_dtype`` covers only the first moment; this covers both.
    """
    state_dtype = jnp.dtype(state_dtype)
    tree_map = jax.tree_util.tree_map

    def init_fn(params):
        def zeros(p):
            return jnp.zeros_like(p, dtype=state_dtype)

        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=tree_map(zeros, params),
            nu=tree_map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        b1c = 1.0 - b1 ** count.astype(jnp.float32)
        b2c = 1.0 - b2 ** count.astype(jnp.float32)
        mu32 = tree_map(
            lambda g, m: b1 * m.astype(jnp.float32)
            + (1.0 - b1) * g.astype(jnp.float32),
            updates, state.mu,
        )
        nu32 = tree_map(
            lambda g, v: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            updates, state.nu,
        )
        new_updates = tree_map(
            lambda g, m, v: ((m / b1c) / (jnp.sqrt(v / b2c) + eps)).astype(
                g.dtype
            ),
            updates, mu32, nu32,
        )
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=tree_map(lambda m: m.astype(state_dtype), mu32),
            nu=tree_map(lambda v: v.astype(state_dtype), nu32),
        )
        return new_updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def _resolve_state_dtype(name: str):
    name = (name or "float32").lower()
    if name in ("float32", "fp32", "f32", ""):
        return None  # default: optax's own fp32-state adam
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(f"unknown optimizer_state_dtype {name!r}")


# --------------------------------------------------------------------------
# weight-decay mask
# --------------------------------------------------------------------------

_NO_DECAY_NAMES = ("pos_embed", "cls_token", "bias", "scale")


def default_weight_decay_mask(params: Any) -> Any:
    """timm semantics: decay only >=2-d params, excluding pos_embed/cls_token
    (``timm.optim.param_groups_weight_decay``); LayerNorm scales/biases are
    1-d and fall out automatically."""

    def mask_leaf(path, leaf):
        names = _path_names(path)
        if any(n in _NO_DECAY_NAMES for n in names):
            return False
        return getattr(leaf, "ndim", 0) >= 2

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


# --------------------------------------------------------------------------
# optimizer factory
# --------------------------------------------------------------------------

def create_optimizer(
    cfg: OptimizationCfg,
    num_intervals: int,
    num_warmup_intervals: int,
    updates_per_interval: int,
    encoder_depth: int = 0,
    decoder_layers: int = 0,
    wrap_multisteps: bool = True,
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """OptimizationCfg -> (optax transformation, lr schedule). Weight-decay
    masks and layer-decay scales are computed lazily from parameter paths, so
    no param tree is needed up front.

    The returned transformation already includes grad clipping, weight decay
    masking, layer-decay scaling, the LR schedule, and — when
    ``wrap_multisteps`` — grad accumulation (``optax.MultiSteps`` when
    ``grad_accum_steps > 1``). Pass ``wrap_multisteps=False`` when the train
    step accumulates micro-batch gradients itself
    (``make_train_step(grad_accum_steps=...)``): the in-step scan holds no
    persistent full-gradient accumulator, which MultiSteps does (~4 bytes /
    param of optimizer state — the difference between cruller_large B=8
    fitting on a v5e chip or not).
    """
    schedule = create_scheduler(
        cfg, num_intervals, num_warmup_intervals, updates_per_interval
    )

    chain = []
    if cfg.clip_grad_value is not None:
        mode = cfg.clip_grad_mode or "norm"
        if mode == "norm":
            chain.append(optax.clip_by_global_norm(cfg.clip_grad_value))
        elif mode == "value":
            chain.append(optax.clip(cfg.clip_grad_value))
        elif mode == "agc":
            chain.append(optax.adaptive_grad_clip(cfg.clip_grad_value))
        else:
            raise ValueError(f"unknown clip_grad_mode {mode!r}")

    name = (cfg.optimizer or "adamw").lower()
    betas = tuple(cfg.betas) if cfg.betas else (0.9, 0.999)
    state_dtype = _resolve_state_dtype(
        getattr(cfg, "optimizer_state_dtype", "float32")
    )
    if name in ("adamw", "adam"):
        if state_dtype is None:
            chain.append(
                optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=cfg.eps)
            )
        else:
            chain.append(
                scale_by_adam_state_dtype(
                    betas[0], betas[1], cfg.eps, state_dtype
                )
            )
        if name == "adamw" and cfg.weight_decay:
            chain.append(
                optax.add_decayed_weights(
                    cfg.weight_decay, mask=default_weight_decay_mask
                )
            )
    elif name in ("sgd", "momentum"):
        momentum = cfg.momentum if cfg.momentum is not None else 0.9
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=name == "momentum"))
        if cfg.weight_decay:
            chain.append(
                optax.add_decayed_weights(
                    cfg.weight_decay, mask=default_weight_decay_mask
                )
            )
    elif name == "lamb":
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=cfg.eps))
        if cfg.weight_decay:
            chain.append(
                optax.add_decayed_weights(
                    cfg.weight_decay, mask=default_weight_decay_mask
                )
            )
        chain.append(optax.scale_by_trust_ratio())
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    if cfg.layer_decay is not None and cfg.layer_decay < 1.0:
        chain.append(
            scale_by_layer_decay(cfg.layer_decay, encoder_depth, decoder_layers)
        )

    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)
    if wrap_multisteps and cfg.grad_accum_steps and cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx, schedule
