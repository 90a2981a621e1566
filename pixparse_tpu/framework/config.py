"""Shared train/eval config dataclasses.

Flag-surface parity with reference ``framework/config.py:5-39``; additions are
TPU-specific knobs (mesh axis sizes) that default to the reference behaviour
(pure data parallel).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class OptimizationCfg:
    optimizer: str = "adamw"
    scheduler: str = "cosine"
    learning_rate: float = 5e-4
    warmup_learning_rate: float = 0.0
    weight_decay: float = 0.02
    eps: float = 1e-6
    clip_grad_value: Optional[float] = None
    clip_grad_mode: Optional[str] = None  # 'norm' | 'value' | 'agc'(->norm)
    grad_accum_steps: int = 1
    momentum: Optional[float] = None
    betas: Optional[Tuple[float, float]] = None
    layer_decay: Optional[float] = None
    # 'bfloat16': store Adam moments (m AND v) in bf16 — halves optimizer
    # state HBM (footprint + per-step update traffic); update math still
    # runs in fp32 on upcast moments. Opt-in: the stored-moment rounding
    # perturbs training at bf16 noise level (parity-delta test-pinned —
    # tests/test_optimization.py::test_bf16_optimizer_state_parity).
    optimizer_state_dtype: str = "float32"


@dataclass
class MeshCfg:
    """TPU mesh axis sizes. 0/None = infer: data axis absorbs all remaining
    devices. Reference parity = all-data (DDP equivalent)."""

    data: int = 0  # 0 => all remaining devices
    fsdp: int = 1
    model: int = 1


@dataclass
class TaskTrainCfg:
    num_intervals: int = 100
    num_warmup_intervals: int = 5
    eval_frequency: int = 1000
    opt: OptimizationCfg = field(default_factory=OptimizationCfg)
    dtype: Optional[str] = None  # compute dtype: 'bfloat16'/'bf16'/'float16'/None(fp32)
    amp: bool = True  # kept for flag parity; TPU path = bf16 compute policy
    # None/'auto' = size heuristic; 'none'/'full'/'dots'/'mlp' force a policy
    # ('mlp' recomputes only the wide MLP activations — the cruller_large
    # recipe; see models/vit.py::_remat_policy)
    remat: Optional[str] = None
    attn_impl: str = "auto"  # 'auto' (flash on TPU) | 'xla' | 'flash'
    model_name: str = ""
    mesh: MeshCfg = field(default_factory=MeshCfg)
    # ship uint8 images host->device (4x smaller transfer) and fuse the
    # normalize into the train step (ops/preprocess.py normalize_images)
    device_preprocess: bool = False
    # train-time augmentation pipeline: 'legacy' (reference task default) |
    # 'better' | 'nougat' (data/transforms.py); None = task default
    transforms: Optional[str] = None


@dataclass
class TaskEvalCfg:
    dtype: Optional[str] = None
    amp: bool = True
    attn_impl: str = "auto"  # 'auto' (flash on TPU) | 'xla' | 'flash'
    model_name: str = ""
    mesh: MeshCfg = field(default_factory=MeshCfg)
    # ship uint8 canvas images host->device (4x smaller transfer) and fuse
    # the normalize into the encoder program (ops/preprocess.py)
    device_preprocess: bool = False
    # opt-in int8 decode mode (--task.kv-cache-dtype int8): quantized
    # cross-KV cache + pre-quantized tied LM head — halves the decode loop's
    # dominant HBM traffic (~+13% pages/s measured; see docs/PERF.md).
    # Measured quality delta on the synthetic eval harness is recorded in
    # docs/PERF.md "int8 decode quality"; bf16 stays the parity default.
    kv_cache_dtype: str = "bf16"  # 'bf16' | 'int8'
    lm_head_dtype: str = "bf16"  # 'bf16' | 'int8'
