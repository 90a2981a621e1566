"""Profiling + MFU accounting.

The reference's only timing instrumentation is a per-eval-step decorator
(``task_cruller_eval_ocr.py:154-169`` in /root/reference) and a samples/sec
"rate" in the monitor (SURVEY.md §5.1). TPU training lives and dies by step
time and MFU, so this module adds:

- :func:`trace` — ``jax.profiler`` trace capture context (xplane dumps
  viewable in tensorboard/xprof),
- analytic matmul-FLOP accounting for the Cruller train step
  (:func:`cruller_train_flops`) and :func:`mfu` against the per-chip peak of
  the detected TPU generation.
"""

from __future__ import annotations

import contextlib
import logging
from typing import Optional

_logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture a jax.profiler trace into ``logdir`` (no-op when None)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        _logger.info("profiler trace written to %s", logdir)


# bf16 peak matmul FLOPs per chip by device_kind substring
_PEAK_FLOPS = (
    ("v5 lite", 197e12),   # v5e
    ("v5p", 459e12),
    ("v5", 459e12),
    ("v4", 275e12),
    ("v6 lite", 918e12),   # Trillium
    ("v6", 918e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def peak_flops_per_chip() -> Optional[float]:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, flops in _PEAK_FLOPS:
        if key in kind:
            return flops
    return None


def transformer_layer_flops(L: int, D: int, F: int, cross_Lk: int = 0) -> float:
    """Forward matmul FLOPs for one post-LN transformer layer at seq len L:
    self-attn projections + score/value matmuls + FFN (+ cross-attention when
    ``cross_Lk`` > 0)."""
    self_attn = 8 * L * D * D + 4 * L * L * D
    ffn = 4 * L * D * F
    cross = 0.0
    if cross_Lk:
        cross = 4 * L * D * D + 4 * cross_Lk * D * D + 4 * L * cross_Lk * D
    return float(self_attn + ffn + cross)


def swin_encoder_flops(cfg) -> float:
    """Forward matmul FLOPs for a Swin encoder (per-stage resolutions/dims,
    WINDOWED attention: the score/value term is N*w^2, not N^2)."""
    gh = cfg.img_size[0] // cfg.patch_size
    gw = cfg.img_size[1] // cfg.patch_size
    w2 = cfg.window_size ** 2
    total = 2 * gh * gw * (cfg.patch_size ** 2 * cfg.in_chans) * cfg.embed_dim
    for stage, depth in enumerate(cfg.depths):
        N = (gh // (2 ** stage)) * (gw // (2 ** stage))
        D = cfg.embed_dim * (2 ** stage)
        per_block = (
            8 * N * D * D            # qkv + out projections
            + 4 * N * w2 * D         # windowed score + value matmuls
            + 4 * N * D * int(D * cfg.mlp_ratio)  # FFN
        )
        total += depth * per_block
        if stage < len(cfg.depths) - 1:
            total += 2 * (N // 4) * (4 * D) * (2 * D)  # patch merging
    return float(total)


def cruller_train_flops(vit_cfg, bart_cfg, batch_size: int, text_len: int) -> float:
    """Matmul FLOPs for one fwd+bwd Cruller train step (bwd = 2x fwd).
    Dispatches on encoder family (ViT full attention vs Swin windowed)."""
    N = vit_cfg.num_tokens
    if hasattr(vit_cfg, "depths"):  # SwinCfg
        enc = swin_encoder_flops(vit_cfg)
    else:
        D = vit_cfg.embed_dim
        enc = 2 * N * (vit_cfg.patch_size ** 2 * vit_cfg.in_chans) * D
        enc += vit_cfg.depth * transformer_layer_flops(
            N, D, int(D * vit_cfg.mlp_ratio)
        )
    Dd = bart_cfg.d_model
    dec = bart_cfg.decoder_layers * transformer_layer_flops(
        text_len, Dd, bart_cfg.decoder_ffn_dim, cross_Lk=N
    )
    dec += 2 * text_len * Dd * bart_cfg.vocab_size  # tied LM head
    fwd = batch_size * (enc + dec)
    return 3.0 * fwd


def mfu(flops_per_step: float, step_time_s: float, n_chips: int = 1) -> Optional[float]:
    """Model FLOPs utilization in [0, 1]; None off-TPU."""
    peak = peak_flops_per_chip()
    if peak is None or step_time_s <= 0:
        return None
    return flops_per_step / step_time_s / (peak * n_chips)
