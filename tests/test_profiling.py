"""FLOP accounting / MFU tests."""

from pixparse_tpu.framework.profiling import (
    cruller_train_flops,
    mfu,
    peak_flops_per_chip,
    transformer_layer_flops,
)
from pixparse_tpu.models.config import get_model_config
from pixparse_tpu.models.cruller import resolve_cruller_cfgs


def test_layer_flops_scaling():
    base = transformer_layer_flops(128, 64, 256)
    assert transformer_layer_flops(256, 64, 256) > 2 * base  # L² attention term
    assert transformer_layer_flops(128, 64, 256, cross_Lk=128) > base


def test_cruller_flops_magnitude():
    cfg = get_model_config("cruller_base")
    vit_cfg, bart_cfg, _ = resolve_cruller_cfgs(cfg)
    flops = cruller_train_flops(vit_cfg, bart_cfg, 8, 1023)
    # ViT-B at 1008 tokens + 4-layer bart-base decoder, B=8 fwd+bwd:
    # order of a few TFLOPs
    assert 1e12 < flops < 1e14
    # scales linearly in batch
    assert abs(flops / cruller_train_flops(vit_cfg, bart_cfg, 1, 1023) - 8) < 1e-6


def test_mfu_cpu_is_none():
    assert peak_flops_per_chip() is None  # tests run on CPU
    assert mfu(1e12, 0.1) is None
