"""Model config dataclasses + JSON registry.

Parity: reference ``models/config.py`` — same dataclass fields, same
``models/configs/*.json`` scan-at-import registry, natural-sorted, deep-copied
on get (``models/config.py:37-67``).
"""

from __future__ import annotations

import copy
import json
import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Tuple

from pixparse_tpu.utils.name_utils import natural_key

_logger = logging.getLogger(__name__)


@dataclass
class ImageEncoderCfg:
    name: str = "vit_base_patch16_224"
    image_fmt: str = "L"
    image_size: Optional[Tuple[int, int]] = (576, 448)
    # Reference defaults pretrained=True (models/config.py:20) via timm hub;
    # TPU hosts are offline so it is opt-in here — when True, weights resolve
    # from pretrained_path / $PIXPARSE_PRETRAINED_DIR / local hub cache and a
    # failure to resolve RAISES (models/pretrained.py).
    pretrained: bool = False
    pretrained_path: Optional[str] = None  # local timm-layout state dict


@dataclass
class TextDecoderCfg:
    name: str = "facebook/bart-base"
    pretrained: bool = False  # see ImageEncoderCfg.pretrained
    pretrained_path: Optional[str] = None  # local HF-layout state dict
    num_decoder_layers: Optional[int] = 4
    max_length: Optional[int] = 1024
    pad_token_id: Optional[int] = None


@dataclass
class ModelCfg:
    image_encoder: ImageEncoderCfg = field(default_factory=ImageEncoderCfg)
    text_decoder: TextDecoderCfg = field(default_factory=TextDecoderCfg)


_MODEL_CONFIG_PATHS = [Path(__file__).parent / "configs"]
_MODEL_CONFIGS = {}


def _load_model_cfg(d: dict) -> ModelCfg:
    enc = d.get("image_encoder", {})
    dec = d.get("text_decoder", {})
    if enc.get("image_size") is not None:
        enc = dict(enc, image_size=tuple(enc["image_size"]))
    return ModelCfg(
        image_encoder=ImageEncoderCfg(**enc),
        text_decoder=TextDecoderCfg(**dec),
    )


def _scan_model_configs():
    global _MODEL_CONFIGS
    config_ext = (".json",)
    config_files = []
    for config_path in _MODEL_CONFIG_PATHS:
        if config_path.is_file() and config_path.suffix in config_ext:
            config_files.append(config_path)
        elif config_path.is_dir():
            for ext in config_ext:
                config_files.extend(config_path.glob(f"*{ext}"))
    for cf in config_files:
        with open(cf) as fh:
            d = json.load(fh)
        try:
            _MODEL_CONFIGS[cf.stem] = _load_model_cfg(d)
        except Exception as e:  # pragma: no cover
            _logger.warning("skipping bad model config %s: %s", cf, e)
    _MODEL_CONFIGS = {
        k: v for k, v in sorted(_MODEL_CONFIGS.items(), key=lambda x: natural_key(x[0]))
    }


_scan_model_configs()


def list_models():
    return list(_MODEL_CONFIGS.keys())


def get_model_config(model_name: str) -> Optional[ModelCfg]:
    if model_name not in _MODEL_CONFIGS:
        return None
    return copy.deepcopy(_MODEL_CONFIGS[model_name])
