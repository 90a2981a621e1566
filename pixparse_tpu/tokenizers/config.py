"""Tokenizer config + JSON registry (parity: reference ``tokenizers/config.py``)."""

from __future__ import annotations

import copy
import json
import logging
from dataclasses import dataclass
from pathlib import Path

from pixparse_tpu.utils.name_utils import natural_key

_logger = logging.getLogger(__name__)


@dataclass
class TokenizerCfg:
    # reference default is facebook/bart-large even for base models
    # (``tokenizers/config.py:16`` quirk — kept for flag parity); offline
    # environments use the 'pixparse_bytelevel' first-party tokenizer.
    name: str = "facebook/bart-large"


_TOKENIZER_CONFIG_PATHS = [Path(__file__).parent / "configs"]
_TOKENIZER_CONFIGS = {}


def _scan_tokenizer_configs():
    global _TOKENIZER_CONFIGS
    files = []
    for p in _TOKENIZER_CONFIG_PATHS:
        if p.is_dir():
            files.extend(p.glob("*.json"))
    for cf in files:
        try:
            with open(cf) as fh:
                d = json.load(fh)
            _TOKENIZER_CONFIGS[cf.stem] = TokenizerCfg(**d.get("tokenizer", {}))
        except Exception as e:  # pragma: no cover
            _logger.warning("skipping bad tokenizer config %s: %s", cf, e)
    _TOKENIZER_CONFIGS = {
        k: v
        for k, v in sorted(_TOKENIZER_CONFIGS.items(), key=lambda x: natural_key(x[0]))
    }


_scan_tokenizer_configs()


def list_tokenizers():
    return list(_TOKENIZER_CONFIGS.keys())


def get_tokenizer_config(name: str):
    if name not in _TOKENIZER_CONFIGS:
        return None
    return copy.deepcopy(_TOKENIZER_CONFIGS[name])
