"""Tokenizer wrapper (parity: reference ``tokenizers/tokenizer_hf.py:6-18``).

``TokenizerHF.trunk`` is the underlying HF tokenizer. Tokenization is pure
host-side data-plane work, so HF tokenizers are kept (they're CPU Rust code,
not torch). Name resolution adds one offline case: the first-party byte-level
tokenizer (:mod:`pixparse_tpu.tokenizers.local_bpe`).
"""

from __future__ import annotations

from pixparse_tpu.tokenizers.config import TokenizerCfg
from pixparse_tpu.tokenizers.local_bpe import LOCAL_TOKENIZER_NAME, create_bytelevel_tokenizer


def create_tokenizer(cfg: TokenizerCfg):
    assert cfg.name
    if cfg.name == LOCAL_TOKENIZER_NAME:
        return create_bytelevel_tokenizer()
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(cfg.name)


class TokenizerHF:
    def __init__(self, cfg: TokenizerCfg):
        self.trunk = create_tokenizer(cfg)
