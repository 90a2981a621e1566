"""Deterministic offline byte-level tokenizer.

TPU training hosts frequently have zero network egress, so
``AutoTokenizer.from_pretrained('facebook/bart-large')`` (the reference path,
``tokenizers/tokenizer_hf.py:6-13``) is not always available. This module
builds a fully functional byte-level tokenizer *programmatically*: a BPE model
with the 256-entry byte alphabet and no merges, wrapped in
``PreTrainedTokenizerFast`` so it exposes the complete HF tokenizer API the
framework uses (``__call__`` with padding/truncation, ``add_special_tokens``,
``convert_tokens_to_ids``, ``batch_decode``, ``get_added_vocab``, ``len()``).

Every string tokenizes to its bytes — no vocabulary files, no downloads,
bit-identical across hosts. BART special-token conventions are kept
(<s>=bos, <pad>, </s>=eos, <unk>).
"""

from __future__ import annotations

LOCAL_TOKENIZER_NAME = "pixparse_bytelevel"


def create_bytelevel_tokenizer():
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    alphabet = sorted(pre_tokenizers.ByteLevel.alphabet())
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for ch in alphabet:
        vocab[ch] = len(vocab)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    wrapped = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<s>",
        eos_token="</s>",
        pad_token="<pad>",
        unk_token="<unk>",
        model_max_length=1 << 20,
    )
    return wrapped
