"""Task-shared vocabulary protocol + preprocessing helpers.

The special-token lists are *data* contracts with the reference checkpoints
(vocab-resize replay, SURVEY.md §5.4): the exact token sets and the
pretrain-first / finetune-second addition order determine embedding-table
shapes and ids, so they are reproduced verbatim from the reference tasks
(citations per list).
"""

from __future__ import annotations

import logging
from typing import Iterable, List

import numpy as np

_logger = logging.getLogger(__name__)


# ``task_cruller_pretrain.py:82,92-99`` in /root/reference
PRETRAIN_TASK_START = "<s_pretrain>"
SEP_TOKEN = "<sep/>"

# ``task_cruller_finetune_CORD.py:209-212`` — tokens the pretrain phase added,
# replayed before loading a pretrain checkpoint in finetune/eval tasks
SPECIAL_TOKENS_FROM_PRETRAIN = [SEP_TOKEN, PRETRAIN_TASK_START]

# ``task_cruller_finetune_CORD.py:124-182`` (57 CORD field tokens; order
# irrelevant — additions are sorted-set)
CORD_FINETUNE_TOKENS = [
    SEP_TOKEN,
    "<s_cord>",
    "</s_service_price>", "<s_subtotal_price>", "<s_discountprice>", "</s_sub>",
    "<s_sub>", "</s_total_etc>", "</s_discountprice>", "</s_vatyn>",
    "</s_subtotal_price>", "<s_changeprice>", "</s_total>", "</s_unitprice>",
    "<s_emoneyprice>", "</s_tax_price>", "</s_othersvc_price>", "</s_cnt>",
    "<s_vatyn>", "<s_unitprice>", "<s_total>", "<s_price>", "</s_price>",
    "<s_sub_total>", "</s_num>", "<s_total_etc>", "</s_creditcardprice>",
    "<s_tax_price>", "<s_menu>", "<s_nm>", "<s_menutype_cnt>",
    "</s_changeprice>", "<s_num>", "<s_itemsubtotal>", "</s_etc>",
    "<s_creditcardprice>", "</s_menuqty_cnt>", "</s_emoneyprice>",
    "<s_menuqty_cnt>", "<s_discount_price>", "</s_menu>", "</s_sub_total>",
    "<s_etc>", "</s_void_menu>", "<s_cashprice>", "</s_discount_price>",
    "</s_total_price>", "</s_nm>", "<s_service_price>", "<s_othersvc_price>",
    "</s_itemsubtotal>", "<s_void_menu>", "<s_total_price>", "</s_cashprice>",
    "</s_menutype_cnt>", "<s_cnt>",
]

# ``task_cruller_finetune_RVLCDIP.py:94-116``
RVLCDIP_FINETUNE_TOKENS = [
    SEP_TOKEN,
    "<s_rvlcdip>",
    "<s_class>", "</s_class>",
    "<advertisement/>", "<budget/>", "<email/>", "<file_folder/>", "<form/>",
    "<handwritten/>", "<invoice/>", "<letter/>", "<memo/>", "<news_article/>",
    "<presentation/>", "<questionnaire/>", "<resume/>",
    "<scientific_publication/>", "<scientific_report/>", "<specification/>",
]

# ``task_cruller_finetune_RVLCDIP.py:118-135``
RVLCDIP_INT2STR = {
    0: "letter", 1: "form", 2: "email", 3: "handwritten", 4: "advertisement",
    5: "scientific_report", 6: "scientific_publication", 7: "specification",
    8: "file_folder", 9: "news_article", 10: "budget", 11: "invoice",
    12: "presentation", 13: "questionnaire", 14: "resume", 15: "memo",
}

# ``task_cruller_finetune_docvqa.py:102-109``
DOCVQA_FINETUNE_TOKENS = [
    SEP_TOKEN,
    "<s_docvqa>", "<s_answer>",
    "<s_question>", "</s_question>", "</s_answer>",
]


def add_special_tokens(tokenizer, tokens: Iterable[str]) -> int:
    """Sorted-set special-token addition (the reference's exact call shape —
    e.g. ``task_cruller_pretrain.py:96-99``). Returns number newly added."""
    return tokenizer.add_special_tokens(
        {"additional_special_tokens": sorted(set(tokens))}
    )


def fold_image_stats(mean, std, image_fmt: str):
    """Grayscale stat folding (``task_cruller_pretrain.py:124-128``): 'L'
    images average the per-channel stats."""
    if image_fmt == "L":
        return (sum(mean) / len(mean),), (sum(std) / len(std),)
    return tuple(mean), tuple(std)


def stack_images(images: List[np.ndarray]) -> np.ndarray:
    """Stack transformed (H, W, C) float32 images into an NHWC batch."""
    return np.stack([np.asarray(im, np.float32) for im in images], axis=0)


def tokenize_batch(
    tokenizer,
    texts: List[str],
    max_length: int,
) -> np.ndarray:
    """Fixed-shape batched tokenization (the finetune collate tokenizer_fn,
    ``task_cruller_finetune_CORD.py:399-406``)."""
    out = tokenizer(
        texts,
        add_special_tokens=False,
        return_tensors="np",
        max_length=max_length,
        padding="max_length",
        truncation=True,
    )
    return out.input_ids.astype(np.int32)


def resolve_model_name(cfg) -> None:
    """Shared ``__post_init__`` body for task cfg dataclasses: resolve
    ``model_name`` through the JSON registry into ``cfg.model`` (parity with
    the block every reference task cfg repeats, e.g.
    ``task_cruller_pretrain.py:38-48``)."""
    from pixparse_tpu.models.config import get_model_config

    if cfg.model_name:
        model = get_model_config(cfg.model_name)
        if model is None:
            _logger.warning(
                f"Model config for {cfg.model_name} was not found, using defaults."
            )
        else:
            cfg.model = model
    else:
        cfg.model_name = "custom"
