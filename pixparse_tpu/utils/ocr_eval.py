"""OCR eval metric assembly (parity: reference ``utils/ocr_utils.py:15-111``
``get_ocr_metrics`` post-processing).

The generation itself is the jitted KV-cached decode in
:mod:`pixparse_tpu.ops.generation`; this module reproduces the reference's
text cleanup + pairing semantics exactly: -100 -> pad restore, tag/newline
stripping, empty-pair filtering, prediction truncated to reference length,
then CER/WER.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from pixparse_tpu.utils.text_metrics import get_cer_wer_metrics

IGNORE_ID = -100


def clean_ocr_text(text: str) -> str:
    """Strip markup tags and newlines (``utils/ocr_utils.py:72-77``)."""
    return re.sub(r"<.*?>", "", re.sub("\n", " ", text))


def restore_ignored(ids: np.ndarray, pad_token_id: int) -> np.ndarray:
    out = np.asarray(ids).copy()
    out[out == IGNORE_ID] = pad_token_id
    return out


def max_target_length(
    ids: np.ndarray, pad_token_id: int, cap: int, bucket: int = 64
) -> int:
    """Per-batch decode-length cap (``utils/ocr_utils.py:60-62``), rounded UP
    to a ``bucket`` multiple: the jitted decode specializes on max_length, so
    raw per-batch values would recompile nearly every batch (the early-exit
    loop makes the extra headroom free)."""
    lengths = (np.asarray(ids) != pad_token_id).sum(axis=1)
    n = int(min(cap, lengths.max())) if lengths.size else cap
    return int(min(cap, ((n + bucket - 1) // bucket) * bucket))


def ocr_metrics_from_text(
    predictions: Sequence[str],
    references: Sequence[str],
) -> Tuple[Optional[Dict[str, float]], Optional[Dict[str, str]]]:
    """Cleaned text pairs -> ({wer, cer}, first reconstruction sample); None
    when every pair is empty after cleaning (``utils/ocr_utils.py:79-111``)."""
    preds = [clean_ocr_text(t) for t in predictions]
    refs = [clean_ocr_text(t) for t in references]
    filtered = [(r, p) for r, p in zip(refs, preds) if r and p]
    if not filtered:
        return None, None
    refs, preds = map(list, zip(*filtered))
    preds = [p[: len(r)] for p, r in zip(preds, refs)]
    metrics: Dict[str, float] = {}
    metrics = get_cer_wer_metrics(metrics, preds, refs)
    reconstruction = {"original_text": refs[0], "reconstructed_text": preds[0]}
    return metrics, reconstruction
