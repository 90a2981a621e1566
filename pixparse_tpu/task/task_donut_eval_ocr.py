"""Donut baseline OCR eval task (parity: reference
``task/task_donut_eval_ocr.py``).

Runs the *published* HF Donut model (``naver-clova-ix/donut-base-finetuned-
cord-v2``) through the same eval harness/metrics so Cruller numbers have an
external reference point (SURVEY.md §4). Model/processor loading goes through
the ``_load_hf`` hook: production resolves the hub name (or a local path);
tests inject a locally-constructed tiny ``VisionEncoderDecoderModel`` so the
full step/metrics path runs offline (``tests/test_donut_eval.py``).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any, Dict

import numpy as np

from pixparse_tpu.framework.config import TaskEvalCfg
from pixparse_tpu.framework.task import TaskEval
from pixparse_tpu.models.config import ModelCfg
from pixparse_tpu.tokenizers import TokenizerCfg
from pixparse_tpu.utils.ocr_eval import ocr_metrics_from_text

_logger = logging.getLogger(__name__)


@dataclass
class TaskDonutEvalOCRCfg(TaskEvalCfg):
    model_name: str = "naver-clova-ix/donut-base-finetuned-cord-v2"
    model: ModelCfg = field(default_factory=ModelCfg)
    tokenizer: TokenizerCfg = field(default_factory=TokenizerCfg)

    def __post_init__(self):
        pass  # external HF model; no local registry resolution


class TaskDonutEvalOCR(TaskEval):
    """External-baseline eval: HF Donut greedy generation + CER/WER
    (reference ``:44-47,105-178``)."""

    def __init__(self, cfg: TaskDonutEvalOCRCfg, device_env, monitor=None):
        super().__init__(cfg, device_env, monitor)
        self.processor, self.model = self._load_hf(cfg.model_name)
        self.model.eval()
        self.task_prompt = "<s_cord-v2>"
        # the eval pipe calls anno_preprocess(anno); the baseline needs the
        # RAW page text as reference (no tokenization)
        self.anno_preprocess_eval = self._raw_text_anno
        self.image_preprocess_eval = lambda img: img  # processor handles it

    @staticmethod
    def _load_hf(model_name: str):
        """Load the HF processor+model (hub name or local path). Split out so
        tests can inject a locally-constructed tiny model (no hub access)."""
        try:
            from transformers import DonutProcessor, VisionEncoderDecoderModel
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "donut_eval_ocr needs the transformers inference stack"
            ) from e
        return (
            DonutProcessor.from_pretrained(model_name),
            VisionEncoderDecoderModel.from_pretrained(model_name),
        )

    @staticmethod
    def _raw_text_anno(anno):
        pages = anno.get("pages", []) if isinstance(anno, dict) else []
        text = "\n".join(pages[0].get("text", [])) if pages else str(anno)
        return {"text": [text], "target": [text]}

    def collate_fn(self, batch):
        return batch

    def setup(self):
        pass

    def prepare_for_evaluation(self, loaders) -> Dict[str, Any]:
        return {name: loader for name, loader in loaders.items() if "eval" in name}

    def step(self, sample) -> Dict[str, Any]:
        import re

        import torch

        if isinstance(sample, (tuple, list)) and len(sample) >= 2 and not isinstance(
            sample[0], dict
        ):
            images, texts = sample[0], sample[1]
        elif isinstance(sample, (tuple, list)):
            # list of per-sample dicts (hf-dataset path collate passthrough)
            images = [s["image"] for s in sample]
            texts = [s.get("text", "") for s in sample]
        else:
            images, texts = sample["image"], sample["text"]
        predictions, references = [], []
        for img, ref in zip(images, texts):
            pixel_values = self.processor(img, return_tensors="pt").pixel_values
            decoder_input_ids = self.processor.tokenizer(
                self.task_prompt, add_special_tokens=False, return_tensors="pt"
            ).input_ids
            unk = self.processor.tokenizer.unk_token_id
            with torch.inference_mode():
                outputs = self.model.generate(
                    pixel_values,
                    decoder_input_ids=decoder_input_ids,
                    max_length=self.model.decoder.config.max_position_embeddings,
                    pad_token_id=self.processor.tokenizer.pad_token_id,
                    eos_token_id=self.processor.tokenizer.eos_token_id,
                    use_cache=True,
                    # reference passes this unconditionally
                    # (task_donut_eval_ocr.py:139); tokenizers without an unk
                    # token (e.g. byte-level) must skip it
                    bad_words_ids=[[unk]] if unk is not None else None,
                )
            seq = self.processor.batch_decode(outputs)[0]
            seq = seq.replace(self.processor.tokenizer.eos_token, "").replace(
                self.processor.tokenizer.pad_token, ""
            )
            seq = re.sub(r"<.*?>", "", seq, count=1).strip()
            predictions.append(seq)
            references.append(ref if isinstance(ref, str) else str(ref))
        metrics, _ = ocr_metrics_from_text(predictions, references)
        return metrics or {}

    def average_metrics(self, metrics: Dict[int, Dict[str, float]]):
        wer = [m["wer"] for m in metrics.values() if "wer" in m]
        cer = [m["cer"] for m in metrics.values() if "cer" in m]
        if not wer:
            return {}
        return {"wer": float(np.mean(wer)), "cer": float(np.mean(cer))}

    def end(self):
        pass
