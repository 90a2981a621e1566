"""CORD finetune task (parity: reference ``task/task_cruller_finetune_CORD.py``).

JSON-completion finetuning on naver-clova-ix/cord-v2: gt_parse dicts are
serialized to ``<s_key>...</s_key>`` token streams (``json2token``), tokenized
to 512, prompt/pad positions masked to -100, sequences pre-shifted in collate
(reference ``:398-435``). Vocab protocol: pretrain tokens first, then the 57
CORD field tokens (``:124-182,209-223,303-328``) — replayed by the base class
so reference checkpoints import with matching shapes.
"""

from __future__ import annotations

import logging
from ast import literal_eval
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from pixparse_tpu.data.preprocess import text_input_to_target
from pixparse_tpu.framework.config import TaskTrainCfg
from pixparse_tpu.models.config import ModelCfg
from pixparse_tpu.task.common import (
    CORD_FINETUNE_TOKENS,
    SPECIAL_TOKENS_FROM_PRETRAIN,
    stack_images,
    tokenize_batch,
)
from pixparse_tpu.task.cruller_base import BaseCrullerTrainTask
from pixparse_tpu.tokenizers import TokenizerCfg
from pixparse_tpu.utils import json2token

from pixparse_tpu.task.common import resolve_model_name

_logger = logging.getLogger(__name__)


@dataclass
class TaskCrullerFinetuneCORDCfg(TaskTrainCfg):
    model_name: Optional[str] = None
    model: ModelCfg = field(default_factory=ModelCfg)
    tokenizer: TokenizerCfg = field(default_factory=TokenizerCfg)

    def __post_init__(self):
        resolve_model_name(self)


class TaskCrullerFinetuneCORD(BaseCrullerTrainTask):
    task_start_token = "<s_cord>"
    prompt_end_token = "<s_cord>"
    base_special_tokens = SPECIAL_TOKENS_FROM_PRETRAIN
    finetune_special_tokens = CORD_FINETUNE_TOKENS
    text_anno_fn = True
    shift_in_step = False  # collate pre-shifts (reference ``:432-433``)
    collate_text_length = 512

    def collate_fn(self, batch):
        images, texts = [], []
        for item in batch:
            gt = item["ground_truth"]
            if isinstance(gt, str):
                gt = literal_eval(gt)
            tokens_from_json, _ = json2token(
                gt["gt_parse"], self.tokenizer.all_special_tokens, sort_json_key=False
            )
            texts.append(
                self.task_start_token + tokens_from_json + self.tokenizer.eos_token
            )
            images.append(self.prepare_image(item["image"]))
        text_inputs = tokenize_batch(self.tokenizer, texts, self.collate_text_length)
        targets = np.stack(
            [
                text_input_to_target(t, self.tokenizer, self.prompt_end_token)
                for t in text_inputs
            ]
        )
        return {
            "image": stack_images(images),
            "label": text_inputs[:, :-1],
            "text_target": targets[:, 1:],
        }
