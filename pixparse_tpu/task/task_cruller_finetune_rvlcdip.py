"""RVLCDIP finetune task (parity: reference
``task/task_cruller_finetune_RVLCDIP.py``).

Classification-as-generation: the 16 document classes become ``<letter/>``
style tokens; the target sequence is ``<s_rvlcdip><class/></s>`` tokenized to
max_length **5** (reference ``:302-329``).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from pixparse_tpu.data.preprocess import text_input_to_target
from pixparse_tpu.framework.config import TaskTrainCfg
from pixparse_tpu.models.config import ModelCfg
from pixparse_tpu.task.common import (
    RVLCDIP_FINETUNE_TOKENS,
    RVLCDIP_INT2STR,
    SPECIAL_TOKENS_FROM_PRETRAIN,
    stack_images,
    tokenize_batch,
)
from pixparse_tpu.task.cruller_base import BaseCrullerTrainTask
from pixparse_tpu.tokenizers import TokenizerCfg

from pixparse_tpu.task.common import resolve_model_name

_logger = logging.getLogger(__name__)


@dataclass
class TaskCrullerFinetuneRVLCDIPCfg(TaskTrainCfg):
    model_name: Optional[str] = None
    model: ModelCfg = field(default_factory=ModelCfg)
    tokenizer: TokenizerCfg = field(default_factory=TokenizerCfg)

    def __post_init__(self):
        resolve_model_name(self)


class TaskCrullerFinetuneRVLCDIP(BaseCrullerTrainTask):
    task_start_token = "<s_rvlcdip>"
    prompt_end_token = "<s_rvlcdip>"
    base_special_tokens = SPECIAL_TOKENS_FROM_PRETRAIN
    finetune_special_tokens = RVLCDIP_FINETUNE_TOKENS
    text_anno_fn = True
    shift_in_step = False
    collate_text_length = 5  # reference ``:312`` — prompt + class + eos
    int2str = RVLCDIP_INT2STR

    def collate_fn(self, batch):
        images = [self.prepare_image(item["image"]) for item in batch]
        texts = [
            self.task_start_token
            + "<" + self.int2str[int(item["label"])] + "/>"
            + self.tokenizer.eos_token
            for item in batch
        ]
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
