"""CORD eval task (parity: reference ``task/task_cruller_eval_cord.py``).

JSON-completion eval on cord-v2 test: greedy decode from ``<s_cord>``,
``token2json`` both sides, per-sample nTED accuracy + run-level field micro-F1
(reference ``:336-387``). The reference decodes per-sample, re-encoding the
full string every step; here it is one batched jitted KV-cached decode.
"""

from __future__ import annotations

import logging
from ast import literal_eval
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np

from pixparse_tpu.data.preprocess import text_input_to_target
from pixparse_tpu.framework.config import TaskEvalCfg
from pixparse_tpu.models.config import ModelCfg
from pixparse_tpu.task.common import (
    CORD_FINETUNE_TOKENS,
    SPECIAL_TOKENS_FROM_PRETRAIN,
    stack_images,
    tokenize_batch,
)
from pixparse_tpu.task.cruller_base import BaseCrullerEvalTask
from pixparse_tpu.tokenizers import TokenizerCfg
from pixparse_tpu.utils import JSONParseEvaluator, json2token, token2json

from pixparse_tpu.task.common import resolve_model_name

_logger = logging.getLogger(__name__)


@dataclass
class TaskCrullerEvalCORDCfg(TaskEvalCfg):
    model_name: Optional[str] = None
    model: ModelCfg = field(default_factory=ModelCfg)
    tokenizer: TokenizerCfg = field(default_factory=TokenizerCfg)

    def __post_init__(self):
        resolve_model_name(self)


class TaskCrullerEvalCORD(BaseCrullerEvalTask):
    task_start_token = "<s_cord>"
    prompt_end_token = "<s_cord>"
    base_special_tokens = SPECIAL_TOKENS_FROM_PRETRAIN
    finetune_special_tokens = CORD_FINETUNE_TOKENS
    max_generation_length = 512

    def __init__(self, cfg: TaskCrullerEvalCORDCfg, device_env, monitor=None):
        super().__init__(cfg, device_env, monitor)
        self.evaluator = JSONParseEvaluator()
        self.all_ground_truths = []
        self.all_predictions = []
        self.acc_list = []

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

    def prepare_for_evaluation(self, loaders) -> Dict[str, Any]:
        return {
            name: loader for name, loader in loaders.items() if "eval" in name
        }

    def step(self, batch) -> Dict[str, Any]:
        images = np.asarray(batch["image"], np.float32)
        labels = np.asarray(batch["label"])
        prompt = self.prompt_ids(self.task_start_token, images.shape[0])
        generated = self.generate_text(images, prompt, self.max_generation_length)
        acc = 0.0
        for row_label, text in zip(labels, generated):
            decoded_gt = self.tokenizer.decode(
                row_label[row_label != self.tokenizer.pad_token_id].astype(np.int64)
            )
            ground_truth = token2json(decoded_gt)
            predicted_json = token2json(text)
            self.all_predictions.append(predicted_json)
            self.all_ground_truths.append(ground_truth)
            acc = self.evaluator.cal_acc(predicted_json, ground_truth)
            self.acc_list.append(acc)
        # parity quirk: reference reports only the *last* sample's acc per
        # batch (``:381``); run-level averages below are the real metric
        return {"batch_accuracy": acc}

    def average_metrics(self, metrics: Dict[int, Dict[str, float]]):
        avg_accuracy = float(np.mean(self.acc_list)) if self.acc_list else 0.0
        f1 = self.evaluator.cal_f1(self.all_predictions, self.all_ground_truths)
        self.all_ground_truths = []
        self.all_predictions = []
        self.acc_list = []
        return {"average_accuracy": avg_accuracy, "f1_score": f1}

    def end(self):
        pass
