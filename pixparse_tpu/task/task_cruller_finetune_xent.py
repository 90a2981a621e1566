"""Cross-entropy classifier finetune task (parity: reference
``task/task_cruller_finetune_xent.py``).

Head-on-encoder path: the pretrained Cruller image encoder + CLS-token pool +
``Linear(embed_dim, 16)`` classifier trained with plain cross-entropy on
RVLCDIP labels (reference ``:28-30,150-156,251-260``). The text decoder is
dropped entirely.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pixparse_tpu.framework.config import TaskTrainCfg
from pixparse_tpu.framework.optimization import create_optimizer
from pixparse_tpu.framework.train_state import create_train_state, make_train_step
from pixparse_tpu.models.config import ModelCfg
from pixparse_tpu.models.vit import ViT
from pixparse_tpu.task.common import SPECIAL_TOKENS_FROM_PRETRAIN, stack_images
from pixparse_tpu.task.cruller_base import BaseCrullerTrainTask
from pixparse_tpu.tokenizers import TokenizerCfg

from pixparse_tpu.task.common import resolve_model_name

_logger = logging.getLogger(__name__)

NUM_CLASSES = 16  # RVLCDIP


@dataclass
class TaskCrullerFinetuneXentCfg(TaskTrainCfg):
    model_name: Optional[str] = None
    model: ModelCfg = field(default_factory=ModelCfg)
    tokenizer: TokenizerCfg = field(default_factory=TokenizerCfg)

    def __post_init__(self):
        resolve_model_name(self)


class CrullerClassifier(nn.Module):
    """encoder -> CLS token -> linear head (reference Sequential equivalent)."""

    vit_cfg: Any
    num_classes: int = NUM_CLASSES
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        x = ViT(self.vit_cfg, dtype=self.dtype, name="encoder")(
            images, deterministic=deterministic
        )
        cls = x[:, 0, :]
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="final_fc")(cls)


class TaskCrullerFinetuneXent(BaseCrullerTrainTask):
    task_start_token = "<s_pretrain>"
    prompt_end_token = "<s_pretrain>"
    base_special_tokens = SPECIAL_TOKENS_FROM_PRETRAIN
    finetune_special_tokens = None
    text_anno_fn = True
    shift_in_step = False
    collate_text_length = 2  # unused; classifier path

    def collate_fn(self, batch):
        images = [self.prepare_image(item["image"]) for item in batch]
        labels = np.asarray([int(item["label"]) for item in batch], np.int32)
        return {"image": stack_images(images), "label": labels}

    # ------------------------------------------------------------------
    def train_setup(self, num_batches_per_interval: int, **kwargs):
        cfg = self.cfg
        accum = max(1, cfg.opt.grad_accum_steps)
        self.grad_accum_steps = accum
        self._accum_buffer = []
        self.num_steps_per_interval = num_batches_per_interval // accum
        self.optimizer, self.scheduler = create_optimizer(
            cfg.opt,
            num_intervals=cfg.num_intervals,
            num_warmup_intervals=cfg.num_warmup_intervals,
            updates_per_interval=max(1, self.num_steps_per_interval),
            encoder_depth=self.vit_cfg.depth,
            decoder_layers=0,
            wrap_multisteps=False,
        )
        self.model = CrullerClassifier(self.vit_cfg, dtype=self.compute_dtype)
        example = (
            jnp.zeros((1, *self.vit_cfg.img_size, self.vit_cfg.in_chans), jnp.float32),
        )
        self.state, self.param_shardings = create_train_state(
            self.model, self.optimizer, self.device_env.mesh, example,
            seed=kwargs.get("seed", 0),
        )
        if self.resume_state_dict is not None:
            # load encoder weights from a pretrain Cruller checkpoint; the
            # head stays freshly initialized (reference ``:145-156``)
            full = self.import_torch_params(
                self.resume_state_dict, self.vit_cfg, self.bart_cfg
            )
            enc = jax.tree_util.tree_map(
                lambda t, p: jax.device_put(np.asarray(p, dtype=t.dtype), t.sharding),
                self.state.params["encoder"],
                full["image_encoder"],
            )
            params = dict(self.state.params)
            params["encoder"] = enc
            self.state = self.state.replace(params=params)
            self.resume_state_dict = None
            _logger.info("imported encoder weights from Cruller checkpoint")

        model = self.model

        def loss_fn(params, batch, rng):
            logits = model.apply(
                {"params": params},
                batch["image"],
                deterministic=False,
                rngs={"dropout": rng},
            )
            labels = batch["label"]
            logz = jax.nn.logsumexp(logits, axis=-1)
            true_logit = jnp.take_along_axis(
                logits, labels[:, None], axis=-1
            ).squeeze(-1)
            loss = (logz - true_logit).mean()
            acc = (logits.argmax(-1) == labels).mean()
            return loss, {"accuracy": acc}

        self.train_step_fn = make_train_step(
            loss_fn, self.optimizer, self.device_env.mesh,
            grad_accum_steps=self.grad_accum_steps,
        )
        self.step_idx = 0
        self.interval_batch_idx = 0

    def normalize_batch(self, sample) -> Dict[str, np.ndarray]:
        return {
            "image": np.asarray(sample["image"], np.float32),
            "label": np.asarray(sample["label"], np.int32),
        }

    def state_dict(self) -> Dict[str, Any]:
        from pixparse_tpu.models.torch_interop import vit_params_to_torch

        params = jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x), np.float32), self.state.params
        )
        sd = vit_params_to_torch(
            params["encoder"], self.vit_cfg, prefix="encoder.trunk."
        )
        sd["final_fc.weight"] = np.asarray(params["final_fc"]["kernel"]).T
        sd["final_fc.bias"] = np.asarray(params["final_fc"]["bias"])
        return sd
