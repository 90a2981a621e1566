"""Pix2Struct pretrain task (capability extension).

Identical objective and data contract to ``cruller_pretrain`` (OCR
text-reading over webdataset shards, ``<s_pretrain>`` task token), but the
image pathway is the variable-resolution Pix2Struct pipeline: each document is
patchified at its native aspect ratio into a fixed ``max_patches`` budget
(:mod:`pixparse_tpu.ops.pix2struct`) and encoded by
:class:`pixparse_tpu.models.pix2struct.Pix2StructCruller`. The reference
describes its models as "Donut/Pix2Struct style" but ships only the
fixed-canvas path (``README.md:3-12`` in /root/reference).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pixparse_tpu.data.preprocess import preprocess_ocr_anno
from pixparse_tpu.framework.config import TaskTrainCfg
from pixparse_tpu.framework.optimization import create_optimizer
from pixparse_tpu.framework.train_state import create_train_state, make_train_step
from pixparse_tpu.models.config import ModelCfg
from pixparse_tpu.models.pix2struct import Pix2StructCruller
from pixparse_tpu.ops.loss import cross_entropy_from_hidden
from pixparse_tpu.ops.pix2struct import patchify_variable
from pixparse_tpu.task.common import resolve_model_name
from pixparse_tpu.task.task_cruller_pretrain import TaskCrullerPretrain
from pixparse_tpu.tokenizers import TokenizerCfg

_logger = logging.getLogger(__name__)


@dataclass
class TaskPix2StructPretrainCfg(TaskTrainCfg):
    model_name: Optional[str] = "pix2struct_base"
    model: ModelCfg = field(default_factory=ModelCfg)
    tokenizer: TokenizerCfg = field(default_factory=TokenizerCfg)

    def __post_init__(self):
        resolve_model_name(self)


class TaskPix2StructPretrain(TaskCrullerPretrain):
    """Pretrain with a variable-resolution patch encoder. Reuses the Cruller
    pretrain token/anno protocol; replaces image preprocessing (host
    patchify), model construction, and batch normalization."""

    def __init__(self, cfg: TaskPix2StructPretrainCfg, device_env, monitor=None):
        super().__init__(cfg, device_env, monitor)
        enc_cfg = self.vit_cfg  # Pix2StructCfg via registry dispatch
        mean, std = self.img_mean, self.img_std

        def preprocess(img):
            arr = np.asarray(img)
            return patchify_variable(
                arr, enc_cfg.patch_size, enc_cfg.max_patches, mean=mean, std=std
            )

        self.image_preprocess_train = preprocess

    # ------------------------------------------------------------------
    def train_setup(self, num_batches_per_interval: int, **kwargs):
        cfg = self.cfg
        accum = max(1, cfg.opt.grad_accum_steps)
        self.num_steps_per_interval = num_batches_per_interval // accum
        self.optimizer, self.scheduler = create_optimizer(
            cfg.opt,
            num_intervals=cfg.num_intervals,
            num_warmup_intervals=cfg.num_warmup_intervals,
            updates_per_interval=max(1, self.num_steps_per_interval),
            encoder_depth=self.vit_cfg.depth,
            decoder_layers=self.bart_cfg.decoder_layers,
        )
        attn_impl = getattr(cfg, "attn_impl", "auto")
        if attn_impl == "auto":
            attn_impl = "flash" if jax.devices()[0].platform != "cpu" else "xla"
        from pixparse_tpu.task.cruller_base import resolve_remat

        # auto: the flash encoder handles the masked 2048-token attention
        # without the (B, H, N, N) fp32 score tensors, so pix2struct_base
        # B=8 trains un-rematerialized on v5e (224 ms/step = 35.6
        # samples/s vs 12.2 rematerialized+XLA); the XLA path still OOMs
        auto = (
            attn_impl != "flash"
            and self.vit_cfg.num_tokens * self.vit_cfg.depth > 20000
        )
        remat = resolve_remat(getattr(cfg, "remat", None), auto)
        self.model = Pix2StructCruller(
            self.vit_cfg, self.bart_cfg, dtype=self.compute_dtype, remat=remat,
            attn_impl=attn_impl,
        )
        n, pdim = self.vit_cfg.max_patches, (
            self.vit_cfg.patch_size ** 2 * self.vit_cfg.in_chans
        )
        example_img = {
            "patches": jnp.zeros((1, n, pdim), jnp.float32),
            "rows": jnp.zeros((1, n), jnp.int32),
            "cols": jnp.zeros((1, n), jnp.int32),
            "mask": jnp.ones((1, n), bool),
        }
        example = (example_img, jnp.zeros((1, self.max_position_embeddings - 1), jnp.int32))
        self.state, self.param_shardings = create_train_state(
            self.model, self.optimizer, self.device_env.mesh, example,
            seed=kwargs.get("seed", 0),
        )
        if self.resume_state_dict is not None:
            raise NotImplementedError(
                "pix2struct models have no reference .pt layout to import"
            )

        model = self.model

        def loss_fn(params, batch, rng):
            hidden = model.apply(
                {"params": params},
                batch["image"],
                batch["text"],
                deterministic=False,
                rngs={"dropout": rng},
                method="forward_hidden",
            )
            loss, _ = cross_entropy_from_hidden(
                hidden,
                params["text_decoder"]["embed_tokens"]["embedding"].astype(
                    hidden.dtype
                ),
                batch["target"],
            )
            return loss, {}

        self.train_step_fn = make_train_step(loss_fn, self.optimizer, self.device_env.mesh)
        self.step_idx = 0
        self.interval_batch_idx = 0
        self._flops_per_sample_step = None

    # ------------------------------------------------------------------
    def normalize_batch(self, sample) -> Dict[str, Any]:
        if isinstance(sample, (tuple, list)):
            image, text, target = sample[:3]
            sample = {"image": image, "text": text, "target": target}
        image = sample["image"]  # dict of (B, N, ...) arrays
        text = np.asarray(sample["text"], np.int64)
        target = np.asarray(sample["target"], np.int64)
        if text.ndim == 3:
            text = text[:, 0]
            target = target[:, 0]
        text, target = text[:, :-1], target[:, 1:]
        return {
            "image": {
                "patches": np.asarray(image["patches"], np.float32),
                "rows": np.asarray(image["rows"], np.int32),
                "cols": np.asarray(image["cols"], np.int32),
                "mask": np.asarray(image["mask"], bool),
            },
            "text": text.astype(np.int32),
            "target": target.astype(np.int32),
        }

    def _log_train_reconstruction(self, batch):
        pass  # the base reconstruction path assumes a canvas image tensor

    def state_dict(self) -> Dict[str, Any]:
        """Flat numpy state dict under our own naming (no reference ``.pt``
        layout exists for this family)."""
        flat = {}

        def walk(prefix, tree):
            for k, v in tree.items():
                name = f"{prefix}.{k}" if prefix else k
                if isinstance(v, dict):
                    walk(name, v)
                else:
                    flat[name] = np.asarray(jax.device_get(v), np.float32)

        walk("", self.state.params)
        return flat
