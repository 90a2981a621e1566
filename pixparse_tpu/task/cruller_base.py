"""Shared Cruller task machinery.

The reference duplicates ~150 lines of device/DDP/optimizer/scheduler/AMP
skeleton in every train task and a model/vocab-rebuild preamble in every eval
task (SURVEY.md §7). Here that skeleton lives once:

- :class:`BaseCrullerTrainTask` — tokenizer + special-token protocol, model
  construction, sharded TrainState, jitted bf16 train step, counters,
  monitor logging, reference-``.pt``-compatible ``state_dict``.
- :class:`BaseCrullerEvalTask` — same vocab replay, checkpoint import, and a
  jitted KV-cached greedy ``generate`` shared by all eval tasks (replacing
  the reference's four hand-rolled decode loops, §3.4).

Concrete tasks supply: task/prompt tokens, special-token lists, collate, and
metrics.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pixparse_tpu.data.transforms import create_transforms
from pixparse_tpu.framework.optimization import create_optimizer
from pixparse_tpu.framework.task import TaskEval, TaskTrain
from pixparse_tpu.framework.train_state import create_train_state, make_train_step
from pixparse_tpu.models.config import ModelCfg, get_model_config
from pixparse_tpu.models.cruller import Cruller, resolve_cruller_cfgs
from pixparse_tpu.models.torch_interop import (
    cruller_params_from_torch,
    cruller_params_to_torch,
    resize_token_embeddings,
)
from pixparse_tpu.ops.generation import generate
from pixparse_tpu.ops.loss import cross_entropy_from_hidden
from pixparse_tpu.task.common import (
    add_special_tokens,
    fold_image_stats,
)
from pixparse_tpu.tokenizers import TokenizerCfg, TokenizerHF

_logger = logging.getLogger(__name__)


def _model_cfg_from_name(model_name: str, fallback: Optional[ModelCfg] = None) -> ModelCfg:
    cfg = get_model_config(model_name)
    if cfg is None:
        if fallback is not None:
            return fallback
        raise ValueError(f"unknown model name {model_name!r}")
    return cfg


def _compute_dtype(dtype_flag: Optional[str]):
    if dtype_flag in ("bfloat16", "bf16", "float16", "fp16"):
        if dtype_flag in ("float16", "fp16"):
            # make the reinterpretation of the user's flag visible in the run
            # log rather than silently changing the numeric format
            _logger.warning(
                "dtype=%s has no TPU fast path; using bfloat16 instead "
                "(no GradScaler needed — bf16 keeps fp32's exponent range)",
                dtype_flag,
            )
        return jnp.bfloat16
    return jnp.float32


def resolve_remat(flag, auto):
    """Map the ``--task.remat`` flag (string from the CLI, bool/str from
    code) to a model remat mode: False | True (full) | 'dots' | 'mlp' |
    'gelu' (cheapest: checkpoint only gelu+fc2, see vit.mlp_forward)."""
    if flag is None:
        return auto
    if isinstance(flag, str):
        s = flag.lower()
        if s == "auto":
            return auto
        if s in ("none", "false", "0", "off"):
            return False
        if s in ("true", "full", "1", "on"):
            return True
        if s in ("dots", "mlp", "gelu"):
            return s
        raise ValueError(
            f"unknown remat mode {flag!r} "
            "(auto|none|full|dots|mlp|gelu)"
        )
    return bool(flag)


def _checkpoint_vocab(sd: Dict[str, np.ndarray]) -> Optional[int]:
    for k, v in sd.items():
        if k.endswith("embed_tokens.weight"):
            return int(np.asarray(v).shape[0])
    return None


class CrullerVocabMixin:
    """Tokenizer + special-token replay + checkpoint import, shared between
    train and eval tasks."""

    def setup_tokenizer(
        self,
        tokenizer_cfg: TokenizerCfg,
        base_special_tokens: List[str],
        finetune_special_tokens: Optional[List[str]] = None,
    ):
        """Replay the reference's token-addition history: base (pretrain)
        tokens first, then optional finetune tokens — so token ids and
        embedding shapes match reference checkpoints at both stages
        (``task_cruller_finetune_CORD.py:209-223,303-328``)."""
        from pixparse_tpu.tokenizers.thread_safe import ThreadLocalTokenizer

        tokenizer = TokenizerHF(tokenizer_cfg).trunk
        add_special_tokens(tokenizer, base_special_tokens)
        self.vocab_size_base = len(tokenizer)
        if finetune_special_tokens:
            self.newly_added_num = add_special_tokens(
                tokenizer, finetune_special_tokens
            )
        else:
            self.newly_added_num = 0
        self.vocab_size = len(tokenizer)
        # loader worker threads each get their own copy (HF fast tokenizers
        # are not thread-safe)
        self.tokenizer = ThreadLocalTokenizer(tokenizer)

    def import_torch_params(self, state_dict, vit_cfg, bart_cfg) -> Dict[str, Any]:
        """Reference ``.pt`` state dict -> flax params at the *current* vocab,
        replaying the resize protocol when the checkpoint predates the
        finetune tokens."""
        import dataclasses as _dc

        from pixparse_tpu.models.torch_interop import normalize_state_dict

        sd = normalize_state_dict(state_dict)
        ckpt_vocab = _checkpoint_vocab(sd)
        load_cfg = bart_cfg
        if ckpt_vocab is not None and ckpt_vocab != bart_cfg.vocab_size:
            load_cfg = _dc.replace(bart_cfg, vocab_size=ckpt_vocab)
        params = cruller_params_from_torch(sd, vit_cfg, load_cfg)
        if ckpt_vocab is not None and ckpt_vocab != bart_cfg.vocab_size:
            params["text_decoder"] = resize_token_embeddings(
                params["text_decoder"], bart_cfg.vocab_size
            )
        return params


# ==========================================================================
# train
# ==========================================================================

class BaseCrullerTrainTask(TaskTrain, CrullerVocabMixin):
    """One jitted sharded train step; subclasses define tokens + collate."""

    # subclass contract ----------------------------------------------------
    task_start_token: str = ""
    prompt_end_token: str = ""
    base_special_tokens: List[str] = []
    finetune_special_tokens: Optional[List[str]] = None
    text_anno_fn: bool = False
    shift_in_step: bool = True  # pretrain shifts in train_step; finetunes in collate
    log_frequency: int = 100

    def __init__(self, cfg, device_env, monitor=None):
        super().__init__(cfg, device_env, monitor)
        self.setup_tokenizer(
            cfg.tokenizer, self.base_special_tokens, self.finetune_special_tokens
        )
        self.max_position_embeddings = cfg.model.text_decoder.max_length
        # finetune collates tokenize to a fixed 512 in the reference
        # (``task_cruller_finetune_CORD.py:403``); clamp to the model's
        # position table so small configs can't index OOB positions
        if getattr(self, "collate_text_length", None):
            self.collate_text_length = min(
                type(self).collate_text_length, self.max_position_embeddings
            )
        self.compute_dtype = _compute_dtype(cfg.dtype)
        self.num_image_chs = 1 if cfg.model.image_encoder.image_fmt == "L" else 3

        self.vit_cfg, self.bart_cfg, stats = resolve_cruller_cfgs(
            cfg.model, vocab_size=self.vocab_size
        )
        self.img_mean, self.img_std = fold_image_stats(
            stats["mean"], stats["std"], cfg.model.image_encoder.image_fmt
        )
        transforms_name = getattr(cfg, "transforms", None) or "legacy"
        # device_preprocess: host emits uint8, normalize fuses into the train
        # step (4x smaller host->device transfer; same math)
        self.device_preprocess = bool(getattr(cfg, "device_preprocess", False))
        self.image_preprocess_train = create_transforms(
            transforms_name,
            image_size=self.vit_cfg.img_size,
            training=True,
            image_mean=self.img_mean,
            image_std=self.img_std,
            normalize=not self.device_preprocess,
        )
        self.resume_state_dict = None
        self._time_last = None
        self._samples_since_log = 0
        self._last_loss_dev = None  # device scalar; materialized lazily
        self._flops_per_sample_step = None  # filled on first logged batch
        # defaults so subclasses overriding train_setup (xent) keep working;
        # train_setup re-derives them from cfg.opt
        self.grad_accum_steps = max(1, cfg.opt.grad_accum_steps)
        self._accum_buffer: List[Dict[str, np.ndarray]] = []

    # ------------------------------------------------------------------
    def prepare_image(self, img) -> np.ndarray:
        """PIL/array -> normalized float32 (H, W, C) with channel coercion."""
        from PIL import Image

        if isinstance(img, Image.Image):
            img = img.convert("L" if self.num_image_chs == 1 else "RGB")
        return self.image_preprocess_train(img)

    # ------------------------------------------------------------------
    def train_setup(self, num_batches_per_interval: int, **kwargs):
        cfg = self.cfg
        accum = max(1, cfg.opt.grad_accum_steps)
        self.num_steps_per_interval = num_batches_per_interval // accum

        # gradient accumulation happens INSIDE the jitted step (micro-batch
        # scan, make_train_step) rather than via optax.MultiSteps — no
        # persistent full-gradient accumulator in optimizer state
        self.grad_accum_steps = accum
        self._accum_buffer: List[Dict[str, np.ndarray]] = []
        self.optimizer, self.scheduler = create_optimizer(
            cfg.opt,
            num_intervals=cfg.num_intervals,
            num_warmup_intervals=cfg.num_warmup_intervals,
            updates_per_interval=max(1, self.num_steps_per_interval),
            encoder_depth=self.vit_cfg.depth,
            decoder_layers=self.bart_cfg.decoder_layers,
            wrap_multisteps=False,
        )
        attn_impl = getattr(cfg, "attn_impl", "auto")
        if attn_impl == "auto":
            # Pallas flash attention: +47% measured train throughput on v5e;
            # XLA on CPU (interpret-mode pallas is for tests only)
            attn_impl = "flash" if jax.devices()[0].platform != "cpu" else "xla"
        # auto: large models (cruller_large: 2509 tokens x 24 blocks) exceed
        # v5e HBM without remat at the reference batch size; the selective
        # 'mlp' policy frees the wide MLP activations at ~1/3-block-forward
        # recompute (vs a whole extra forward for full remat, docs/PERF.md).
        # Base-size models run fastest with no remat (measured).
        auto = (
            "mlp" if self.vit_cfg.num_tokens * self.vit_cfg.depth > 20000
            else False
        )
        remat = resolve_remat(getattr(cfg, "remat", None), auto)
        self.model = Cruller(
            self.vit_cfg, self.bart_cfg, dtype=self.compute_dtype,
            remat=remat,
            attn_impl=attn_impl,
        )
        text_len = self.max_position_embeddings - 1 if self.shift_in_step else (
            self.collate_text_length - 1
        )
        example = (
            jnp.zeros(
                (1, *self.vit_cfg.img_size, self.vit_cfg.in_chans), jnp.float32
            ),
            jnp.zeros((1, text_len), jnp.int32),
        )
        self.state, self.param_shardings = create_train_state(
            self.model,
            self.optimizer,
            self.device_env.mesh,
            example,
            seed=kwargs.get("seed", 0),
        )
        if self.resume_state_dict is not None:
            params = self.import_torch_params(
                self.resume_state_dict, self.vit_cfg, self.bart_cfg
            )
            params = jax.tree_util.tree_map(
                lambda t, p: jax.device_put(
                    np.asarray(p, dtype=t.dtype), t.sharding
                ),
                self.state.params,
                params,
            )
            self.state = self.state.replace(params=params)
            self.resume_state_dict = None
            _logger.info("imported torch checkpoint into train state")
        else:
            # honor cfg.model.*.pretrained (reference defaults to pretrained
            # backbones — image_encoder_timm.py:15, text_decoder_hf.py:25-33);
            # raises when weights can't be resolved, never a silent no-op
            from pixparse_tpu.models.pretrained import maybe_load_pretrained

            pretrained = maybe_load_pretrained(
                cfg.model, self.vit_cfg, self.bart_cfg
            )
            if pretrained:
                params = dict(self.state.params)
                for key, subtree in pretrained.items():
                    params[key] = jax.tree_util.tree_map(
                        lambda t, p: jax.device_put(
                            np.asarray(p, dtype=t.dtype), t.sharding
                        ),
                        self.state.params[key],
                        subtree,
                    )
                self.state = self.state.replace(params=params)
                _logger.info(
                    "initialized from pretrained backbones: %s",
                    ", ".join(pretrained),
                )

        model = self.model
        device_pre = self.device_preprocess
        img_mean = jnp.asarray(self.img_mean, jnp.float32)
        img_std = jnp.asarray(self.img_std, jnp.float32)

        def loss_fn(params, batch, rng):
            image = batch["image"]
            if device_pre and image.dtype == jnp.uint8:
                from pixparse_tpu.ops.preprocess import normalize_images

                image = normalize_images(image, img_mean, img_std)
            hidden = model.apply(
                {"params": params},
                image,
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

        self.train_step_fn = make_train_step(
            loss_fn, self.optimizer, self.device_env.mesh,
            grad_accum_steps=self.grad_accum_steps,
        )
        self.step_idx = 0
        self.interval_batch_idx = 0
        self._flops_per_sample_step = None  # filled on first real batch

    # ------------------------------------------------------------------
    def train_interval_start(self):
        if self.monitor:
            self.monitor.log_phase(
                "train", interval=self.interval_idx, name_prefix="start "
            )
        self.interval_batch_idx = 0
        self._time_last = time.perf_counter()
        self._samples_since_log = 0

    def train_interval_end(self):
        if self.monitor:
            self.monitor.log_phase("train", interval=self.interval_idx)
            self.monitor.write_summary(
                {
                    "train": {
                        "step": self.step_idx,
                        "lr": self.get_current_lr(),
                        "loss": float(jax.device_get(self._last_loss_dev))
                        if self._last_loss_dev is not None
                        else None,
                    }
                },
                index=self.interval_idx,
            )
        self.interval_idx += 1

    # ------------------------------------------------------------------
    def normalize_batch(self, sample) -> Dict[str, np.ndarray]:
        """Task-specific batch dict -> {image, text, target} numpy arrays.
        Pretrain wds batches carry unshifted sequences -> shift here (parity:
        ``task_cruller_pretrain.py:240-242``)."""
        if isinstance(sample, (tuple, list)):
            image, text, target = sample[:3]
            sample = {"image": image, "text": text, "target": target}
        image = np.asarray(sample["image"])
        if not (self.device_preprocess and image.dtype == np.uint8):
            image = image.astype(np.float32)
        text = np.asarray(sample.get("text", sample.get("label")), np.int64)
        target = np.asarray(sample.get("target", sample.get("text_target")), np.int64)
        if text.ndim == 3:  # (B, 1, L) page dimension from ocr anno preproc
            text = text[:, 0]
            target = target[:, 0]
        if self.shift_in_step:
            text, target = text[:, :-1], target[:, 1:]
        return {
            "image": image,
            "text": text.astype(np.int32),
            "target": target.astype(np.int32),
        }

    def train_step(self, sample) -> Dict[str, Any]:
        if self._stop_requested:
            from pixparse_tpu.framework.task import StopTraining

            raise StopTraining
        batch = self.normalize_batch(sample)
        if self.grad_accum_steps > 1:
            # buffer micro-batches; one stacked device step per accum window
            # (reference cadence: update every k-th batch with mean grads,
            # task_cruller_pretrain.py:244-286)
            self._accum_buffer.append(batch)
            if len(self._accum_buffer) < self.grad_accum_steps:
                self.step_idx += 1
                self.batch_idx += 1
                self.interval_batch_idx += 1
                self._samples_since_log += (
                    batch["image"].shape[0] * self.device_env.process_count
                )
                return {"loss": self._last_loss_dev}
            stacked = {
                k: np.stack([mb[k] for mb in self._accum_buffer])
                for k in batch
            }
            self._accum_buffer = []
            sharded = self.device_env.shard_batch(stacked, stacked=True)
        else:
            sharded = self.device_env.shard_batch(batch)
        self.state, metrics = self.train_step_fn(self.state, sharded)
        self._last_loss_dev = metrics["loss"]
        # host-side counter: reading state.step would force a device sync
        # every step (the async dispatch pipeline is the throughput)
        self.step_idx += 1
        self.batch_idx += 1
        self.interval_batch_idx += 1

        if (
            self.eval_frequency
            and self.monitor
            and self.step_idx % self.eval_frequency == 0
        ):
            self._log_train_reconstruction(batch)
        batch_size = jax.tree_util.tree_leaves(batch)[0].shape[0]
        self._samples_since_log += batch_size * self.device_env.process_count

        if self.monitor and self.interval_batch_idx % self.log_frequency == 0:
            loss = float(metrics["loss"])
            now = time.perf_counter()
            rate = (
                self._samples_since_log / (now - self._time_last)
                if self._time_last
                else None
            )
            extra = {}
            if rate and "text" in batch:
                from pixparse_tpu.framework.profiling import cruller_train_flops, mfu

                if self._flops_per_sample_step is None:
                    self._flops_per_sample_step = cruller_train_flops(
                        self.vit_cfg, self.bart_cfg, 1, batch["text"].shape[1]
                    )
                util = mfu(
                    self._flops_per_sample_step * rate,  # flops/sec across chips
                    1.0,
                    n_chips=self.device_env.num_devices,
                )
                if util is not None:
                    extra["mfu"] = round(util, 4)
            self._time_last = now
            self._samples_since_log = 0
            self.monitor.log_step(
                "train",
                step_idx=self.step_idx,
                step_end_idx=self.num_intervals * (self.num_steps_per_interval or 0),
                interval=self.interval_idx,
                loss=loss,
                rate=rate,
                lr=self.get_current_lr(),
                metrics=extra or None,
            )
        return {"loss": metrics["loss"]}

    # ------------------------------------------------------------------
    def _log_train_reconstruction(self, batch: Dict[str, np.ndarray]):
        """Train-time OCR reconstruction monitoring (parity:
        ``task_cruller_pretrain.py:297-311,316-370`` — the reference's smoke
        test that the model is learning; also fixes its latent TypeError,
        SURVEY.md §7 tail): greedy-decode the current batch, log CER/WER and
        an image/text gallery sample."""
        try:
            from pixparse_tpu.ops.generation import generate
            from pixparse_tpu.utils.ocr_eval import (
                max_target_length,
                ocr_metrics_from_text,
                restore_ignored,
            )

            n = min(4, batch["image"].shape[0])  # small slice: monitoring only
            images = batch["image"][:n]
            if images.dtype == np.uint8:  # device_preprocess batches
                mean = np.asarray(self.img_mean, np.float32).reshape(1, 1, 1, -1)
                std = np.asarray(self.img_std, np.float32).reshape(1, 1, 1, -1)
                images = (images.astype(np.float32) / 255.0 - mean) / std
            text = restore_ignored(batch["text"][:n], self.tokenizer.pad_token_id)
            max_len = max_target_length(text, self.tokenizer.pad_token_id, 256)
            prompt_ids = self.tokenizer(
                self.task_start_token, add_special_tokens=False, return_tensors="np"
            ).input_ids.astype(np.int32)
            prompt = np.tile(prompt_ids, (n, 1))
            # jitted encode: an unjitted apply dispatches the encoder
            # op-by-op (~16x slower measured through the remote transport)
            if not hasattr(self, "_recon_encode_jit"):
                self._recon_encode_jit = jax.jit(
                    lambda p, im: self.model.apply(
                        {"params": p}, im, method="encode"
                    )
                )
            enc = self._recon_encode_jit(
                self.state.params, jnp.asarray(images)
            )
            result = generate(
                self.model,
                self.state.params,
                enc,
                jnp.asarray(prompt),
                max_length=max(max_len, prompt.shape[1] + 2),
                eos_token_id=self.tokenizer.eos_token_id,
                pad_token_id=self.tokenizer.pad_token_id,
            )
            preds = self.tokenizer.batch_decode(np.asarray(result.tokens))
            refs = self.tokenizer.batch_decode(text.astype(np.int64))
            metrics, recon = ocr_metrics_from_text(preds, refs)
            if metrics:
                eval_data = None
                if recon:
                    eval_data = {
                        "original_text": recon["original_text"],
                        "reconstructed_text": recon["reconstructed_text"],
                        "image": images[0],
                    }
                self.monitor.log_step(
                    "train",
                    step_idx=self.step_idx,
                    interval=self.interval_idx,
                    phase_suffix="ocr_reconstruction",
                    metrics=metrics,
                    eval_data=eval_data,
                )
        except Exception as e:  # monitoring must never kill training
            _logger.warning("train-time OCR reconstruction failed: %s", e)

    # ------------------------------------------------------------------
    def state_dict(self) -> Dict[str, Any]:
        """Reference-layout torch state dict of the model weights
        (``image_encoder.trunk...`` names) for ``.pt`` interop."""
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x), np.float32), self.state.params
        )
        return cruller_params_to_torch(params, self.vit_cfg, self.bart_cfg)


# ==========================================================================
# eval
# ==========================================================================

class BaseCrullerEvalTask(TaskEval, CrullerVocabMixin):
    task_start_token: str = ""
    prompt_end_token: str = ""
    base_special_tokens: List[str] = []
    finetune_special_tokens: Optional[List[str]] = None
    max_generation_length: int = 512

    def __init__(self, cfg, device_env, monitor=None):
        super().__init__(cfg, device_env, monitor)
        self.setup_tokenizer(
            cfg.tokenizer, self.base_special_tokens, self.finetune_special_tokens
        )
        self.max_position_embeddings = cfg.model.text_decoder.max_length
        self.collate_text_length = min(512, self.max_position_embeddings)
        self.max_generation_length = min(
            type(self).max_generation_length, self.max_position_embeddings
        )
        self.compute_dtype = _compute_dtype(cfg.dtype)
        self.num_image_chs = 1 if cfg.model.image_encoder.image_fmt == "L" else 3
        self.vit_cfg, self.bart_cfg, stats = resolve_cruller_cfgs(
            cfg.model, vocab_size=self.vocab_size
        )
        self.img_mean, self.img_std = fold_image_stats(
            stats["mean"], stats["std"], cfg.model.image_encoder.image_fmt
        )
        self.device_preprocess = bool(getattr(cfg, "device_preprocess", False))
        # device_preprocess: the host pipeline does geometry only and emits
        # uint8 canvases; normalize runs on device fused into the encoder
        # (ops/preprocess.py). Same math, 4x smaller H2D transfer.
        self.image_preprocess_eval = create_transforms(
            getattr(cfg, "transforms", None) or "legacy",
            image_size=self.vit_cfg.img_size,
            training=False,
            image_mean=self.img_mean,
            image_std=self.img_std,
            normalize=not self.device_preprocess,
        )
        self.resume_state_dict = None
        self.model: Optional[Cruller] = None
        self.params = None
        self._encode_fn = None

    def prepare_image(self, img) -> np.ndarray:
        from PIL import Image

        if isinstance(img, Image.Image):
            img = img.convert("L" if self.num_image_chs == 1 else "RGB")
        return self.image_preprocess_eval(img)

    # ------------------------------------------------------------------
    def setup(self):
        """Build the model and load ``resume_state_dict`` (parity:
        ``task_cruller_eval_ocr.py:171-179``). Params are replicated across
        the local mesh so eval batches shard over every chip (the reference —
        and a naive jit — would leave 7 of 8 chips idle on a v5e-8 host)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(self.device_env.mesh, P())
        attn_impl = getattr(self.cfg, "attn_impl", "auto")
        if attn_impl == "auto":
            # the flash encoder matters for eval too: XLA attention on the
            # 1009-token encode costs ~130 ms of fp32 softmax per decode
            # batch (profiled) — over a third of total eval-decode time.
            # Cached decode/prefill attention keeps the XLA path regardless.
            attn_impl = "flash" if jax.devices()[0].platform != "cpu" else "xla"
        self.model = Cruller(
            self.vit_cfg, self.bart_cfg, dtype=self.compute_dtype,
            attn_impl=attn_impl,
            # opt-in int8 decode mode (TaskEvalCfg / --task.kv-cache-dtype)
            kv_cache_dtype=getattr(self.cfg, "kv_cache_dtype", "bf16"),
            lm_head_dtype=getattr(self.cfg, "lm_head_dtype", "bf16"),
        )
        # eval holds no fp32 master weights: params ride in the compute
        # dtype (bit-identical to what the per-op cast would produce; halves
        # the weight HBM traffic that bounds the decode loop)
        param_dtype = self.compute_dtype
        if self.resume_state_dict is not None:
            params = self.import_torch_params(
                self.resume_state_dict, self.vit_cfg, self.bart_cfg
            )
            self.params = jax.tree_util.tree_map(
                lambda p: jax.device_put(
                    np.asarray(p, np.float32).astype(param_dtype), replicated
                ),
                params,
            )
            self.resume_state_dict = None
        else:
            variables = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, *self.vit_cfg.img_size, self.vit_cfg.in_chans)),
                jnp.zeros((1, 4), jnp.int32),
            )
            import flax.linen as nn

            self.params = jax.tree_util.tree_map(
                lambda p: jax.device_put(p.astype(param_dtype), replicated),
                nn.unbox(variables["params"]),
            )

    def _shard_eval_batch(self, *arrays):
        """Batch-shard eval inputs over the mesh. Ragged batches (the final
        partial batch of an eval epoch) are padded up to the next multiple of
        the data-axes shard count by repeating the last row, so decode stays
        sharded over every chip instead of falling back to one device;
        callers slice results back to the true batch size."""
        n_shard = int(np.prod(self.device_env.mesh.devices.shape[:2]))
        B = arrays[0].shape[0]
        pad = (-B) % n_shard
        if pad:
            arrays = [
                np.concatenate(
                    [np.asarray(a), np.repeat(np.asarray(a)[-1:], pad, axis=0)]
                )
                for a in arrays
            ]
        placed = self.device_env.shard_batch(
            {i: np.asarray(a) for i, a in enumerate(arrays)}
        )
        return [placed[i] for i in range(len(arrays))]

    # ------------------------------------------------------------------
    def encode_images(self, images) -> jax.Array:
        """One jitted program: (optional fused uint8 normalize ->) encoder."""
        if self._encode_fn is None:
            model = self.model
            mean = jnp.asarray(self.img_mean, jnp.float32)
            std = jnp.asarray(self.img_std, jnp.float32)
            device_pre = self.device_preprocess

            def _encode(params, images):
                if device_pre and images.dtype == jnp.uint8:
                    from pixparse_tpu.ops.preprocess import normalize_images

                    images = normalize_images(images, mean, std)
                return model.apply({"params": params}, images, method="encode")

            self._encode_fn = jax.jit(_encode)
        return self._encode_fn(self.params, jnp.asarray(images))

    num_beams: int = 1  # >1 switches every eval decode to jitted beam search

    def generate_ids(
        self,
        images: np.ndarray,
        prompt_ids: np.ndarray,
        max_length: Optional[int] = None,
    ) -> np.ndarray:
        """Batched jitted KV-cached decode -> (B, max_length) ids (greedy by
        default; beam search when ``num_beams > 1``), batch-sharded over the
        mesh when the batch divides it."""
        with self.device_env.mesh:
            return self._generate_ids_inner(images, prompt_ids, max_length)

    def _generate_ids_inner(self, images, prompt_ids, max_length):
        B = np.asarray(images).shape[0]
        images, prompt_ids = self._shard_eval_batch(
            np.asarray(images), np.asarray(prompt_ids, np.int32)
        )
        enc = self.encode_images(images)
        if self.num_beams > 1:
            from pixparse_tpu.ops.generation import generate_beam

            result = generate_beam(
                self.model,
                self.params,
                enc,
                jnp.asarray(prompt_ids, jnp.int32),
                num_beams=self.num_beams,
                max_length=max_length or self.max_generation_length,
                eos_token_id=self.tokenizer.eos_token_id,
                pad_token_id=self.tokenizer.pad_token_id,
            )
            return np.asarray(result.tokens)[:B]
        result = generate(
            self.model,
            self.params,
            enc,
            jnp.asarray(prompt_ids, jnp.int32),
            max_length=max_length or self.max_generation_length,
            eos_token_id=self.tokenizer.eos_token_id,
            pad_token_id=self.tokenizer.pad_token_id,
        )
        return np.asarray(result.tokens)[:B]

    def generate_text(self, images, prompt_ids, max_length=None) -> List[str]:
        tokens = self.generate_ids(images, prompt_ids, max_length)
        texts = self.tokenizer.batch_decode(tokens, skip_special_tokens=False)
        pad = self.tokenizer.pad_token
        # padding (incl. the left-alignment pads of variable-length prompts)
        # never carries content; the reference's per-sample decode has none
        return [t.replace(pad, "") for t in texts]

    def generate_text_stream(
        self,
        pages,  # iterable of (page_id, prepared image ndarray)
        prompt: str,
        *,
        slots: int = 16,
        max_length: Optional[int] = None,
        max_new_tokens: Optional[int] = None,
        refill_size: int = 8,
        chunk_steps: int = 16,
        pool_pages: Optional[int] = None,
    ):
        """Continuous-batching decode over a page stream: yields
        ``(page_id, text)`` in completion order. Unlike :meth:`generate_text`,
        a batch never waits for its slowest page — finished slots are
        refilled mid-stream on-device from a staged pool (ops/serving.py).
        Single-device jit (serving targets one replica per chip; run one
        process per chip to scale)."""
        from pixparse_tpu.ops.serving import ContinuousBatcher

        prompt_row = self.prompt_ids(prompt, 1)[0]
        batcher = ContinuousBatcher(
            self.model,
            self.params,
            slots=slots,
            max_length=max_length or self.max_generation_length,
            prompt_ids=prompt_row,
            eos_token_id=self.tokenizer.eos_token_id,
            pad_token_id=self.tokenizer.pad_token_id,
            refill_size=refill_size,
            chunk_steps=chunk_steps,
            pool_pages=pool_pages,
        )
        encode = lambda imgs: self.encode_images(np.asarray(imgs))
        budget = (lambda pid: max_new_tokens) if max_new_tokens else None
        pad_tok = self.tokenizer.pad_token
        for res in batcher.run(pages, encode, max_new_tokens=budget):
            text = self.tokenizer.decode(
                res.tokens.tolist(), skip_special_tokens=False
            )
            yield res.page_id, text.replace(pad_tok, "")

    def prompt_ids(self, prompt: str, batch_size: int) -> np.ndarray:
        ids = self.tokenizer(prompt, add_special_tokens=False, return_tensors="np").input_ids
        return np.tile(ids.astype(np.int32), (batch_size, 1))

    def average_metrics(self, metrics: Dict[int, Dict[str, float]]):
        if not metrics:
            return {}
        keys = list(next(iter(metrics.values())).keys())
        return {
            k: float(np.mean([m[k] for m in metrics.values() if k in m]))
            for k in keys
        }
