"""Benchmarks (BASELINE.md target configs).

Three measurements on the available device(s):

1. **train/synthetic** — cruller_base pretrain step (ViT-B/16 576x448
   grayscale encoder + 4-layer bart-base decoder, bf16, flash attention,
   AdamW + clip + cosine) on device-resident synthetic batches: the pure
   device rate. PRIMARY metric (samples/sec/chip).
2. **train/pipeline** — the SAME step fed by the real webdataset input
   pipeline (synthetic doc-page tar on tmpfs -> native decode -> 'better'
   train transforms -> collate -> shard), proving the host side sustains the
   device rate (threaded prefetch overlaps).
3. **eval/decode** — greedy KV-cached OCR decode (batch 16, 128 new tokens),
   pages/sec/chip (BASELINE.json configs 1/2).

stdout contract: ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``
for the primary metric; the other measurements ride in the same line under
``"extra"`` (and are narrated on stderr).

Baseline context (BASELINE.md): the reference publishes no numbers; the
north-star is >= reference A100 samples/sec/chip. ``vs_baseline`` reports the
ratio against a fixed reference point of 20 samples/sec/chip (a cruller_base
bf16 DDP A100 estimate; replaced by a measured number when the driver
provides one).
"""

from __future__ import annotations

import io
import json
import os
import sys
import tarfile
import tempfile
import time

import numpy as np

REFERENCE_SAMPLES_PER_SEC_PER_CHIP = 20.0  # stand-in A100 baseline


def _note(msg):
    print(msg, file=sys.stderr, flush=True)


def _read_scalar(x):
    """Scalar readback, not block_until_ready — the latter does not reliably
    synchronize through remote-TPU transports."""
    import jax

    return float(jax.device_get(x))


# --------------------------------------------------------------------------
# synthetic doc pages (white background + black text-like bars: compresses
# like a real scan, decodes at realistic cost)
# --------------------------------------------------------------------------

def _make_page(rng: np.random.RandomState, h: int = 1650, w: int = 1275) -> bytes:
    from PIL import Image

    page = np.full((h, w), 255, np.uint8)
    y = 60
    while y < h - 80:
        line_h = int(rng.randint(14, 22))
        x = 90
        while x < w - 120:
            word_w = int(rng.randint(30, 90))
            if rng.rand() < 0.8:
                page[y:y + line_h, x:x + word_w] = int(rng.randint(0, 60))
            x += word_w + int(rng.randint(8, 20))
        y += line_h + int(rng.randint(8, 16))
    buf = io.BytesIO()
    Image.fromarray(page, "L").save(buf, format="PNG", compress_level=1)
    return buf.getvalue()


def _make_shard(path: str, n: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    words = ["invoice", "total", "date", "amount", "vendor", "page", "tax"]
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            png = _make_page(rng)
            info = tarfile.TarInfo(f"{i:05d}.png")
            info.size = len(png)
            tf.addfile(info, io.BytesIO(png))
            lines = [
                " ".join(rng.choice(words, rng.randint(4, 9)).tolist())
                for _ in range(int(rng.randint(20, 40)))
            ]
            anno = json.dumps({"pages": [{"text": lines}]}).encode()
            info = tarfile.TarInfo(f"{i:05d}.json")
            info.size = len(anno)
            tf.addfile(info, io.BytesIO(anno))


# --------------------------------------------------------------------------
# 1) train step on synthetic device-resident batches (primary)
# --------------------------------------------------------------------------

def bench_train_synthetic(model_name, batch_size, text_len, steps, warmup, dtype, attn_impl):
    import jax
    import jax.numpy as jnp

    from pixparse_tpu.framework.config import OptimizationCfg
    from pixparse_tpu.framework.optimization import create_optimizer
    from pixparse_tpu.framework.train_state import create_train_state, make_train_step
    from pixparse_tpu.models.config import get_model_config
    from pixparse_tpu.models.cruller import Cruller, resolve_cruller_cfgs
    from pixparse_tpu.ops.loss import cross_entropy_from_hidden
    from pixparse_tpu.parallel.mesh import create_mesh, shard_batch

    cfg = get_model_config(model_name)
    vit_cfg, bart_cfg, _ = resolve_cruller_cfgs(cfg)
    model = Cruller(vit_cfg, bart_cfg, dtype=dtype, attn_impl=attn_impl)
    mesh = create_mesh()
    n_chips = mesh.devices.size

    opt_cfg = OptimizationCfg(
        learning_rate=3e-4, clip_grad_value=1.0, clip_grad_mode="norm",
        betas=(0.9, 0.98), weight_decay=0.02,
    )
    tx, _ = create_optimizer(
        opt_cfg, 30, 3, 100,
        encoder_depth=vit_cfg.depth, decoder_layers=bart_cfg.decoder_layers,
    )
    example = (
        jnp.zeros((batch_size, *vit_cfg.img_size, vit_cfg.in_chans), jnp.float32),
        jnp.zeros((batch_size, text_len), jnp.int32),
    )
    _note("bench[train/synthetic]: init train state...")
    state, _ = create_train_state(model, tx, mesh, example, seed=0)

    def loss_fn(params, batch, rng):
        hidden = model.apply(
            {"params": params}, batch["image"], batch["text"],
            deterministic=False, rngs={"dropout": rng},
            method="forward_hidden",
        )
        loss, _ = cross_entropy_from_hidden(
            hidden,
            params["text_decoder"]["embed_tokens"]["embedding"].astype(hidden.dtype),
            batch["target"],
        )
        return loss, {}

    step = make_train_step(loss_fn, tx, mesh)
    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "image": rng.rand(batch_size, *vit_cfg.img_size, vit_cfg.in_chans).astype(np.float32),
        "text": rng.randint(4, bart_cfg.vocab_size, (batch_size, text_len)).astype(np.int32),
        "target": rng.randint(4, bart_cfg.vocab_size, (batch_size, text_len)).astype(np.int32),
    })

    _note("bench[train/synthetic]: warmup/compile...")
    for _ in range(warmup):
        state, metrics = step(state, batch)
    _read_scalar(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    _read_scalar(metrics["loss"])
    elapsed = time.perf_counter() - t0

    per_chip = batch_size * steps / elapsed / n_chips
    from pixparse_tpu.framework.profiling import cruller_train_flops, mfu

    flops = cruller_train_flops(vit_cfg, bart_cfg, batch_size, text_len)
    util = mfu(flops, elapsed / steps, n_chips=n_chips)
    _note(
        f"bench[train/synthetic]: {per_chip:.1f} samples/s/chip, "
        f"step {elapsed / steps * 1e3:.1f} ms"
        + (f", MFU {util:.1%}" if util is not None else "")
    )
    del state, batch, step
    return {
        "samples_per_sec_per_chip": round(per_chip, 3),
        "step_ms": round(elapsed / steps * 1e3, 1),
        "mfu": round(util, 4) if util is not None else None,
        "n_chips": n_chips,
    }


# --------------------------------------------------------------------------
# 2) train step fed by the real wds pipeline
# --------------------------------------------------------------------------

def bench_train_pipeline(model_name, batch_size, steps, warmup, dtype_flag, num_workers=8):
    from pixparse_tpu.data import create_loader
    from pixparse_tpu.data.config import DatasetCfg
    from pixparse_tpu.framework.config import OptimizationCfg
    from pixparse_tpu.parallel.mesh import MeshEnv
    from pixparse_tpu.task import TaskCrullerPretrain, TaskCrullerPretrainCfg
    from pixparse_tpu.tokenizers import TokenizerCfg

    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    n_pages = min(96, batch_size * 4)
    with tempfile.TemporaryDirectory(dir=tmp_root) as td:
        shard = os.path.join(td, "bench-00000.tar")
        _note(f"bench[train/pipeline]: generating {n_pages}-page synthetic shard...")
        _make_shard(shard, n_pages)

        env = MeshEnv.initialize()
        task_cfg = TaskCrullerPretrainCfg(
            model_name=model_name,
            tokenizer=TokenizerCfg(name="pixparse_bytelevel"),
            opt=OptimizationCfg(
                learning_rate=3e-4, clip_grad_value=1.0, clip_grad_mode="norm",
                betas=(0.9, 0.98), weight_decay=0.02,
            ),
            dtype=dtype_flag,
            num_intervals=30,
            num_warmup_intervals=3,
        )
        task_cfg.transforms = "better"  # the real train aug pipeline
        # production TPU path: uint8 host->device + in-step fused normalize
        task_cfg.device_preprocess = True
        task = TaskCrullerPretrain(task_cfg, env, None)
        total = batch_size * (steps + warmup)
        loader = create_loader(
            DatasetCfg(
                source=shard, num_samples=total, batch_size=batch_size,
                split="train", num_workers=num_workers,
            ),
            is_train=True,
            image_preprocess=task.prepare_image,
            anno_preprocess=task.anno_preprocess_train,
        )
        task.train_setup(num_batches_per_interval=loader.num_batches)
        task.train_interval_start()

        it = iter(loader.loader)
        _note("bench[train/pipeline]: warmup/compile...")
        for _ in range(warmup):
            out = task.train_step(next(it))
        _read_scalar(out["loss"])

        t0 = time.perf_counter()
        for _ in range(steps):
            out = task.train_step(next(it))
        _read_scalar(out["loss"])
        elapsed = time.perf_counter() - t0

    n_chips = env.num_devices
    per_chip = batch_size * steps / elapsed / n_chips
    _note(
        f"bench[train/pipeline]: {per_chip:.1f} samples/s/chip "
        f"(loader-fed, {num_workers} workers)"
    )
    return {"samples_per_sec_per_chip": round(per_chip, 3), "n_chips": n_chips}


# --------------------------------------------------------------------------
# 3) greedy OCR eval decode
# --------------------------------------------------------------------------

def bench_eval_decode(model_name, batch_size, new_tokens, steps, dtype):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pixparse_tpu.models.config import get_model_config
    from pixparse_tpu.models.cruller import Cruller, resolve_cruller_cfgs
    from pixparse_tpu.ops.generation import generate
    from pixparse_tpu.parallel.mesh import batch_sharding, create_mesh

    cfg = get_model_config(model_name)
    vit_cfg, bart_cfg, _ = resolve_cruller_cfgs(cfg)
    import jax as _jax

    attn = "flash" if _jax.devices()[0].platform != "cpu" else "xla"
    model = Cruller(vit_cfg, bart_cfg, dtype=dtype, attn_impl=attn)
    mesh = create_mesh()
    n_chips = mesh.devices.size

    _note("bench[eval/decode]: init params...")
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *vit_cfg.img_size, vit_cfg.in_chans)),
        jnp.zeros((1, 4), jnp.int32),
    )
    replicated = NamedSharding(mesh, P())
    params = jax.tree_util.tree_map(
        lambda p: jax.device_put(p, replicated), nn.unbox(variables["params"])
    )

    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.rand(batch_size, *vit_cfg.img_size, vit_cfg.in_chans).astype(np.float32),
        batch_sharding(mesh, 4),
    )
    prompts = jax.device_put(
        np.full((batch_size, 1), 1, np.int32), batch_sharding(mesh, 2)
    )

    def _decode():
        with mesh:
            enc = model.apply({"params": params}, images, method="encode")
            out = generate(
                model, params, enc, prompts,
                max_length=new_tokens, eos_token_id=-1, pad_token_id=0,
            )
        return out.tokens

    _note("bench[eval/decode]: warmup/compile decode program...")
    toks = _decode()
    _read_scalar(toks[0, -1])

    t0 = time.perf_counter()
    for _ in range(steps):
        toks = _decode()
    _read_scalar(toks[0, -1])
    elapsed = time.perf_counter() - t0

    pages = batch_size * steps / elapsed / n_chips
    tok_s = batch_size * new_tokens * steps / elapsed / n_chips
    _note(
        f"bench[eval/decode]: {pages:.2f} pages/s/chip "
        f"({tok_s:.0f} new tokens/s/chip @ {new_tokens} tokens/page)"
    )
    return {
        "pages_per_sec_per_chip": round(pages, 3),
        "new_tokens_per_sec_per_chip": round(tok_s, 1),
        "decode_len": new_tokens,
        "n_chips": n_chips,
    }


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    on_accelerator = jax.devices()[0].platform != "cpu"
    if on_accelerator:
        jax.config.update("jax_default_prng_impl", "rbg")  # fast dropout masks
        # reference pretrain semantics: tokenize pads to max_length=1024,
        # train step shifts -> 1023 decoder positions every step.
        # B=16 + flash attention measured best samples/sec/chip on v5e.
        model_name, batch_size, text_len = "cruller_base", 16, 1023
        steps, warmup = 10, 3
        dtype, dtype_flag, attn_impl = jnp.bfloat16, "bfloat16", "flash"
        decode_bs, decode_len, decode_steps = 16, 128, 3
    else:  # CPU smoke mode: tiny model so the script stays runnable anywhere
        model_name, batch_size, text_len = "cruller_test", 8, 64
        steps, warmup = 3, 1
        dtype, dtype_flag, attn_impl = jnp.float32, None, "xla"
        decode_bs, decode_len, decode_steps = 8, 16, 2

    modes = (sys.argv[1].split(",") if len(sys.argv) > 1
             else ["train", "pipeline", "decode"])

    extra = {}
    train_res = None
    if "train" in modes:
        train_res = bench_train_synthetic(
            model_name, batch_size, text_len, steps, warmup, dtype, attn_impl
        )
        extra["train_step_ms"] = train_res["step_ms"]
        extra["train_mfu"] = train_res["mfu"]
    if "pipeline" in modes:
        pipe = bench_train_pipeline(model_name, batch_size, steps, warmup, dtype_flag)
        extra["pipeline_fed_samples_per_sec_per_chip"] = pipe["samples_per_sec_per_chip"]
        if train_res:
            extra["pipeline_vs_synthetic"] = round(
                pipe["samples_per_sec_per_chip"] / train_res["samples_per_sec_per_chip"], 3
            )
    if "decode" in modes:
        dec = bench_eval_decode(model_name, decode_bs, decode_len, decode_steps, dtype)
        extra["eval_decode_pages_per_sec_per_chip"] = dec["pages_per_sec_per_chip"]
        extra["eval_decode_new_tokens_per_sec_per_chip"] = dec["new_tokens_per_sec_per_chip"]

    primary = train_res or {"samples_per_sec_per_chip": 0.0}
    print(json.dumps({
        "metric": "cruller_base pretrain samples/sec/chip",
        "value": primary["samples_per_sec_per_chip"],
        "unit": "samples/sec/chip",
        "vs_baseline": round(
            primary["samples_per_sec_per_chip"] / REFERENCE_SAMPLES_PER_SEC_PER_CHIP, 3
        ),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
