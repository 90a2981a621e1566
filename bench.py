"""Benchmark: cruller_base pretrain step throughput (samples/sec/chip).

Runs the real jitted bf16 train step (ViT-B/16 576x448 grayscale encoder +
4-layer bart-base decoder w/ cross-attention, AdamW + clip + cosine schedule)
on synthetic data, measures steady-state samples/sec on the available
device(s), and prints ONE JSON line.

Baseline context (BASELINE.md): the reference publishes no numbers; the
north-star is >= reference A100 samples/sec/chip. ``vs_baseline`` reports the
ratio against a fixed reference point of 20 samples/sec/chip (a cruller_base
bf16 DDP A100 estimate; replaced by a measured number when the driver
provides one).
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_SAMPLES_PER_SEC_PER_CHIP = 20.0  # stand-in A100 baseline


def main():
    import os
    import sys

    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeat bench runs skip the big XLA compiles
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    def _note(msg):
        print(msg, file=sys.stderr, flush=True)

    from pixparse_tpu.framework.config import OptimizationCfg
    from pixparse_tpu.framework.optimization import create_optimizer
    from pixparse_tpu.framework.train_state import create_train_state, make_train_step
    from pixparse_tpu.models.config import get_model_config
    from pixparse_tpu.models.cruller import Cruller, resolve_cruller_cfgs
    from pixparse_tpu.ops.loss import chunked_cross_entropy_from_hidden
    from pixparse_tpu.parallel.mesh import create_mesh, shard_batch

    on_accelerator = jax.devices()[0].platform != "cpu"
    if on_accelerator:
        jax.config.update("jax_default_prng_impl", "rbg")  # fast dropout masks
    if on_accelerator:
        # reference pretrain semantics: tokenize pads to max_length=1024,
        # train step shifts -> 1023 decoder positions every step.
        # B=16 + flash attention measured best samples/sec/chip on v5e.
        batch_size, text_len, steps, warmup = 16, 1023, 10, 3
        model_name = "cruller_base"
    else:  # CPU smoke mode: tiny model so the script stays runnable anywhere
        batch_size, text_len, steps, warmup = 8, 64, 3, 1
        model_name = "cruller_test"

    cfg = get_model_config(model_name)
    vit_cfg, bart_cfg, _ = resolve_cruller_cfgs(cfg)
    model = Cruller(
        vit_cfg, bart_cfg,
        dtype=jnp.bfloat16 if on_accelerator else jnp.float32,
        attn_impl="flash" if on_accelerator else "xla",
    )
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
    _note("bench: init train state...")
    state, _ = create_train_state(model, tx, mesh, example, seed=0)
    _note("bench: init done")

    def loss_fn(params, batch, rng):
        hidden = model.apply(
            {"params": params}, batch["image"], batch["text"],
            deterministic=False, rngs={"dropout": rng},
            method="forward_hidden",
        )
        loss, _ = chunked_cross_entropy_from_hidden(
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

    _note("bench: warmup/compile train step...")
    for _ in range(warmup):
        state, metrics = step(state, batch)
    # NOTE: scalar readback, not block_until_ready — the latter does not
    # reliably synchronize through remote-TPU transports
    float(jax.device_get(metrics["loss"]))

    _note("bench: timing...")
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    float(jax.device_get(metrics["loss"]))
    elapsed = time.perf_counter() - t0

    samples_per_sec = batch_size * steps / elapsed
    per_chip = samples_per_sec / n_chips
    from pixparse_tpu.framework.profiling import cruller_train_flops, mfu

    flops = cruller_train_flops(vit_cfg, bart_cfg, batch_size, text_len)
    util = mfu(flops, elapsed / steps, n_chips=n_chips)
    if util is not None:
        _note(f"bench: step {elapsed / steps * 1e3:.1f} ms, MFU {util:.1%}")
    print(json.dumps({
        "metric": "cruller_base pretrain samples/sec/chip",
        "value": round(per_chip, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(per_chip / REFERENCE_SAMPLES_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
