"""Capture a jax.profiler trace of one bench-config train step on the chip.

Usage:
  python tools/profile_step.py donut_base --batch 4 --remat gelu \
      --attn flash --image 1280x960 --out /tmp/trace_donut
  python tools/xplane_top.py /tmp/trace_donut

Reuses bench.py's model/optimizer/loss construction so the traced program
is byte-identical to the bench row. Traces 3 steps after a compile+warmup
step (the xplane then holds 3 repetitions of every op; xplane_top sums
them, which is fine for relative attribution).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--text-len", type=int, default=1023)
    ap.add_argument("--remat", default=False)
    ap.add_argument("--attn", default="flash")
    ap.add_argument("--image", default=None, help="HxW override, e.g. 1280x960")
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/trace")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import jax.numpy as jnp
    import numpy as np

    import bench
    from pixparse_tpu.framework.config import OptimizationCfg
    from pixparse_tpu.framework.optimization import create_optimizer
    from pixparse_tpu.framework.train_state import create_train_state, make_train_step
    from pixparse_tpu.models.config import get_model_config
    from pixparse_tpu.models.cruller import Cruller, resolve_cruller_cfgs
    from pixparse_tpu.ops.loss import cross_entropy_from_hidden
    from pixparse_tpu.parallel.mesh import create_mesh, shard_batch

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = get_model_config(args.model)
    if args.image:
        h, w = args.image.split("x")
        cfg.image_encoder.image_size = (int(h), int(w))
    vit_cfg, bart_cfg, _ = resolve_cruller_cfgs(cfg)
    remat = args.remat if args.remat not in ("False", "false", False) else False
    rng = np.random.RandomState(0)
    micro_b = args.batch // args.grad_accum
    shape = (
        (args.grad_accum, micro_b) if args.grad_accum > 1 else (args.batch,)
    )
    if args.model.startswith("pix2struct"):
        # mirrors bench.bench_train_pix2struct: full-length patch batches
        # through the varlen flash encoder
        from pixparse_tpu.models.pix2struct import Pix2StructCruller

        model = Pix2StructCruller(
            vit_cfg, bart_cfg, dtype=dtype, attn_impl=args.attn
        )
        n = vit_cfg.max_patches
        pdim = vit_cfg.patch_size ** 2 * vit_cfg.in_chans
        example_img = {
            "patches": jnp.zeros((1, n, pdim), jnp.float32),
            "rows": jnp.zeros((1, n), jnp.int32),
            "cols": jnp.zeros((1, n), jnp.int32),
            "mask": jnp.ones((1, n), bool),
        }
        example = (example_img, jnp.zeros((1, args.text_len), jnp.int32))
        cols_per_row = max(1, min(vit_cfg.max_cols, n // 2))
        idx = np.arange(n, dtype=np.int32)
        batch_img = {
            "patches": rng.rand(*shape, n, pdim).astype(np.float32),
            "rows": np.broadcast_to(idx // cols_per_row, (*shape, n)).copy(),
            "cols": np.broadcast_to(idx % cols_per_row, (*shape, n)).copy(),
            "mask": np.ones((*shape, n), bool),
        }
    else:
        model = Cruller(
            vit_cfg, bart_cfg, dtype=dtype, attn_impl=args.attn, remat=remat
        )
        example = (
            jnp.zeros((micro_b, *vit_cfg.img_size, vit_cfg.in_chans), jnp.float32),
            jnp.zeros((micro_b, args.text_len), jnp.int32),
        )
        batch_img = rng.rand(*shape, *vit_cfg.img_size, vit_cfg.in_chans).astype(
            np.float32
        )
    batch_np = {
        "image": batch_img,
        "text": rng.randint(4, bart_cfg.vocab_size, (*shape, args.text_len)).astype(
            np.int32
        ),
        "target": rng.randint(4, bart_cfg.vocab_size, (*shape, args.text_len)).astype(
            np.int32
        ),
    }

    mesh = create_mesh()
    opt_cfg = OptimizationCfg(
        learning_rate=3e-4, clip_grad_value=1.0, clip_grad_mode="norm",
        betas=(0.9, 0.98), weight_decay=0.02,
    )
    tx, _ = create_optimizer(
        opt_cfg, 30, 3, 100,
        encoder_depth=getattr(vit_cfg, "depth", 0),
        decoder_layers=bart_cfg.decoder_layers,
    )
    print("init train state...", file=sys.stderr)
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

    step = make_train_step(loss_fn, tx, mesh, grad_accum_steps=args.grad_accum)
    batch = shard_batch(mesh, batch_np, stacked=args.grad_accum > 1)

    print("compile+warmup...", file=sys.stderr)
    state, metrics = step(state, batch)
    print("warm loss:", bench._read_scalar(metrics["loss"]), file=sys.stderr)

    import time

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch)
    bench._read_scalar(metrics["loss"])
    untraced = (time.perf_counter() - t0) / args.steps

    print(f"tracing {args.steps} steps -> {args.out}", file=sys.stderr)
    jax.profiler.start_trace(args.out)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch)
    bench._read_scalar(metrics["loss"])
    traced = (time.perf_counter() - t0) / args.steps
    jax.profiler.stop_trace()
    print(
        f"step: {untraced*1e3:.1f} ms untraced / {traced*1e3:.1f} ms traced; "
        f"trace in {args.out}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
