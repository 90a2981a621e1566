"""Minimal repro: context-sensitive TPU worker crash with the fused Swin
window-attention kernel (ops/window_attention.py).

WARNING: running this WILL kill the TPU worker process on affected
versions (it auto-restarts under axon; re-verify with a trivial jnp op
before the next real run). Do NOT run while another chip job is active.

Distilled from the bisection in docs/PERF.md "Fused Swin window
attention" (round 3). The kernel itself is shape-correct: every faulting
composition's standalone kernels pass and compute parity <= 9e-4 vs the
XLA math; the fault toggles with *compilation context* in both
directions (an encoder-only jax.grad at B=4 faults while the strictly
larger full train step at B=4 — same fwd+bwd kernels — runs clean).

Two smallest known-faulting compositions (pick via argv[1]):

  python docs/repro_window_fault.py grad_b4    # encoder-only grad, B=4
  python docs/repro_window_fault.py depths222  # 3-stage fwd+bwd, B=8
  python docs/repro_window_fault.py control    # B=4 passing control
  python docs/repro_window_fault.py full_b8    # full-depth fwd+bwd, B=8
  python docs/repro_window_fault.py encode_b16 # full-depth fwd only, B=16
                                               # (the eval/decode encode)

UPDATE (round 5, jax 0.9.0): the fault's envelope MOVED — every mode of
this script (including both 0.8.x faulters and the new full_b8/encode_b16)
now survives, but the bench donut DECODE composition (jitted B=16 encode +
KV-cache decode program, `python bench.py donut` with the guard bypassed)
crashed the worker the same way. The set of faulting compositions
reshuffles with the compiler pin; the production guard
(models/swin.py::_flash_window_unvalidated) therefore STAYS. Read a
passing canary as necessary, not sufficient: only the exact production
composition counts as validated. Re-run all modes AND the bench donut
rows after any jax/jaxlib upgrade.

Environment of record (round 3/4): jax 0.8.x, single TPU v5e via axon,
donut_swin_base geometry (1280x960, patch 4, window 10, embed 128).

The production guard (models/swin.py::_flash_window_unvalidated) reroutes
batch>4 multi-stage compositions to XLA; this script disables it via
PIXPARSE_UNSAFE_FLASH_WINDOW=1 — that env var exists ONLY for this kind of
fault work.
"""

import os
import sys

os.environ["PIXPARSE_UNSAFE_FLASH_WINDOW"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from pixparse_tpu.models.swin import Swin, SwinCfg  # noqa: E402


def build(depths, batch):
    cfg = SwinCfg(
        img_size=(1280, 960), patch_size=4, in_chans=3, embed_dim=128,
        depths=depths, num_heads=(4, 8, 16, 32)[: len(depths)],
        window_size=10,
    )
    model = Swin(cfg, dtype=jnp.bfloat16, attn_impl="flash")
    x = jnp.asarray(np.random.RandomState(0).rand(batch, 1280, 960, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return model, params, x


def encoder_grad(model, params, x):
    def loss(p):
        return jnp.mean(model.apply(p, x).astype(jnp.float32) ** 2)

    return jax.jit(jax.grad(loss))(params)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "grad_b4"
    if mode == "grad_b4":
        # encoder-only grad at B=4 — FAULTS (while the full train step at
        # B=4, containing these exact kernels plus more, runs clean)
        model, params, x = build((2, 2, 14, 2), 4)
    elif mode == "depths222":
        # truncated-depth fwd+bwd at B=8 — FAULTS ((2,) and (2,2) pass)
        model, params, x = build((2, 2, 2), 8)
    elif mode == "control":
        # B=4 truncated-depth — PASSES (same kernels, smaller context)
        model, params, x = build((2, 2), 4)
    elif mode == "full_b8":
        # full donut depths fwd+bwd at B=8 — the composition the round-3/4
        # guard existed for
        model, params, x = build((2, 2, 14, 2), 8)
    elif mode == "encode_b16":
        # fwd-only full-depth encode at B=16 — the eval/decode envelope
        model, params, x = build((2, 2, 14, 2), 16)
        out = jax.jit(model.apply)(params, x)
        print("survived:", mode, float(jnp.sum(jnp.abs(out.astype(jnp.float32)))))
        return
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    g = encoder_grad(model, params, x)
    leaf = jax.tree_util.tree_leaves(g)[0]
    print("survived:", mode, float(jnp.sum(jnp.abs(leaf.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
