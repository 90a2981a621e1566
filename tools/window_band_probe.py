"""Probe: fold the Swin window partition/reverse into the Pallas kernel.

The donut_base profile attributes ~22.6 ms/step to copies — dominated by
`_window_partition`/`_window_reverse` transposes around every block's
attention (models/swin.py:132-142). PERF.md's deferred idea: read the
NHWC map directly in the kernel via BlockSpec (a horizontal band of TBw
windows is a contiguous (1, win, TBw*win, C) tile of NHWC) and do the
window gather in VMEM instead of HBM.

The crux this probe answers BEFORE any kernel rewrite:

1. Does Mosaic compile the in-VMEM (win, win, C) <-> (win*win, C)
   reshape (win=10 is not sublane-aligned, so this is a relayout)?
2. End-to-end, does [banded kernel on NHWC] beat
   [XLA partition -> current fused kernel -> XLA reverse] on the donut
   stage geometries? Both variants include the identical qkv projection
   so the delta isolates the partition/reverse copies vs any in-kernel
   relayout cost.

Run on the chip: python tools/window_band_probe.py [stage0|stage2|all]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from pixparse_tpu.models.swin import _window_partition, _window_reverse  # noqa: E402
from pixparse_tpu.ops.window_attention import window_attention  # noqa: E402


def band_fwd_kernel(qkv_ref, bias_ref, o_ref, *, heads, dh, win, tbw):
    """qkv_ref: (1, 1, win, tbw, win, 3C); bias: (H, ww, ww) f32;
    o_ref: (1, 1, win, tbw, win, C)."""
    C = heads * dh
    ww = win * win
    scale = dh ** -0.5
    for t in range(tbw):
        w = qkv_ref[0, 0, :, t, :, :]  # (win, win, 3C)
        x = w.reshape(ww, 3 * C)       # THE relayout under test
        q, k, v = x[:, :C], x[:, C:2 * C], x[:, 2 * C:]
        outs = []
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + bias_ref[h]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
            outs.append(jax.lax.dot_general(
                p, v[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        o = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)  # (ww, C)
        o_ref[0, 0, :, t, :, :] = o.reshape(win, win, C)  # inverse relayout


def banded_attention(qkv, bias, win, tbw):
    """qkv: (B, Hp, Wp, 3C) NHWC -> (B, Hp, Wp, C). No HBM transpose:
    the 6-D view is a free reshape; blocks are contiguous band tiles."""
    B, Hp, Wp, C3 = qkv.shape
    C = C3 // 3
    heads, ww = bias.shape[0], win * win
    dh = C // heads
    nwh, nww = Hp // win, Wp // win
    x6 = qkv.reshape(B, nwh, win, nww, win, C3)
    spec_in = pl.BlockSpec(
        (1, 1, win, tbw, win, C3), lambda b, h, j: (b, h, 0, j, 0, 0))
    spec_out = pl.BlockSpec(
        (1, 1, win, tbw, win, C), lambda b, h, j: (b, h, 0, j, 0, 0))
    out = pl.pallas_call(
        functools.partial(band_fwd_kernel, heads=heads, dh=dh, win=win, tbw=tbw),
        grid=(B, nwh, nww // tbw),
        in_specs=[spec_in, pl.BlockSpec((heads, ww, ww), lambda b, h, j: (0, 0, 0))],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((B, nwh, win, nww, win, C), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x6, bias)
    return out.reshape(B, Hp, Wp, C)


def variant_current(h, wqkv, bias, win):
    """XLA partition -> fused window kernel -> XLA reverse (today's path)."""
    B, Hp, Wp, C = h.shape
    windows = _window_partition(h, win)          # HBM transpose
    qkv = windows @ wqkv                          # (nB, ww, 3C)
    o = window_attention(qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:], bias)
    return _window_reverse(o, win, B, Hp, Wp)     # HBM transpose


def variant_banded(h, wqkv, bias, win, tbw):
    qkv = h @ wqkv                                # same matmul, NHWC layout
    return banded_attention(qkv, bias, win, tbw)


def run(name, B, Hp, Wp, C, heads, win, tbw, iters=30):
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(B, Hp, Wp, C), jnp.bfloat16)
    wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.02, jnp.bfloat16)
    ww = win * win
    bias = jnp.asarray(rng.randn(heads, ww, ww) * 0.1, jnp.float32)

    f_cur = jax.jit(functools.partial(variant_current, bias=bias, win=win))
    f_band = jax.jit(functools.partial(
        variant_banded, bias=bias, win=win, tbw=tbw))

    o_cur = f_cur(h, wqkv)
    o_band = f_band(h, wqkv)
    diff = float(jnp.max(jnp.abs(o_cur.astype(jnp.float32)
                                 - o_band.astype(jnp.float32))))
    print(f"[{name}] parity max|diff| = {diff:.3e}", flush=True)

    for label, f in (("current", f_cur), ("banded ", f_band)):
        float(jax.device_get(jnp.sum(f(h, wqkv).astype(jnp.float32))))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(h, wqkv)
        float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"[{name}] {label}: {dt:7.3f} ms", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", flush=True)
    # donut_base 1280x960: stage grids 320x240 (C=128, H=4), 160x120
    # (C=256, H=8), 80x60 (C=512, H=16), 40x30 (C=1024, H=32); win=10
    if which in ("reshape", "all"):
        # minimal compile check of the relayout alone: tiny geometry
        run("reshape-smoke", 1, 20, 20, 128, 4, 10, 2, iters=5)
    if which in ("stage0", "all"):
        run("stage0 320x240 C128", 4, 320, 240, 128, 4, 10, 6)
    if which in ("stage2", "all"):
        run("stage2  80x60 C512", 4, 80, 60, 512, 16, 10, 6)


if __name__ == "__main__":
    main()
