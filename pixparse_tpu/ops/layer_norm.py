"""Fused Pallas LayerNorm (forward + one-pass backward).

Parity: the reference normalizes with torch ``nn.LayerNorm`` everywhere
(timm ViT blocks, HF BART layers — e.g. reference
``src/pixparse/models/image_encoder_timm.py`` / the HF decoder stack);
numerically this is the same mean/variance normalization with learned
(scale, bias), stats in fp32.

Motivation (TPU): a v5e profile of the cruller_large B=4 train step showed
**71 ms/step (17%) in XLA LayerNorm fusions** — 45 ms forward
(``convert_reduce_fusion``: two fp32 stat tensors + the normalized output)
and 26 ms backward (``multiply_reduce_fusion``) — running at ~190 GB/s
against the chip's measured 368 GB/s elementwise stream rate. XLA lowers
the lane-dimension reductions as separate passes over the (R, D) tile and
round-trips fp32 stats through HBM.

Measured outcome (v5e, 2026-08-19 — docs/PERF.md "Fused LayerNorm A/B"):
**the kernel is a net LOSS inside full train steps** and is therefore
opt-in (``PIXPARSE_LN_IMPL=pallas``), not the default. The profile's 71 ms
counted *fusions containing* LN, but those fusions also carried the
adjacent residual adds/casts XLA had folded in; carving LN out into a
custom call forces those neighbours into separate passes and blocks remat
compression of the saved activations. cruller_base train: 72.6 (pallas)
vs 77.9 (xla) samples/s; cruller_large B=4: OOM (16.81G > 15.75G) vs fits.
The kernel stays for targeted use and as a worked negative result.

Design:

- forward kernel: one pass — read the (block_rows, D) tile, compute fp32
  row stats in VMEM, write the normalized bf16 tile. **No stats are saved**;
  the backward recomputes mean/rstd from the residual-stream input it must
  re-read anyway (pre-LN blocks keep that array alive for the residual add,
  so saving it costs no extra HBM).
- backward kernel: one pass — recompute stats, write dx, and accumulate
  dscale/dbias partials into a single (1, D) fp32 output across the
  sequential TPU grid.
- the ``custom_vjp`` sits OUTSIDE shard_map (same reasoning as the fused CE
  in :mod:`pixparse_tpu.ops.loss`): forward and backward each dispatch
  shard_map as plain computations; under a >1-device mesh rows are sharded
  over ``(data, fsdp)`` and dscale/dbias are psum'ed inside the backward
  shard_map. A bare pallas_call under pjit would be replicated by the SPMD
  partitioner (repo invariant).
- XLA fallback (CPU, ragged D): plain fp32-stats math under autodiff.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from pixparse_tpu.ops.flash_attention import _interpret, ambient_mesh

LANES = 128
_SUBLANES = 8


def _ln_ref(x, scale, bias, eps):
    """fp32-stats LayerNorm, XLA autodiff path (CPU fallback + parity oracle)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    xc = xf - mu
    var = (xc * xc).mean(-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


# --------------------------------------------------------------------------
# kernels


def _fwd_kernel(x_ref, w_ref, b_ref, y_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # (block_rows, D)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * w_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, w_ref, dy_ref, dx_ref, dw_ref, db_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    dxh = dy * w_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (dxh - m1 - xhat * m2)).astype(dx_ref.dtype)
    # dscale/dbias: zero-padded tail rows carry dy == 0, so they add nothing
    pw = jnp.sum(dy * xhat, axis=0, keepdims=True)  # (1, D) f32
    pb = jnp.sum(dy, axis=0, keepdims=True)
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = pw
        db_ref[...] = pb

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dw_ref[...] += pw
        db_ref[...] += pb


def _block_rows(R: int, D: int) -> int:
    # backward holds x/dy tiles plus several (block_rows, D) fp32 temporaries
    # in VMEM; shrink the block as D grows so wide models stay under the
    # (raised) scoped-VMEM limit — see _compiler_params
    cap = 512 if D <= 1024 else (256 if D <= 4096 else 128)
    return min(cap, max(_SUBLANES, -(-R // _SUBLANES) * _SUBLANES))


def _compiler_params(*semantics):
    from jax.experimental.pallas import tpu as pltpu

    # raise the default 16 MB scoped-vmem limit: the backward's fp32
    # temporaries at (256, 4096) tiles exceed it with input double-buffering
    return pltpu.CompilerParams(
        dimension_semantics=tuple(semantics),
        vmem_limit_bytes=64 * 1024 * 1024,
    )


def _pad_rows(a, R_p):
    R = a.shape[0]
    return a if R == R_p else jnp.pad(a, ((0, R_p - R), (0, 0)))


def _fwd_local(x2, w2, b2, *, eps):
    from jax.experimental import pallas as pl

    R, D = x2.shape
    br = _block_rows(R, D)
    R_p = -(-R // br) * br
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((R_p, D), x2.dtype),
        grid=(R_p // br,),
        in_specs=[
            pl.BlockSpec((br, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, D), lambda i: (i, 0)),
        compiler_params=_compiler_params("parallel"),
        interpret=_interpret(),
    )(_pad_rows(x2, R_p), w2, b2)
    return y[:R]


def _bwd_local(x2, w2, dy2, *, eps):
    from jax.experimental import pallas as pl

    R, D = x2.shape
    br = _block_rows(R, D)
    R_p = -(-R // br) * br
    dx, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((R_p, D), x2.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        grid=(R_p // br,),
        in_specs=[
            pl.BlockSpec((br, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((br, D), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((br, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ),
        # grid accumulates dscale/dbias across rows -> sequential semantics
        compiler_params=_compiler_params("arbitrary"),
        interpret=_interpret(),
    )(_pad_rows(x2, R_p), w2, _pad_rows(dy2, R_p))
    return dx[:R], dw, db


# --------------------------------------------------------------------------
# dispatch (mesh-aware) + custom_vjp

_BATCH_AXES = ("data", "fsdp")


def _ln_mesh(R: int):
    mesh = ambient_mesh()
    if mesh is None or not ({"data", "fsdp", "model"} <= set(mesh.axis_names)):
        return None
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_batch = sizes["data"] * sizes["fsdp"]
    return mesh if R % n_batch == 0 else None


def _mesh_unshardable(R: int) -> bool:
    """True when a >1-device mesh is ambient but the sharded shard_map
    dispatch is impossible (rows not divisible by data*fsdp, or foreign axis
    names). The kernel must NOT run bare in that case: a bare pallas_call
    under pjit is replicated by the SPMD partitioner (full-batch all-gather
    on every chip — repo invariant); the caller falls back to XLA, which
    shards fine under pjit."""
    mesh = ambient_mesh()
    if mesh is None or mesh.devices.size == 1:
        return False
    return _ln_mesh(R) is None


def _fwd_dispatch(x2, w2, b2, eps):
    from jax.sharding import PartitionSpec as P

    mesh = _ln_mesh(x2.shape[0])
    fn = functools.partial(_fwd_local, eps=eps)
    if mesh is None:
        return fn(x2, w2, b2)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(_BATCH_AXES, None), P(None, None), P(None, None)),
        out_specs=P(_BATCH_AXES, None),
        check_vma=False,  # pallas outputs carry no vma metadata
    )(x2, w2, b2)


def _bwd_dispatch(x2, w2, dy2, eps):
    from jax.sharding import PartitionSpec as P

    mesh = _ln_mesh(x2.shape[0])
    if mesh is None:
        return _bwd_local(x2, w2, dy2, eps=eps)

    def fn(x2, w2, dy2):
        dx, dw, db = _bwd_local(x2, w2, dy2, eps=eps)
        dw = jax.lax.psum(dw, _BATCH_AXES)
        db = jax.lax.psum(db, _BATCH_AXES)
        return dx, dw, db

    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(_BATCH_AXES, None), P(None, None), P(_BATCH_AXES, None)),
        out_specs=(P(_BATCH_AXES, None), P(None, None), P(None, None)),
        check_vma=False,
    )(x2, w2, dy2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_fused(x2, w, b, eps):
    return _fwd_dispatch(x2, w[None, :], b[None, :], eps)


def _ln_fused_vjp_fwd(x2, w, b, eps):
    return _ln_fused(x2, w, b, eps), (x2, w)


def _ln_fused_vjp_bwd(eps, res, dy2):
    x2, w = res
    dx, dw, db = _bwd_dispatch(x2, w[None, :], dy2, eps)
    return dx, dw[0].astype(w.dtype), db[0].astype(w.dtype)


_ln_fused.defvjp(_ln_fused_vjp_fwd, _ln_fused_vjp_bwd)


def layer_norm(
    x: jax.Array,  # (..., D)
    scale: jax.Array,  # (D,)
    bias: jax.Array,  # (D,)
    eps: float = 1e-6,
    impl: "str | None" = None,  # None = pallas on TPU, xla elsewhere
) -> jax.Array:
    """LayerNorm over the last axis; fp32 stats, output in ``x.dtype``."""
    import os

    D = x.shape[-1]
    R = x.size // D if D else 0
    if impl is None:
        # PIXPARSE_LN_IMPL=pallas: opt-in A/B escape hatch. Default is XLA:
        # measured on v5e (2026-08-19, docs/PERF.md "Fused LayerNorm A/B"),
        # the standalone kernel's custom-call boundary breaks XLA's fusion of
        # LN with adjacent elementwise ops and its remat compression —
        # cruller_base train dropped 77.9 -> 72.6 samples/s and cruller_large
        # B=4 went from fitting (10.0/s) to OOM (16.81G > 15.75G HBM).
        impl = os.environ.get("PIXPARSE_LN_IMPL", "xla")
        if impl == "pallas" and (_interpret() or D % LANES or D > 8192):
            impl = "xla"  # env opt-in still respects kernel eligibility
    if impl == "pallas" and _mesh_unshardable(R):
        impl = "xla"  # never a bare pallas_call under a >1-device pjit mesh
    if impl == "xla":
        return _ln_ref(x, scale, bias, eps)
    shape = x.shape
    y = _ln_fused(x.reshape(-1, D), scale, bias, float(eps))
    return y.reshape(shape)


class FusedLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm`` (same param names/shapes: scale, bias)
    that routes through :func:`layer_norm` — fp32-stats XLA math by default,
    the Pallas kernel under ``PIXPARSE_LN_IMPL=pallas``.
    Unlike flax's LayerNorm — which casts (x - mean) to the
    compute dtype before scaling — the whole normalization here runs in
    fp32 and only the final result is cast, so it is (slightly) *more*
    accurate at bf16."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # logical-axis-annotated by default: params must carry logical axis names
    # for the mesh rules (parallel/mesh.py) — same annotation the model
    # stacks apply to nn.LayerNorm (models/bart.py::_ln)
    scale_init: Callable = nn.with_logical_partitioning(
        nn.initializers.ones_init(), ("embed",)
    )
    bias_init: Callable = nn.with_logical_partitioning(
        nn.initializers.zeros_init(), ("embed",)
    )

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        scale = self.param("scale", self.scale_init, (D,), self.param_dtype)
        bias = self.param("bias", self.bias_init, (D,), self.param_dtype)
        return layer_norm(x.astype(self.dtype), scale, bias, self.epsilon)
