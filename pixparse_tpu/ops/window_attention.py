"""Fused Pallas windowed-attention kernel for Swin encoders.

Swin attention is thousands of tiny (ww x ww) softmax-attention problems
(ww = window^2, e.g. 100 tokens for Donut's window 10). The XLA lowering
materializes the f32 score tensor — (B*nW, H, ww, ww), ~0.5 GB per
donut_base stage-0 block — in HBM between the QK^T matmul, the
bias/mask/softmax fusion and the PV matmul, so the op is HBM-bound at a
few hundred GB/s of pure score traffic (profiled: ~104 ms of a 286 ms
donut_base train step). This kernel keeps the scores in VMEM: one grid
step loads a tile of TB windows (q/k/v rows), loops the heads, and writes
only the attention output. Window counts and window sizes are static per
Swin stage, so everything tiles at trace time.

Layout: q/k/v/out are (nB, ww, C) with C = heads*head_dim lane-major —
ww and C are the (sublane, lane) dims of every block, satisfying the
Mosaic "block equals array dim" clause for the non-aligned ww (e.g. 100).
The relative-position bias (H, ww, ww) is differentiable (the learned
table's gradient flows through the gather outside the kernel); the
shifted-window mask (nW, ww, ww) is a trace-time constant.

The backward recomputes scores flash-style (no lse residual needed — the
whole row is resident, max/sum are recomputed exactly) and accumulates
dbias across grid steps into a revisited output block (TPU grids are
sequential).

Multi-device: like the flash/CE kernels, a bare pallas_call under pjit is
replicated by the SPMD partitioner, so >1-device meshes dispatch through
shard_map — batch over (data, fsdp), heads (the C lanes and the bias
rows) over model. The custom_vjp sits OUTSIDE the shard_map (loss.py
rationale): its backward psums dbias over the batch axes explicitly.

Reference parity: timm/HF Swin `WindowAttention` (the reference leaves
Swin unfinished — `/root/reference/src/pixparse/models/image_encoder_timm.py:22-23`);
the math matches models/swin.py's XLA path exactly (softmax in f32).

Runs in interpreter mode automatically on CPU (tests).
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_logger = logging.getLogger(__name__)


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


def _vmem_limit_mb() -> int:
    import os

    # The kernel's working set is ~8 MB; a far larger scoped-VMEM limit
    # lets Mosaic over-commit VMEM that surrounding XLA computations may
    # also be holding live — a candidate mechanism for the
    # composition-dependent worker fault (docs/repro_window_fault.py):
    # whether the limit collides depends on what ELSE the program keeps in
    # VMEM, not on the kernel's own shapes. Overridable for fault triage.
    return int(os.environ.get("PIXPARSE_WINDOW_VMEM_MB", "32"))


def _compiler_params(semantics="parallel"):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(
        # fwd grid steps are independent ("parallel"); only the bwd needs
        # sequential steps ("arbitrary") for the cross-step dbias accumulation
        dimension_semantics=(semantics,),
        vmem_limit_bytes=_vmem_limit_mb() * 1024 * 1024,
    )


def _pick_tb(n_windows: int, n: int, c: int, itemsize: int, tensors: int) -> int:
    """Largest divisor of ``n_windows`` whose q/k/v/... blocks fit a ~4 MB
    VMEM budget (leaves room for the resident bias + f32 score values)."""
    budget = 4 * 1024 * 1024
    cap = max(1, budget // max(1, n * c * itemsize * tensors))
    best = 1
    for t in range(1, n_windows + 1):
        if n_windows % t == 0 and t <= cap:
            best = t
    return best


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(*refs, heads, dh, scale, has_mask):
    if has_mask:
        q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref = refs
        mask = mask_ref[...]  # (TB, N, N) f32
    else:
        q_ref, k_ref, v_ref, bias_ref, o_ref = refs
        mask = None
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (TB, N, N)
        s = s + bias_ref[h][None]
        if mask is not None:
            s = s + mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v[:, :, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


def _bwd_kernel(*refs, heads, dh, scale, has_mask):
    if has_mask:
        (q_ref, k_ref, v_ref, do_ref, bias_ref, mask_ref,
         dq_ref, dk_ref, dv_ref, dbias_ref) = refs
        mask = mask_ref[...]
    else:
        (q_ref, k_ref, v_ref, do_ref, bias_ref,
         dq_ref, dk_ref, dv_ref, dbias_ref) = refs
        mask = None

    @pl.when(pl.program_id(0) == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh, kh, vh, doh = q[:, :, sl], k[:, :, sl], v[:, :, sl], do[:, :, sl]
        s = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + bias_ref[h][None]
        if mask is not None:
            s = s + mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # (TB, N, N) f32

        pb = p.astype(vh.dtype)
        # dv[b,j,d] = sum_i p[b,i,j] do[b,i,d]
        dv = jax.lax.dot_general(
            pb, doh,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dp[b,i,j] = sum_d do[b,i,d] v[b,j,d]
        dp = jax.lax.dot_general(
            doh, vh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))  # f32
        dbias_ref[h] += jnp.sum(ds, axis=0)
        dsb = (ds * scale).astype(kh.dtype)
        dq = jax.lax.dot_general(
            dsb, kh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dk[b,j,d] = sum_i ds[b,i,j] q[b,i,d]
        dk = jax.lax.dot_general(
            dsb, qh,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# local (per-shard) pallas dispatch
# ---------------------------------------------------------------------------


def _specs(nB, N, C, TB, nW, heads, has_mask):
    qspec = pl.BlockSpec((TB, N, C), lambda i: (i, 0, 0))
    bspec = pl.BlockSpec((heads, N, N), lambda i: (0, 0, 0))
    in_specs = [qspec, qspec, qspec, bspec]
    if has_mask:
        blocks = nW // TB
        in_specs.append(pl.BlockSpec((TB, N, N), lambda i: (i % blocks, 0, 0)))
    return qspec, bspec, in_specs


def _fwd_local(q, k, v, bias, mask, heads, has_mask):
    nB, N, C = q.shape
    dh = C // heads
    nW = mask.shape[0] if has_mask else nB
    TB = _pick_tb(nW, N, C, q.dtype.itemsize, 4)
    qspec, _, in_specs = _specs(nB, N, C, TB, nW, heads, has_mask)
    args = (q, k, v, bias, mask) if has_mask else (q, k, v, bias)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, heads=heads, dh=dh, scale=dh ** -0.5, has_mask=has_mask
        ),
        grid=(nB // TB,),
        in_specs=in_specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((nB, N, C), q.dtype),
        compiler_params=_compiler_params("parallel"),
        interpret=_interpret(),
    )(*args)


def _bwd_local(q, k, v, do, bias, mask, heads, has_mask):
    nB, N, C = q.shape
    dh = C // heads
    nW = mask.shape[0] if has_mask else nB
    TB = _pick_tb(nW, N, C, q.dtype.itemsize, 8)
    qspec, bspec, in_specs = _specs(nB, N, C, TB, nW, heads, has_mask)
    in_specs.insert(3, qspec)  # do sits after q, k, v
    args = (q, k, v, do, bias, mask) if has_mask else (q, k, v, do, bias)
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, heads=heads, dh=dh, scale=dh ** -0.5, has_mask=has_mask
        ),
        grid=(nB // TB,),
        in_specs=in_specs,
        out_specs=(qspec, qspec, qspec, bspec),
        out_shape=(
            jax.ShapeDtypeStruct((nB, N, C), q.dtype),
            jax.ShapeDtypeStruct((nB, N, C), q.dtype),
            jax.ShapeDtypeStruct((nB, N, C), q.dtype),
            jax.ShapeDtypeStruct((heads, N, N), jnp.float32),
        ),
        compiler_params=_compiler_params("arbitrary"),
        interpret=_interpret(),
    )(*args)


# ---------------------------------------------------------------------------
# mesh-aware dispatch; custom_vjp OUTSIDE shard_map (see module docstring)
# ---------------------------------------------------------------------------


def _window_mesh(nB, heads, nW):
    from pixparse_tpu.ops.flash_attention import ambient_mesh

    mesh = ambient_mesh()
    if mesh is None or not ({"data", "fsdp", "model"} <= set(mesh.axis_names)):
        return None
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_batch = sizes["data"] * sizes["fsdp"]
    # shards must split on whole-image boundaries (mask period) and whole heads
    if nB % n_batch or (nB // n_batch) % nW or heads % sizes["model"]:
        return None
    return mesh, sizes["model"]


def _dispatch_fwd(q, k, v, bias, mask, heads, has_mask):
    nW = mask.shape[0] if has_mask else 1
    m = _window_mesh(q.shape[0], heads, nW)
    if m is None:
        return _fwd_local(q, k, v, bias, mask, heads, has_mask)
    mesh, model_sz = m
    from jax.sharding import PartitionSpec as P

    qspec = P(("data", "fsdp"), None, None if model_sz == 1 else "model")
    return jax.shard_map(
        functools.partial(
            _fwd_local, heads=heads // model_sz, has_mask=has_mask
        ),
        mesh=mesh,
        in_specs=(qspec, qspec, qspec, P("model"), P()),
        out_specs=qspec,
        check_vma=False,
    )(q, k, v, bias, mask)


def _dispatch_bwd(q, k, v, do, bias, mask, heads, has_mask):
    nW = mask.shape[0] if has_mask else 1
    m = _window_mesh(q.shape[0], heads, nW)
    if m is None:
        return _bwd_local(q, k, v, do, bias, mask, heads, has_mask)
    mesh, model_sz = m
    from jax.sharding import PartitionSpec as P

    qspec = P(("data", "fsdp"), None, None if model_sz == 1 else "model")

    def body(q, k, v, do, bias, mask):
        dq, dk, dv, db = _bwd_local(
            q, k, v, do, bias, mask, heads // model_sz, has_mask
        )
        db = jax.lax.psum(db, ("data", "fsdp"))
        return dq, dk, dv, db

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(qspec, qspec, qspec, qspec, P("model"), P()),
        out_specs=(qspec, qspec, qspec, P("model")),
        check_vma=False,
    )(q, k, v, do, bias, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _window_attn(q, k, v, bias, mask, heads, has_mask):
    return _dispatch_fwd(q, k, v, bias, mask, heads, has_mask)


def _window_attn_fwd(q, k, v, bias, mask, heads, has_mask):
    out = _dispatch_fwd(q, k, v, bias, mask, heads, has_mask)
    return out, (q, k, v, bias, mask)


def _window_attn_bwd(heads, has_mask, res, g):
    q, k, v, bias, mask = res
    dq, dk, dv, dbias = _dispatch_bwd(
        q, k, v, g.astype(q.dtype), bias, mask, heads, has_mask
    )
    return dq, dk, dv, dbias, jnp.zeros_like(mask)


_window_attn.defvjp(_window_attn_fwd, _window_attn_bwd)


def window_attention(
    q: jax.Array,  # (nB, ww, C)  nB = batch * windows-per-image, C = H*Dh
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,  # (H, ww, ww) relative-position bias (differentiable)
    mask: "jax.Array | None" = None,  # (nW, ww, ww) shift mask (constant)
) -> jax.Array:
    """Fused per-window attention: softmax((q k^T) * dh^-0.5 + bias + mask) v,
    computed window-tile-at-a-time with scores resident in VMEM."""
    heads = bias.shape[0]
    has_mask = mask is not None
    if has_mask:
        if q.shape[0] % mask.shape[0]:
            raise ValueError(
                f"window count {q.shape[0]} not a multiple of mask period "
                f"{mask.shape[0]}"
            )
        mask = jax.lax.stop_gradient(mask.astype(jnp.float32))
    else:
        mask = jnp.zeros((1, 1, 1), jnp.float32)
    if q.shape[-1] % heads:
        raise ValueError(f"C={q.shape[-1]} not divisible by heads={heads}")
    return _window_attn(
        q, k, v, bias.astype(jnp.float32), mask, heads, has_mask
    )
