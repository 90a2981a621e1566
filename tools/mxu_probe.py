"""In-VMEM MXU contraction-width probe (VERDICT r3 #3).

The flash kernel's score dots run in VMEM: (block_q, 64) x (64, block_k)
per head inside `for h in range(hp)`. Question: does Mosaic drive the MXU
at half rate when K=64, and would one (block_q, 128) x (128, block_k)
block-diagonal dot (2x executed MACs, both heads at once) be faster?

Kernel: each grid step does R back-to-back dots in VMEM, accumulating into
a single (M, N) f32 tile (so nothing but the final tile leaves the core).
Cases, equal USEFUL MACs per grid step:
  k64   : 2R dots of (256,  64) x ( 64, 256)
  k128  :  R dots of (256, 128) x (128, 256)
  k64x2 : 2R dots as above but operands live in one (256,128) buffer
          sliced per-64 lanes (models the packed layout's in-kernel slice)
"""
import functools, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

M = 512
N = 256
R = 64   # dots per grid step
G = 256  # grid steps


def kern_k64(a_ref, b_ref, o_ref):
    acc = jnp.zeros((M, N), jnp.float32)
    for r in range(2 * R):
        acc += jax.lax.dot_general(
            a_ref[r % 32], b_ref[r % 32],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[...] = acc


def kern_k128(a_ref, b_ref, o_ref):
    acc = jnp.zeros((M, N), jnp.float32)
    for r in range(R):
        acc += jax.lax.dot_general(
            a_ref[r % 32], b_ref[r % 32],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[...] = acc


def kern_k64x2(a_ref, b_ref, o_ref):
    # packed operands: slice 64 lanes out of a 128-lane buffer per dot
    acc = jnp.zeros((M, N), jnp.float32)
    for r in range(2 * R):
        h = r % 2
        a = a_ref[r % 32][:, h * 64:(h + 1) * 64]
        b = b_ref[r % 32][h * 64:(h + 1) * 64, :]
        acc += jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[...] = acc


def run(kern, K, kb):
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(32, M, K), jnp.bfloat16)
    b = jnp.asarray(rng.rand(32, kb, N), jnp.bfloat16)
    f = jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        grid=(G,),
        in_specs=[pl.BlockSpec((32, M, K), lambda i: (0, 0, 0)),
                  pl.BlockSpec((32, kb, N), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((M, N), lambda i: (0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
    ))
    out = f(a, b); float(jax.device_get(out[0, 0]))
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(a, b)
    float(jax.device_get(out[0, 0]))
    dt = (time.perf_counter() - t0) / 20
    macs = G * R * M * N * 128  # useful MACs identical across cases
    print(f"{kern.__name__:10s} {dt*1e6:8.1f} us  useful {2*macs/dt/1e12:6.1f} TFLOP/s",
          flush=True)


run(kern_k64, 64, 64)
run(kern_k128, 128, 128)
run(kern_k64x2, 128, 128)
