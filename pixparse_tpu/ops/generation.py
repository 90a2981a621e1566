"""Jitted KV-cached autoregressive generation.

Replaces all four hand-rolled decode loops in the reference (SURVEY.md §3.4):
``utils/ocr_utils.py:143-197`` (batched greedy, full-prefix recompute every
step), the per-sample string-rebuild loops in CORD/DocVQA eval
(``task_cruller_eval_cord.py:349-368``), and the RVLCDIP 5-step variant.

Design:
- one ``prefill`` pass caches self-attn K/V for the prompt and cross-attn K/V
  for the encoder output (computed once per image, not once per step),
- a ``lax.while_loop`` single-token decode with static-shape buffers: the
  output is a preallocated ``(B, max_length)`` token buffer, finished
  sequences get ``pad`` written (the reference keeps appending argmax garbage
  after EOS — deviation documented, ours is strictly cleaner),
- early exit preserves the reference semantics: loop ends when every sequence
  has produced EOS or ``max_length`` is reached,
- greedy by default; temperature sampling matches
  ``utils/ocr_utils.py:200-222`` (``get_next_token``).

The whole thing is one jit per (batch, prompt-length, max-length) signature.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class GenerateResult(NamedTuple):
    tokens: jax.Array  # (B, max_length) int32, pad-filled after EOS
    lengths: jax.Array  # (B,) number of valid tokens (incl. prompt + eos)


def _select_next(logits, sample: bool, temperature: float, rng):
    if sample:
        return jax.random.categorical(rng, logits / temperature, axis=-1)
    return jnp.argmax(logits, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "max_length", "eos_token_id", "pad_token_id", "sample", "temperature",
    ),
)
def generate(
    model,  # flax module with .decode(input_ids, enc, key_pad_mask, mode) method
    params,
    encoder_output: jax.Array,  # (B, Lk, D)
    prompt_ids: jax.Array,  # (B, Lp) int32; may contain pad (masked out)
    *,
    max_length: int,
    eos_token_id: int,
    pad_token_id: int,
    sample: bool = False,
    temperature: float = 5.0,
    rng: Optional[jax.Array] = None,
) -> GenerateResult:
    B, Lp = prompt_ids.shape
    assert Lp < max_length, "prompt longer than max_length"
    decode_model = model.clone(max_cache_len=max_length)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    buffer = jnp.full((B, max_length), pad_token_id, jnp.int32)
    buffer = jax.lax.dynamic_update_slice(buffer, prompt_ids.astype(jnp.int32), (0, 0))

    # cache skeleton (zeros) via shape-only trace
    cache_shapes = jax.eval_shape(
        lambda: decode_model.init(
            jax.random.PRNGKey(0),
            prompt_ids,
            encoder_output,
            mode="prefill",
            method="decode",
        )["cache"]
    )
    cache0 = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes
    )

    key_mask = buffer != pad_token_id
    prefill_logits, mutated = decode_model.apply(
        {"params": params, "cache": cache0},
        prompt_ids,
        encoder_output,
        key_pad_mask=key_mask,
        mode="prefill",
        method="decode",
        mutable=["cache"],
    )
    cache = mutated["cache"]

    # prompt may be right-padded: last real position per row
    prompt_valid = (prompt_ids != pad_token_id).sum(axis=1)  # (B,)
    last_idx = jnp.maximum(prompt_valid - 1, 0)
    carry_logits = jnp.take_along_axis(
        prefill_logits, last_idx[:, None, None], axis=1
    )[:, 0, :]

    class State(NamedTuple):
        buffer: jax.Array
        cache: dict
        logits: jax.Array
        finished: jax.Array
        cur: jax.Array
        rng: jax.Array

    def cond(s: State):
        return (s.cur < max_length) & ~jnp.all(s.finished)

    def body(s: State):
        rng, step_rng = jax.random.split(s.rng)
        next_tok = _select_next(s.logits, sample, temperature, step_rng).astype(jnp.int32)
        newly_finished = s.finished | (next_tok == eos_token_id)
        write_tok = jnp.where(s.finished, pad_token_id, next_tok)
        buf = jax.lax.dynamic_update_slice(
            s.buffer, write_tok[:, None], (0, s.cur)
        )
        key_mask = buf != pad_token_id
        step_logits, mutated = decode_model.apply(
            {"params": params, "cache": s.cache},
            write_tok[:, None],
            encoder_output,
            key_pad_mask=key_mask,
            mode="decode",
            method="decode",
            mutable=["cache"],
        )
        return State(
            buffer=buf,
            cache=mutated["cache"],
            logits=step_logits[:, -1, :],
            finished=newly_finished,
            cur=s.cur + 1,
            rng=rng,
        )

    init = State(
        buffer=buffer,
        cache=cache,
        logits=carry_logits,
        finished=jnp.zeros((B,), bool),
        cur=jnp.asarray(Lp, jnp.int32),
        rng=rng,
    )
    final = jax.lax.while_loop(cond, body, init)
    lengths = (final.buffer != pad_token_id).sum(axis=1)
    return GenerateResult(tokens=final.buffer, lengths=lengths)


def generate_naive(
    model,
    params,
    encoder_output: jax.Array,
    prompt_ids: jax.Array,
    *,
    max_length: int,
    eos_token_id: int,
    pad_token_id: int,
) -> jax.Array:
    """Reference-algorithm greedy decode (full-prefix recompute each step,
    python loop, no cache). Kept as the correctness oracle for tests
    (mirrors ``utils/ocr_utils.py:165-197``; tokens after EOS are written as
    pad here, matching :func:`generate`)."""
    B, Lp = prompt_ids.shape
    ids = prompt_ids.astype(jnp.int32)
    finished = jnp.zeros((B,), bool)
    while ids.shape[1] < max_length and not bool(jnp.all(finished)):
        mask = ids != pad_token_id
        logits = model.apply(
            {"params": params},
            ids,
            encoder_output,
            attention_mask=mask,
            mode="train",
            method="decode",
        )
        # last non-pad position per row
        last = jnp.maximum(mask.sum(axis=1) - 1, 0)
        next_logits = jnp.take_along_axis(logits, last[:, None, None], axis=1)[:, 0, :]
        next_tok = jnp.argmax(next_logits, axis=-1).astype(jnp.int32)
        write = jnp.where(finished, pad_token_id, next_tok)
        finished = finished | (next_tok == eos_token_id)
        ids = jnp.concatenate([ids, write[:, None]], axis=1)
    pad_width = max_length - ids.shape[1]
    if pad_width:
        ids = jnp.pad(ids, ((0, 0), (0, pad_width)), constant_values=pad_token_id)
    return ids
