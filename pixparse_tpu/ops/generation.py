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


def _left_align_prompts(prompt_ids, pad_token_id):
    """Right-padded variable-length prompts -> (aligned_prompt, positions,
    prompt_valid): every row's last real token lands in the final column, so
    generated tokens write contiguously and cache slots line up with buffer
    columns; explicit positions keep real-token positions pad-independent."""
    B, Lp = prompt_ids.shape
    prompt_ids = prompt_ids.astype(jnp.int32)
    prompt_valid = (prompt_ids != pad_token_id).sum(axis=1)  # (B,)
    pad_counts = Lp - prompt_valid
    col = jax.lax.broadcasted_iota(jnp.int32, (B, Lp), 1)
    src_idx = col - pad_counts[:, None]
    aligned = jnp.where(
        src_idx >= 0,
        jnp.take_along_axis(prompt_ids, jnp.clip(src_idx, 0, Lp - 1), axis=1),
        pad_token_id,
    )
    positions = jnp.maximum(src_idx, 0)
    return aligned, positions, prompt_valid


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
    encoder_pad_mask: Optional[jax.Array] = None,  # (B, Lk) True = real key
    max_new_tokens: Optional[jax.Array] = None,  # (B,) per-row budget (>=1)
) -> GenerateResult:
    B, Lp = prompt_ids.shape
    assert Lp < max_length, "prompt longer than max_length"
    decode_model = model.clone(max_cache_len=max_length)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # opt-in int8 tied head: quantize the (V, D) embedding HERE — outside
    # the while_loop, so the table rides in as a loop constant (quantizing
    # inline in the model re-ran the ~38M-element round/clip chain every
    # step: measured 170.6 vs 190.2 pages/s). Per-vocab-row scales; the
    # decode step then returns pre-head hidden states and the head applies
    # below with a native int8 MXU dot.
    q8_head = getattr(model, "lm_head_dtype", "bf16") == "int8"
    if q8_head:
        from pixparse_tpu.ops.decode_attention import quantize_int8_rows

        E = params["text_decoder"]["embed_tokens"]["embedding"]
        _E_i8, _escale = quantize_int8_rows(E.astype(jnp.float32), axis=1)
        _ecol = _escale[:, 0]

        def _q8_logits(hidden):  # (B, 1, D) -> (B, 1, V) f32
            x_i8, xscale = quantize_int8_rows(
                hidden.astype(jnp.float32), axis=-1
            )
            raw = jax.lax.dot_general(
                x_i8, _E_i8, dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return raw.astype(jnp.float32) * xscale * _ecol

    aligned_prompt, prompt_positions, prompt_valid = _left_align_prompts(
        prompt_ids, pad_token_id
    )

    buffer = jnp.full((B, max_length), pad_token_id, jnp.int32)
    buffer = jax.lax.dynamic_update_slice(buffer, aligned_prompt, (0, 0))

    # cache skeleton (zeros) via shape-only trace
    cache_shapes = jax.eval_shape(
        lambda: decode_model.init(
            jax.random.PRNGKey(0),
            aligned_prompt,
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
        aligned_prompt,
        encoder_output,
        key_pad_mask=key_mask,
        mode="prefill",
        method="decode",
        mutable=["cache"],
        positions=prompt_positions,
        encoder_pad_mask=encoder_pad_mask,
    )
    cache = mutated["cache"]

    # left-aligned: every row's last real prompt token is at column Lp-1
    carry_logits = prefill_logits[:, -1, :]

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
        if max_new_tokens is not None:
            # rows share the column clock (left-aligned prompts), so the
            # generated count at this step is cur - Lp + 1 for every row
            newly_finished = newly_finished | (
                (s.cur - Lp + 1) >= max_new_tokens
            )
        write_tok = jnp.where(s.finished, pad_token_id, next_tok)
        buf = jax.lax.dynamic_update_slice(
            s.buffer, write_tok[:, None], (0, s.cur)
        )
        key_mask = buf != pad_token_id
        step_positions = (prompt_valid + (s.cur - Lp))[:, None]
        step_out, mutated = decode_model.apply(
            {"params": params, "cache": s.cache},
            write_tok[:, None],
            encoder_output,
            key_pad_mask=key_mask,
            mode="decode",
            method="decode",
            mutable=["cache"],
            positions=step_positions,
            encoder_pad_mask=encoder_pad_mask,
            return_hidden=q8_head,
        )
        step_logits = _q8_logits(step_out) if q8_head else step_out
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


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------

class BeamResult(NamedTuple):
    tokens: jax.Array  # (B, max_length) best beam, pad-filled after EOS
    scores: jax.Array  # (B,) length-normalized log-prob of the best beam
    all_tokens: jax.Array  # (B, K, max_length)
    all_scores: jax.Array  # (B, K)


def _gather_beam_cache(cache, flat_idx):
    """Reorder per-sequence cache rows (leading dim B*K); scalar counters
    (cache_index / position_offset) are shared and pass through.

    Cross-attention caches (``cached_enc_*``) are SKIPPED: every beam of a
    sample shares the same encoder output (``repeat(enc, K)``), and beam
    reordering only permutes within a sample, so the gather would copy
    hundreds of MB per step (B*K, Lk, H*D) to produce an identical array."""

    def gather(path, c):
        if c.ndim == 0:
            return c
        if any("cached_enc" in str(p) for p in path):
            return c
        return c[flat_idx]

    return jax.tree_util.tree_map_with_path(gather, cache)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "num_beams", "max_length", "eos_token_id", "pad_token_id",
    ),
)
def generate_beam(
    model,
    params,
    encoder_output: jax.Array,  # (B, Lk, D)
    prompt_ids: jax.Array,  # (B, Lp) int32, same prompt layout as generate()
    *,
    num_beams: int,
    max_length: int,
    eos_token_id: int,
    pad_token_id: int,
    length_penalty: float = 1.0,
) -> BeamResult:
    """Jitted KV-cached beam search (HF-style: additive log-probs, finished
    beams frozen by forcing pad, final ranking by score / length**penalty).

    ``num_beams=1`` reduces exactly to :func:`generate` (greedy).

    Note: ``lm_head_dtype='int8'`` applies only to the greedy :func:`generate`
    loop — beam search always uses the exact bf16 tied head (beam scores
    compare log-probs across beams, where quantization noise would reorder
    candidates; the int8 KV caches still apply through the decode step).
    """
    B, Lp = prompt_ids.shape
    K = num_beams
    assert Lp < max_length, "prompt longer than max_length"
    decode_model = model.clone(max_cache_len=max_length)

    # expand to (B*K, ...) flat beams; left-align variable-length prompts
    # (same layout contract as generate())
    enc = jnp.repeat(encoder_output, K, axis=0)
    prompts, prompt_positions, prompt_valid = _left_align_prompts(
        jnp.repeat(prompt_ids.astype(jnp.int32), K, axis=0), pad_token_id
    )

    buffer = jnp.full((B * K, max_length), pad_token_id, jnp.int32)
    buffer = jax.lax.dynamic_update_slice(buffer, prompts, (0, 0))

    cache_shapes = jax.eval_shape(
        lambda: decode_model.init(
            jax.random.PRNGKey(0), prompts, enc, mode="prefill", method="decode"
        )["cache"]
    )
    cache0 = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes
    )
    key_mask = buffer != pad_token_id
    prefill_logits, mutated = decode_model.apply(
        {"params": params, "cache": cache0},
        prompts,
        enc,
        key_pad_mask=key_mask,
        mode="prefill",
        method="decode",
        mutable=["cache"],
        positions=prompt_positions,
    )
    cache = mutated["cache"]
    V = prefill_logits.shape[-1]

    carry_logits = prefill_logits[:, -1, :]  # left-aligned: last col is real

    # only beam 0 of each sample is "live" at start (identical prompts would
    # otherwise produce K duplicate beams)
    init_scores = jnp.tile(
        jnp.where(jnp.arange(K) == 0, 0.0, -jnp.inf)[None, :], (B, 1)
    )  # (B, K)

    class BeamState(NamedTuple):
        buffer: jax.Array  # (B*K, max_length)
        cache: dict
        logits: jax.Array  # (B*K, V)
        scores: jax.Array  # (B, K) cumulative log-prob
        finished: jax.Array  # (B*K,)
        lengths: jax.Array  # (B*K,) generated length incl. eos
        cur: jax.Array

    def cond(s: BeamState):
        return (s.cur < max_length) & ~jnp.all(s.finished)

    def body(s: BeamState):
        logprobs = jax.nn.log_softmax(s.logits.astype(jnp.float32), axis=-1)
        fin = s.finished[:, None]
        # finished beams: pad continues with score 0, everything else -inf
        pad_onehot = jnp.where(
            jnp.arange(V)[None, :] == pad_token_id, 0.0, -jnp.inf
        )
        logprobs = jnp.where(fin, pad_onehot, logprobs)

        total = s.scores.reshape(B * K, 1) + logprobs  # (B*K, V)
        flat = total.reshape(B, K * V)
        top_scores, top_flat = jax.lax.top_k(flat, K)  # (B, K)
        beam_idx = top_flat // V  # (B, K) source beam within sample
        token = (top_flat % V).astype(jnp.int32)

        flat_src = (
            jnp.arange(B)[:, None] * K + beam_idx
        ).reshape(-1)  # (B*K,) indices into flat beams
        buffer = s.buffer[flat_src]
        cache = _gather_beam_cache(s.cache, flat_src)
        finished = s.finished[flat_src]
        lengths = s.lengths[flat_src]
        valid = prompt_valid[flat_src]

        tok_flat = token.reshape(-1)
        write_tok = jnp.where(finished, pad_token_id, tok_flat)
        buffer = jax.lax.dynamic_update_slice(
            buffer, write_tok[:, None], (0, s.cur)
        )
        newly_finished = finished | (tok_flat == eos_token_id)
        lengths = jnp.where(finished, lengths, lengths + 1)

        key_mask = buffer != pad_token_id
        step_positions = (valid + (s.cur - Lp))[:, None]
        step_logits, mutated = decode_model.apply(
            {"params": params, "cache": cache},
            write_tok[:, None],
            enc,
            key_pad_mask=key_mask,
            mode="decode",
            method="decode",
            mutable=["cache"],
            positions=step_positions,
        )
        return BeamState(
            buffer=buffer,
            cache=mutated["cache"],
            logits=step_logits[:, -1, :],
            scores=top_scores,
            finished=newly_finished,
            lengths=lengths,
            cur=s.cur + 1,
        )

    init = BeamState(
        buffer=buffer,
        cache=cache,
        logits=carry_logits,
        scores=init_scores,
        finished=jnp.zeros((B * K,), bool),
        lengths=jnp.zeros((B * K,), jnp.int32),
        cur=jnp.asarray(Lp, jnp.int32),
    )
    final = jax.lax.while_loop(cond, body, init)

    lengths = jnp.maximum(final.lengths.reshape(B, K), 1)
    norm_scores = final.scores / (lengths.astype(jnp.float32) ** length_penalty)
    best = jnp.argmax(norm_scores, axis=1)  # (B,)
    all_tokens = final.buffer.reshape(B, K, max_length)
    best_tokens = jnp.take_along_axis(
        all_tokens, best[:, None, None], axis=1
    )[:, 0]
    best_scores = jnp.take_along_axis(norm_scores, best[:, None], axis=1)[:, 0]
    return BeamResult(
        tokens=best_tokens,
        scores=best_scores,
        all_tokens=all_tokens,
        all_scores=norm_scores,
    )
