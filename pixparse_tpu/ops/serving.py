"""Continuous-batching decode for serving (vLLM-style, TPU-native).

Batch decode (:func:`pixparse_tpu.ops.generation.generate`) runs every page
in a batch until the SLOWEST page finishes: with realistic OCR output-length
spread (a page's text can be 20 or 900 tokens), finished slots idle for
``max_len - len`` steps each — at a uniform [¼·L, L] length draw the batch
wastes ~35-40% of its decode steps. Continuous batching keeps a persistent
B-slot decode state and refills finished slots with freshly-encoded pages
mid-stream, so throughput tracks the MEAN generation length instead of the
batch max. The reference has no serving path at all (its eval decode is a
per-sample full-prefix recompute, /root/reference/src/pixparse/utils/ocr_utils.py);
this module is the TPU-first design for the deployment story.

Everything on-device is static-shape (XLA: one compile per program):

- **Decode chunks**: ``lax.fori_loop`` of K single-token steps over the
  persistent state; per-slot token counts give per-row positions, a one-hot
  column write appends to each row's compact output buffer.
- **Shared cache column**: the self-attention cache keeps its scalar write
  index (one ``dynamic_update_slice`` per step — a per-row scatter would
  either serialize on TPU or rewrite the whole cache every step). A refilled
  slot simply CONTINUES at the current shared column with its positions
  restarted at 0; an explicit per-slot ``cache_mask`` makes attention see
  only the slot's own K/V, and position embeddings come from explicit
  per-row positions, so cache-column order is irrelevant to the math.
- **Refill**: a fixed-size (``refill_size``) prefill program computes the new
  pages' cross-K/V + prompt self-K/V + first logits; per-row
  ``dynamic_update_slice`` (unrolled over the static refill size, dynamic row
  index) splices rows into the persistent caches — write-only, no full-cache
  rewrite.
- **Compaction**: the shared column grows ~1/step, so the self cache has
  ``capacity > max_length``; when the slack is exhausted, a one-hot matmul
  compresses every row's valid columns left (MXU-shaped, a few GFLOPs).
  Masked softmax entries are exact zeros and compress-left preserves key
  order, so compaction is bitwise-exact.

The host reads back only the (B,) finished mask (and, when harvesting, the
small int32 token buffer) between chunks; the shared column is mirrored on
the host, so no extra device round-trips. Pages are encoded in fixed-size
batches on demand through a caller-supplied ``encode_fn``.

Greedy parity with :func:`generate` is exact (tests/test_serving.py).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pixparse_tpu.ops.generation import _left_align_prompts


class PageResult(NamedTuple):
    page_id: Any
    tokens: np.ndarray  # (length,) int32 — prompt + generated (incl. eos)
    length: int


class _State(NamedTuple):
    """Persistent device-side decode state (all static shapes)."""

    buffer: jax.Array      # (B, max_length) int32, per-row compact tokens
    cache: Any             # flax cache tree; self leaves have capacity C
    cache_mask: jax.Array  # (B, C) bool — this slot's own K/V columns
    tok_count: jax.Array   # (B,) int32 — valid tokens (prompt + generated)
    prompt_len: jax.Array  # (B,) int32 — valid prompt tokens per row
    finished: jax.Array    # (B,) bool
    logits: jax.Array      # (B, V) f32 — pending next-token distribution
    max_new: jax.Array     # (B,) int32 — per-slot generation budget


def _is_self_kv(path) -> bool:
    name = path[-1].key
    return name in ("cached_key", "cached_value")


def _is_cache_index(path) -> bool:
    return path[-1].key == "cache_index"


class ContinuousBatcher:
    """Decode a stream of pre-processed page images with slot refill.

    Args:
      model: Cruller-like module with ``encode``/``decode`` methods.
      params: model params.
      slots: persistent decode batch size B.
      max_length: per-page token budget (prompt + generated), as in generate().
      prompt_ids: (Lp,) shared task prompt (every page gets the same prompt,
        as the OCR/eval tasks do).
      eos_token_id / pad_token_id: as in generate().
      refill_size: pages encoded + spliced per refill program call (static;
        refill waits until this many slots are free AND pages are pending).
      chunk_steps: decode steps per jitted chunk between host checks.
      capacity_slack: extra self-cache columns beyond max_length; compaction
        triggers when exhausted. More slack = rarer compaction but more
        decode-kernel cache read traffic.
    """

    def __init__(
        self,
        model,
        params,
        *,
        slots: int,
        max_length: int,
        prompt_ids,
        eos_token_id: int,
        pad_token_id: int,
        refill_size: int = 8,
        chunk_steps: int = 16,
        capacity_slack: Optional[int] = None,
    ):
        self.model = model
        self.params = params
        self.B = int(slots)
        self.max_length = int(max_length)
        self.eos = int(eos_token_id)
        self.pad = int(pad_token_id)
        self.E = min(int(refill_size), self.B)
        self.K = int(chunk_steps)
        if capacity_slack is None:
            # default: land C on the 128-column tile multiple bart.py will
            # allocate anyway (no wasted kernel read width), with at least
            # ~max_length/2 growth room between compactions
            c = max(self.max_length + self.K + 8, (3 * self.max_length) // 2)
            self.C = -(-c // 128) * 128
        else:
            # explicit slack is honored exactly (tests force compaction with
            # tiny capacities; bart still tile-pads its own allocation)
            self.C = self.max_length + max(int(capacity_slack), self.K + 8)
        pid = np.asarray(prompt_ids, np.int32).reshape(-1)
        self.Lp = int(pid.shape[0])
        assert self.Lp < max_length, "prompt longer than max_length"
        # shared prompt, left-aligned once on the host (mirrors
        # generation._left_align_prompts for the buffer contents)
        real = pid[pid != self.pad]
        self.prompt_valid = int(real.shape[0])
        self._prompt_row = np.full((self.max_length,), self.pad, np.int32)
        self._prompt_row[: self.prompt_valid] = real
        self.prompt_ids = jnp.asarray(pid)
        self.decode_model = model.clone(max_cache_len=self.C)
        self._enc_shape = None  # (Lk, D, dtype), set by the first encode

        self._jit_refill = jax.jit(self._refill, static_argnames=("n",))
        self._jit_chunk = jax.jit(self._chunk, donate_argnums=(1,))
        self._jit_compact = jax.jit(self._compact, donate_argnums=(0,))

    # ------------------------------------------------------------------
    # jitted pieces
    # ------------------------------------------------------------------

    def _prefill(self, params, enc, n: int):
        """Prefill ``n`` fresh pages: returns (cache tree with batch n,
        first logits (n, V), prompt_valid (n,))."""
        prompts = jnp.broadcast_to(self.prompt_ids[None], (n, self.Lp))
        aligned, positions, valid = _left_align_prompts(prompts, self.pad)
        cache_shapes = jax.eval_shape(
            lambda: self.decode_model.init(
                jax.random.PRNGKey(0), aligned, enc,
                mode="prefill", method="decode",
            )["cache"]
        )
        cache0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (1, self.C), 1)
        key_mask = col < valid[:, None]
        logits, mutated = self.decode_model.apply(
            {"params": params, "cache": cache0},
            aligned, enc,
            key_pad_mask=key_mask,
            mode="prefill", method="decode",
            mutable=["cache"],
            positions=positions,
        )
        return mutated["cache"], logits[:, -1, :].astype(jnp.float32), valid

    def _splice(self, state: _State, new_cache, new_logits, new_valid,
                slot_ids, max_new, col):
        """Splice freshly-prefilled pages into ``slot_ids`` rows of the
        persistent state at shared column ``col`` (static int). Row writes
        are per-row dynamic_update_slice (write-only), unrolled over the
        static refill size; ``slot_ids`` rows must be distinct."""
        E = new_logits.shape[0]

        def merge_leaf(path, dst, src):
            if _is_cache_index(path):
                return jnp.asarray(col + self.Lp, dst.dtype)
            if dst.ndim == 0:  # position_offset: unused (positions explicit)
                return dst
            if _is_self_kv(path):
                block = src[:, : self.Lp]  # prompt K/V at columns [0, Lp)
                for e in range(E):
                    dst = jax.lax.dynamic_update_slice(
                        dst, block[e : e + 1], (slot_ids[e], col, 0)
                    )
                return dst
            # cross-attention leaves (cached_enc_* and int8 scales): full row
            for e in range(E):
                start = (slot_ids[e],) + (0,) * (src.ndim - 1)
                dst = jax.lax.dynamic_update_slice(dst, src[e : e + 1], start)
            return dst

        cache = jax.tree_util.tree_map_with_path(
            merge_leaf, state.cache, new_cache
        )

        rows = jnp.zeros((self.B,), bool).at[slot_ids].set(True)
        onehot = rows[:, None]

        def by_slot(vals, fill):
            out = jnp.full((self.B,) + vals.shape[1:], fill, vals.dtype)
            return out.at[slot_ids].set(vals)

        valid_b = by_slot(new_valid, 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, self.C), 1)
        prompt_cols = (col_iota >= col) & (col_iota < col + valid_b[:, None])
        cache_mask = jnp.where(onehot, prompt_cols, state.cache_mask)

        prompt_row = jnp.asarray(self._prompt_row)
        buffer = jnp.where(onehot, prompt_row[None], state.buffer)
        return _State(
            buffer=buffer,
            cache=cache,
            cache_mask=cache_mask,
            tok_count=jnp.where(rows, valid_b, state.tok_count),
            prompt_len=jnp.where(rows, valid_b, state.prompt_len),
            finished=jnp.where(rows, False, state.finished),
            logits=jnp.where(onehot, by_slot(new_logits, 0.0), state.logits),
            max_new=jnp.where(rows, by_slot(max_new, 0), state.max_new),
        )

    def _refill(self, params, enc, state: _State, slot_ids, max_new, col, n: int):
        """Prefill ``n`` fresh pages AND splice them into ``slot_ids`` as ONE
        jitted program. Dispatch count is the serving hot metric on remote-TPU
        transports (every dispatch pays a host round trip measured in tens of
        ms — docs/PERF.md "Continuous batching vs dispatch latency"), so the
        two stages are fused rather than dispatched back-to-back."""
        new_cache, new_logits, new_valid = self._prefill(params, enc, n)
        return self._splice(
            state, new_cache, new_logits, new_valid, slot_ids, max_new, col
        )

    def _chunk(self, params, state: _State, col):
        """K greedy decode steps (the generate() body with per-row state);
        ``col`` is the shared cache column at entry — a dynamic scalar (the
        host mirrors its value to avoid device readbacks, but the jitted
        program treats it as data, so no recompiles as it advances)."""
        buf_iota = jax.lax.broadcasted_iota(jnp.int32, (1, self.max_length), 1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, self.C), 1)
        lk, dim, enc_dtype = self._enc_shape
        dummy_enc = jnp.zeros((self.B, lk, dim), enc_dtype)

        def body(i, s: _State):
            c = col + i
            tok = jnp.argmax(s.logits, axis=-1).astype(jnp.int32)
            budget_hit = (s.tok_count - s.prompt_len + 1) >= s.max_new
            cap_hit = (s.tok_count + 1) >= self.max_length
            newly = s.finished | (tok == self.eos) | budget_hit | cap_hit
            write = jnp.where(s.finished, self.pad, tok)
            buffer = jnp.where(
                (buf_iota == s.tok_count[:, None]) & ~s.finished[:, None],
                write[:, None], s.buffer,
            )
            cache_mask = s.cache_mask | (
                (col_iota == c) & ~s.finished[:, None]
            )
            positions = s.tok_count[:, None]
            step_logits, mutated = self.decode_model.apply(
                {"params": params, "cache": s.cache},
                write[:, None],
                dummy_enc,
                key_pad_mask=cache_mask,
                mode="decode", method="decode",
                mutable=["cache"],
                positions=positions,
            )
            return _State(
                buffer=buffer,
                cache=mutated["cache"],
                cache_mask=cache_mask,
                tok_count=s.tok_count + (~s.finished),
                prompt_len=s.prompt_len,
                finished=newly,
                logits=step_logits[:, -1, :].astype(jnp.float32),
                max_new=s.max_new,
            )

        return jax.lax.fori_loop(0, self.K, body, state)

    def _compact(self, state: _State):
        """Compress every row's valid self-cache columns left (bitwise-exact:
        masked keys are exact softmax zeros; order among valid keys kept)."""
        mask = state.cache_mask  # (B, C)
        newpos = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1  # (B, C)
        tgt = jax.lax.broadcasted_iota(jnp.int32, (1, self.max_length, 1), 1)
        onehot = (newpos[:, None, :] == tgt) & mask[:, None, :]  # (B, max, C)

        def repack(path, leaf):
            if _is_cache_index(path):
                return jnp.asarray(self.max_length, leaf.dtype)
            if not _is_self_kv(path):
                return leaf
            # leaf columns are tile-padded past C (models/bart.py len_pad);
            # only [0, C) ever holds data between compactions
            sel = onehot.astype(leaf.dtype)
            packed = jax.lax.dot_general(
                sel, leaf[:, : self.C],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(leaf.dtype)  # (B, max_length, D) — exact one-hot select
            pad = ((0, 0), (0, leaf.shape[1] - self.max_length), (0, 0))
            return jnp.pad(packed, pad)

        cache = jax.tree_util.tree_map_with_path(repack, state.cache)
        new_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, self.C), 1)
            < jnp.sum(mask, axis=1).astype(jnp.int32)[:, None]
        )
        return state._replace(cache=cache, cache_mask=new_mask)

    # ------------------------------------------------------------------
    # host orchestration
    # ------------------------------------------------------------------

    def run(
        self,
        pages: Iterable[Tuple[Any, np.ndarray]],
        encode_fn: Callable[[jax.Array], jax.Array],
        *,
        max_new_tokens: Optional[Callable[[Any], int]] = None,
    ) -> Iterator[PageResult]:
        """Decode a stream of ``(page_id, image)`` pairs; yields PageResults
        in completion order. ``encode_fn`` maps an (n, H, W, C) image batch
        to encoder output (n, Lk, D) — called with static batch sizes
        ``slots`` (once, initial fill) and ``refill_size``.
        ``max_new_tokens``: optional per-page generation budget
        (page_id -> int >= 1); defaults to the max_length budget."""
        it = iter(pages)
        B, E, Lp = self.B, self.E, self.Lp

        def take(n):
            out = []
            for _ in range(n):
                try:
                    out.append(next(it))
                except StopIteration:
                    break
            return out

        def budgets(batch_pages, n):
            m = [
                (max_new_tokens(pid) if max_new_tokens else self.max_length)
                for pid, _ in batch_pages
            ]
            m += [0] * (n - len(batch_pages))  # dummy slots finish instantly
            return jnp.asarray(m, jnp.int32)

        def encode_batch(batch_pages, n):
            imgs = [np.asarray(img) for _, img in batch_pages]
            pad_n = n - len(imgs)
            if pad_n:
                imgs += [np.zeros_like(imgs[0])] * pad_n
            enc = encode_fn(jnp.asarray(np.stack(imgs)))
            if self._enc_shape is None:
                self._enc_shape = (enc.shape[1], enc.shape[2], enc.dtype)
            return enc

        # ---- initial fill (the refill path at batch B, slot_ids=arange) ----
        first = take(B)
        if not first:
            return
        enc = encode_batch(first, B)
        # abstract-trace the prefill once for the persistent-state shapes
        # (cache tree at batch B, vocab size) without running anything
        shapes = jax.eval_shape(lambda p, e: self._prefill(p, e, B), self.params, enc)
        V = shapes[1].shape[1]
        state = _State(
            buffer=jnp.full((B, self.max_length), self.pad, jnp.int32),
            cache=jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes[0]
            ),
            cache_mask=jnp.zeros((B, self.C), bool),
            tok_count=jnp.zeros((B,), jnp.int32),
            prompt_len=jnp.full((B,), Lp, jnp.int32),
            finished=jnp.zeros((B,), bool),
            logits=jnp.zeros((B, V), jnp.float32),
            max_new=jnp.zeros((B,), jnp.int32),
        )
        col = 0  # host mirror of the shared self-cache write column
        state = self._jit_refill(
            self.params, enc, state,
            jnp.arange(B, dtype=jnp.int32), budgets(first, B), col, n=B,
        )
        col += Lp
        slot_pages = [pid for pid, _ in first] + [None] * (B - len(first))
        stream_done = len(first) < B
        harvested = [len(first) <= i for i in range(B)]  # unused slots: done

        while True:
            if col + self.K + 1 > self.C:  # chunk must not overflow capacity
                state = self._jit_compact(state)
                col = self.max_length
            state = self._jit_chunk(self.params, state, col)
            col += self.K
            # ONE host round trip per chunk: the finished mask plus the small
            # token buffer/counts (the payload is KBs; the trip is the cost)
            finished, buf, cnt = (
                np.asarray(x) for x in jax.device_get(
                    (state.finished, state.buffer, state.tok_count)
                )
            )
            done_slots = [
                i for i in range(B) if finished[i] and not harvested[i]
            ]
            if done_slots:
                for i in done_slots:
                    harvested[i] = True
                    if slot_pages[i] is not None:
                        yield PageResult(
                            page_id=slot_pages[i],
                            tokens=buf[i, : cnt[i]].copy(),
                            length=int(cnt[i]),
                        )
                        slot_pages[i] = None
            # refill when a full refill batch of slots is free
            free = [i for i in range(B) if harvested[i]]
            while not stream_done and len(free) >= E:
                batch_pages = take(E)
                if len(batch_pages) < E:
                    stream_done = True
                if not batch_pages:
                    break
                slot_ids, free = free[:E], free[E:]
                enc = encode_batch(batch_pages, E)
                if col + Lp + self.K + 1 > self.C:
                    state = self._jit_compact(state)
                    col = self.max_length
                state = self._jit_refill(
                    self.params, enc, state,
                    jnp.asarray(slot_ids, jnp.int32), budgets(batch_pages, E),
                    col, n=E,
                )
                col += Lp
                for k, (pid, _) in enumerate(batch_pages):
                    slot_pages[slot_ids[k]] = pid
                    harvested[slot_ids[k]] = False
                for k in range(len(batch_pages), E):
                    harvested[slot_ids[k]] = True  # dummy pad slots
            if all(harvested):
                if stream_done:
                    return
                raise RuntimeError(
                    "serving invariant violated: idle slots with pages pending"
                )
