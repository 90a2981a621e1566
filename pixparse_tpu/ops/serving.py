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

**The refill decision lives ON DEVICE.** The first design of this module
orchestrated chunks from the host (decode K steps -> read back the finished
mask -> maybe dispatch a refill) and lost its own A/B 6x: on a remote-TPU
transport every blocking host<->device round trip costs tens of ms
(measured 27 ms through the axon tunnel, docs/PERF.md "Continuous batching
vs dispatch latency"), and the host paid one per chunk plus one per refill
while batch decode pays ~one per batch. The rewrite stages a POOL of
pre-encoded, pre-prefilled pages in HBM and folds harvest + refill into one
jitted ``lax.while_loop`` program, so the host blocks roughly once per pool
group (~``pool_pages`` pages) and the transport latency amortizes away:

- **Pool staging** (host, all dispatches async): pages are encoded in
  fixed-size batches, prefilled in ONE batched program (cross-K/V, the
  shared prompt's self-K/V, first logits), and parked in HBM together with
  per-page generation budgets.
- **Serve program** (one jitted ``lax.while_loop``): each iteration runs
  [compact-if-needed -> refill free slots from the pool -> K decode steps
  -> harvest finished slots into a results ring]. All control flow is
  ``lax.cond``/``fori_loop`` on static shapes; the host passes only traced
  scalars (pool cursor, group base, ring floor), so the program compiles
  once.
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
- **Refill**: up to ``max_refill_per_chunk`` free slots per iteration take
  the next pool pages; per-row ``dynamic_update_slice`` splices each page's
  cross-K/V rows and prompt self-K/V block into the persistent caches
  (write-only, no full-cache rewrite; entries beyond the taken count
  duplicate the last taken entry's write — identical data to the same row,
  deterministic).
- **Harvest**: a finished slot's token buffer is scattered into a results
  ring (size 2·(pool+slots)) keyed by the page's global sequence number;
  a ``done_seq`` row tags the occupant. Ring rows are only overwritten once
  the host confirms the previous occupant was read (the ``floor_seq``
  operand) — a blocked harvest simply retries next iteration.
- **Compaction**: the shared column grows ~1/step, so the self cache has
  ``capacity > max_length``; when the slack is exhausted, a one-hot matmul
  compresses every row's valid columns left (MXU-shaped, a few GFLOPs).
  Masked softmax entries are exact zeros and compress-left preserves key
  order, so compaction is bitwise-exact.

The host loop double-buffers pool groups: while the serve program runs on
group N, group N+1's encode/prefill dispatches are already enqueued, so the
device never idles on staging. The serve program exits early when its pool
drains and a fresh one is waiting.

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
    finished: jax.Array    # (B,) bool — row hit eos/budget/capacity
    harvested: jax.Array   # (B,) bool — row's result written to the ring
    logits: jax.Array      # (B, V) f32 — pending next-token distribution
    max_new: jax.Array     # (B,) int32 — per-slot generation budget
    page_seq: jax.Array    # (B,) int32 — global sequence number of the page


class _Results(NamedTuple):
    """Host-readable results ring (R real rows + 1 scratch row)."""

    tokens: jax.Array    # (R+1, max_length) int32
    lengths: jax.Array   # (R+1,) int32
    done_seq: jax.Array  # (R+1,) int32 — occupant's page_seq, -1 = empty


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
      refill_size: encode batch size for pool staging (static; ``encode_fn``
        is called at exactly this batch).
      chunk_steps: decode steps per refill/harvest check inside the serve
        program. No host traffic is involved, so small values (8-16) are
        cheap and cut finished-slot idling (a slot idles ~K/2 steps between
        finishing and refill).
      capacity_slack: extra self-cache columns beyond max_length; compaction
        triggers when exhausted. More slack = rarer compaction but more
        decode-kernel cache read traffic.
      pool_pages: pages staged per pool group (default ``2 * slots``,
        rounded up to a multiple of ``refill_size``). Larger pools mean
        fewer host round trips and more HBM for staged cross-K/V.
      max_refill_per_chunk: slots refilled per serve-loop iteration
        (default ``min(slots, 8)``); leftovers refill on later iterations.
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
        pool_pages: Optional[int] = None,
        max_refill_per_chunk: Optional[int] = None,
    ):
        self.model = model
        self.params = params
        self.B = int(slots)
        self.max_length = int(max_length)
        self.eos = int(eos_token_id)
        self.pad = int(pad_token_id)
        self.E = min(int(refill_size), self.B)
        self.K = int(chunk_steps)
        pid = np.asarray(prompt_ids, np.int32).reshape(-1)
        self.Lp = int(pid.shape[0])
        assert self.Lp < max_length, "prompt longer than max_length"
        if capacity_slack is None:
            # default: land C on the 128-column tile multiple bart.py will
            # allocate anyway (no wasted kernel read width), with at least
            # ~max_length/2 growth room between compactions
            c = max(
                self.max_length + self.K + self.Lp + 8,
                (3 * self.max_length) // 2,
            )
            self.C = -(-c // 128) * 128
        else:
            # explicit slack is honored exactly (tests force compaction with
            # tiny capacities; bart still tile-pads its own allocation). The
            # floor covers one refill (Lp) plus one chunk (K) past a compact.
            self.C = self.max_length + max(
                int(capacity_slack), self.K + self.Lp + 8
            )
        g = int(pool_pages) if pool_pages else 2 * self.B
        self.G = max(self.E, -(-g // self.E) * self.E)  # multiple of E
        self.R = 2 * (self.G + self.B)  # results ring rows
        self.Rm = (
            min(self.B, 8)
            if max_refill_per_chunk is None
            else max(1, min(int(max_refill_per_chunk), self.B))
        )
        # per-dispatch iteration bound: generous (the loop exits on its done
        # condition; this only guards a logic bug from spinning forever)
        self.max_outer = 8 + ((self.G + 2 * self.B) * self.max_length) // max(
            1, self.K
        )
        # shared prompt, left-aligned once on the host (mirrors
        # generation._left_align_prompts for the buffer contents)
        real = pid[pid != self.pad]
        self.prompt_valid = int(real.shape[0])
        self._prompt_row = np.full((self.max_length,), self.pad, np.int32)
        self._prompt_row[: self.prompt_valid] = real
        self.prompt_ids = jnp.asarray(pid)
        self.decode_model = model.clone(max_cache_len=self.C)
        self._enc_shape = None  # (Lk, D, dtype), set by the first encode

        self._jit_pool = jax.jit(self._pool)
        self._jit_serve = jax.jit(self._serve, donate_argnums=(1, 3))

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

    def _pool(self, params, enc, budgets):
        """Stage one pool group: batched prefill of ``G`` pages, self-K/V
        sliced to the prompt block (columns [0, Lp) are all a fresh page
        carries), cross-K/V kept whole. One dispatch, async."""
        cache, logits, _ = self._prefill(params, enc, self.G)

        def slim(path, leaf):
            if _is_self_kv(path):
                return leaf[:, : self.Lp]
            return leaf

        return {
            "cache": jax.tree_util.tree_map_with_path(slim, cache),
            "logits": logits,
            "budgets": budgets,
        }

    def _refill_from_pool(self, state: _State, pool, col, pool_next,
                          n_staged, group_base):
        """Splice up to ``Rm`` pool pages into free slots at shared column
        ``col``. Called under ``lax.cond(any free & pool not drained)``, so
        at least one page is taken; entries beyond the taken count repeat
        the last taken entry's writes (same data, same row: deterministic)."""
        B, Lp, Rm = self.B, self.Lp, self.Rm
        free = state.harvested
        rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # (B,) rank among free
        avail = n_staged - pool_next
        take = free & (rank < jnp.minimum(avail, Rm))
        n_take = jnp.sum(take.astype(jnp.int32))

        # entry e -> (slot row, pool index), inactive entries duplicating
        # the last active one
        slot_ids, pool_ids = [], []
        prev_row = jnp.int32(0)
        prev_idx = jnp.asarray(pool_next, jnp.int32)
        for e in range(Rm):
            mask_e = take & (rank == e)
            exists = jnp.any(mask_e)
            row_e = jnp.where(
                exists, jnp.argmax(mask_e).astype(jnp.int32), prev_row
            )
            idx_e = jnp.where(exists, pool_next + e, prev_idx)
            slot_ids.append(row_e)
            pool_ids.append(idx_e)
            prev_row, prev_idx = row_e, idx_e

        def merge_leaf(path, dst, src):
            if _is_cache_index(path):
                return jnp.asarray(col + Lp, dst.dtype)
            if dst.ndim == 0:  # position_offset: unused (positions explicit)
                return dst
            if _is_self_kv(path):
                # pool holds the (G, Lp, D) prompt block; write it at the
                # shared column (write-only, no full-cache rewrite)
                for e in range(Rm):
                    blk = jax.lax.dynamic_index_in_dim(
                        src, pool_ids[e], 0, keepdims=True
                    )
                    dst = jax.lax.dynamic_update_slice(
                        dst, blk.astype(dst.dtype), (slot_ids[e], col, 0)
                    )
                return dst
            # cross-attention leaves (cached_enc_* and int8 scales): full row
            for e in range(Rm):
                row = jax.lax.dynamic_index_in_dim(
                    src, pool_ids[e], 0, keepdims=True
                )
                start = (slot_ids[e],) + (0,) * (src.ndim - 1)
                dst = jax.lax.dynamic_update_slice(
                    dst, row.astype(dst.dtype), start
                )
            return dst

        cache = jax.tree_util.tree_map_with_path(
            merge_leaf, state.cache, pool["cache"]
        )

        pv = jnp.int32(self.prompt_valid)
        idx_b = jnp.clip(pool_next + rank, 0, self.G - 1)
        new_logits = jnp.take(pool["logits"], idx_b, axis=0)  # (B, V)
        new_budget = jnp.take(pool["budgets"], idx_b, axis=0)
        new_seq = group_base + pool_next + rank
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, self.C), 1)
        prompt_cols = (col_iota >= col) & (col_iota < col + pv)
        onehot = take[:, None]
        prompt_row = jnp.asarray(self._prompt_row)
        state = _State(
            buffer=jnp.where(onehot, prompt_row[None], state.buffer),
            cache=cache,
            cache_mask=jnp.where(onehot, prompt_cols, state.cache_mask),
            tok_count=jnp.where(take, pv, state.tok_count),
            prompt_len=jnp.where(take, pv, state.prompt_len),
            finished=jnp.where(take, False, state.finished),
            harvested=jnp.where(take, False, state.harvested),
            logits=jnp.where(onehot, new_logits, state.logits),
            max_new=jnp.where(take, new_budget, state.max_new),
            page_seq=jnp.where(take, new_seq, state.page_seq),
        )
        return state, col + Lp, pool_next + n_take

    def _decode_chunk(self, params, state: _State, col):
        """K greedy decode steps (the generate() body with per-row state);
        ``col`` is the shared cache column at entry — a traced scalar the
        serve loop mirrors alongside the cache's own ``cache_index``."""
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
            return s._replace(
                buffer=buffer,
                cache=mutated["cache"],
                cache_mask=cache_mask,
                tok_count=s.tok_count + (~s.finished),
                finished=newly,
                logits=step_logits[:, -1, :].astype(jnp.float32),
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

    def _harvest(self, state: _State, res: _Results, floor_seq):
        """Scatter finished slots' buffers into the results ring. A ring row
        is reused only once its previous occupant is behind the host's read
        floor; blocked slots stay finished-unharvested and retry later."""
        R = self.R
        ready = state.finished & ~state.harvested
        ring = jnp.where(ready, jnp.mod(state.page_seq, R), R)
        prev = jnp.take(res.done_seq, ring)
        ready = ready & (prev < floor_seq)
        ring = jnp.where(ready, jnp.mod(state.page_seq, R), R)
        seq = jnp.where(ready, state.page_seq, -1)
        return (
            state._replace(harvested=state.harvested | ready),
            _Results(
                tokens=res.tokens.at[ring].set(state.buffer),
                lengths=res.lengths.at[ring].set(state.tok_count),
                done_seq=res.done_seq.at[ring].set(seq),
            ),
        )

    def _serve(self, params, state: _State, pool, res: _Results, col,
               pool_next, n_staged, group_base, more_stream, floor_seq):
        """The serve program: loop [compact? -> refill -> decode K ->
        harvest] until the pool drains (and, when another pool group is
        staged, at least one slot is free for it) or every slot is idle.
        ONE dispatch + ONE host readback covers the whole loop."""

        def cond(carry):
            i, state, res, col, pool_next = carry
            drained = pool_next >= n_staged
            all_h = jnp.all(state.harvested)
            any_h = jnp.any(state.harvested)
            done = drained & (all_h | (more_stream & any_h))
            # ring-safety stall: every slot finished, pending harvests
            # blocked, no refill possible — only a host read unblocks
            stalled = (
                jnp.all(state.finished)
                & jnp.any(state.finished & ~state.harvested)
                & (drained | ~any_h)
            )
            return (i < self.max_outer) & ~done & ~stalled

        def body(carry):
            i, state, res, col, pool_next = carry
            state, col = jax.lax.cond(
                col + self.K + self.Lp + 1 > self.C,
                lambda s, c: (self._compact(s), jnp.int32(self.max_length)),
                lambda s, c: (s, c),
                state, col,
            )
            need = jnp.any(state.harvested) & (pool_next < n_staged)
            state, col, pool_next = jax.lax.cond(
                need,
                lambda s, c, p: self._refill_from_pool(
                    s, pool, c, p, n_staged, group_base
                ),
                lambda s, c, p: (s, c, p),
                state, col, pool_next,
            )
            state = self._decode_chunk(params, state, col)
            col = col + self.K
            state, res = self._harvest(state, res, floor_seq)
            return (i + 1, state, res, col, pool_next)

        carry = (jnp.int32(0), state, res, col, pool_next)
        i, state, res, col, pool_next = jax.lax.while_loop(cond, body, carry)
        return state, res, col, pool_next, i

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
        to encoder output (n, Lk, D) — called with static batch size
        ``refill_size``. ``max_new_tokens``: optional per-page generation
        budget (page_id -> int >= 1); defaults to the max_length budget."""
        it = iter(pages)
        B, E, G, R = self.B, self.E, self.G, self.R
        stream_done = False

        def take(n):
            nonlocal stream_done
            out = []
            for _ in range(n):
                try:
                    out.append(next(it))
                except StopIteration:
                    stream_done = True
                    break
            return out

        def stage(group):
            """Encode + prefill one pool group (dispatches are async: the
            device works through them behind the running serve program)."""
            if not group:
                return None
            encs = []
            for lo in range(0, len(group), E):
                imgs = [np.asarray(img) for _, img in group[lo:lo + E]]
                if len(imgs) < E:
                    imgs += [np.zeros_like(imgs[0])] * (E - len(imgs))
                enc = encode_fn(jnp.asarray(np.stack(imgs)))
                if self._enc_shape is None:
                    self._enc_shape = (enc.shape[1], enc.shape[2], enc.dtype)
                encs.append(enc)
            lk, d, dt = self._enc_shape
            while len(encs) < G // E:
                encs.append(jnp.zeros((E, lk, d), dt))
            enc = jnp.concatenate(encs, axis=0) if len(encs) > 1 else encs[0]
            budgets = np.ones((G,), np.int32)
            for i, (pid, _) in enumerate(group):
                b = max_new_tokens(pid) if max_new_tokens else self.max_length
                budgets[i] = max(1, int(b))
            pool = self._jit_pool(self.params, enc, jnp.asarray(budgets))
            return pool, len(group), [pid for pid, _ in group]

        cur = stage(take(G))
        if cur is None:
            return
        nxt = stage(take(G)) if not stream_done else None

        lk, d, dt = self._enc_shape
        shapes = jax.eval_shape(
            lambda p, e: self._prefill(p, e, B),
            self.params, jax.ShapeDtypeStruct((B, lk, d), dt),
        )
        V = shapes[1].shape[1]
        state = _State(
            buffer=jnp.full((B, self.max_length), self.pad, jnp.int32),
            cache=jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes[0]
            ),
            cache_mask=jnp.zeros((B, self.C), bool),
            tok_count=jnp.zeros((B,), jnp.int32),
            prompt_len=jnp.full((B,), self.Lp, jnp.int32),
            finished=jnp.ones((B,), bool),
            harvested=jnp.ones((B,), bool),
            logits=jnp.zeros((B, V), jnp.float32),
            max_new=jnp.zeros((B,), jnp.int32),
            page_seq=jnp.full((B,), -1, jnp.int32),
        )
        res = _Results(
            tokens=jnp.full((R + 1, self.max_length), self.pad, jnp.int32),
            lengths=jnp.zeros((R + 1,), jnp.int32),
            done_seq=jnp.full((R + 1,), -1, jnp.int32),
        )
        col = jnp.int32(0)
        pool_next = jnp.int32(0)
        group_base = 0
        consumed = 0
        next_seq = 0
        outstanding = {}  # global seq -> page_id
        pending_stage = False

        import os
        import time as _time

        debug = os.environ.get("PIXPARSE_SERVE_DEBUG") == "1"
        n_dispatch = 0
        while True:
            floor = min(outstanding) if outstanding else next_seq
            more = (nxt is not None) or (pending_stage and not stream_done)
            t0 = _time.perf_counter() if debug else 0.0
            state, res, col, pool_next, iters = self._jit_serve(
                self.params, state, cur[0], res, col, pool_next,
                jnp.int32(cur[1]), jnp.int32(group_base),
                jnp.asarray(more), jnp.int32(floor),
            )
            n_dispatch += 1
            if pending_stage:
                # stage the NEXT group while the dispatched serve program
                # runs — its encode/prefill queue behind the serve program,
                # so the pool is ready the moment the current one drains
                nxt = stage(take(G)) if not stream_done else None
                pending_stage = False
            t1 = _time.perf_counter() if debug else 0.0
            # the round trip: ONE blocking readback per serve dispatch
            pn, done_seq, toks, lens, harv = (
                np.asarray(x) for x in jax.device_get(
                    (pool_next, res.done_seq, res.tokens, res.lengths,
                     state.harvested)
                )
            )
            if debug:
                print(
                    f"[serve] dispatch {n_dispatch}: iters={int(jax.device_get(iters))} "
                    f"pool_next={int(pn)}/{cur[1]} free={int(harv.sum())} "
                    f"enqueue={1e3 * (t1 - t0):.1f}ms "
                    f"block={1e3 * (_time.perf_counter() - t1):.1f}ms "
                    f"more={more} floor={floor}",
                    flush=True,
                )
            for i in range(consumed, int(pn)):
                outstanding[group_base + i] = cur[2][i]
                next_seq = group_base + i + 1
            consumed = int(pn)
            for seq in sorted(outstanding):
                r = seq % R
                if done_seq[r] == seq:
                    n = int(lens[r])
                    yield PageResult(
                        outstanding.pop(seq), toks[r, :n].copy(), n
                    )
            if consumed >= cur[1]:  # pool drained
                if nxt is not None:
                    group_base += cur[1]
                    cur = nxt
                    nxt = None
                    pending_stage = True
                    consumed = 0
                    pool_next = jnp.int32(0)
                    continue
                if not pending_stage and bool(harv.all()) and not outstanding:
                    return
            # else: pool not drained (iteration cap / ring stall) or slots
            # still draining — dispatch again with an advanced read floor
