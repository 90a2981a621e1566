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

Two designs of this module LOST their own A/B before the current one won it;
both failure modes are structural lessons (docs/PERF.md "Continuous batching
vs dispatch latency"):

1. **Host-orchestrated chunks** (round 4, 0.16x): decode K steps -> read the
   finished mask -> maybe dispatch a refill. On a remote-TPU transport every
   blocking round trip costs tens of ms (27 ms measured), paid per chunk and
   per refill; batch decode pays ~one per batch.
2. **Device-side loop with ``lax.cond`` refill/compact branches** (0.2x):
   folding the refill decision into one jitted while_loop fixed the dispatch
   count (3 dispatches for 160 pages) but the xplane showed ~50% of device
   time as while-op SELF time — XLA inserts full-carry copies when the big
   cache buffers thread through ``cond`` boundaries inside the loop body
   (the 400 MB cross-K/V copied ~every iteration), and chunk-granular
   refill idled finished slots ~K/2 steps each.

The current design is ONE flat step-granular ``lax.while_loop`` whose body
contains NO ``lax.cond``:

- **Pool staging** (host, async dispatches): pages are encoded in fixed
  batches, prefilled in one batched program (cross-K/V, the shared prompt's
  self-K/V, first logits), and parked in HBM with per-page budgets. The host
  double-buffers pool groups behind the running serve program.
- **Serve program**: every iteration = [masked refill of up to ``Rm`` free
  slots] -> [one decode step] — both unconditional. Inactive refill entries
  write a row's CURRENT contents back to itself (idempotent, a few MB), so
  no branch is needed and XLA's while-loop in-place buffer aliasing works
  exactly as in :func:`generate`'s loop.
- **Results ring**: a finishing slot keeps its tokens in the persistent
  buffer; the rows are flushed into a host-readable ring when the slot is
  REFILLED (its buffer is about to be overwritten) and once at program exit
  — not per step. Ring rows are keyed by page sequence number modulo the
  ring size; an assignment-time conflict gate (no live slot, no unread ring
  occupant on the target row) plus a host read-floor operand make reuse
  provably safe — a blocked refill simply retries next iteration.
- **Shared cache column**: the self-attention cache keeps its scalar write
  index (one ``dynamic_update_slice`` per step). A refilled slot CONTINUES
  at the current shared column with positions restarted at 0; the per-slot
  ``cache_mask`` makes attention see only the slot's own K/V, so
  cache-column order is irrelevant to the math.
- **Compaction**: the shared column grows ~1/step; when the slack would be
  exhausted the loop EXITS (capacity exit) and the next dispatch starts
  with a single compact (a ``cond`` OUTSIDE the loop, once per dispatch):
  a one-hot matmul compresses every row's valid columns left —
  bitwise-exact (masked keys are exact softmax zeros, order preserved).

The host blocks once per dispatch (pool drain / capacity exit / all idle),
reading the small result ring + scalars; dispatch count is ~pool-group
granularity, so the transport latency amortizes away.

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
    logits: jax.Array      # (B, V) f32 — pending next-token distribution
    max_new: jax.Array     # (B,) int32 — per-slot generation budget
    page_seq: jax.Array    # (B,) int32 — global sequence number (-1 = none)


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
      chunk_steps: unused (kept for signature compatibility — refill and
        result flushing are per-step device-side operations now).
      capacity_slack: extra self-cache columns beyond max_length; a capacity
        EXIT (followed by an entry-compact on the next dispatch) triggers
        when exhausted. More slack = fewer dispatches but more decode-kernel
        cache read traffic; the default sizes it so capacity exits are about
        as frequent as pool-drain exits.
      pool_pages: pages staged per pool group (default ``2 * slots``,
        rounded up to a multiple of ``refill_size``). Larger pools mean
        fewer host round trips and more HBM for staged cross-K/V.
      max_refill_per_step: slots refilled per decode step (default 2 — the
        steady-state finishing rate is ``slots/mean_len`` per step, well
        under 1; leftovers refill on later steps while other slots decode).

    Scaling note: the one blocking readback per dispatch transfers the FULL
    results ring — ``(2*(pool_pages+slots)+1, max_length)`` int32 tokens
    (~100 KB at the bench sizes). That is deliberate: ring rows are only
    reusable once the host has READ them (the ``floor_seq`` protocol), so a
    partial fetch would need a second round trip to learn which rows to
    fetch — on the transports where this class wins, round trips cost more
    than the bytes. If ``pool_pages * max_length`` grows to MBs on a
    bandwidth-limited transport, shrink ``pool_pages`` (more dispatches,
    smaller rings) rather than fetching selectively.
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
        max_refill_per_step: Optional[int] = None,
    ):
        del chunk_steps  # compat: the loop is step-granular now
        self.model = model
        self.params = params
        self.B = int(slots)
        self.max_length = int(max_length)
        self.eos = int(eos_token_id)
        self.pad = int(pad_token_id)
        self.E = min(int(refill_size), self.B)
        pid = np.asarray(prompt_ids, np.int32).reshape(-1)
        self.Lp = int(pid.shape[0])
        assert self.Lp < max_length, "prompt longer than max_length"
        if capacity_slack is None:
            # default: 2x max_length (tile-rounded) — the column budget per
            # dispatch is (C - max_length)/(1 + Lp) steps minimum, and 2x
            # keeps capacity exits rarer than pool-drain exits while only
            # widening the per-step self-cache read stream
            c = max(2 * self.max_length, self.max_length + 32 * (self.Lp + 1))
            self.C = -(-c // 128) * 128
        else:
            # explicit slack is honored exactly (tests force frequent
            # capacity exits with tiny slacks); floor = one refill + a step
            self.C = self.max_length + max(int(capacity_slack), self.Lp + 4)
        g = int(pool_pages) if pool_pages else 2 * self.B
        self.G = max(self.E, -(-g // self.E) * self.E)  # multiple of E
        self.R = 2 * (self.G + self.B)  # results ring rows
        self.Rm = (
            min(self.B, 2)
            if max_refill_per_step is None
            else max(1, min(int(max_refill_per_step), self.B))
        )
        # per-dispatch step bound: generous (the loop exits on its own done
        # conditions; this only guards a logic bug from spinning forever)
        self.max_steps = 16 + (self.G + 2 * self.B) * self.max_length
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

    def _flush_rows(self, state: _State, res: _Results, floor_seq, mask):
        """Masked write of slots' buffers into the results ring. A ring row
        is written only when its previous occupant is behind the host's read
        floor (or IS this seq — re-flush is idempotent); blocked rows retry
        on a later flush. Returns the updated ring."""
        R = self.R
        ready = mask & (state.page_seq >= 0)
        ring = jnp.where(ready, jnp.mod(state.page_seq, R), R)
        prev = jnp.take(res.done_seq, ring)
        ready = ready & ((prev < floor_seq) | (prev == state.page_seq))
        ring = jnp.where(ready, jnp.mod(state.page_seq, R), R)
        seq = jnp.where(ready, state.page_seq, -1)
        return _Results(
            tokens=res.tokens.at[ring].set(state.buffer),
            lengths=res.lengths.at[ring].set(state.tok_count),
            done_seq=res.done_seq.at[ring].set(seq),
        )

    def _refill(self, state: _State, pool, res: _Results, col, pool_next,
                n_staged, group_base, floor_seq):
        """Unconditional masked refill of up to ``Rm`` finished slots with
        the next pool pages. Runs EVERY step — inactive entries write a
        row's current contents back to itself (idempotent small writes), so
        the loop body needs no ``lax.cond`` and XLA keeps the cache buffers
        aliased in place. Outgoing rows are flushed to the results ring
        first. Returns (state, res, col, pool_next, n_take)."""
        B, Lp, Rm, R = self.B, self.Lp, self.Rm, self.R
        free = state.finished
        rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # (B,) rank among free
        avail = n_staged - pool_next

        # ring-safety assignment gate, per candidate rank r: the NEW seq's
        # ring row must hold no live slot's seq and no unread flushed seq.
        # Consumption stops at the first blocked rank (pool order preserved).
        r_idx = jnp.arange(Rm, dtype=jnp.int32)
        ns = group_base + pool_next + r_idx            # (Rm,) new seqs
        ring_ns = jnp.mod(ns, R)
        live = state.page_seq >= 0                     # (B,)
        conflict_live = jnp.any(
            live[None, :] & (jnp.mod(state.page_seq, R)[None, :] == ring_ns[:, None]),
            axis=1,
        )                                              # (Rm,)
        occupant = jnp.take(res.done_seq, ring_ns)     # (Rm,)
        conflict_ring = occupant >= floor_seq          # unread occupant
        blocked = conflict_live | conflict_ring
        first_block = jnp.min(jnp.where(blocked, r_idx, Rm))
        n_allowed = jnp.minimum(jnp.minimum(avail, Rm), first_block)
        take = free & (rank < n_allowed)
        n_take = jnp.sum(take.astype(jnp.int32))

        # entry e -> (slot row, pool index); inactive entries become
        # idempotent self-writes (row keeps its own current data)
        any_take = n_take > 0
        col_new = jnp.where(any_take, col + Lp, col)
        slot_ids, pool_ids, actives = [], [], []
        for e in range(Rm):
            mask_e = take & (rank == e)
            exists = jnp.any(mask_e)
            row_e = jnp.where(
                exists, jnp.argmax(mask_e).astype(jnp.int32), jnp.int32(0)
            )
            idx_e = jnp.clip(pool_next + e, 0, self.G - 1)
            slot_ids.append(row_e)
            pool_ids.append(idx_e)
            actives.append(exists)

        # flush the outgoing rows' results before their buffers are reused:
        # per-entry unconditional dynamic_update_slice rows (inactive/fresh
        # entries land on the scratch ring row R) — NOT a full-batch scatter,
        # which would serialize B updates every step. No floor check needed
        # here: the assignment gate above never co-assigns two live seqs to
        # one ring row, so a refilled slot's own ring row can only hold
        # stale (host-read) data or this very seq (idempotent re-flush).
        tokens, lengths, done_seq = res
        for e in range(Rm):
            seq_e = jax.lax.dynamic_index_in_dim(
                state.page_seq, slot_ids[e], 0, keepdims=False
            )
            ok = actives[e] & (seq_e >= 0)
            ring_e = jnp.where(ok, jnp.mod(seq_e, R), R)
            row_tok = jax.lax.dynamic_index_in_dim(
                state.buffer, slot_ids[e], 0, keepdims=True
            )
            tokens = jax.lax.dynamic_update_slice(tokens, row_tok, (ring_e, 0))
            cnt = jax.lax.dynamic_index_in_dim(
                state.tok_count, slot_ids[e], 0, keepdims=True
            )
            lengths = jax.lax.dynamic_update_slice(lengths, cnt, (ring_e,))
            done_seq = jax.lax.dynamic_update_slice(
                done_seq, jnp.where(ok, seq_e, -1)[None], (ring_e,)
            )
        res = _Results(tokens=tokens, lengths=lengths, done_seq=done_seq)

        def merge_leaf(path, dst, src):
            if _is_cache_index(path):
                return jnp.asarray(col_new, dst.dtype)
            if dst.ndim == 0:  # position_offset: unused (positions explicit)
                return dst
            if _is_self_kv(path):
                # pool holds the (G, Lp, D) prompt block; write it at the
                # shared column. Inactive entries rewrite the current block.
                for e in range(Rm):
                    new_blk = jax.lax.dynamic_index_in_dim(
                        src, pool_ids[e], 0, keepdims=True
                    ).astype(dst.dtype)
                    cur_blk = jax.lax.dynamic_slice(
                        dst, (slot_ids[e], col, 0), new_blk.shape
                    )
                    blk = jnp.where(actives[e], new_blk, cur_blk)
                    dst = jax.lax.dynamic_update_slice(
                        dst, blk, (slot_ids[e], col, 0)
                    )
                return dst
            # cross-attention leaves (cached_enc_* and int8 scales): full row
            for e in range(Rm):
                start = (slot_ids[e],) + (0,) * (src.ndim - 1)
                new_row = jax.lax.dynamic_index_in_dim(
                    src, pool_ids[e], 0, keepdims=True
                ).astype(dst.dtype)
                cur_row = jax.lax.dynamic_slice(dst, start, new_row.shape)
                row = jnp.where(actives[e], new_row, cur_row)
                dst = jax.lax.dynamic_update_slice(dst, row, start)
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
            logits=jnp.where(onehot, new_logits, state.logits),
            max_new=jnp.where(take, new_budget, state.max_new),
            page_seq=jnp.where(take, new_seq, state.page_seq),
        )
        return state, res, col_new, pool_next + n_take, n_take

    def _decode_step(self, params, state: _State, col):
        """One greedy decode step (the generate() body with per-row state);
        ``col`` is the shared cache column this step writes."""
        buf_iota = jax.lax.broadcasted_iota(jnp.int32, (1, self.max_length), 1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, self.C), 1)
        lk, dim, enc_dtype = self._enc_shape
        dummy_enc = jnp.zeros((self.B, lk, dim), enc_dtype)
        s = state
        tok = jnp.argmax(s.logits, axis=-1).astype(jnp.int32)
        budget_hit = (s.tok_count - s.prompt_len + 1) >= s.max_new
        cap_hit = (s.tok_count + 1) >= self.max_length
        newly = s.finished | (tok == self.eos) | budget_hit | cap_hit
        write = jnp.where(s.finished, self.pad, tok)
        buffer = jnp.where(
            (buf_iota == s.tok_count[:, None]) & ~s.finished[:, None],
            write[:, None], s.buffer,
        )
        cache_mask = s.cache_mask | ((col_iota == col) & ~s.finished[:, None])
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

    def _serve(self, params, state: _State, pool, res: _Results, col,
               pool_next, n_staged, group_base, more_stream, floor_seq):
        """The serve program: [entry compact if the column is past
        max_length] then a flat step-granular while loop of
        [masked refill -> one decode step] with NO branch in the body.
        Exits on pool drain (immediately when another pool group is staged
        and a slot is free for it; otherwise when every slot is idle),
        capacity exhaustion, or a ring/floor stall. ONE dispatch + ONE host
        readback covers the whole loop; results ride in the ring."""
        # entry compaction: once per dispatch, OUTSIDE the loop (a cond in
        # the loop body forces XLA to copy the full cache carry every
        # iteration — the round-5 lesson in the module docstring)
        state, col = jax.lax.cond(
            col > self.max_length,
            lambda s, c: (self._compact(s), jnp.int32(self.max_length)),
            lambda s, c: (s, jnp.asarray(c, jnp.int32)),
            state, col,
        )

        def cond(carry):
            i, state, res, col, pool_next, stalled = carry
            drained = pool_next >= n_staged
            all_f = jnp.all(state.finished)
            any_f = jnp.any(state.finished)
            done = drained & (all_f | (more_stream & any_f))
            cap = col + self.Lp + 2 > self.C
            return (i < self.max_steps) & ~done & ~stalled & ~cap

        def body(carry):
            i, state, res, col, pool_next, _ = carry
            state, res, col, pool_next, n_take = self._refill(
                state, pool, res, col, pool_next, n_staged, group_base,
                floor_seq,
            )
            state = self._decode_step(params, state, col)
            col = col + 1
            # stall: every slot idle and this step's refill moved nothing
            # (pool blocked by the ring floor) — only a host read unblocks
            stalled = jnp.all(state.finished) & (n_take == 0) & (
                pool_next < n_staged
            )
            return (i + 1, state, res, col, pool_next, stalled)

        carry = (jnp.int32(0), state, res, col, pool_next, jnp.asarray(False))
        i, state, res, col, pool_next, _ = jax.lax.while_loop(
            cond, body, carry
        )
        # exit flush: rows that finished and were never refilled (their data
        # still sits in the persistent buffers) go to the ring here, once
        # per dispatch — re-flushing an already-flushed row is idempotent
        res = self._flush_rows(state, res, floor_seq, state.finished)
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
            pn, done_seq, toks, lens, fin = (
                np.asarray(x) for x in jax.device_get(
                    (pool_next, res.done_seq, res.tokens, res.lengths,
                     state.finished)
                )
            )
            if debug:
                print(
                    f"[serve] dispatch {n_dispatch}: steps={int(jax.device_get(iters))} "
                    f"pool_next={int(pn)}/{cur[1]} idle={int(fin.sum())} "
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
                if (
                    not pending_stage
                    and bool(fin.all())
                    and not outstanding
                ):
                    return
            # else: pool not drained (capacity exit / step cap / ring
            # stall) or slots still draining — dispatch again with an
            # advanced read floor (entry compact reclaims the column)
