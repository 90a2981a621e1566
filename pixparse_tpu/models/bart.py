"""First-party flax BART-style causal decoder with cross-attention.

Replaces the reference's HF ``BartForCausalLM`` construction
(``models/text_decoder_hf.py:10-37`` in /root/reference): same architecture
(post-LN transformer decoder, learned positions with the BART +2 offset,
embedding layernorm, GELU FFN, tied LM head, ``decoder_layers`` /
``max_position_embeddings`` overrides, cross-attention over image-encoder
tokens), built TPU-first:

- one module serves three statically-selected modes: parallel teacher-forced
  forward (training), ``prefill`` (fills the self-attention KV cache from a
  prompt and caches cross-attention K/V computed once per image), and
  ``decode`` (single-token step against the cache). The generation loop in
  :mod:`pixparse_tpu.ops.generation` jits prefill once and runs decode steps
  inside ``lax.while_loop`` — replacing the reference's O(L^2) full-prefix
  recompute loops (SURVEY.md §3.4).
- static shapes everywhere: the cache is a preallocated ``(B, max_len, H, D)``
  buffer, key validity is a mask, no dynamic concatenation.
- params carry logical axis names for mesh sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pixparse_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype

NEG_INF = jnp.finfo(jnp.float32).min


def _use_decode_kernel() -> bool:
    """Pallas decode-attention on accelerators; XLA on CPU (tests compare
    the kernel against the XLA path in interpret mode separately)."""
    return jax.devices()[0].platform != "cpu"


@dataclasses.dataclass(frozen=True)
class BartDecoderCfg:
    vocab_size: int = 50265
    d_model: int = 768
    decoder_layers: int = 4
    decoder_attention_heads: int = 12
    decoder_ffn_dim: int = 3072
    max_position_embeddings: int = 1024
    activation: str = "gelu"
    scale_embedding: bool = False
    layernorm_embedding: bool = True
    add_final_layer_norm: bool = False
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    pad_token_id: int = 1
    bos_token_id: int = 0
    eos_token_id: int = 2
    ln_eps: float = 1e-5
    pos_offset: int = 2  # BART quirk: positional table shifted by 2
    pre_norm: bool = False  # mBART/Donut decoder: pre-LN layers + final LN


def _dense(features, logical, name, dtype):
    return nn.Dense(
        features,
        dtype=dtype,
        kernel_init=nn.with_logical_partitioning(nn.initializers.normal(0.02), logical),
        bias_init=nn.with_logical_partitioning(nn.initializers.zeros_init(), (logical[-1],)),
        name=name,
    )


class _Proj(nn.Module):
    """Declares a Dense-layout param pair (``kernel``, ``bias``) WITHOUT
    applying it — same param-tree paths/shapes/init as ``nn.Dense`` so
    checkpoints interop, but the caller owns the matmul. Used to fuse the
    q/k/v projections into one GEMM in the decode step (3 GEMV-shaped
    matmuls -> 1; the decode while-loop is per-op-latency-bound, docs/PERF.md
    eval-decode section)."""

    in_features: int
    features: int
    logical: tuple

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.with_logical_partitioning(
                nn.initializers.normal(0.02), self.logical
            ),
            (self.in_features, self.features),
        )
        bias = self.param(
            "bias",
            nn.with_logical_partitioning(
                nn.initializers.zeros_init(), (self.logical[-1],)
            ),
            (self.features,),
        )
        return kernel, bias


def _ln(name, eps, dtype):
    # FusedLayerNorm: Pallas one-pass kernel on TPU (XLA lowers LN as
    # separate stat/normalize passes — measured 71 ms/step on the
    # cruller_large profile), fp32-stats XLA math on CPU. Param names/shapes
    # (scale, bias) and ("embed",) logical axes identical to nn.LayerNorm.
    from pixparse_tpu.ops.layer_norm import FusedLayerNorm

    return FusedLayerNorm(epsilon=eps, dtype=dtype, name=name)


class CachedSelfAttention(nn.Module):
    """Causal self-attention with a preallocated decode cache.

    Modes (statically selected):
      - train: full-length causal attention, no cache
      - prefill: writes K/V for the L prompt positions at [0, L), causal
      - decode: writes K/V for L=1 at [index, index+1), attends over the
        whole buffer gated by ``key_pad_mask``
    """

    cfg: BartDecoderCfg
    max_cache_len: int = 0
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, L, D)
        pad_bias: Optional[jax.Array] = None,  # (B, 1, 1, Lk) additive (train)
        mode: str = "train",
        key_pad_mask: Optional[jax.Array] = None,  # (B, max_cache_len) decode/prefill
    ):
        c = self.cfg
        H = c.decoder_attention_heads
        Dh = c.d_model // H
        B, L, _ = x.shape

        def split(t):
            return t.reshape(B, L, H, Dh)

        if mode == "train":
            q = split(_dense(c.d_model, ("embed", "heads"), "q_proj", self.dtype)(x))
            k = split(_dense(c.d_model, ("embed", "heads"), "k_proj", self.dtype)(x))
            v = split(_dense(c.d_model, ("embed", "heads"), "v_proj", self.dtype)(x))
            # flash path taken when no pad bias (the training forward passes
            # none — parity with the reference's mask-free teacher forcing)
            out = dot_product_attention(
                q, k, v, bias=pad_bias, causal=True, dtype=self.dtype,
                impl=self.attn_impl,
            )
        else:
            # decode/prefill: fuse q/k/v into ONE GEMM. Same params/paths as
            # the train-mode Dense modules (_Proj declares without applying);
            # the kernel concat is loop-invariant, XLA hoists it out of the
            # decode while-loop. Per decode step this turns 3 latency-bound
            # (B, D)x(D, D) GEMVs into one (B, D)x(D, 3D) matmul.
            qk, qb = _Proj(c.d_model, c.d_model, ("embed", "heads"), name="q_proj")()
            kk, kb = _Proj(c.d_model, c.d_model, ("embed", "heads"), name="k_proj")()
            vk, vb = _Proj(c.d_model, c.d_model, ("embed", "heads"), name="v_proj")()
            fused_kernel = jnp.concatenate([qk, kk, vk], axis=1).astype(self.dtype)
            fused_bias = jnp.concatenate([qb, kb, vb]).astype(self.dtype)
            qkv = x.astype(self.dtype) @ fused_kernel + fused_bias  # (B, L, 3D)
            qf, kf, vf = jnp.split(qkv, 3, axis=-1)  # (B, L, D) heads flat
            assert self.max_cache_len > 0, "decode modes need max_cache_len"
            # caches are stored FLAT (B, len_pad, H*Dh), allocated at a
            # 128-lane multiple: the head-split (…, 12, 64) layout gets
            # (16, 128)-tile padding on TPU — a measured 2.67x HBM
            # footprint/bandwidth inflation on the decode loop's dominant
            # traffic — and a runtime pad would re-copy the loop-carried
            # cache every step (see ops/decode_attention.py)
            len_pad = -(-self.max_cache_len // 128) * 128
            cached_k = self.variable(
                "cache", "cached_key",
                jnp.zeros, (B, len_pad, c.d_model), self.dtype,
            )
            cached_v = self.variable(
                "cache", "cached_value",
                jnp.zeros, (B, len_pad, c.d_model), self.dtype,
            )
            index = self.variable(
                "cache", "cache_index", lambda: jnp.zeros((), jnp.int32)
            )
            i = index.value
            cached_k.value = jax.lax.dynamic_update_slice(
                cached_k.value, kf.astype(self.dtype), (0, i, 0)
            )
            cached_v.value = jax.lax.dynamic_update_slice(
                cached_v.value, vf.astype(self.dtype), (0, i, 0)
            )
            index.value = i + L
            if mode == "decode" and L == 1 and _use_decode_kernel():
                # single-token step: Pallas kernel streams the flat caches
                from pixparse_tpu.ops.decode_attention import decode_attention

                col = jax.lax.broadcasted_iota(jnp.int32, (1, len_pad), 1)
                valid = col <= i  # keys written so far (causal, absolute)
                if key_pad_mask is not None:
                    valid = valid & jnp.pad(
                        key_pad_mask.astype(bool),
                        ((0, 0), (0, len_pad - self.max_cache_len)),
                    )
                else:
                    valid = jnp.broadcast_to(valid, (B, len_pad))
                out = decode_attention(
                    qf, cached_k.value, cached_v.value, valid, num_heads=H
                )
                return _dense(c.d_model, ("heads", "embed"), "out_proj", self.dtype)(out)
            # prefill / multi-token fallback: XLA attention over head-split
            # views of the true-length cache prefix (once per generate call)
            q = split(qf)
            col = jax.lax.broadcasted_iota(
                jnp.int32, (1, self.max_cache_len), 1
            )
            q_pos = i + jax.lax.broadcasted_iota(jnp.int32, (1, 1, L, 1), 2)
            valid = col[:, None, None, :] <= q_pos  # causal vs absolute pos
            if key_pad_mask is not None:
                valid = valid & key_pad_mask[:, None, None, :].astype(bool)
            bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
            out = dot_product_attention(
                q,
                cached_k.value[:, :self.max_cache_len].reshape(
                    B, self.max_cache_len, H, Dh
                ),
                cached_v.value[:, :self.max_cache_len].reshape(
                    B, self.max_cache_len, H, Dh
                ),
                bias=bias, causal=False, dtype=self.dtype,
            )

        out = out.reshape(B, L, c.d_model)
        return _dense(c.d_model, ("heads", "embed"), "out_proj", self.dtype)(out)


class CachedCrossAttention(nn.Module):
    """Cross-attention over encoder tokens; K/V cached once per decode session."""

    cfg: BartDecoderCfg
    cache: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    # 'int8': prefill quantizes the cross-K/V caches per (sample, position,
    # head) — HALVES the decode loop's dominant HBM traffic (~400 MB/step at
    # B=32). Opt-in: greedy tokens may differ from bf16 at quantization
    # noise level (~0.4% per-element); bf16 stays the parity default.
    kv_cache_dtype: str = "bf16"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, L, D)
        encoder_hidden_states: jax.Array,  # (B, Lk, D)
        mode: str = "train",
        encoder_pad_bias: Optional[jax.Array] = None,  # (B, 1, 1, Lk) additive
        encoder_kv_lens: Optional[jax.Array] = None,  # (B,) leading valid keys
        encoder_pad_mask: Optional[jax.Array] = None,  # (B, Lk) True = real key
    ):
        c = self.cfg
        H = c.decoder_attention_heads
        Dh = c.d_model // H
        B, L, _ = x.shape
        Lk = encoder_hidden_states.shape[1]

        qf = _dense(c.d_model, ("embed", "heads"), "q_proj", self.dtype)(x)

        if mode == "train" or not self.cache:
            q = qf.reshape(B, L, H, Dh)
            k = _dense(c.d_model, ("embed", "heads"), "k_proj", self.dtype)(
                encoder_hidden_states
            ).reshape(B, Lk, H, Dh)
            v = _dense(c.d_model, ("embed", "heads"), "v_proj", self.dtype)(
                encoder_hidden_states
            ).reshape(B, Lk, H, Dh)
        else:
            # prefill computes K/V once; decode reuses without recompute.
            # Caches stored FLAT (B, Lk_pad, H*Dh), allocated at a 128-lane
            # multiple — the decode loop's dominant HBM traffic; a runtime
            # pad would re-copy the caches EVERY while-loop iteration (they
            # are loop-carried state XLA can't hoist around; measured 0.6
            # ms/step). See CachedSelfAttention / ops/decode_attention.py.
            Lk_pad = -(-Lk // 128) * 128
            use_q8 = self.kv_cache_dtype == "int8"
            cache_dtype = jnp.int8 if use_q8 else self.dtype
            cached_k = self.variable(
                "cache", "cached_enc_key", jnp.zeros, (B, Lk_pad, c.d_model), cache_dtype
            )
            cached_v = self.variable(
                "cache", "cached_enc_value", jnp.zeros, (B, Lk_pad, c.d_model), cache_dtype
            )
            if use_q8:
                Hp = -(-H // 8) * 8
                k_scale = self.variable(
                    "cache", "cached_enc_key_scale", jnp.ones, (B, Hp, Lk_pad), jnp.float32
                )
                v_scale = self.variable(
                    "cache", "cached_enc_value_scale", jnp.ones, (B, Hp, Lk_pad), jnp.float32
                )
            k_full = v_full = None
            if mode == "prefill":
                pad = ((0, 0), (0, Lk_pad - Lk), (0, 0))
                k_full = _dense(
                    c.d_model, ("embed", "heads"), "k_proj", self.dtype
                )(encoder_hidden_states)
                v_full = _dense(
                    c.d_model, ("embed", "heads"), "v_proj", self.dtype
                )(encoder_hidden_states)
                if use_q8:
                    from pixparse_tpu.ops.decode_attention import quantize_kv_rows

                    k_i8, ks = quantize_kv_rows(k_full, H)
                    v_i8, vs = quantize_kv_rows(v_full, H)
                    spad = ((0, 0), (0, 0), (0, Lk_pad - Lk))
                    cached_k.value = jnp.pad(k_i8, pad)
                    cached_v.value = jnp.pad(v_i8, pad)
                    k_scale.value = jnp.pad(ks, spad, constant_values=1.0)
                    v_scale.value = jnp.pad(vs, spad, constant_values=1.0)
                else:
                    cached_k.value = jnp.pad(k_full, pad)
                    cached_v.value = jnp.pad(v_full, pad)
            # decode mode reads the prefill-cached K/V (flax tolerates the
            # unused k/v_proj params in the supplied tree)
            if mode == "decode" and L == 1 and (use_q8 or _use_decode_kernel()):
                col = jax.lax.broadcasted_iota(jnp.int32, (1, Lk_pad), 1)
                if encoder_pad_mask is not None:
                    valid = jnp.pad(
                        encoder_pad_mask.astype(bool),
                        ((0, 0), (0, Lk_pad - Lk)),
                    )
                elif encoder_kv_lens is not None:
                    valid = col < encoder_kv_lens[:, None]
                else:
                    valid = jnp.broadcast_to(col < Lk, (B, Lk_pad))
                if use_q8:
                    from pixparse_tpu.ops.decode_attention import decode_attention_q8

                    out = decode_attention_q8(
                        qf, cached_k.value, cached_v.value,
                        k_scale.value, v_scale.value, valid, num_heads=H,
                        interpret=not _use_decode_kernel(),
                    )
                else:
                    from pixparse_tpu.ops.decode_attention import decode_attention

                    out = decode_attention(
                        qf, cached_k.value, cached_v.value, valid, num_heads=H
                    )
                return _dense(
                    c.d_model, ("heads", "embed"), "out_proj", self.dtype
                )(out)
            q = qf.reshape(B, L, H, Dh)
            # XLA fallback/prefill attention sees only the true Lk keys
            # (slice-copy: runs once per generate call, not per step)
            if k_full is not None:
                # prefill: attend over the EXACT just-computed projections —
                # the prompt positions (and so the first generated token's
                # logits) never pay the int8 cache's quantization noise
                k = k_full.reshape(B, Lk, H, Dh)
                v = v_full.reshape(B, Lk, H, Dh)
            elif use_q8:
                kr = cached_k.value[:, :Lk].astype(jnp.float32).reshape(B, Lk, H, Dh)
                vr = cached_v.value[:, :Lk].astype(jnp.float32).reshape(B, Lk, H, Dh)
                ksr = k_scale.value[:, :H, :Lk].transpose(0, 2, 1)[..., None]
                vsr = v_scale.value[:, :H, :Lk].transpose(0, 2, 1)[..., None]
                k = (kr * ksr).astype(self.dtype)
                v = (vr * vsr).astype(self.dtype)
            else:
                k = cached_k.value[:, :Lk].reshape(B, Lk, H, Dh)
                v = cached_v.value[:, :Lk].reshape(B, Lk, H, Dh)

        out = dot_product_attention(
            q, k, v, dtype=self.dtype, bias=encoder_pad_bias,
            impl=self.attn_impl if mode == "train" else "xla",
            kv_lens=encoder_kv_lens,
        )
        out = out.reshape(B, L, c.d_model)
        return _dense(c.d_model, ("heads", "embed"), "out_proj", self.dtype)(out)


class BartDecoderLayer(nn.Module):
    """Post-LN decoder layer (HF Bart layout: self-attn -> LN, cross -> LN, FFN -> LN)."""

    cfg: BartDecoderCfg
    max_cache_len: int = 0
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    mlp_remat: Any = False  # False | 'mlp' | 'gelu' (see vit.mlp_forward)
    kv_cache_dtype: str = "bf16"  # 'int8': quantized cross-KV decode cache

    @nn.compact
    def __call__(
        self,
        x,
        encoder_hidden_states,
        self_pad_bias=None,
        mode: str = "train",
        deterministic: bool = True,
        encoder_pad_bias=None,
        encoder_kv_lens=None,
        key_pad_mask=None,  # (B, max_cache_len) decode/prefill self-attn
        encoder_pad_mask=None,  # (B, Lk) decode cross-attn kernel
    ):
        c = self.cfg
        dropout = nn.Dropout(rate=c.dropout)
        self_ln = _ln("self_attn_layer_norm", c.ln_eps, self.dtype)
        cross_ln = _ln("encoder_attn_layer_norm", c.ln_eps, self.dtype)
        ffn_ln = _ln("final_layer_norm", c.ln_eps, self.dtype)
        self_attn = CachedSelfAttention(
            c, self.max_cache_len, self.dtype, self.attn_impl, name="self_attn"
        )
        cross_attn = CachedCrossAttention(
            c, cache=mode != "train", dtype=self.dtype, attn_impl=self.attn_impl,
            kv_cache_dtype=self.kv_cache_dtype, name="encoder_attn",
        )

        if self.mlp_remat:
            # remat='mlp': the FFN runs as a pure checkpointed function —
            # residual = its input; backward recomputes the (L, 4*D) wide
            # fc1/gelu activations (see vit.mlp_forward / vit.DenseParams).
            # remat='gelu': checkpoint only gelu(+act-dropout)+fc2 —
            # residual = the fc1 output; backward recomputes just the
            # elementwise tail (half the memory win, ~none of the matmul
            # recompute). Activation dropout is replicated manually (flax
            # semantics: keep_prob mask, x/keep_prob) so the rng rides in
            # as an explicit argument to the checkpointed function.
            w1, b1 = _Proj(c.d_model, c.decoder_ffn_dim, ("embed", "mlp"), name="fc1")()
            w2, b2 = _Proj(c.decoder_ffn_dim, c.d_model, ("mlp", "embed"), name="fc2")()
            act_rate = c.activation_dropout
            use_act_drop = (not deterministic) and act_rate > 0.0
            act_key = self.make_rng("dropout") if use_act_drop else None
            dt = self.dtype

            def ffn_head(h, w1, b1):
                return h.astype(dt) @ w1.astype(dt) + b1.astype(dt)

            def ffn_tail(h, w2, b2, key):
                h = nn.gelu(h, approximate=False)
                if use_act_drop:
                    keep = 1.0 - act_rate
                    mask = jax.random.bernoulli(key, p=keep, shape=h.shape)
                    h = jax.lax.select(
                        mask, h / jnp.asarray(keep, dt), jnp.zeros_like(h)
                    )
                return h @ w2.astype(dt) + b2.astype(dt)

            if self.mlp_remat == "gelu":
                ckpt_tail = jax.checkpoint(ffn_tail)

                def ffn(h):
                    return dropout(
                        ckpt_tail(ffn_head(h, w1, b1), w2, b2, act_key),
                        deterministic=deterministic,
                    )
            else:
                def ffn_fn(h, w1, b1, w2, b2, key):
                    return ffn_tail(ffn_head(h, w1, b1), w2, b2, key)

                ckpt_ffn = jax.checkpoint(ffn_fn)

                def ffn(h):
                    return dropout(
                        ckpt_ffn(h, w1, b1, w2, b2, act_key),
                        deterministic=deterministic,
                    )
        else:
            def ffn(h):
                h = _dense(c.decoder_ffn_dim, ("embed", "mlp"), "fc1", self.dtype)(h)
                h = nn.gelu(h, approximate=False)
                h = nn.Dropout(rate=c.activation_dropout)(h, deterministic=deterministic)
                h = _dense(c.d_model, ("mlp", "embed"), "fc2", self.dtype)(h)
                return dropout(h, deterministic=deterministic)

        if c.pre_norm:
            # mBART layout (the Donut decoder): LN -> sublayer -> residual
            x = x + dropout(
                self_attn(
                    self_ln(x), pad_bias=self_pad_bias, mode=mode,
                    key_pad_mask=key_pad_mask,
                ),
                deterministic=deterministic,
            )
            x = x + dropout(
                cross_attn(
                    cross_ln(x), encoder_hidden_states, mode=mode,
                    encoder_pad_bias=encoder_pad_bias,
                    encoder_kv_lens=encoder_kv_lens,
                    encoder_pad_mask=encoder_pad_mask,
                ),
                deterministic=deterministic,
            )
            x = x + ffn(ffn_ln(x))
            return x

        # BART layout: sublayer -> residual -> LN
        residual = x
        x = self_attn(
            x, pad_bias=self_pad_bias, mode=mode, key_pad_mask=key_pad_mask
        )
        x = dropout(x, deterministic=deterministic)
        x = self_ln(residual + x)

        residual = x
        x = cross_attn(
            x, encoder_hidden_states, mode=mode, encoder_pad_bias=encoder_pad_bias,
            encoder_kv_lens=encoder_kv_lens, encoder_pad_mask=encoder_pad_mask,
        )
        x = dropout(x, deterministic=deterministic)
        x = cross_ln(residual + x)

        residual = x
        h = ffn(x)
        x = ffn_ln(residual + h)
        return x


class BartCausalDecoder(nn.Module):
    """BART-style causal LM with cross-attention and tied LM head.

    ``__call__(input_ids, encoder_hidden_states, ...)`` returns logits
    (B, L, V). ``mode``: 'train' | 'prefill' | 'decode' (see module docstring).
    """

    cfg: BartDecoderCfg
    max_cache_len: int = 0
    dtype: Dtype = jnp.float32
    remat: Any = False  # False | True/"full" | "dots" | "mlp" | "gelu"
    attn_impl: str = "xla"
    kv_cache_dtype: str = "bf16"  # 'int8': quantized cross-KV decode cache

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,  # (B, L)
        encoder_hidden_states: jax.Array,  # (B, Lk, D)
        attention_mask: Optional[jax.Array] = None,  # (B, L) 1 = attend (train)
        key_pad_mask: Optional[jax.Array] = None,  # (B, max_cache_len) decode/prefill
        mode: str = "train",
        deterministic: bool = True,
        return_hidden: bool = False,  # pre-head hidden for chunked CE
        positions: Optional[jax.Array] = None,  # (B, L) explicit positions
        encoder_pad_mask: Optional[jax.Array] = None,  # (B, Lk) True = real key
        encoder_kv_lens: Optional[jax.Array] = None,  # (B,) contiguous valid keys
    ) -> jax.Array:
        c = self.cfg
        B, L = input_ids.shape

        embed_tokens = nn.Embed(
            c.vocab_size,
            c.d_model,
            dtype=self.dtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(0.02), ("vocab", "vocab_embed")
            ),
            name="embed_tokens",
        )
        embed_positions = nn.Embed(
            c.max_position_embeddings + c.pos_offset,
            c.d_model,
            dtype=self.dtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(0.02), ("length", "embed")
            ),
            name="embed_positions",
        )

        if mode in ("prefill", "decode"):
            # own position counter (mirrors the per-layer cache_index but
            # lives at the top so position lookup never reaches into scopes)
            pos_var = self.variable(
                "cache", "position_offset", lambda: jnp.zeros((), jnp.int32)
            )
            start = pos_var.value
            pos_var.value = start + L
        else:
            start = jnp.zeros((), jnp.int32)
        if positions is None:
            positions = start + jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)

        x = embed_tokens(input_ids)
        if c.scale_embedding:
            x = x * jnp.asarray(c.d_model ** 0.5, self.dtype)
        x = x + embed_positions(positions + c.pos_offset)
        if c.layernorm_embedding:
            x = _ln("layernorm_embedding", c.ln_eps, self.dtype)(x)
        x = nn.Dropout(rate=c.dropout)(x, deterministic=deterministic)
        x = nn.with_logical_constraint(x, ("batch", "length", None))

        # additive self-attention key bias from padding (train); decode and
        # prefill thread the raw key_pad_mask instead — CachedSelfAttention
        # owns the causal/pad composition there (kernel- or bias-based)
        pad_bias = None
        if mode == "train" and attention_mask is not None:
            pad_bias = jnp.where(
                attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF
            )

        layer_cls = BartDecoderLayer
        mlp_remat = (
            self.remat if self.remat in ("mlp", "gelu") and mode == "train"
            else False
        )
        if self.remat and not mlp_remat and mode == "train":
            # trade the (B, H, L, L) fp32 attention-score tensors for
            # recompute — the dominant non-logits train allocation at L=1023
            # static_argnums index __call__ args with self at 0: mode (4)
            # and deterministic (5) are Python-level statics
            from pixparse_tpu.models.vit import _remat_policy

            layer_cls = nn.remat(
                BartDecoderLayer, static_argnums=(4, 5),
                policy=_remat_policy(self.remat),
            )
        encoder_pad_bias = None
        if encoder_pad_mask is not None and encoder_kv_lens is None:
            encoder_pad_bias = jnp.where(
                encoder_pad_mask[:, None, None, :].astype(bool), 0.0, NEG_INF
            )
        for i in range(c.decoder_layers):
            x = layer_cls(
                c, self.max_cache_len, self.dtype, self.attn_impl,
                mlp_remat, kv_cache_dtype=self.kv_cache_dtype,
                name=f"layers_{i}",
            )(
                x,
                encoder_hidden_states,
                pad_bias,
                mode,
                deterministic,
                encoder_pad_bias,
                encoder_kv_lens,
                key_pad_mask if mode != "train" else None,
                encoder_pad_mask,
            )

        if c.add_final_layer_norm:
            x = _ln("final_norm", c.ln_eps, self.dtype)(x)
        if return_hidden:
            # training fast path: the loss computes the tied head per
            # sequence chunk (ops/loss.py chunked CE) so (B, L, V) logits
            # never materialize
            return x
        # tied LM head: matmul in compute dtype (bf16 on TPU, matching the
        # reference's autocast semantics), logits surfaced in fp32 for the loss
        logits = embed_tokens.attend(x).astype(jnp.float32)
        return logits


# HF-name -> architecture table (facebook/bart-base & -large layouts), so the
# framework never needs network access or the transformers lib at runtime.
BART_ARCH_TABLE = {
    "facebook/bart-base": dict(
        vocab_size=50265, d_model=768, decoder_layers=6,
        decoder_attention_heads=12, decoder_ffn_dim=3072,
    ),
    "facebook/bart-large": dict(
        vocab_size=50265, d_model=1024, decoder_layers=12,
        decoder_attention_heads=16, decoder_ffn_dim=4096,
    ),
    # Donut decoder: mBART layout (pre-LN + final LN, scaled embeddings),
    # 4 layers, asian-bart vocab (naver-clova-ix/donut-base text tower)
    "donut-mbart": dict(
        vocab_size=57525, d_model=1024, decoder_layers=4,
        decoder_attention_heads=16, decoder_ffn_dim=4096,
        pre_norm=True, add_final_layer_norm=True, scale_embedding=True,
    ),
    # test-size decoder, not an HF name
    "bart-test": dict(
        vocab_size=512, d_model=64, decoder_layers=2,
        decoder_attention_heads=2, decoder_ffn_dim=128,
    ),
}


def resolve_bart_cfg(
    name: str,
    num_decoder_layers: Optional[int] = None,
    max_length: Optional[int] = None,
    vocab_size: Optional[int] = None,
) -> BartDecoderCfg:
    """Resolve an HF-style decoder name + reference overrides
    (``models/text_decoder_hf.py:13-22``: cross-attn on, decoder_layers and
    max_position_embeddings overridable) to a BartDecoderCfg."""
    if name not in BART_ARCH_TABLE:
        raise ValueError(f"unknown text decoder '{name}' (known: {sorted(BART_ARCH_TABLE)})")
    arch = dict(BART_ARCH_TABLE[name])
    if num_decoder_layers is not None:
        arch["decoder_layers"] = num_decoder_layers
    if vocab_size is not None:
        arch["vocab_size"] = vocab_size
    kwargs = {}
    if max_length is not None:
        kwargs["max_position_embeddings"] = max_length
    return BartDecoderCfg(**arch, **kwargs)
