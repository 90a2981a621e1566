"""Continuous-batching decode (ops/serving.py): greedy parity with
generate(), refill correctness, forced compaction, per-page budgets, and
stream accounting."""

import numpy as np
import jax
import jax.numpy as jnp

from pixparse_tpu.models.config import get_model_config
from pixparse_tpu.models.cruller import Cruller, resolve_cruller_cfgs
from pixparse_tpu.ops.generation import generate
from pixparse_tpu.ops.serving import ContinuousBatcher


def _setup(n_pages, seed=0):
    cfg = get_model_config("cruller_test")
    vit_cfg, bart_cfg, _ = resolve_cruller_cfgs(cfg)
    model = Cruller(vit_cfg, bart_cfg)
    rng = np.random.RandomState(seed)
    imgs = rng.rand(n_pages, *vit_cfg.img_size, vit_cfg.in_chans).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(imgs[:1]), jnp.zeros((1, 4), jnp.int32)
    )
    import flax.linen as nn

    params = nn.unbox(variables["params"])
    encode = jax.jit(
        lambda x: model.apply({"params": params}, x, method="encode")
    )
    return model, params, encode, imgs, bart_cfg


def _reference_tokens(model, params, encode, img, cfg, max_length, max_new=None):
    """Single-page generate() — the gold result for one page."""
    enc = encode(jnp.asarray(img[None]))
    kw = {}
    if max_new is not None:
        kw["max_new_tokens"] = jnp.asarray([max_new], jnp.int32)
    out = generate(
        model, params, enc, jnp.zeros((1, 1), jnp.int32),
        max_length=max_length, eos_token_id=cfg.eos_token_id,
        pad_token_id=cfg.pad_token_id, **kw,
    )
    n = int(out.lengths[0])
    return np.asarray(out.tokens[0, :n])


def _run_batcher(model, params, encode, imgs, cfg, **kw):
    defaults = dict(
        slots=2, max_length=12, prompt_ids=[0],
        eos_token_id=cfg.eos_token_id, pad_token_id=cfg.pad_token_id,
        refill_size=2, chunk_steps=3,
    )
    defaults.update(kw)
    max_new = defaults.pop("max_new_tokens", None)
    b = ContinuousBatcher(model, params, **defaults)
    pages = [(i, imgs[i]) for i in range(len(imgs))]
    return b, list(
        b.run(
            pages, encode,
            max_new_tokens=(lambda pid: max_new[pid]) if max_new else None,
        )
    )


def test_no_refill_parity_with_generate():
    """slots == pages: continuous (one fill, no refill) must equal the
    batched generate() bit-for-bit."""
    model, params, encode, imgs, cfg = _setup(3)
    enc = encode(jnp.asarray(imgs))
    g = generate(
        model, params, enc, jnp.zeros((3, 1), jnp.int32),
        max_length=12, eos_token_id=cfg.eos_token_id,
        pad_token_id=cfg.pad_token_id,
    )
    _, results = _run_batcher(
        model, params, encode, imgs, cfg, slots=3, max_length=12
    )
    assert len(results) == 3
    by_id = {r.page_id: r for r in results}
    for i in range(3):
        n = int(g.lengths[i])
        np.testing.assert_array_equal(
            by_id[i].tokens, np.asarray(g.tokens[i, :n]),
            err_msg=f"page {i}",
        )


def test_refill_parity_per_page():
    """More pages than slots: every page's tokens must match its own
    single-page generate() regardless of which slots/neighbors it shared."""
    model, params, encode, imgs, cfg = _setup(5)
    _, results = _run_batcher(model, params, encode, imgs, cfg)
    assert sorted(r.page_id for r in results) == list(range(5))
    for r in results:
        ref = _reference_tokens(model, params, encode, imgs[r.page_id], cfg, 12)
        np.testing.assert_array_equal(r.tokens, ref, err_msg=f"page {r.page_id}")


def test_forced_compaction_is_exact():
    """Tiny capacity slack forces compactions mid-stream; results must not
    change vs a run with ample capacity."""
    model, params, encode, imgs, cfg = _setup(6)
    _, small = _run_batcher(
        model, params, encode, imgs, cfg, capacity_slack=8, chunk_steps=2
    )
    _, big = _run_batcher(
        model, params, encode, imgs, cfg, capacity_slack=512, chunk_steps=2
    )
    a = {r.page_id: r.tokens for r in small}
    b = {r.page_id: r.tokens for r in big}
    assert set(a) == set(b) == set(range(6))
    for pid in a:
        np.testing.assert_array_equal(a[pid], b[pid], err_msg=f"page {pid}")


def test_per_page_budget():
    """max_new_tokens bounds each page's generated count (incl. any eos)."""
    model, params, encode, imgs, cfg = _setup(4)
    budgets = {0: 3, 1: 7, 2: 1, 3: 5}
    _, results = _run_batcher(
        model, params, encode, imgs, cfg, max_length=16,
        max_new_tokens=budgets,
    )
    assert sorted(r.page_id for r in results) == list(range(4))
    for r in results:
        generated = r.length - 1  # prompt is 1 token
        assert generated <= budgets[r.page_id], (r.page_id, generated)
        ref = _reference_tokens(
            model, params, encode, imgs[r.page_id], cfg, 16,
            max_new=budgets[r.page_id],
        )
        np.testing.assert_array_equal(r.tokens, ref, err_msg=f"page {r.page_id}")


def test_short_stream_and_empty_stream():
    model, params, encode, imgs, cfg = _setup(1)
    b, results = _run_batcher(model, params, encode, imgs, cfg, slots=4)
    assert len(results) == 1 and results[0].page_id == 0
    assert list(b.run(iter([]), encode)) == []


def test_many_pool_groups_parity():
    """pages >> pool_pages: several pool swaps (device-side refill from
    successive staged groups) must not perturb any page's tokens."""
    model, params, encode, imgs, cfg = _setup(9)
    _, results = _run_batcher(
        model, params, encode, imgs, cfg, pool_pages=2, chunk_steps=2,
    )
    assert sorted(r.page_id for r in results) == list(range(9))
    for r in results:
        ref = _reference_tokens(model, params, encode, imgs[r.page_id], cfg, 12)
        np.testing.assert_array_equal(r.tokens, ref, err_msg=f"page {r.page_id}")


def test_refill_cap_lag_parity():
    """max_refill_per_step=1: free slots queue for refill across steps;
    results must still be exact and complete."""
    model, params, encode, imgs, cfg = _setup(7)
    _, results = _run_batcher(
        model, params, encode, imgs, cfg, slots=3, max_refill_per_step=1,
        chunk_steps=2,
    )
    assert sorted(r.page_id for r in results) == list(range(7))
    for r in results:
        ref = _reference_tokens(model, params, encode, imgs[r.page_id], cfg, 12)
        np.testing.assert_array_equal(r.tokens, ref, err_msg=f"page {r.page_id}")


def test_generate_max_new_tokens_rowwise():
    """The generate() budget arg finishes rows independently."""
    model, params, encode, imgs, cfg = _setup(2)
    enc = encode(jnp.asarray(imgs))
    out = generate(
        model, params, enc, jnp.zeros((2, 1), jnp.int32),
        max_length=16, eos_token_id=cfg.eos_token_id,
        pad_token_id=cfg.pad_token_id,
        max_new_tokens=jnp.asarray([2, 9], jnp.int32),
    )
    lengths = np.asarray(out.lengths)
    assert lengths[0] - 1 <= 2 and lengths[1] - 1 <= 9
    # unbudgeted run for row 1 must agree on the first 9 generated tokens
    ref = generate(
        model, params, enc, jnp.zeros((2, 1), jnp.int32),
        max_length=16, eos_token_id=cfg.eos_token_id,
        pad_token_id=cfg.pad_token_id,
    )
    n = int(lengths[1])
    np.testing.assert_array_equal(
        np.asarray(out.tokens[1, :n]), np.asarray(ref.tokens[1, :n])
    )


def test_int8_kv_cache_parity():
    """kv_cache_dtype='int8' composes with the batcher: the path-based
    cache slice/splice/compact is dtype-agnostic (int8 code leaves and
    their scale leaves ride the same pytree ops), and prefill quantizes
    identically in the pool stager and in generate() — so serving tokens
    must be EXACTLY the int8 generate() tokens."""
    cfg = get_model_config("cruller_test")
    vit_cfg, bart_cfg, _ = resolve_cruller_cfgs(cfg)
    model = Cruller(vit_cfg, bart_cfg, kv_cache_dtype="int8")
    rng = np.random.RandomState(0)
    imgs = rng.rand(5, *vit_cfg.img_size, vit_cfg.in_chans).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(imgs[:1]), jnp.zeros((1, 4), jnp.int32)
    )
    import flax.linen as nn

    params = nn.unbox(variables["params"])
    encode = jax.jit(
        lambda x: model.apply({"params": params}, x, method="encode")
    )
    b, results = _run_batcher(model, params, encode, imgs, bart_cfg)
    got = {r.page_id: r.tokens for r in results}
    assert sorted(got) == list(range(5))
    for i in range(5):
        ref = _reference_tokens(model, params, encode, imgs[i], bart_cfg, 12)
        np.testing.assert_array_equal(got[i], ref)


def test_swin_family_parity():
    """The batcher is model-family-generic: the Donut-style Swin encoder +
    pre-LN mBART stack serves with exact generate() parity too (its decode
    cache pytree has the same cached_enc_*/self-KV path structure, which is
    all the splice/compact logic relies on)."""
    cfg = get_model_config("cruller_swin_test")
    enc_cfg, bart_cfg, _ = resolve_cruller_cfgs(cfg)
    model = Cruller(enc_cfg, bart_cfg)
    rng = np.random.RandomState(0)
    imgs = rng.rand(4, *enc_cfg.img_size, enc_cfg.in_chans).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(imgs[:1]), jnp.zeros((1, 4), jnp.int32)
    )
    import flax.linen as nn

    params = nn.unbox(variables["params"])
    encode = jax.jit(
        lambda x: model.apply({"params": params}, x, method="encode")
    )
    b, results = _run_batcher(
        model, params, encode, imgs, bart_cfg, max_length=10
    )
    got = {r.page_id: r.tokens for r in results}
    assert sorted(got) == list(range(4))
    for i in range(4):
        ref = _reference_tokens(model, params, encode, imgs[i], bart_cfg, 10)
        np.testing.assert_array_equal(got[i], ref)
