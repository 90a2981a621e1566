"""Beam search tests: beam=1 == greedy; beam>1 score dominance; pix2struct
patchify op tests ride along here."""

import numpy as np
import jax
import jax.numpy as jnp

from pixparse_tpu.models.config import get_model_config
from pixparse_tpu.models.cruller import Cruller, resolve_cruller_cfgs
from pixparse_tpu.ops.generation import generate, generate_beam


def _model_and_inputs(B=2):
    cfg = get_model_config("cruller_test")
    vit_cfg, bart_cfg, _ = resolve_cruller_cfgs(cfg)
    model = Cruller(vit_cfg, bart_cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, *vit_cfg.img_size, vit_cfg.in_chans), jnp.float32)
    txt = jnp.zeros((B, 4), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, txt)
    import flax.linen as nn

    params = nn.unbox(variables["params"])
    enc = model.apply({"params": params}, img, method="encode")
    prompt = jnp.full((B, 1), 0, jnp.int32)  # bos
    return model, params, enc, prompt, bart_cfg


def test_beam1_equals_greedy():
    model, params, enc, prompt, cfg = _model_and_inputs()
    g = generate(
        model, params, enc, prompt,
        max_length=16, eos_token_id=cfg.eos_token_id, pad_token_id=cfg.pad_token_id,
    )
    b = generate_beam(
        model, params, enc, prompt,
        num_beams=1, max_length=16,
        eos_token_id=cfg.eos_token_id, pad_token_id=cfg.pad_token_id,
    )
    np.testing.assert_array_equal(np.asarray(g.tokens), np.asarray(b.tokens))


def test_beam_search_score_dominates_greedy():
    model, params, enc, prompt, cfg = _model_and_inputs()

    def seq_logprob(tokens):
        """Sum log P(token_t | prefix) for generated tokens under the model."""
        ids = jnp.asarray(tokens)[None] if tokens.ndim == 1 else jnp.asarray(tokens)
        mask = ids != cfg.pad_token_id
        logits = model.apply(
            {"params": params}, ids, enc[:1], attention_mask=mask,
            mode="train", method="decode",
        )
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        total = 0.0
        row = np.asarray(ids[0])
        lp = np.asarray(logprobs[0])
        for t in range(1, len(row)):
            if row[t] == cfg.pad_token_id:
                break
            total += lp[t - 1, row[t]]
        return total

    g = generate(
        model, params, enc[:1], prompt[:1],
        max_length=12, eos_token_id=cfg.eos_token_id, pad_token_id=cfg.pad_token_id,
    )
    b = generate_beam(
        model, params, enc[:1], prompt[:1],
        num_beams=4, max_length=12,
        eos_token_id=cfg.eos_token_id, pad_token_id=cfg.pad_token_id,
        length_penalty=0.0,  # raw log-prob comparison
    )
    # with length_penalty=0 the best beam's raw logprob >= greedy's
    assert seq_logprob(np.asarray(b.tokens[0])) >= seq_logprob(np.asarray(g.tokens[0])) - 1e-4
    assert b.all_tokens.shape == (1, 4, 12)
    assert np.isfinite(np.asarray(b.scores)).all()


def test_pix2struct_patchify_host_and_device():
    from pixparse_tpu.ops.pix2struct import (
        patchify_variable,
        patchify_variable_batch,
        variable_grid,
    )

    rows, cols = variable_grid(1700, 1300, 16, 1024)
    assert rows * cols <= 1024
    assert rows > cols  # portrait document keeps aspect

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (300, 200, 1), np.uint8)
    out = patchify_variable(img, 16, 256)
    assert out["patches"].shape == (256, 16 * 16 * 1)
    n = int(out["mask"].sum())
    assert 0 < n <= 256
    assert (out["patches"][n:] == 0).all()
    assert out["rows"][:n].max() > 0 and out["cols"][:n].max() > 0

    batch = rng.rand(2, 128, 96, 1).astype(np.float32)
    dev = patchify_variable_batch(jnp.asarray(batch), 16, 64)
    assert dev["patches"].shape == (2, 64, 256)
    assert int(dev["mask"][0].sum()) <= 64


def test_generate_variable_length_prompts_match_per_sample():
    """Batched decode with right-padded variable-length prompts must produce
    the same continuation each row would get decoded alone (the reference
    decodes per-sample; a pad gap between prompt and answer is a bug)."""
    model, params, enc, _, cfg = _model_and_inputs(B=2)
    pad = cfg.pad_token_id
    p_short = np.array([5], np.int32)
    p_long = np.array([5, 9, 11], np.int32)
    batch_prompts = np.full((2, 3), pad, np.int32)
    batch_prompts[0, : len(p_short)] = p_short
    batch_prompts[1, : len(p_long)] = p_long

    out = generate(
        model, params, enc, jnp.asarray(batch_prompts),
        max_length=12, eos_token_id=cfg.eos_token_id, pad_token_id=pad,
    )
    rows = np.asarray(out.tokens)

    def solo(row_idx, prompt):
        r = generate(
            model, params, enc[row_idx:row_idx + 1], jnp.asarray(prompt[None]),
            max_length=12 - (3 - len(prompt)),
            eos_token_id=cfg.eos_token_id, pad_token_id=pad,
        )
        return np.asarray(r.tokens)[0]

    for i, prompt in enumerate((p_short, p_long)):
        batch_seq = rows[i][rows[i] != pad]
        solo_seq = solo(i, prompt)
        solo_seq = solo_seq[solo_seq != pad]
        n = min(len(batch_seq), len(solo_seq))
        assert n > len(prompt), "no tokens generated"
        np.testing.assert_array_equal(batch_seq[:n], solo_seq[:n])


def test_sampled_generation_reproducible_and_diverse():
    model, params, enc, prompt, cfg = _model_and_inputs()
    kw = dict(max_length=12, eos_token_id=cfg.eos_token_id,
              pad_token_id=cfg.pad_token_id, sample=True, temperature=2.0)
    a = generate(model, params, enc, prompt, rng=jax.random.PRNGKey(5), **kw)
    b = generate(model, params, enc, prompt, rng=jax.random.PRNGKey(5), **kw)
    c = generate(model, params, enc, prompt, rng=jax.random.PRNGKey(6), **kw)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    assert not np.array_equal(np.asarray(a.tokens), np.asarray(c.tokens))


def test_eval_task_with_beam_search():
    from pixparse_tpu.framework.config import OptimizationCfg
    from pixparse_tpu.parallel.mesh import MeshEnv
    from pixparse_tpu.task import TaskCrullerEvalRVLCDIP, TaskCrullerEvalRVLCDIPCfg
    from pixparse_tpu.tokenizers import TokenizerCfg
    from PIL import Image

    env = MeshEnv.initialize()
    task = TaskCrullerEvalRVLCDIP(
        TaskCrullerEvalRVLCDIPCfg(
            model_name="cruller_test", tokenizer=TokenizerCfg(name="pixparse_bytelevel")
        ),
        env, None,
    )
    task.num_beams = 2
    task.setup()
    rng = np.random.RandomState(0)
    batch = task.collate_fn([
        {"image": Image.fromarray(rng.randint(0, 255, (70, 60), np.uint8), "L"),
         "label": 3},
    ])
    metrics = task.step(batch)
    assert metrics["classification"]["n_valid_samples"] == 1
