"""Framework-layer tests: optimization, sharded train state/step, checkpoint.

Runs on the 8-device virtual CPU mesh from conftest (SURVEY.md §4
"distributed-without-a-cluster").
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixparse_tpu.framework.config import OptimizationCfg
from pixparse_tpu.framework.optimization import (
    create_optimizer,
    create_scheduler,
    cruller_layer_depth,
    default_weight_decay_mask,
    layer_decay_scales,
)
from pixparse_tpu.framework.train_state import (
    TrainState,
    create_train_state,
    make_train_step,
)
from pixparse_tpu.models.config import get_model_config
from pixparse_tpu.models.cruller import Cruller, resolve_cruller_cfgs
from pixparse_tpu.ops.loss import cross_entropy_loss
from pixparse_tpu.parallel.mesh import MeshEnv, create_mesh, shard_batch


# ------------------------------------------------------------------ schedule

def test_cosine_schedule_warmup_then_decay():
    cfg = OptimizationCfg(learning_rate=1e-3, warmup_learning_rate=1e-6)
    # 10 intervals, 2 warmup, 5 updates per interval
    sched = create_scheduler(cfg, 10, 2, 5)
    assert float(sched(0)) == pytest.approx(1e-6, rel=1e-4)
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-4)  # warmup end
    mid, end = float(sched(30)), float(sched(49))
    assert 0 < end < mid < 1e-3
    assert float(sched(50)) == pytest.approx(0.0, abs=1e-9)
    # monotone decay after warmup
    vals = [float(sched(s)) for s in range(10, 51)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_constant_schedule():
    cfg = OptimizationCfg(learning_rate=5e-4, scheduler="constant")
    sched = create_scheduler(cfg, 10, 0, 5)
    assert float(sched(0)) == pytest.approx(5e-4)
    assert float(sched(49)) == pytest.approx(5e-4)


# --------------------------------------------------------------- layer decay

def test_layer_depths_ordering():
    enc_depth, dec_layers = 12, 4
    d = lambda names: cruller_layer_depth(names, enc_depth, dec_layers)
    assert d(("image_encoder", "patch_embed", "kernel")) == 0
    assert d(("image_encoder", "pos_embed")) == 0
    assert d(("image_encoder", "blocks_0", "attn", "qkv", "kernel")) == 1
    assert d(("image_encoder", "blocks_11", "mlp", "fc2", "bias")) == 12
    assert d(("image_encoder", "norm", "scale")) == 13
    assert d(("text_decoder", "embed_tokens", "embedding")) == 13
    assert d(("text_decoder", "layers_0", "fc1", "kernel")) == 14
    assert d(("text_decoder", "layers_3", "fc2", "bias")) == 17
    assert d(("head", "kernel")) == 18  # unknown path -> max depth


def test_layer_decay_scales_geometric():
    params = {
        "image_encoder": {"patch_embed": {"kernel": jnp.zeros((2, 2))}},
        "text_decoder": {"layers_3": {"fc2": {"kernel": jnp.zeros((2, 2))}}},
    }
    scales = layer_decay_scales(params, 0.75, encoder_depth=12, decoder_layers=4)
    # max depth 18: first layer decayed 0.75^18, last decoder layer 0.75^1
    assert scales["image_encoder"]["patch_embed"]["kernel"] == pytest.approx(0.75 ** 18)
    assert scales["text_decoder"]["layers_3"]["fc2"]["kernel"] == pytest.approx(0.75)


def test_weight_decay_mask():
    params = {
        "pos_embed": jnp.zeros((1, 5, 8)),
        "cls_token": jnp.zeros((1, 1, 8)),
        "dense": {"kernel": jnp.zeros((8, 8)), "bias": jnp.zeros((8,))},
        "ln": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
        "embed": {"embedding": jnp.zeros((100, 8))},
    }
    mask = default_weight_decay_mask(params)
    assert not mask["pos_embed"] and not mask["cls_token"]
    assert mask["dense"]["kernel"] and not mask["dense"]["bias"]
    assert not mask["ln"]["scale"] and not mask["ln"]["bias"]
    assert mask["embed"]["embedding"]


# -------------------------------------------------------- sharded train step

def _tiny_model_and_batch(batch=8, text_len=16):
    cfg = get_model_config("cruller_test")
    vit_cfg, bart_cfg, _ = resolve_cruller_cfgs(cfg)
    model = Cruller(vit_cfg, bart_cfg)
    rng = np.random.RandomState(0)
    img = rng.rand(batch, *vit_cfg.img_size, vit_cfg.in_chans).astype(np.float32)
    txt = rng.randint(4, bart_cfg.vocab_size, size=(batch, text_len)).astype(np.int32)
    tgt = np.roll(txt, -1, axis=1).astype(np.int32)
    tgt[:, -1] = -100
    return model, vit_cfg, bart_cfg, {"image": img, "text": txt, "target": tgt}


def _make_loss(model):
    def loss_fn(params, batch, rng):
        logits = model.apply(
            {"params": params},
            batch["image"],
            batch["text"],
            deterministic=False,
            rngs={"dropout": rng},
        )
        loss, _ = cross_entropy_loss(logits, batch["target"])
        return loss, {}

    return loss_fn


def test_sharded_train_step_loss_decreases():
    model, vit_cfg, bart_cfg, batch = _tiny_model_and_batch()
    mesh = create_mesh()  # 8 virtual devices, all data
    opt_cfg = OptimizationCfg(learning_rate=1e-3, clip_grad_value=1.0, clip_grad_mode="norm")
    import optax

    from pixparse_tpu.framework.optimization import create_optimizer

    tx, sched = create_optimizer(
        opt_cfg, 10, 1, 10, encoder_depth=vit_cfg.depth,
        decoder_layers=bart_cfg.decoder_layers,
    )
    example = (
        jnp.zeros((8, *vit_cfg.img_size, vit_cfg.in_chans)),
        jnp.zeros((8, 16), jnp.int32),
    )
    state, shardings = create_train_state(model, tx, mesh, example, seed=0)
    step = make_train_step(_make_loss(model), tx, mesh)
    sharded = shard_batch(mesh, batch)
    losses = []
    for _ in range(8):
        state, metrics = step(state, sharded)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    assert np.isfinite(losses).all()


def test_train_step_matches_single_device():
    """Sharded 8-device step == single-device step numerically (SURVEY §4)."""
    model, vit_cfg, bart_cfg, batch = _tiny_model_and_batch()
    import optax

    tx = optax.adam(1e-3)
    example = (
        jnp.zeros((8, *vit_cfg.img_size, vit_cfg.in_chans)),
        jnp.zeros((8, 16), jnp.int32),
    )

    def run(mesh_devices):
        mesh = create_mesh(devices=mesh_devices)
        state, _ = create_train_state(model, tx, mesh, example, seed=0)
        step = make_train_step(_make_loss(model), tx, mesh)
        sharded = shard_batch(mesh, batch)
        out = []
        for _ in range(3):
            state, m = step(state, sharded)
            out.append(float(m["loss"]))
        return out

    multi = run(jax.devices())
    single = run(jax.devices()[:1])
    np.testing.assert_allclose(multi, single, rtol=2e-4)


def test_grad_accum_multisteps():
    """grad_accum_steps=2: params only move every second micro-step."""
    model, vit_cfg, bart_cfg, batch = _tiny_model_and_batch()
    mesh = create_mesh()
    opt_cfg = OptimizationCfg(learning_rate=1e-3, grad_accum_steps=2)
    tx, _ = create_optimizer(opt_cfg, 10, 0, 10)
    example = (
        jnp.zeros((8, *vit_cfg.img_size, vit_cfg.in_chans)),
        jnp.zeros((8, 16), jnp.int32),
    )
    state, _ = create_train_state(model, tx, mesh, example, seed=0)
    step = make_train_step(_make_loss(model), tx, mesh)
    sharded = shard_batch(mesh, batch)
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state, _ = step(state, sharded)
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    np.testing.assert_array_equal(p0, p1)  # accum step: no move
    state, _ = step(state, sharded)
    p2 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert not np.array_equal(p1, p2)  # update applied


def test_grad_accum_scan_matches_multisteps():
    """In-step micro-batch scan accumulation (make_train_step
    grad_accum_steps=2, no persistent accumulator) lands the SAME parameters
    as optax.MultiSteps fed the same two micro-batches (deterministic loss,
    so rng threading differences don't matter)."""
    model, vit_cfg, bart_cfg, batch = _tiny_model_and_batch(batch=16)
    mesh = create_mesh()

    def det_loss(params, b, rng):
        logits = model.apply({"params": params}, b["image"], b["text"])
        loss, _ = cross_entropy_loss(logits, b["target"])
        return loss, {}

    mb1 = {k: v[:8] for k, v in batch.items()}
    mb2 = {k: v[8:] for k, v in batch.items()}
    opt_cfg = OptimizationCfg(learning_rate=1e-3, grad_accum_steps=2)
    example = (
        jnp.zeros((8, *vit_cfg.img_size, vit_cfg.in_chans)),
        jnp.zeros((8, 16), jnp.int32),
    )

    tx_m, _ = create_optimizer(opt_cfg, 10, 0, 10)
    state_m, _ = create_train_state(model, tx_m, mesh, example, seed=0)
    step_m = make_train_step(det_loss, tx_m, mesh)
    state_m, _ = step_m(state_m, shard_batch(mesh, mb1))
    state_m, _ = step_m(state_m, shard_batch(mesh, mb2))

    tx_s, _ = create_optimizer(opt_cfg, 10, 0, 10, wrap_multisteps=False)
    state_s, _ = create_train_state(model, tx_s, mesh, example, seed=0)
    step_s = make_train_step(det_loss, tx_s, mesh, grad_accum_steps=2)
    stacked = {k: np.stack([mb1[k], mb2[k]]) for k in batch}
    state_s, metrics = step_s(
        state_s, shard_batch(mesh, stacked, stacked=True)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state_s.step) == 1  # one optimizer update

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        ),
        state_m.params,
        state_s.params,
    )


# ---------------------------------------------------------------- checkpoint

def test_checkpoint_roundtrip(tmp_path):
    import optax

    from pixparse_tpu.framework.checkpoint import (
        latest_checkpoint,
        restore_train_state,
        save_checkpoint,
    )

    model, vit_cfg, bart_cfg, batch = _tiny_model_and_batch()
    mesh = create_mesh()
    tx = optax.adam(1e-3)
    example = (
        jnp.zeros((8, *vit_cfg.img_size, vit_cfg.in_chans)),
        jnp.zeros((8, 16), jnp.int32),
    )
    state, _ = create_train_state(model, tx, mesh, example, seed=0)
    step = make_train_step(_make_loss(model), tx, mesh)
    sharded = shard_batch(mesh, batch)
    state, _ = step(state, sharded)

    path = str(tmp_path / "checkpoint-3")
    save_checkpoint(path, state, metadata={"interval": 3})
    assert latest_checkpoint(str(tmp_path)) == path

    fresh, _ = create_train_state(model, tx, mesh, example, seed=123)
    restored, meta = restore_train_state(path, fresh)
    assert meta["interval"] == 3
    assert int(restored.step) == 1
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored state steps identically to the original
    s1, m1 = step(state, sharded)
    s2, m2 = step(restored, sharded)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_chunked_ce_matches_full():
    """Chunked tied-head CE == full-logits CE (values and grads)."""
    import optax

    from pixparse_tpu.ops.loss import (
        chunked_cross_entropy_from_hidden,
        cross_entropy_loss,
    )

    rng = np.random.RandomState(0)
    B, L, D, V = 2, 37, 16, 53  # L deliberately not a chunk multiple
    hidden = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    emb = jnp.asarray(rng.randn(V, D).astype(np.float32))
    targets = rng.randint(0, V, (B, L))
    targets[:, -5:] = -100
    targets = jnp.asarray(targets)

    def full(h, e):
        logits = h @ e.T
        return cross_entropy_loss(logits, targets)[0]

    def chunked(h, e):
        return chunked_cross_entropy_from_hidden(h, e, targets, chunk_size=8)[0]

    np.testing.assert_allclose(
        float(full(hidden, emb)), float(chunked(hidden, emb)), rtol=1e-5
    )
    gf = jax.grad(full, argnums=(0, 1))(hidden, emb)
    gc = jax.grad(chunked, argnums=(0, 1))(hidden, emb)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fsdp_mesh_shards_params():
    """fsdp=2 mesh: embed-dim params shard over the fsdp axis (ZeRO-style)
    with no model-code changes (logical axis rules)."""
    model, vit_cfg, bart_cfg, _ = _tiny_model_and_batch()
    import optax

    mesh = create_mesh(data=4, fsdp=2, model=1)
    tx = optax.adam(1e-3)
    example = (
        jnp.zeros((8, *vit_cfg.img_size, vit_cfg.in_chans)),
        jnp.zeros((8, 16), jnp.int32),
    )
    state, shardings = create_train_state(model, tx, mesh, example, seed=0)
    # patch_embed kernel logical axes are ("patch", "embed") -> embed on fsdp
    kernel = state.params["image_encoder"]["patch_embed"]["kernel"]
    spec = kernel.sharding.spec
    assert "fsdp" in str(spec), spec
    # one shard holds half the embed dim
    shard_shape = kernel.addressable_shards[0].data.shape
    assert shard_shape[1] == kernel.shape[1] // 2
    # adam moments inherit the layout (GSPMD propagation)
    mu_kernel = state.opt_state[0].mu["image_encoder"]["patch_embed"]["kernel"]
    assert mu_kernel.sharding == kernel.sharding


def test_resume_is_bit_identical_to_continuous_run(tmp_path):
    """Save at step 2, restore into a fresh state, continue: steps 3-4 must
    match the uninterrupted run exactly (full-state checkpointing + per-step
    fold_in dropout make resume deterministic — the reference cannot do this,
    it never saves optimizer state)."""
    import optax

    from pixparse_tpu.framework.checkpoint import (
        restore_train_state,
        save_checkpoint,
        wait_for_saves,
    )

    model, vit_cfg, bart_cfg, batch = _tiny_model_and_batch()
    mesh = create_mesh()
    opt_cfg = OptimizationCfg(learning_rate=1e-3, clip_grad_value=1.0, clip_grad_mode="norm")
    tx, _ = create_optimizer(
        opt_cfg, 10, 1, 10, encoder_depth=vit_cfg.depth,
        decoder_layers=bart_cfg.decoder_layers,
    )
    example = (
        jnp.zeros((8, *vit_cfg.img_size, vit_cfg.in_chans)),
        jnp.zeros((8, 16), jnp.int32),
    )
    step = make_train_step(_make_loss(model), tx, mesh, donate=False)
    sharded = shard_batch(mesh, batch)

    # continuous run: 4 steps
    state_c, _ = create_train_state(model, tx, mesh, example, seed=7)
    cont_losses = []
    for _ in range(4):
        state_c, m = step(state_c, sharded)
        cont_losses.append(float(m["loss"]))

    # interrupted run: 2 steps, checkpoint, restore, 2 more
    state_a, _ = create_train_state(model, tx, mesh, example, seed=7)
    for _ in range(2):
        state_a, m = step(state_a, sharded)
    path = str(tmp_path / "checkpoint-0")
    save_checkpoint(path, state_a, metadata={"interval": 0})
    wait_for_saves()

    fresh, _ = create_train_state(model, tx, mesh, example, seed=99)
    state_b, meta = restore_train_state(path, fresh)
    resumed_losses = []
    for _ in range(2):
        state_b, m = step(state_b, sharded)
        resumed_losses.append(float(m["loss"]))

    np.testing.assert_array_equal(resumed_losses, cont_losses[2:])
