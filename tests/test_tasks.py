"""Task-suite tests: factory, collates, vocab protocol, end-to-end train
steps, eval steps with the jitted decode — all on the 8-device CPU mesh with
the offline byte-level tokenizer and the cruller_test model config."""

import numpy as np
import pytest
from PIL import Image

from pixparse_tpu.framework.config import OptimizationCfg
from pixparse_tpu.parallel.mesh import MeshEnv, create_mesh
from pixparse_tpu.task import TASK_CLASS_REGISTRY, TaskFactory
from pixparse_tpu.tokenizers import TokenizerCfg

LOCAL_TOK = TokenizerCfg(name="pixparse_bytelevel")


def _env():
    return MeshEnv.initialize()


def _task_cfg(cfg_cls, **kwargs):
    import dataclasses

    names = {f.name for f in dataclasses.fields(cfg_cls)}
    if "opt" in names:
        kwargs.setdefault("opt", OptimizationCfg(learning_rate=1e-3))
    return cfg_cls(model_name="cruller_test", tokenizer=LOCAL_TOK, **kwargs)


def _pil_image(h=80, w=60, seed=0):
    rng = np.random.RandomState(seed)
    return Image.fromarray(rng.randint(0, 255, (h, w), np.uint8), mode="L")


# ------------------------------------------------------------------ factory

def test_factory_names_match_reference():
    reference_names = {
        "cruller_eval_ocr", "cruller_eval_rvlcdip", "cruller_eval_cord",
        "cruller_eval_docvqa", "donut_eval_ocr", "cruller_pretrain",
        "cruller_finetune_rvlcdip", "cruller_finetune_cord",
        "cruller_finetune_docvqa", "cruller_finetune_xent",
    }
    assert reference_names <= set(TASK_CLASS_REGISTRY)  # full reference parity
    assert set(TASK_CLASS_REGISTRY) - reference_names == {"pix2struct_pretrain"}


def test_factory_creates_tasks():
    env = _env()
    for name in ("cruller_pretrain", "cruller_finetune_cord", "cruller_eval_rvlcdip"):
        _, cfg_cls = TASK_CLASS_REGISTRY[name]
        task, cfg = TaskFactory.create_task(
            name, _task_cfg(cfg_cls), device_env=env, monitor=None
        )
        assert task.cfg is cfg


def test_factory_unknown_task():
    with pytest.raises(ValueError):
        TaskFactory.create_task("nope", {}, device_env=None)


# ------------------------------------------------------------------ collates

def test_cord_collate_masking_and_shift():
    from pixparse_tpu.task import TaskCrullerFinetuneCORD, TaskCrullerFinetuneCORDCfg

    env = _env()
    task = TaskCrullerFinetuneCORD(
        _task_cfg(TaskCrullerFinetuneCORDCfg), env, None
    )
    item = {
        "image": _pil_image(),
        "ground_truth": str({"gt_parse": {"menu": {"nm": "latte", "price": "5.00"}}}),
    }
    batch = task.collate_fn([item, item])
    assert batch["image"].shape == (2, 64, 48, 1)
    # collate length = min(512, max_position_embeddings=128), shifted
    assert batch["label"].shape == (2, 127)
    assert batch["text_target"].shape == (2, 127)
    # prompt token (<s_cord>) is never a target; -100 until after prompt end
    assert batch["text_target"][0, 0] != task.tokenizer.convert_tokens_to_ids("<s_cord>")
    # shift: label[i+1] token is predicted at target position i (non-masked head)
    tgt = batch["text_target"][0]
    lbl = batch["label"][0]
    valid = tgt != -100
    idx = np.nonzero(valid)[0]
    np.testing.assert_array_equal(tgt[idx[:-1]], lbl[idx[:-1] + 1])


def test_rvlcdip_collate():
    from pixparse_tpu.task import TaskCrullerFinetuneRVLCDIP, TaskCrullerFinetuneRVLCDIPCfg

    env = _env()
    task = TaskCrullerFinetuneRVLCDIP(
        _task_cfg(TaskCrullerFinetuneRVLCDIPCfg), env, None
    )
    batch = task.collate_fn(
        [{"image": _pil_image(), "label": 3}, {"image": _pil_image(), "label": 15}]
    )
    assert batch["label"].shape == (2, 4)  # max_length 5, shifted
    # class token present in the input sequence
    tok = task.tokenizer.convert_tokens_to_ids("<handwritten/>")
    assert tok in batch["label"][0]


def test_docvqa_collate_answer_only_loss():
    from pixparse_tpu.task import TaskCrullerFinetuneDOCVQA, TaskCrullerFinetuneDOCVQACfg

    env = _env()
    task = TaskCrullerFinetuneDOCVQA(
        _task_cfg(TaskCrullerFinetuneDOCVQACfg), env, None
    )
    qa = "<s_question>what?</s_question><s_answer>42</s_answer>"
    batch = task.collate_fn([{"image": _pil_image(), "labels": [qa]}])
    tgt = batch["text_target"][0]
    lbl = batch["label"][0]
    # everything through <s_answer> masked; answer span supervised
    ans_id = task.tokenizer.convert_tokens_to_ids("<s_answer>")
    ans_pos = int(np.nonzero(lbl == ans_id)[0][0])
    assert (tgt[:ans_pos] == -100).all()
    assert (tgt != -100).sum() > 0


# ------------------------------------------------------------------ training

def test_pretrain_task_end_to_end():
    from pixparse_tpu.task import TaskCrullerPretrain, TaskCrullerPretrainCfg

    env = _env()
    task = TaskCrullerPretrain(_task_cfg(TaskCrullerPretrainCfg), env, None)
    task.train_setup(num_batches_per_interval=4)
    rng = np.random.RandomState(0)
    L = task.max_position_embeddings
    batch = {
        "image": rng.rand(8, 64, 48, 1).astype(np.float32),
        "text": rng.randint(4, 200, (8, L)).astype(np.int64),
        "target": rng.randint(4, 200, (8, L)).astype(np.int64),
    }
    # enough steps that fitting the fixed batch dominates dropout-mask noise
    losses = [float(task.train_step(batch)["loss"]) for _ in range(6)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert task.step_idx == 6

    sd = task.state_dict()
    assert "image_encoder.trunk.patch_embed.proj.weight" in sd
    assert "text_decoder.trunk.model.decoder.embed_tokens.weight" in sd
    assert sd["text_decoder.trunk.model.decoder.embed_tokens.weight"].shape[0] == task.vocab_size


def test_vocab_replay_pretrain_to_finetune():
    """Pretrain checkpoint -> CORD finetune import with vocab growth."""
    from pixparse_tpu.task import (
        TaskCrullerFinetuneCORD,
        TaskCrullerFinetuneCORDCfg,
        TaskCrullerPretrain,
        TaskCrullerPretrainCfg,
    )

    env = _env()
    pre = TaskCrullerPretrain(_task_cfg(TaskCrullerPretrainCfg), env, None)
    pre.train_setup(num_batches_per_interval=2)
    sd = pre.state_dict()

    fin = TaskCrullerFinetuneCORD(_task_cfg(TaskCrullerFinetuneCORDCfg), env, None)
    assert fin.vocab_size > pre.vocab_size  # CORD tokens appended after
    assert fin.vocab_size_base == pre.vocab_size  # replay point matches
    fin.resume_state_dict = sd
    fin.train_setup(num_batches_per_interval=2)
    emb = np.asarray(
        __import__("jax").device_get(
            fin.state.params["text_decoder"]["embed_tokens"]["embedding"]
        )
    )
    assert emb.shape[0] == fin.vocab_size
    # pretrain rows carried over exactly
    np.testing.assert_allclose(
        emb[: pre.vocab_size],
        sd["text_decoder.trunk.model.decoder.embed_tokens.weight"],
        atol=1e-6,
    )


def test_xent_task_train_step():
    from pixparse_tpu.task import TaskCrullerFinetuneXent, TaskCrullerFinetuneXentCfg

    env = _env()
    task = TaskCrullerFinetuneXent(_task_cfg(TaskCrullerFinetuneXentCfg), env, None)
    task.train_setup(num_batches_per_interval=2)
    batch = task.collate_fn(
        [{"image": _pil_image(seed=i), "label": i % 16} for i in range(8)]
    )
    out = task.train_step(batch)
    assert np.isfinite(float(out["loss"]))


# ------------------------------------------------------------------ eval

def test_eval_rvlcdip_step():
    from pixparse_tpu.task import TaskCrullerEvalRVLCDIP, TaskCrullerEvalRVLCDIPCfg

    env = _env()
    task = TaskCrullerEvalRVLCDIP(_task_cfg(TaskCrullerEvalRVLCDIPCfg), env, None)
    task.setup()  # random params, no checkpoint
    batch = task.collate_fn(
        [{"image": _pil_image(seed=i), "label": i % 16} for i in range(2)]
    )
    metrics = task.step(batch)
    c = metrics["classification"]
    assert c["n_valid_samples"] == 2
    assert 0 <= c["correct_samples"] <= 2
    avg = task.average_metrics({0: metrics})
    assert "accuracy" in avg["classification"]


def test_eval_ocr_step_with_generation():
    from pixparse_tpu.task import TaskCrullerEvalOCR, TaskCrullerEvalOCRCfg

    env = _env()
    task = TaskCrullerEvalOCR(_task_cfg(TaskCrullerEvalOCRCfg), env, None)
    task.max_generation_length = 12
    task.setup()
    rng = np.random.RandomState(0)
    images = rng.rand(2, 64, 48, 1).astype(np.float32)
    # reference text: real tokens then pad
    text = np.full((2, 16), task.tokenizer.pad_token_id, np.int64)
    ids = task.tokenizer("hello world", add_special_tokens=False).input_ids
    text[:, : len(ids)] = ids
    metrics = task.step({"image": images, "text": text})
    # random model may emit empty text -> metrics may be empty; both are dicts
    assert isinstance(metrics, dict)


def test_pretrain_train_time_reconstruction(caplog):
    """eval_frequency triggers the OCR reconstruction monitor (and must not
    raise — the reference version had a latent TypeError)."""
    from pixparse_tpu.framework.monitor import Monitor
    from pixparse_tpu.task import TaskCrullerPretrain, TaskCrullerPretrainCfg

    env = _env()
    cfg = _task_cfg(TaskCrullerPretrainCfg, eval_frequency=2)
    mon = Monitor(experiment_name="t", output_dir=None, output_enabled=True)
    task = TaskCrullerPretrain(cfg, env, mon)
    task.train_setup(num_batches_per_interval=4)
    rng = np.random.RandomState(0)
    L = task.max_position_embeddings
    batch = {
        "image": rng.rand(8, 64, 48, 1).astype(np.float32),
        "text": rng.randint(4, 200, (8, L)).astype(np.int64),
        "target": rng.randint(4, 200, (8, L)).astype(np.int64),
    }
    for _ in range(2):
        task.train_step(batch)
    assert task.step_idx == 2  # host-side counter advanced


def test_eval_docvqa_step_and_anls():
    from pixparse_tpu.task import TaskCrullerEvalDOCVQA, TaskCrullerEvalDOCVQACfg

    env = _env()
    task = TaskCrullerEvalDOCVQA(_task_cfg(TaskCrullerEvalDOCVQACfg), env, None)
    task.max_generation_length = 20
    task.setup()
    batch = task.collate_fn([
        {"image": _pil_image(seed=1),
         "labels": {"question": "what is this?", "answers": ["a receipt"]},
         "question_id": 7},
        {"image": _pil_image(seed=2),
         "labels": {"question": "total?", "answers": ["5.00", "$5.00"]},
         "question_id": 8},
    ])
    assert batch["images"].shape == (2, 64, 48, 1)
    task.step(batch)
    assert len(task.all_predictions) == 2
    avg = task.average_metrics({})
    assert "ANLS" in avg and 0.0 <= avg["ANLS"] <= 1.0
    # accumulators reset after averaging
    assert task.all_predictions == []


def test_pretrain_task_with_swin_encoder():
    """Swin-encoder Cruller trains through the same task machinery (incl.
    layer-decay over layers_{s}_blocks_{b} names)."""
    from pixparse_tpu.task import TaskCrullerPretrain, TaskCrullerPretrainCfg

    env = _env()
    cfg = TaskCrullerPretrainCfg(
        model_name="cruller_swin_test",
        tokenizer=LOCAL_TOK,
        opt=OptimizationCfg(learning_rate=1e-3, layer_decay=0.75),
    )
    task = TaskCrullerPretrain(cfg, env, None)
    task.train_setup(num_batches_per_interval=2)
    rng = np.random.RandomState(0)
    L = task.max_position_embeddings
    batch = {
        "image": rng.rand(8, 64, 64, 1).astype(np.float32),
        "text": rng.randint(4, 200, (8, L)).astype(np.int64),
        "target": rng.randint(4, 200, (8, L)).astype(np.int64),
    }
    losses = [float(task.train_step(batch)["loss"]) for _ in range(2)]
    assert np.isfinite(losses).all()
    sd = task.state_dict()
    assert "image_encoder.trunk.layers.0.blocks.0.attn.qkv.weight" in sd


def test_eval_generation_sharded_matches_single_device():
    """Eval decode sharded over the 8-device mesh == single-device decode."""
    from pixparse_tpu.task import TaskCrullerEvalOCR, TaskCrullerEvalOCRCfg

    env = _env()
    task = TaskCrullerEvalOCR(_task_cfg(TaskCrullerEvalOCRCfg), env, None)
    task.max_generation_length = 12
    task.setup()
    rng = np.random.RandomState(0)
    images = rng.rand(8, 64, 48, 1).astype(np.float32)  # divides the mesh
    bos = np.zeros((8, 1), np.int32)
    sharded = task.generate_ids(images, bos, 12)

    # ragged batch: padded to the shard multiple (NOT a single-device
    # fallback), padding rows dropped from the result
    single = task.generate_ids(images[:3], bos[:3], 12)
    assert single.shape[0] == 3
    np.testing.assert_array_equal(sharded[:3], single)

    # padding must actually shard: a 13-row batch pads to 16 over 8 devices
    images13 = np.concatenate([images, images[:5]])
    bos13 = np.zeros((13, 1), np.int32)
    out13 = task.generate_ids(images13, bos13, 12)
    assert out13.shape[0] == 13
    np.testing.assert_array_equal(out13[:8], sharded)
    placed = task._shard_eval_batch(images13, bos13)
    assert placed[0].shape[0] == 16
    assert len(placed[0].sharding.device_set) == 8


def test_train_device_preprocess_matches_host_pipeline():
    """Train device_preprocess: uint8 batches + in-step fused normalize give
    the same loss as host-normalized float batches."""
    from pixparse_tpu.task import TaskCrullerPretrain, TaskCrullerPretrainCfg

    env = _env()
    host = TaskCrullerPretrain(_task_cfg(TaskCrullerPretrainCfg), env, None)
    dev = TaskCrullerPretrain(
        _task_cfg(TaskCrullerPretrainCfg, device_preprocess=True), env, None
    )
    host.train_setup(num_batches_per_interval=2, seed=7)
    dev.train_setup(num_batches_per_interval=2, seed=7)

    rng = np.random.RandomState(0)
    L = host.max_position_embeddings
    img8 = rng.randint(0, 256, (8, 64, 48, 1), np.uint8)
    mean = np.asarray(host.img_mean, np.float32).reshape(1, 1, 1, -1)
    std = np.asarray(host.img_std, np.float32).reshape(1, 1, 1, -1)
    imgf = (img8.astype(np.float32) / 255.0 - mean) / std
    text = rng.randint(4, 200, (8, L)).astype(np.int64)
    target = rng.randint(4, 200, (8, L)).astype(np.int64)

    loss_h = float(host.train_step({"image": imgf, "text": text, "target": target})["loss"])
    loss_d = float(dev.train_step({"image": img8, "text": text, "target": target})["loss"])
    assert loss_h == pytest.approx(loss_d, rel=1e-6)


def test_eval_device_preprocess_matches_host_pipeline():
    """device_preprocess=True: host emits uint8 canvases, normalize fuses
    into the encoder (ops/preprocess.normalize_images) — decoded tokens must
    be identical to the host-normalized path."""
    from pixparse_tpu.task import TaskCrullerEvalOCR, TaskCrullerEvalOCRCfg

    env = _env()
    host = TaskCrullerEvalOCR(_task_cfg(TaskCrullerEvalOCRCfg), env, None)
    dev = TaskCrullerEvalOCR(
        _task_cfg(TaskCrullerEvalOCRCfg, device_preprocess=True), env, None
    )
    host.setup()
    dev.setup()  # both init from PRNGKey(0): identical params

    img = _pil_image(90, 70)
    a = host.prepare_image(img)
    b = dev.prepare_image(img)
    assert a.dtype == np.float32 and b.dtype == np.uint8
    assert a.shape == b.shape

    bos = np.zeros((8, 1), np.int32)
    toks_host = host.generate_ids(np.stack([a] * 8), bos, 10)
    toks_dev = dev.generate_ids(np.stack([b] * 8), bos, 10)
    np.testing.assert_array_equal(toks_host, toks_dev)


def test_pix2struct_pretrain_task_end_to_end():
    """Variable-resolution pretrain: patchified batches train end-to-end."""
    from pixparse_tpu.task import TaskPix2StructPretrain, TaskPix2StructPretrainCfg

    env = _env()
    cfg = TaskPix2StructPretrainCfg(
        model_name="pix2struct_test",
        tokenizer=LOCAL_TOK,
        opt=OptimizationCfg(learning_rate=1e-3),
    )
    task = TaskPix2StructPretrain(cfg, env, None)
    task.train_setup(num_batches_per_interval=2)

    # per-sample host patchify (as the wds pipe would run it), then collate
    from pixparse_tpu.data.wds import default_collate

    rng = np.random.RandomState(0)
    samples = []
    L = task.max_position_embeddings
    for i in range(8):
        img = rng.randint(0, 255, (90 + 7 * i, 60 + 5 * i), np.uint8)  # varied aspect
        patched = task.image_preprocess_train(img)
        txt = rng.randint(4, 200, (L,)).astype(np.int64)
        samples.append((patched, txt, txt.copy()))
    batch = default_collate(samples)
    losses = [float(task.train_step(batch)["loss"]) for _ in range(3)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    sd = task.state_dict()
    assert any(k.startswith("image_encoder.") for k in sd)


def test_pix2struct_task_in_factory():
    from pixparse_tpu.task import TASK_CLASS_REGISTRY

    assert "pix2struct_pretrain" in TASK_CLASS_REGISTRY


def test_pix2struct_auto_remat_off_with_flash():
    """With the varlen flash encoder, pix2struct trains un-rematerialized;
    the auto heuristic must only engage remat for the XLA attention path
    (which needs the (B, H, N, N) fp32 score tensors)."""
    from pixparse_tpu.task.task_pix2struct_pretrain import (
        TaskPix2StructPretrain,
        TaskPix2StructPretrainCfg,
    )

    env = _env()

    def make():
        return TaskPix2StructPretrain(
            TaskPix2StructPretrainCfg(
                model_name="pix2struct_test", tokenizer=LOCAL_TOK,
                opt=OptimizationCfg(learning_rate=1e-3),
            ),
            env, None,
        )

    task = make()
    task.cfg.attn_impl = "flash"
    task.train_setup(num_batches_per_interval=2)
    assert task.model.remat is False

    task2 = make()
    task2.cfg.attn_impl = "xla"
    task2.train_setup(num_batches_per_interval=2)
    # tiny test config stays under the token*depth threshold either way
    expected = task2.vit_cfg.num_tokens * task2.vit_cfg.depth > 20000
    assert task2.model.remat is expected


def test_resolve_remat_flag_mapping():
    """--task.remat string flags -> model remat modes (auto|none|full|dots|mlp)."""
    import pytest as _pytest

    from pixparse_tpu.task.cruller_base import resolve_remat

    assert resolve_remat(None, "mlp") == "mlp"
    assert resolve_remat("auto", False) is False
    assert resolve_remat("none", "mlp") is False
    assert resolve_remat("false", True) is False
    assert resolve_remat("full", False) is True
    assert resolve_remat("true", False) is True
    assert resolve_remat("dots", False) == "dots"
    assert resolve_remat("mlp", False) == "mlp"
    assert resolve_remat("gelu", False) == "gelu"
    assert resolve_remat(True, False) is True
    with _pytest.raises(ValueError):
        resolve_remat("bogus", False)


def test_eval_generate_flash_matches_xla_encode():
    """The eval path now auto-selects flash encode on TPU; the generated
    tokens must be identical (within greedy-argmax stability) to the XLA
    encode for the same weights."""
    from pixparse_tpu.task import TaskCrullerEvalOCR, TaskCrullerEvalOCRCfg

    env = _env()
    rng = np.random.RandomState(0)
    images = rng.rand(2, 64, 48, 1).astype(np.float32)

    def gen(attn_impl):
        task = TaskCrullerEvalOCR(
            _task_cfg(TaskCrullerEvalOCRCfg, attn_impl=attn_impl), env, None
        )
        task.max_generation_length = 10
        task.setup()
        prompt = task.prompt_ids(task.task_start_token, 2)
        return task.generate_ids(images, prompt)

    np.testing.assert_array_equal(gen("xla"), gen("flash"))
