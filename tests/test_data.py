"""Data plane tests: tokenizer, preprocessing, wds reader, transforms, loader."""

import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image, ImageDraw

from pixparse_tpu.data import (
    DatasetCfg,
    braceexpand,
    create_doc_anno_pipe,
    create_loader,
    create_transforms,
    create_wds_loader,
    expand_shards,
    preprocess_ocr_anno,
    preprocess_text_anno,
    text_input_to_target,
)
from pixparse_tpu.data.wds import iter_tar_samples
from pixparse_tpu.tokenizers import TokenizerCfg, TokenizerHF


@pytest.fixture(scope="module")
def tok():
    t = TokenizerHF(TokenizerCfg(name="pixparse_bytelevel")).trunk
    t.add_special_tokens(
        {"additional_special_tokens": ["<s_pretrain>", "<sep/>", "<s_answer>"]}
    )
    return t


def _make_page_image(text: str, size=(96, 128)) -> Image.Image:
    img = Image.new("L", size, 255)
    d = ImageDraw.Draw(img)
    d.text((4, 4), text, fill=0)
    return img


def _write_shard(path, n_samples, start=0):
    with tarfile.open(path, "w") as tf:
        for i in range(start, start + n_samples):
            img = _make_page_image(f"doc {i}")
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            img_bytes = buf.getvalue()
            info = tarfile.TarInfo(f"sample{i:04d}.png")
            info.size = len(img_bytes)
            tf.addfile(info, io.BytesIO(img_bytes))
            anno = json.dumps(
                {"pages": [{"text": [f"hello document {i}", "line two"]}]}
            ).encode()
            info = tarfile.TarInfo(f"sample{i:04d}.json")
            info.size = len(anno)
            tf.addfile(info, io.BytesIO(anno))


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    _write_shard(d / "shard-0000.tar", 8, 0)
    _write_shard(d / "shard-0001.tar", 8, 8)
    return d


def test_braceexpand():
    assert braceexpand("s-{0000..0002}.tar") == ["s-0000.tar", "s-0001.tar", "s-0002.tar"]
    assert braceexpand("x{a,b}y") == ["xay", "xby"]
    assert braceexpand("plain.tar") == ["plain.tar"]
    assert len(expand_shards("a-{00..01}.tar::b.tar")) == 3


def test_preprocess_text_anno(tok):
    out = preprocess_text_anno(
        "hello world",
        tokenizer=tok,
        max_position_embeddings=32,
        task_start_token="<s_pretrain>",
        prompt_end_token="<s_pretrain>",
    )
    text, target = out["text"][0], out["target"][0]
    assert text.shape == (32,) and target.shape == (32,)
    assert text[0] == tok.convert_tokens_to_ids("<s_pretrain>")
    # task token masked, pads masked
    assert target[0] == -100
    assert (target[text == tok.pad_token_id] == -100).all()
    # content tokens survive
    assert (target != -100).sum() > 0


def test_preprocess_prompt_end_masking(tok):
    """DocVQA-style: loss only after <s_answer>."""
    q = "<s_pretrain>what? <s_answer>42"
    out = preprocess_text_anno(
        q.replace("<s_pretrain>", ""),
        tokenizer=tok,
        max_position_embeddings=32,
        task_start_token="<s_pretrain>",
        prompt_end_token="<s_answer>",
    )
    text, target = out["text"][0], out["target"][0]
    ans_pos = int(np.nonzero(text == tok.convert_tokens_to_ids("<s_answer>"))[0][0])
    assert (target[: ans_pos + 1] == -100).all()
    assert (target[ans_pos + 1:][text[ans_pos + 1:] != tok.pad_token_id] != -100).all()


def test_preprocess_ocr_anno_page_sampling(tok):
    anno = {"pages": [{"text": []}, {"text": ["page one text"]}]}
    rng = np.random.RandomState(0)
    out, info = preprocess_ocr_anno(
        anno,
        tokenizer=tok,
        max_position_embeddings=32,
        task_start_token="<s_pretrain>",
        prompt_end_token="<s_pretrain>",
        generator=rng,
    )
    assert info["page_indices"] == [1]  # empty page skipped
    assert info["orig_text"] == "page one text"
    assert info["num_pages"] == 2


def test_preprocess_ocr_anno_all_empty(tok):
    anno = {"pages": [{"text": []}, {"text": []}]}
    with pytest.raises(RuntimeError):
        preprocess_ocr_anno(
            anno, tokenizer=tok, max_position_embeddings=32,
            task_start_token="<s_pretrain>", prompt_end_token="<s_pretrain>",
            generator=np.random.RandomState(0),
        )


def test_text_input_to_target(tok):
    ids = tok("<s_pretrain>abc</s>", add_special_tokens=False, return_tensors="np",
              max_length=16, padding="max_length").input_ids[0]
    tgt = text_input_to_target(ids, tok, "<s_pretrain>")
    assert tgt[0] == -100
    assert (tgt[ids == tok.pad_token_id] == -100).all()


def test_iter_tar_samples(shard_dir):
    samples = list(iter_tar_samples(str(shard_dir / "shard-0000.tar")))
    assert len(samples) == 8
    assert set(samples[0]) >= {"__key__", "png", "json"}


def test_wds_loader_end_to_end(shard_dir, tok):
    from functools import partial

    anno_fn = partial(
        preprocess_ocr_anno,
        tokenizer=tok,
        max_position_embeddings=32,
        task_start_token="<s_pretrain>",
        prompt_end_token="<s_pretrain>",
        generator=np.random.RandomState(0),
    )
    image_fn = create_transforms("legacy", (64, 48), training=True)
    decoder = create_doc_anno_pipe(image_fn, anno_fn, image_fmt="L")
    bundle = create_wds_loader(
        str(shard_dir / "shard-{0000..0001}.tar"),
        decoder,
        is_train=True,
        num_samples=16,
        workers=2,
        batch_size=4,
        seed=0,
    )
    assert bundle.num_batches == 4
    batches = list(bundle.loader)
    assert len(batches) == 4
    img, text, target = batches[0]
    assert img.shape == (4, 64, 48, 1) and img.dtype == np.float32
    assert text.shape == (4, 32) and target.shape == (4, 32)
    # interval reshuffle changes batch composition
    bundle.set_interval(1)
    batches2 = list(bundle.loader)
    assert len(batches2) == 4


def test_wds_loader_eval_single_pass(shard_dir, tok):
    from functools import partial

    anno_fn = partial(
        preprocess_ocr_anno,
        tokenizer=tok,
        max_position_embeddings=32,
        task_start_token="<s_pretrain>",
        prompt_end_token="<s_pretrain>",
        generator=np.random.RandomState(0),
    )
    image_fn = create_transforms("legacy", (64, 48), training=False)
    decoder = create_doc_anno_pipe(image_fn, anno_fn, image_fmt="L")
    bundle = create_wds_loader(
        str(shard_dir / "shard-0000.tar"), decoder,
        is_train=False, num_samples=8, workers=1, batch_size=3, seed=0,
    )
    batches = list(bundle.loader)
    total = sum(b[0].shape[0] for b in batches)
    assert total == 8  # every sample exactly once, partial final batch kept


def test_wds_world_split(shard_dir, tok):
    """Two processes see disjoint shards."""
    from functools import partial

    anno_fn = partial(
        preprocess_ocr_anno, tokenizer=tok, max_position_embeddings=32,
        task_start_token="<s_pretrain>", prompt_end_token="<s_pretrain>",
        generator=np.random.RandomState(0),
    )
    image_fn = create_transforms("legacy", (64, 48), training=False)
    decoder = create_doc_anno_pipe(image_fn, anno_fn, image_fmt="L")
    seen = []
    for rank in (0, 1):
        bundle = create_wds_loader(
            str(shard_dir / "shard-{0000..0001}.tar"), decoder,
            is_train=False, num_samples=16, workers=1, batch_size=4,
            seed=0, world_size=2, global_rank=rank,
        )
        texts = [b[1] for b in bundle.loader]
        seen.append(np.concatenate(texts).tobytes())
    assert seen[0] != seen[1]


def test_transforms_shapes():
    img = _make_page_image("hello", (200, 100))
    for name in ("legacy", "better", "nougat"):
        for training in (False, True):
            fn = create_transforms(
                name, (64, 48), training=training,
                crop_margin=(name != "legacy"), align_long_axis=(name != "legacy"),
                seed=0,
            )
            out = fn(img)
            assert out.shape == (64, 48, 1), (name, training, out.shape)
            assert out.dtype == np.float32
            assert np.isfinite(out).all()


def test_transforms_rgb():
    img = Image.new("RGB", (100, 80), (255, 255, 255))
    fn = create_transforms("better", (64, 48), training=True,
                           image_mean=(0.5,) * 3, image_std=(0.5,) * 3, seed=0)
    out = fn(img)
    assert out.shape == (64, 48, 3)


def test_create_loader_webdataset(shard_dir, tok):
    from functools import partial

    cfg = DatasetCfg(
        source=str(shard_dir / "shard-{0000..0001}.tar"),
        num_samples=16, batch_size=4, split="train", format="webdataset",
        num_workers=2,
    )
    anno_fn = partial(
        preprocess_ocr_anno, tokenizer=tok, max_position_embeddings=32,
        task_start_token="<s_pretrain>", prompt_end_token="<s_pretrain>",
        generator=np.random.RandomState(0),
    )
    image_fn = create_transforms("legacy", (64, 48), training=True)
    bundle = create_loader(cfg, is_train=True, image_preprocess=image_fn,
                           anno_preprocess=anno_fn)
    batch = next(iter(bundle.loader))
    assert batch[0].shape == (4, 64, 48, 1)


def test_wds_interval_determinism(shard_dir, tok):
    """Same interval -> identical batch stream (resumable shuffling);
    different interval -> different order (parity: chug set_interval,
    app/train.py:57)."""
    from functools import partial

    from pixparse_tpu.data.preprocess import preprocess_ocr_anno
    from pixparse_tpu.data.wds import create_doc_anno_pipe, create_wds_loader

    anno_pre = partial(
        preprocess_ocr_anno, tokenizer=tok, max_position_embeddings=32,
        task_start_token="<s>", prompt_end_token="<s>",
    )
    img_pre = lambda im: np.zeros((8, 8, 1), np.float32)
    decoder = create_doc_anno_pipe(image_preprocess=img_pre, anno_preprocess=anno_pre)

    def texts_for_interval(i):
        bundle = create_wds_loader(
            str(shard_dir / "shard-{0000..0001}.tar"), decoder,
            is_train=True, num_samples=16, workers=1, batch_size=4, seed=7,
        )
        bundle.set_interval(i)
        out = []
        for batch in bundle.loader:
            out.append(np.asarray(batch[1]))
        return np.concatenate(out)

    a = texts_for_interval(3)
    b = texts_for_interval(3)
    c = texts_for_interval(4)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_pipe_source_matches_direct(shard_dir):
    """``pipe:cmd`` subprocess sources (reference: ``pipe:aws s3 cp …``,
    README.md:21) yield byte-identical sample streams to direct files —
    through the readahead thread that keeps the subprocess streaming while
    the consumer transforms (wds._ReadaheadStream)."""
    from pixparse_tpu.data.wds import iter_tar_samples

    direct = list(iter_tar_samples(str(shard_dir / "shard-0000.tar")))
    piped = list(iter_tar_samples("pipe:cat " + str(shard_dir / "shard-0000.tar")))
    assert [s["__key__"] for s in direct] == [s["__key__"] for s in piped]
    for a, b in zip(direct, piped):
        for k in a:
            if k == "__url__":
                continue
            assert a[k] == b[k], k

    # abandoning a pipe mid-shard must not hang (readahead close protocol)
    it = iter_tar_samples("pipe:cat " + str(shard_dir / "shard-0001.tar"))
    next(it)
    it.close()


def test_get_additional_tokens_from_dataset():
    from pixparse_tpu.data.datasets_utils import get_additional_tokens_from_dataset

    samples = [
        {"ground_truth": str({"gt_parse": {"menu": {"nm": "a", "cnt": "1"}}})},
        {"ground_truth": str({"gt_parse": {"total": {"total_price": "5"}}})},
    ]
    tokens = get_additional_tokens_from_dataset([], dataset=samples)
    assert "<s_menu>" in tokens and "</s_menu>" in tokens
    assert "<s_total_price>" in tokens


def test_better_transform_train_stochastic_eval_deterministic():
    from pixparse_tpu.data.transforms import create_transforms

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (100, 80), np.uint8)
    ev = create_transforms("better", (64, 48), training=False, image_mean=0.5, image_std=0.5)
    a, b = ev(img), ev(img)
    np.testing.assert_array_equal(a, b)  # eval path deterministic
    assert a.shape == (64, 48, 1)

    tr = create_transforms("better", (64, 48), training=True, image_mean=0.5, image_std=0.5, seed=0)
    outs = [tr(img) for _ in range(4)]
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])  # jitter active


def test_custom_vqa_dataset_reference_layout(tmp_path):
    """Reference directory layout: root/{split}/processed_train_v1.0.json
    with {image_id: [qa strings]} and images beside the json."""
    import json as _json

    from PIL import Image as PILImage

    from pixparse_tpu.data.datasets_utils import CustomVQADataset

    split_dir = tmp_path / "train"
    split_dir.mkdir()
    (split_dir / "documents").mkdir()
    img_rel = "documents/doc1.png"
    PILImage.fromarray(np.zeros((10, 10), np.uint8), "L").save(split_dir / img_rel)
    (split_dir / "processed_train_v1.0.json").write_text(
        _json.dumps({img_rel: ["<s_question>q</s_question><s_answer>a</s_answer>"]})
    )
    ds = CustomVQADataset(root_dir=str(tmp_path), split="train")
    assert len(ds) == 1
    item = ds[0]
    assert item["labels"][0].startswith("<s_question>")
    assert item["image"].size == (10, 10)


def test_crop_margin_reference_threshold():
    from pixparse_tpu.data.transforms import crop_margin

    img = np.full((50, 40), 255, np.uint8)
    img[10:20, 5:15] = 180  # light-gray content (norm ~0.7 < 200/255)
    out = crop_margin(img)
    assert out.shape == (10, 10)  # light-gray treated as ink, kept


def test_align_long_axis_clockwise():
    from pixparse_tpu.data.transforms import align_long_axis

    img = np.zeros((10, 20), np.uint8)
    img[0, 0] = 255  # top-left marker
    out = align_long_axis(img, (20, 10))  # portrait canvas, landscape image
    assert out.shape == (20, 10)
    # clockwise rotation: top-left -> top-right
    assert out[0, -1] == 255
