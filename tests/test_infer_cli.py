"""Batch-inference CLI: images in -> JSONL out, through the real jitted
KV-cached decode on the virtual mesh (full static-shape batching incl. the
padded final batch)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from pixparse_tpu.app.infer import main as infer_main


@pytest.fixture(scope="module")
def pages(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    rng = np.random.RandomState(0)
    for i in range(5):  # 5 pages at batch 4 -> exercises final-batch padding
        img = Image.fromarray(rng.randint(0, 255, (64, 48), np.uint8), "L")
        img.save(d / f"page-{i:02d}.png")
    return str(d)


def test_infer_cli_ocr_jsonl(pages, tmp_path):
    out = str(tmp_path / "ocr.jsonl")
    rc = infer_main([
        "--infer.task_name", "cruller_eval_ocr",
        "--infer.images", pages,
        "--infer.output", out,
        "--infer.batch_size", "4",
        "--infer.max_new_tokens", "8",
        "--task.model_name", "cruller_test",
        "--task.tokenizer.name", "pixparse_bytelevel",
        "--task.dtype", "float32",
    ])
    assert rc == 0
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 5
    recs = [json.loads(l) for l in lines]
    assert [os.path.basename(r["file"]) for r in recs] == [
        f"page-{i:02d}.png" for i in range(5)
    ]
    for r in recs:
        assert "text" in r  # random weights -> arbitrary text, but present


def test_infer_cli_unknown_task():
    with pytest.raises(SystemExit):
        infer_main(["--infer.task_name", "nope", "--infer.images", "/tmp"])


def test_infer_cli_cord_json_field(pages, tmp_path):
    """JSON-completion tasks decode through token2json; with random weights
    the parse may be empty, but the record schema must hold."""
    out = str(tmp_path / "cord.jsonl")
    rc = infer_main([
        "--infer.task_name", "cruller_eval_cord",
        "--infer.images", pages,
        "--infer.output", out,
        "--infer.batch_size", "5",
        "--infer.max_new_tokens", "8",
        "--task.model_name", "cruller_test",
        "--task.tokenizer.name", "pixparse_bytelevel",
        "--task.dtype", "float32",
    ])
    assert rc == 0
    recs = [json.loads(l) for l in open(out).read().strip().splitlines()]
    assert len(recs) == 5
    for r in recs:
        assert "text" in r
        if "json" in r:
            assert isinstance(r["json"], (dict, list))


def test_maybe_json_parses_wellformed_markup():
    """The CORD token markup must round-trip into the 'json' field (the
    original call passed a nonexistent kwarg and silently never parsed)."""
    from pixparse_tpu.app.infer import _maybe_json

    out = _maybe_json("<s_menu><s_nm>latte</s_nm><s_cnt>2</s_cnt></s_menu>")
    assert out == {"menu": {"nm": "latte", "cnt": "2"}}
    # tag-free text falls back to token2json's text_sequence wrapper
    assert _maybe_json("plain") == {"text_sequence": "plain"}


def test_infer_cli_continuous_matches_batched(pages, tmp_path):
    """--infer.continuous routes through ops/serving.py and must produce the
    same per-file text as the batched path (greedy, same weights/seed)."""
    out_b = str(tmp_path / "batched.jsonl")
    out_c = str(tmp_path / "continuous.jsonl")
    common = [
        "--infer.task_name", "cruller_eval_ocr",
        "--infer.images", pages,
        "--infer.max_new_tokens", "8",
        "--task.model_name", "cruller_test",
        "--task.tokenizer.name", "pixparse_bytelevel",
        "--task.dtype", "float32",
    ]
    assert infer_main(common + [
        "--infer.output", out_b, "--infer.batch_size", "5",
    ]) == 0
    assert infer_main(common + [
        "--infer.output", out_c, "--infer.batch_size", "2",
        "--infer.continuous", "true",
        "--infer.refill_size", "2", "--infer.chunk_steps", "3",
    ]) == 0
    batched = {r["file"]: r["text"] for r in map(json.loads, open(out_b))}
    continuous = {r["file"]: r["text"] for r in map(json.loads, open(out_c))}
    assert batched == continuous
