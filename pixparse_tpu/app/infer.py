"""Batch inference CLI: ``python -m pixparse_tpu.app.infer``.

Production serving entry point (no reference counterpart — upstream users
run inference by abusing the eval tasks over webdataset shards; see
``/root/reference/src/pixparse/app/eval.py`` + ``task_cruller_eval_ocr.py``,
which require annotation files even for pure inference). This CLI takes a
directory / glob of page images, batches them through the jitted KV-cached
decode, and writes one JSON line per page:

    python -m pixparse_tpu.app.infer \\
        --infer.task_name cruller_eval_ocr \\
        --infer.checkpoint_path ./checkpoint-29.pt \\
        --infer.images './pages/*.png' \\
        --infer.output ./ocr.jsonl \\
        --task.model_name cruller_base ...

Tasks: any eval task in the registry. OCR emits ``{"file", "text"}``;
JSON-completion tasks (cord/rvlcdip/docvqa) additionally emit the parsed
``"json"`` via token2json. The final partial batch is padded (repeat-last)
so every compiled program sees full static shapes — decode stays sharded
over the mesh.
"""

from __future__ import annotations

import glob
import json
import logging
import os
from dataclasses import dataclass, replace
from typing import List, Optional

from pixparse_tpu.framework import random_seed, setup_logging
from pixparse_tpu.framework.cli import ConfigArgumentParser
from pixparse_tpu.parallel.mesh import MeshEnv
from pixparse_tpu.task.task_factory import TASK_CLASS_REGISTRY

_logger = logging.getLogger("infer")

_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp", ".webp")


@dataclass
class InferCfg:
    task_name: str = "cruller_eval_ocr"
    checkpoint_path: str = ""
    images: str = ""  # directory or glob of page images
    output: str = ""  # output JSONL path ('' or '-' = stdout)
    batch_size: int = 16
    max_new_tokens: int = 0  # 0 = task default generation length
    prompt: str = ""  # override the task prompt token/text
    seed: int = 42
    # continuous batching (ops/serving.py): finished decode slots are
    # refilled mid-stream on-device from a staged pool instead of waiting
    # for the batch's slowest page — higher throughput whenever page text
    # lengths vary (the refill decision runs inside one jitted program, so
    # remote-TPU dispatch latency does not tax it)
    continuous: bool = False
    refill_size: int = 0  # encode batch for pool staging (0 = batch_size)
    # accepted for compatibility; the device-resident serve loop refills
    # per-step now (ops/serving.py), so this knob is inert
    chunk_steps: int = 16
    pool_pages: int = 0  # pages staged per pool group (0 = 2*batch_size)


def _list_images(spec: str) -> List[str]:
    if os.path.isdir(spec):
        files = [
            os.path.join(spec, f)
            for f in sorted(os.listdir(spec))
            if f.lower().endswith(_IMAGE_EXTS)
        ]
    else:
        files = sorted(glob.glob(spec))
    if not files:
        raise FileNotFoundError(f"no images match {spec!r}")
    return files


def _maybe_json(text: str) -> Optional[dict]:
    """Parse generated markup into a dict for JSON-completion tasks."""
    from pixparse_tpu.utils.json_utils import token2json

    try:
        out = token2json(text)
    except Exception:  # malformed generation — raw text still emitted
        return None
    return out if out else None


def infer(infer_cfg: InferCfg, task_cfg) -> int:
    import numpy as np
    from PIL import Image

    env = MeshEnv.initialize(
        data=getattr(task_cfg.mesh, "data", 0),
        fsdp=getattr(task_cfg.mesh, "fsdp", 1),
        model=getattr(task_cfg.mesh, "model", 1),
    )
    random_seed(infer_cfg.seed, env.global_rank)
    task_cls, _ = TASK_CLASS_REGISTRY[infer_cfg.task_name]
    task = task_cls(task_cfg, env, None)

    if infer_cfg.checkpoint_path:
        import torch

        checkpoint = torch.load(
            infer_cfg.checkpoint_path, map_location="cpu", weights_only=False
        )
        if isinstance(checkpoint, dict) and "model" in checkpoint:
            checkpoint = checkpoint["model"]
        task.resume_state_dict = checkpoint
        _logger.info("loaded checkpoint %s", infer_cfg.checkpoint_path)
    else:
        _logger.warning("no --infer.checkpoint_path: running random weights")
    task.setup()

    files = _list_images(infer_cfg.images)
    _logger.info("%d images", len(files))
    bs = max(1, infer_cfg.batch_size)
    prompt = infer_cfg.prompt or task.task_start_token

    emit_json = infer_cfg.task_name != "cruller_eval_ocr"
    records = []

    def _clean(text: str) -> str:
        # strip only the structural frame — the leading prompt prefix and
        # the trailing EOS — never interior occurrences of either string
        # (generated text may legitimately contain them)
        clean = text
        if prompt and clean.startswith(prompt):
            clean = clean[len(prompt):]
        eos = task.tokenizer.eos_token or ""
        if eos and clean.endswith(eos):
            clean = clean[: -len(eos)]
        return clean.strip()

    def _record(f: str, text: str) -> dict:
        rec = {"file": f, "text": _clean(text)}
        if emit_json:
            parsed = _maybe_json(rec["text"])
            if parsed is not None:
                rec["json"] = parsed
        return rec

    if infer_cfg.continuous:
        pages = ((f, task.prepare_image(Image.open(f))) for f in files)
        stream = task.generate_text_stream(
            pages, prompt,
            slots=bs,
            max_new_tokens=infer_cfg.max_new_tokens or None,
            refill_size=infer_cfg.refill_size or bs,
            chunk_steps=infer_cfg.chunk_steps,
            pool_pages=infer_cfg.pool_pages or None,
        )
        by_file = {}
        for i, (f, text) in enumerate(stream, 1):
            by_file[f] = _record(f, text)
            if i % bs == 0 or i == len(files):
                _logger.info("%d/%d pages done", i, len(files))
        records = [by_file[f] for f in files]  # input order in the JSONL
    else:
        records = _infer_batched(infer_cfg, task, files, prompt, bs, _record)

    out = infer_cfg.output
    lines = [json.dumps(r, ensure_ascii=False) for r in records]
    if env.is_primary():
        if out and out != "-":
            os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
            with open(out, "w") as f:
                f.write("\n".join(lines) + "\n")
            _logger.info("wrote %s (%d records)", out, len(records))
        else:
            for line in lines:
                print(line)
    task.end()
    return 0


def _infer_batched(infer_cfg, task, files, prompt, bs, _record):
    import numpy as np
    from PIL import Image

    records = []
    for lo in range(0, len(files), bs):
        chunk = files[lo:lo + bs]
        n = len(chunk)
        padded = chunk + [chunk[-1]] * (bs - n)  # static shapes for the jit
        images = np.stack(
            [task.prepare_image(Image.open(f)) for f in padded]
        )
        prompt_ids = task.prompt_ids(prompt, bs)
        # max_new_tokens counts GENERATED tokens; generate() takes the total
        # sequence length (prompt included)
        max_len = (
            prompt_ids.shape[1] + infer_cfg.max_new_tokens
            if infer_cfg.max_new_tokens
            else None
        )
        texts = task.generate_text(images, prompt_ids, max_length=max_len)[:n]
        for f, text in zip(chunk, texts):
            records.append(_record(f, text))
        _logger.info("%d/%d pages done", min(lo + bs, len(files)), len(files))
    return records


def main(argv=None) -> int:
    import sys

    from pixparse_tpu.framework.cli import peek_flag

    argv = list(sys.argv[1:] if argv is None else argv)
    task_name = peek_flag(argv, "infer.task_name") or "cruller_eval_ocr"
    from pixparse_tpu.task.cruller_base import BaseCrullerEvalTask

    eval_tasks = sorted(
        n for n, (cls, _) in TASK_CLASS_REGISTRY.items()
        if isinstance(cls, type) and issubclass(cls, BaseCrullerEvalTask)
    )
    if task_name not in eval_tasks:
        raise SystemExit(f"--infer.task_name must be one of {eval_tasks}")
    _, task_cfg_cls = TASK_CLASS_REGISTRY[task_name]

    parser = ConfigArgumentParser(description="pixparse_tpu batch inference")
    parser.add_arguments(InferCfg, dest="infer")
    parser.add_arguments(task_cfg_cls, dest="task")
    args = parser.parse_args(argv)
    infer_cfg: InferCfg = replace(args.infer, task_name=task_name)

    setup_logging(None)
    return infer(infer_cfg, args.task)


if __name__ == "__main__":
    raise SystemExit(main())
