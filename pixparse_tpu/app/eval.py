"""Eval CLI: ``python -m pixparse_tpu.app.eval`` (parity: reference
``app/eval.py``).

Flow: MeshEnv -> TaskFactory -> checkpoint load (local ``.pt``/S3; skipped for
``donut_eval_ocr`` which uses published HF weights) -> metrics filename
derived from checkpoint+dataset name -> eval loader -> ``task.setup()`` ->
``evaluate`` -> metrics JSON dump -> ``task.end()``.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, field, replace
from typing import List

from pixparse_tpu.data import DataCfg, create_loader
from pixparse_tpu.data.wds import create_image_text_pipe
from pixparse_tpu.framework import Monitor, evaluate, random_seed, setup_logging
from pixparse_tpu.framework.cli import ConfigArgumentParser
from pixparse_tpu.parallel.mesh import MeshEnv
from pixparse_tpu.task import TaskFactory
from pixparse_tpu.task.task_factory import TASK_CLASS_REGISTRY

_logger = logging.getLogger("eval")


@dataclass
class EvalCfg:
    experiment: str = ""
    output_dir: str = "./output"
    log_filename: str = "out.log"
    dataset_name: str = ""
    s3_bucket: str = ""
    checkpoint_path: str = ""
    metrics_file_path: str = ""
    task_name: str = ""
    datasets: List[str] = field(default_factory=lambda: ["eval"])
    seed: int = 42


_SUM_KEY_HINTS = ("samples", "count", "num", "correct", "total")


def _merge_metric_trees(trees, key: str = ""):
    """Merge per-host metric trees (hosts evaluate disjoint data shards):
    count-like leaves (name contains samples/count/num/correct/total) are
    SUMMED, other numeric leaves averaged. NOTE: the average is unweighted
    across hosts — with uneven shard sizes (ragged final shards) ratio metrics
    carry a small bias; tasks exposing counts (e.g. rvlcdip accuracy) merge
    exactly."""
    if len(trees) == 1:
        return trees[0]
    first = trees[0]
    if isinstance(first, dict):
        return {
            k: _merge_metric_trees([t[k] for t in trees if k in t], k)
            for k in first
        }
    if isinstance(first, (int, float)):
        vals = [t for t in trees if isinstance(t, (int, float))]
        if any(h in key.lower() for h in _SUM_KEY_HINTS):
            return sum(vals)
        return sum(vals) / max(1, len(vals))
    return first


def eval(cfg: EvalCfg, task, eval_loaders: dict):
    metrics = evaluate(task, eval_loaders)
    device_env = task.device_env
    if device_env.process_count > 1:
        # each host evaluated its data shard; aggregate before reporting
        metrics = _merge_metric_trees(device_env.all_gather_object(metrics))
    if device_env.is_primary():
        with open(cfg.metrics_file_path, "w") as f:
            json.dump(metrics, f)
    return metrics


def main(argv=None):
    import sys

    from pixparse_tpu.framework.cli import peek_flag

    argv = list(sys.argv[1:] if argv is None else argv)
    task_name = peek_flag(argv, "eval.task_name")
    if not task_name or task_name not in TASK_CLASS_REGISTRY:
        raise SystemExit(
            f"--eval.task_name must be one of {sorted(TASK_CLASS_REGISTRY)}"
        )
    _, task_cfg_cls = TASK_CLASS_REGISTRY[task_name]

    parser = ConfigArgumentParser(description="pixparse_tpu eval")
    parser.add_arguments(EvalCfg, dest="eval")
    parser.add_arguments(task_cfg_cls, dest="task")
    parser.add_arguments(DataCfg, dest="data")
    args = parser.parse_args(argv)
    eval_cfg: EvalCfg = args.eval
    data_cfg: DataCfg = args.data

    mesh_cfg = getattr(args.task, "mesh", None)
    device_env = MeshEnv.initialize(
        data=mesh_cfg.data if mesh_cfg else 0,
        fsdp=mesh_cfg.fsdp if mesh_cfg else 1,
        model=mesh_cfg.model if mesh_cfg else 1,
    )
    task, task_cfg = TaskFactory.create_task(
        task_name=eval_cfg.task_name,
        task_args=args.task,
        device_env=device_env,
        monitor=None,
    )
    random_seed(eval_cfg.seed, rank=device_env.global_rank)
    _logger.info(f"Device env is {device_env}")

    assert eval_cfg.output_dir is not None, "output_dir is not provided."
    os.makedirs(eval_cfg.output_dir, exist_ok=True)
    if device_env.is_primary():
        setup_logging(os.path.join(eval_cfg.output_dir, eval_cfg.log_filename))
    task.monitor = Monitor(
        eval_cfg.experiment,
        output_dir=eval_cfg.output_dir,
        output_enabled=device_env.is_primary(),
    )

    if eval_cfg.task_name not in ["donut_eval_ocr"]:
        checkpoint_path = eval_cfg.checkpoint_path
        if eval_cfg.s3_bucket != "":
            from pixparse_tpu.utils.s3_utils import load_checkpoint_from_s3

            _logger.info("s3 bucket specified. Loading checkpoint from s3.")
            checkpoint = load_checkpoint_from_s3(eval_cfg.s3_bucket, checkpoint_path)
        else:
            assert os.path.isfile(
                checkpoint_path
            ), f"Cannot find checkpoint {checkpoint_path}: File not found"
            from pixparse_tpu.models.torch_interop import load_torch_checkpoint

            checkpoint = load_torch_checkpoint(checkpoint_path)
        task.resume_state_dict = checkpoint

        checkpoint_name = eval_cfg.checkpoint_path.replace("/", "_").replace(".pt", "")
        metrics_file_name = f"{checkpoint_name}-{eval_cfg.dataset_name}-metrics.json"
    else:
        metrics_file_name = f"{eval_cfg.task_name}-{eval_cfg.dataset_name}-metrics.json"

    eval_cfg = replace(
        eval_cfg,
        metrics_file_path=os.path.join(eval_cfg.output_dir, metrics_file_name),
    )

    if device_env.is_primary():
        _logger.info(task_cfg)
        _logger.info(eval_cfg)

    assert data_cfg.eval is not None, "data_cfg.eval is not set."
    loaders = {}
    # one loader per requested dataset identifier (default ['eval']); tasks
    # filter loaders by name in prepare_for_evaluation
    for loader_name in (eval_cfg.datasets or ["eval"]):
        loaders[loader_name] = create_loader(
            data_cfg.eval,
            is_train=False,
            collate_fn=task.collate_fn,
            image_preprocess=getattr(task, "image_preprocess_eval", None),
            anno_preprocess=getattr(task, "anno_preprocess_eval", None),
            image_fmt=task_cfg.model.image_encoder.image_fmt,
            seed=eval_cfg.seed,
            world_size=device_env.world_size,
            global_rank=device_env.global_rank,
            create_decoder_pipe=create_image_text_pipe,
        )

    task.setup()
    if device_env.is_primary():
        _logger.info(task)

    metrics = eval(eval_cfg, task, loaders)
    _logger.info("eval metrics: %s", metrics)
    task.end()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
