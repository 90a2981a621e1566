"""Eval driver (parity: reference ``framework/eval.py:4-24``)."""

from __future__ import annotations

from collections import defaultdict

from pixparse_tpu.framework.task import TaskEval


def evaluate(task: TaskEval, loaders):
    metrics = defaultdict(dict)
    eval_loaders = task.prepare_for_evaluation(loaders)
    for key, loader in eval_loaders.items():
        for batch_idx, sample in enumerate(loader.loader):
            metrics[key][batch_idx] = task.step(sample)
        if hasattr(task, "average_metrics"):
            averaged = task.average_metrics(metrics[key])
            metrics[key] = {"average": averaged}
    return dict(metrics)
