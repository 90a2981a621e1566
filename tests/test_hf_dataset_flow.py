"""hf_dataset-path flows: CORD finetune training + CORD eval through the
HfDatasetLoader (the torch-DataLoader/DistributedSampler replacement), with a
synthetic in-memory dataset."""

import numpy as np
from PIL import Image

from pixparse_tpu.data.datasets_utils import SafeDataset
from pixparse_tpu.data.loader import HfDatasetLoader
from pixparse_tpu.framework.config import OptimizationCfg
from pixparse_tpu.parallel.mesh import MeshEnv
from pixparse_tpu.task import (
    TaskCrullerEvalCORD,
    TaskCrullerEvalCORDCfg,
    TaskCrullerFinetuneCORD,
    TaskCrullerFinetuneCORDCfg,
)
from pixparse_tpu.tokenizers import TokenizerCfg

LOCAL_TOK = TokenizerCfg(name="pixparse_bytelevel")


class FakeCordDataset:
    """Minimal cord-v2-shaped dataset (image + ground_truth gt_parse str)."""

    def __init__(self, n=16, corrupt_indices=()):
        self.n = n
        self.corrupt = set(corrupt_indices)
        self.rng = np.random.RandomState(0)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i in self.corrupt:
            raise OSError("corrupt sample")
        img = Image.fromarray(
            self.rng.randint(0, 255, (90, 70), np.uint8), "L"
        )
        gt = {"gt_parse": {"menu": {"nm": f"item{i}", "price": f"{i}.00"}}}
        return {"image": img, "ground_truth": str(gt)}


def _cfg(cls, **kw):
    import dataclasses

    names = {f.name for f in dataclasses.fields(cls)}
    if "opt" in names:
        kw.setdefault("opt", OptimizationCfg(learning_rate=1e-3))
    return cls(model_name="cruller_test", tokenizer=LOCAL_TOK, **kw)


def test_cord_finetune_via_hf_loader():
    env = MeshEnv.initialize()
    task = TaskCrullerFinetuneCORD(_cfg(TaskCrullerFinetuneCORDCfg), env, None)
    dataset = SafeDataset(FakeCordDataset(24, corrupt_indices={3, 7}))
    loader = HfDatasetLoader(
        dataset, batch_size=8, collate_fn=task.collate_fn, is_train=True,
        seed=0, num_workers=2,
    )
    task.train_setup(num_batches_per_interval=len(loader))
    losses = []
    for batch in loader:
        losses.append(float(task.train_step(batch)["loss"]))
    assert len(losses) >= 2  # 24 samples (some corrupt) / batch 8, drop_last
    assert np.isfinite(losses).all()

    # per-interval reshuffle changes batch order
    loader.set_interval(1)
    first_pass = [idx for idx in loader._indices()]
    loader.set_interval(2)
    second_pass = [idx for idx in loader._indices()]
    assert first_pass != second_pass


def test_cord_eval_via_hf_loader():
    env = MeshEnv.initialize()
    task = TaskCrullerEvalCORD(_cfg(TaskCrullerEvalCORDCfg), env, None)
    task.max_generation_length = 24  # keep CPU decode quick
    task.setup()
    dataset = SafeDataset(FakeCordDataset(4))
    loader = HfDatasetLoader(
        dataset, batch_size=2, collate_fn=task.collate_fn, is_train=False,
        seed=0, num_workers=1,
    )
    all_metrics = {}
    for i, batch in enumerate(loader):
        all_metrics[i] = task.step(batch)
    assert len(all_metrics) == 2
    avg = task.average_metrics(all_metrics)
    assert "average_accuracy" in avg and "f1_score" in avg
    assert 0.0 <= avg["average_accuracy"] <= 1.0


def test_hf_loader_world_striping():
    """Index striping partitions samples disjointly across processes."""
    dataset = FakeCordDataset(20)
    seen = []
    for rank in range(4):
        loader = HfDatasetLoader(
            dataset, batch_size=2, collate_fn=lambda x: x, is_train=False,
            world_size=4, global_rank=rank,
        )
        seen.extend(loader._indices())
    assert sorted(seen) == list(range(20))
