"""Loader factory (parity: reference ``data/loader.py:24-119``).

One ``create_loader`` over two formats:

- ``webdataset``: first-party tar pipeline (:mod:`pixparse_tpu.data.wds`),
  shard-split per host process.
- ``hf_dataset``: HF ``datasets`` (or local :class:`CustomVQADataset`),
  wrapped in :class:`SafeDataset`; cross-host sharding is index striping by
  process (the jax-native replacement for ``DistributedSampler``), batching +
  task collate in a thread-prefetched iterator.

Both return a :class:`LoaderBundle` (``loader`` / ``num_batches`` /
``num_samples`` / ``set_interval``).
"""

from __future__ import annotations

import logging
import queue
import random
import threading
from typing import Callable, Optional

from pixparse_tpu.data.config import DatasetCfg
from pixparse_tpu.data.datasets_utils import CustomVQADataset, SafeDataset
from pixparse_tpu.data.wds import (
    LoaderBundle,
    create_doc_anno_pipe,
    create_wds_loader,
    default_collate,
)

_logger = logging.getLogger(__name__)


class HfDatasetLoader:
    """Batched iterator over an indexable dataset with per-process striping.

    Train: per-interval shuffle of this process's indices, drop_last.
    Eval: deterministic order, final partial batch kept.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        is_train: bool,
        seed: int = 0,
        world_size: int = 1,
        global_rank: int = 0,
        num_workers: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn or default_collate
        self.is_train = is_train
        self.seed = seed
        self.world_size = max(1, world_size)
        self.global_rank = global_rank
        self.num_workers = max(1, num_workers)
        self.interval = 0

    def set_interval(self, interval: int):
        self.interval = interval

    set_epoch = set_interval

    def _indices(self):
        n = len(self.dataset)
        order = list(range(n))
        if self.is_train:
            random.Random(self.seed + self.interval).shuffle(order)
        return order[self.global_rank::self.world_size]

    def __len__(self):
        per_proc = len(self._indices())
        if self.is_train:
            return per_proc // self.batch_size
        return -(-per_proc // self.batch_size)

    def __iter__(self):
        indices = self._indices()
        batches = [
            indices[i:i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.is_train:
            batches = [b for b in batches if len(b) == self.batch_size]

        # thread-prefetch: fetch+collate next batches while the device steps
        q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 2)
        stop = threading.Event()

        n = len(self.dataset)
        backfill_rng = random.Random(self.seed * 7919 + self.interval)

        def fetch_one(i):
            item = self.dataset[i]
            retries = 0
            while item is None and self.is_train and retries < 50:
                item = self.dataset[backfill_rng.randrange(n)]
                retries += 1
            if item is None and self.is_train:
                # a ragged train batch would break static batch sharding;
                # 50 failed draws means the dataset is essentially unreadable
                raise RuntimeError(
                    "could not backfill a corrupt sample after 50 draws — "
                    "dataset appears mostly unreadable"
                )
            return item

        # PIL/cv2/tokenizers release the GIL: fetch a batch's items in a
        # small pool (the reference gets this from DataLoader workers)
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def fetch(idx_list):
            """Fetch items, replacing corrupt (None) samples so train batches
            stay full (deviation from the reference's filter-only SafeDataset
            handling, which torch collate tolerated)."""
            return [x for x in pool.map(fetch_one, idx_list) if x is not None]

        def producer():
            try:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    items = fetch(batch_idx)
                    if not items:
                        continue
                    q.put(self.collate_fn(items))
            except Exception as e:  # surface in the consumer, don't end silently
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False, cancel_futures=True)
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def create_loader(
    cfg: DatasetCfg,
    is_train: bool,
    image_preprocess: Optional[Callable] = None,
    anno_preprocess: Optional[Callable] = None,
    collate_fn: Optional[Callable] = None,
    image_key: str = "pdf;tif;tiff;png;jpg;jpeg",
    image_fmt: str = "L",
    start_interval: int = 0,
    seed: int = 0,
    world_size: int = 1,
    global_rank: int = 0,
    create_decoder_pipe: Callable = create_doc_anno_pipe,
) -> LoaderBundle:
    if cfg.format == "webdataset":
        decoder = create_decoder_pipe(
            image_preprocess=image_preprocess,
            anno_preprocess=anno_preprocess,
            image_key=image_key,
            image_fmt=image_fmt,
        )
        bundle = create_wds_loader(
            cfg.source,
            decoder,
            is_train=is_train,
            num_samples=cfg.num_samples,
            workers=cfg.num_workers,
            batch_size=cfg.batch_size,
            seed=seed,
            world_size=world_size,
            global_rank=global_rank,
        )
        bundle.set_interval(start_interval)
        return bundle

    if cfg.format == "hf_dataset":
        if cfg.source == "SinglePageDocVQA":
            import os

            root = os.environ.get(
                "PIXPARSE_DOCVQA_DIR",
                os.path.expanduser("~/.cache/SinglePageDocVQA"),
            )
            dataset = CustomVQADataset(root_dir=root, split=cfg.split)
        else:
            from datasets import VerificationMode, load_dataset

            dataset = load_dataset(
                cfg.source, verification_mode=VerificationMode.ALL_CHECKS
            )[cfg.split]
        dataset = SafeDataset(dataset)
        loader = HfDatasetLoader(
            dataset,
            batch_size=cfg.batch_size,
            collate_fn=collate_fn,
            is_train=is_train,
            seed=seed,
            world_size=world_size,
            global_rank=global_rank,
            num_workers=cfg.num_workers,
        )
        loader.set_interval(start_interval)
        return LoaderBundle(
            loader=loader,
            num_batches=len(loader),
            num_samples=len(dataset),
        )

    raise ValueError(f"unknown dataset format {cfg.format!r}")
