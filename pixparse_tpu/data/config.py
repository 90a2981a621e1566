"""Data config dataclasses (parity: reference ``data/config.py:11-25``)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass
class PreprocessCfg:
    # preprocessing currently configured inside tasks (parity with reference)
    pass


@dataclass
class DatasetCfg:
    source: str
    num_samples: int
    batch_size: int
    split: str  # "train" | "test" | "val"
    format: str = "webdataset"  # or "hf_dataset"
    num_workers: int = 4


@dataclass
class DataCfg:
    train: Optional[DatasetCfg] = None
    eval: Optional[DatasetCfg] = None
