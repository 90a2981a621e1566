"""Task base classes (parity: reference ``framework/task.py`` in
/root/reference).

Same lifecycle surface the apps drive (``collate_fn`` / ``train_setup`` /
``train_interval_start`` / ``train_step`` / ``setup`` / ``step`` /
``average_metrics`` / ``state_dict``), but the heavy machinery the reference
duplicates per task (~150 lines of DDP/optimizer/scaler/scheduler skeleton in
each of 5 train tasks — SURVEY.md §7) lives once in
:class:`TaskTrain.train_setup` here: tasks supply tokens, collate,
target-masking and metrics; the framework supplies the jitted sharded step.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional


from pixparse_tpu.framework.config import TaskEvalCfg, TaskTrainCfg
from pixparse_tpu.framework.monitor import Monitor
from pixparse_tpu.parallel.mesh import MeshEnv

_logger = logging.getLogger(__name__)


class StopTraining(Exception):
    """Raised from a train step when a graceful stop was requested."""


class Task:
    def __init__(
        self,
        cfg,
        device_env: MeshEnv,
        monitor: Optional[Monitor] = None,
    ):
        self.cfg = cfg
        self.device_env = device_env
        self.monitor = monitor


class TaskEval(Task):
    def __init__(self, cfg: TaskEvalCfg, device_env: MeshEnv, monitor=None):
        super().__init__(cfg, device_env, monitor)

    def collate_fn(self, batch):
        pass

    def setup(self, *args, **kwargs):
        pass

    def prepare_for_evaluation(self, loaders) -> Dict[str, Any]:
        pass

    def step(self, sample) -> Dict[str, Any]:
        pass

    def end(self):
        pass


class TaskTrain(Task):
    def __init__(self, cfg: TaskTrainCfg, device_env: MeshEnv, monitor=None):
        super().__init__(cfg, device_env, monitor)
        self.num_intervals = cfg.num_intervals
        self.num_warmup_intervals = cfg.num_warmup_intervals
        self.eval_frequency = cfg.eval_frequency
        self.num_steps_per_interval: Optional[int] = None

        # counters (parity: ``framework/task.py:50-61``)
        self.step_idx = 0  # optimizer updates
        self.batch_idx = 0  # global batches seen
        self.interval_idx = 0
        self.interval_batch_idx = 0
        self.start_interval = 0  # set by resume (app layer)
        self._stop_requested = False  # set by the app's signal handler

        # optimization slots, filled by train_setup
        self.optimizer = None  # optax.GradientTransformation
        self.scheduler = None  # optax.Schedule
        self.state = None  # TrainState
        self.train_step_fn = None

    def collate_fn(self, batch):
        pass

    def train_setup(self, num_batches_per_interval: int, *args, **kwargs):
        pass

    def train_interval_start(self):
        pass

    def train_interval_end(self):
        pass

    def train_step(self, sample) -> Dict[str, Any]:
        pass

    def eval_step(self, sample) -> Dict[str, Any]:
        pass

    def get_current_lr(self) -> float:
        if self.scheduler is None:
            return 0.0
        accum = max(1, getattr(self.cfg.opt, "grad_accum_steps", 1))
        return float(self.scheduler(self.step_idx // accum))

    def state_dict(self) -> Dict[str, Any]:
        return {}

    def load_state_dict(self, state_dict: Dict[str, Any]):
        pass
