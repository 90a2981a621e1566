"""Framework layer (parity: reference ``framework/__init__.py:1-8``)."""

from pixparse_tpu.framework.config import (
    MeshCfg,
    OptimizationCfg,
    TaskEvalCfg,
    TaskTrainCfg,
)
from pixparse_tpu.framework.eval import evaluate
from pixparse_tpu.framework.logger import setup_logging
from pixparse_tpu.framework.monitor import Monitor
from pixparse_tpu.framework.random import jax_key, random_seed
from pixparse_tpu.framework.task import Task, TaskEval, TaskTrain
from pixparse_tpu.framework.train import train_one_interval
from pixparse_tpu.parallel.mesh import MeshEnv
