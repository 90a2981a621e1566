"""Train CLI: ``python -m pixparse_tpu.app.train`` (parity: reference
``app/train.py``).

Same three-scope flag surface (``--train.* --task.* --data.*`` with dash
variants and ``--config_path``), same flow: MeshEnv -> TaskFactory -> seeded
RNG -> auto-named experiment (broadcast to all hosts) -> refuse to clobber an
existing experiment log -> Monitor on primary -> optional ``.pt``/S3 resume ->
loader with the task's collate/preproc -> ``train_setup`` -> interval loop.

Checkpointing improves on the reference (SURVEY.md §5.3/§5.4): per interval
the primary writes BOTH the reference-compatible model-only
``checkpoint-{i}.pt`` AND a full orbax train state (params + optimizer +
counters), and ``--train.resume`` with a ``checkpoint-{i}`` orbax dir restores
optimizer/interval state too (the reference silently drops it).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, replace
from datetime import datetime
from typing import Dict, Optional

from pixparse_tpu.data import DataCfg, create_loader
from pixparse_tpu.framework import (
    Monitor,
    random_seed,
    setup_logging,
    train_one_interval,
)
from pixparse_tpu.framework.task import StopTraining
from pixparse_tpu.framework.checkpoint import (
    checkpoint_path as native_checkpoint_path,
    restore_train_state,
    save_checkpoint,
    wait_for_saves,
)
from pixparse_tpu.framework.cli import ConfigArgumentParser
from pixparse_tpu.parallel.mesh import MeshEnv
from pixparse_tpu.task import TaskFactory
from pixparse_tpu.utils.name_utils import clean_name

_logger = logging.getLogger("train")


@dataclass
class TrainCfg:
    experiment: Optional[str] = None
    output_dir: str = "./output"
    log_filename: str = "out.log"
    s3_bucket: str = ""
    resume: bool = False
    checkpoint_path: str = ""
    output_checkpoint_dir: Optional[str] = None  # default output_dir/checkpoints
    seed: int = 42
    task_name: str = "cruller_pretrain"
    wandb: bool = False
    wandb_project: str = "unknown"
    tensorboard: bool = False
    log_eval_data: bool = False
    profile: bool = False  # jax.profiler trace of the first interval
    profile_dir: str = ""  # default {experiment}/profile


def _save_interval_checkpoints(
    cfg: TrainCfg, task, interval: int, completed: bool = True
):
    """``completed=False`` (preemption mid-interval): the weights snapshot is
    written under this interval's name, but metadata records the previous
    interval as the last complete one, so resume re-runs this interval from
    its start instead of skipping its remaining batches."""
    device_env = task.device_env
    checkpoint_dir = os.path.join(cfg.output_checkpoint_dir, cfg.experiment)
    if device_env.is_primary():
        os.makedirs(checkpoint_dir, exist_ok=True)
        # reference-compatible model-only .pt (host-gathering params; skipped
        # when params span non-addressable devices — fsdp>1 multihost — where
        # the orbax full-state below is the checkpoint of record)
        from pixparse_tpu.models.torch_interop import save_torch_checkpoint

        try:
            save_torch_checkpoint(
                os.path.join(checkpoint_dir, f"checkpoint-{interval}.pt"),
                task.state_dict(),
            )
        except RuntimeError as e:
            _logger.warning(".pt export skipped (params not host-addressable): %s", e)
    # full train state (all hosts participate in a sharded save)
    last_complete = interval if completed else interval - 1
    save_checkpoint(
        native_checkpoint_path(checkpoint_dir, interval),
        task.state,
        metadata={"interval": last_complete, "step": int(task.state.step)},
    )


def train(cfg: TrainCfg, task, loaders: Dict[str, object]):
    # graceful preemption: SIGTERM/SIGINT checkpoints at the next step
    # boundary before exiting (the reference loses the whole interval;
    # SURVEY.md §2c "elastic / fault-tolerant training: absent")
    import signal

    preempted = {"flag": False}

    def _request_stop(signum, frame):
        _logger.warning("signal %s received: checkpointing then exiting", signum)
        preempted["flag"] = True
        task._stop_requested = True

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _request_stop)
        except ValueError:  # non-main thread (tests)
            pass

    device_env = task.device_env
    train_loader = loaders["train"]
    for i in range(task.start_interval, task.num_intervals):
        train_loader.set_interval(i)
        task.interval_idx = i
        try:
            if cfg.profile and i == task.start_interval:
                from pixparse_tpu.framework.profiling import trace

                logdir = cfg.profile_dir or os.path.join(
                    cfg.output_dir, cfg.experiment, "profile"
                )
                with trace(logdir):
                    train_one_interval(task, train_loader)
            else:
                train_one_interval(task, train_loader)
        except StopTraining:
            # mid-interval preemption: snapshot under interval i with
            # metadata pointing at i-1 so resume replays interval i fully
            _save_interval_checkpoints(cfg, task, i, completed=False)
            _logger.warning("preempted during interval %d; state saved", i)
            break

        _save_interval_checkpoints(cfg, task, i)
        if preempted["flag"]:
            break

    wait_for_saves()  # commit the last async checkpoint before returning
    for sig, handler in prev_handlers.items():
        signal.signal(sig, handler)



def main(argv=None):
    # the task cfg scope is parsed generically then re-scoped by the factory
    # into the task-specific cfg class (model_name/tokenizer resolution)

    from pixparse_tpu.task.task_factory import TASK_CLASS_REGISTRY

    import sys

    from pixparse_tpu.framework.cli import peek_flag

    argv = list(sys.argv[1:] if argv is None else argv)
    # peek at task_name to build the right --task.* flag set
    task_name = peek_flag(argv, "train.task_name") or TrainCfg.task_name
    if task_name not in TASK_CLASS_REGISTRY:
        raise SystemExit(f"unknown task {task_name!r}")
    _, task_cfg_cls = TASK_CLASS_REGISTRY[task_name]

    parser = ConfigArgumentParser(description="pixparse_tpu train")
    parser.add_arguments(TrainCfg, dest="train")
    parser.add_arguments(task_cfg_cls, dest="task")
    parser.add_arguments(DataCfg, dest="data")
    args = parser.parse_args(argv)
    train_cfg: TrainCfg = args.train
    data_cfg: DataCfg = args.data

    # MeshEnv.initialize must be the FIRST backend-touching jax call
    # (multi-host rendezvous); platform checks come after
    device_env = MeshEnv.initialize(
        data=args.task.mesh.data, fsdp=args.task.mesh.fsdp, model=args.task.mesh.model
    )
    import jax

    if jax.devices()[0].platform != "cpu":
        # threefry dropout-mask generation costs ~10% of a cruller_base train
        # step on v5e (measured); rbg cuts it to ~2% with no training impact
        jax.config.update("jax_default_prng_impl", "rbg")
    task, task_cfg = TaskFactory.create_task(
        task_name=train_cfg.task_name,
        task_args=args.task,
        device_env=device_env,
        monitor=None,
    )
    random_seed(train_cfg.seed, rank=device_env.global_rank)
    _logger.info(f"Device env is {device_env}")

    if train_cfg.experiment is None:
        model_name_safe = clean_name(task_cfg.model_name)
        date_str = datetime.now().strftime("%Y%m%d-%H%M%S")
        if device_env.world_size > 1:
            date_str = device_env.broadcast_object(date_str)
        experiment = "-".join(
            [
                date_str,
                f"task_{train_cfg.task_name}",
                f"model_{model_name_safe}",
                f"lr_{'{:.1e}'.format(task_cfg.opt.learning_rate)}",
                f"b_{data_cfg.train.batch_size}",
            ]
        )
        train_cfg = replace(train_cfg, experiment=experiment)

    experiment_path = os.path.join(train_cfg.output_dir, train_cfg.experiment)
    log_path = None
    should_abort = False
    if device_env.is_primary():
        os.makedirs(experiment_path, exist_ok=True)
        log_path = os.path.join(experiment_path, train_cfg.log_filename)
        should_abort = os.path.exists(log_path) and not train_cfg.resume
    # every host must take the same branch or the rest deadlock in collectives
    if device_env.world_size > 1:
        should_abort = device_env.broadcast_object(should_abort)
    if should_abort:
        _logger.error(
            "Error. Experiment already exists. Use --train.experiment to "
            "specify a new experiment."
        )
        return -1

    setup_logging(log_path)
    task.monitor = Monitor(
        train_cfg.experiment,
        output_dir=experiment_path,
        wandb=train_cfg.wandb,
        wandb_project=train_cfg.wandb_project,
        tensorboard=train_cfg.tensorboard,
        output_enabled=device_env.is_primary(),
        log_eval_data=train_cfg.log_eval_data,
    )

    native_resume_dir = None
    if train_cfg.resume:
        checkpoint_path = train_cfg.checkpoint_path
        if not checkpoint_path:
            # resume-latest: newest orbax train-state dir of this experiment
            from pixparse_tpu.framework.checkpoint import latest_checkpoint

            default_ckpt_dir = train_cfg.output_checkpoint_dir or os.path.join(
                experiment_path, "checkpoints"
            )
            checkpoint_path = (
                latest_checkpoint(os.path.join(default_ckpt_dir, train_cfg.experiment))
                or ""
            )
            if checkpoint_path:
                _logger.info("resume: found latest checkpoint %s", checkpoint_path)
            else:
                _logger.info("resume requested but no checkpoint found; fresh start")
        if not checkpoint_path:
            pass
        elif train_cfg.s3_bucket != "":
            from pixparse_tpu.utils.s3_utils import load_checkpoint_from_s3

            _logger.info("s3 bucket specified. Loading checkpoint from s3.")
            checkpoint = load_checkpoint_from_s3(
                train_cfg.s3_bucket, checkpoint_path
            )
            task.resume_state_dict = checkpoint
        elif os.path.isdir(checkpoint_path):
            # native orbax train-state dir: restored after train_setup
            native_resume_dir = checkpoint_path
        else:
            assert os.path.isfile(
                checkpoint_path
            ), f"Cannot find checkpoint {checkpoint_path}: File not found"
            from pixparse_tpu.models.torch_interop import load_torch_checkpoint

            task.resume_state_dict = load_torch_checkpoint(checkpoint_path)

    output_checkpoint_dir = train_cfg.output_checkpoint_dir or os.path.join(
        experiment_path, "checkpoints"
    )
    os.makedirs(output_checkpoint_dir, exist_ok=True)
    train_cfg = replace(train_cfg, output_checkpoint_dir=output_checkpoint_dir)
    if device_env.is_primary():
        _logger.info(task_cfg)
        _logger.info(train_cfg)

    loaders = {}
    # deviation from the reference (which asserts train-OR-eval then crashes
    # on loaders['train'] anyway): the train app requires train data
    assert data_cfg.train is not None, "the train app requires --data.train.*"
    if data_cfg.train is not None:
        loaders["train"] = create_loader(
            data_cfg.train,
            is_train=True,
            collate_fn=task.collate_fn,
            image_preprocess=getattr(task, "image_preprocess_train", None),
            anno_preprocess=getattr(task, "anno_preprocess_train", None),
            image_fmt=task_cfg.model.image_encoder.image_fmt,
            seed=train_cfg.seed,
            world_size=device_env.world_size,
            global_rank=device_env.global_rank,
        )
    task.train_setup(
        num_batches_per_interval=loaders["train"].num_batches,
        seed=train_cfg.seed,
    )

    if native_resume_dir is not None:
        task.state, meta = restore_train_state(native_resume_dir, task.state)
        task.start_interval = int(meta.get("interval", -1)) + 1
        task.step_idx = int(task.state.step)
        _logger.info(
            "restored full train state from %s (interval %s, step %s)",
            native_resume_dir, task.start_interval - 1, task.step_idx,
        )

    if device_env.is_primary():
        _logger.info(task)

    train(train_cfg, task, loaders)
    task.monitor.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
