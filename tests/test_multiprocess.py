"""Two-process jax.distributed loopback test (SURVEY.md §4: multi-process via
jax.distributed loopback substitutes for the fake-backend layer the reference
lacks)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(num_procs: int, mode: str = "basic", shard_dir: str = ""):
    port = str(_free_port())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "mp_worker.py")
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # workers must import pixparse_tpu from the repo even when it isn't
    # pip-installed (script-path invocation puts tests/, not the root, on
    # sys.path)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), str(num_procs), port, mode, shard_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd=root, env=env,
            text=True,
        )
        for rank in range(num_procs)
    ]
    outputs = [p.communicate(timeout=240)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"proc {rank} failed:\n{out}"
        assert f"proc {rank}: OK" in out
    return outputs


def test_four_process_data_plane_uneven_shards(tmp_path):
    """VERDICT r1 item 10: 4 hosts x 2 devices, 6 wds shards (uneven split),
    full eval coverage + metric merge + global batch assembly."""
    import io
    import json
    import tarfile

    for s in range(6):
        with tarfile.open(tmp_path / f"shard-{s:05d}.tar", "w") as tf:
            for i in range(4):
                payload = json.dumps({"id": f"s{s}_{i}"}).encode()
                info = tarfile.TarInfo(f"s{s}_{i:02d}.json")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
    _run_workers(4, mode="data", shard_dir=str(tmp_path))


def test_two_process_sharded_train_matches_single_process():
    """VERDICT r2 item 7: make_train_step over a mesh SPANNING 2 processes
    (4 virtual devices each, per-host batch slices) produces the same loss
    trajectory as the identical run on this process's local 8-device mesh —
    the distributed grad-sync path the single-process dryrun can't see."""
    import json
    import re

    import numpy as np

    outputs = _run_workers(2, mode="train")
    worker_losses = []
    for out in outputs:
        m = re.search(r"losses=(\[[^\]]*\])", out)
        assert m, f"no losses in worker output:\n{out}"
        worker_losses.append(json.loads(m.group(1)))
    # both processes observe the same global loss
    np.testing.assert_allclose(worker_losses[0], worker_losses[1], rtol=1e-6)

    # single-process reference: same model/opt/batch on the local mesh
    import jax
    import jax.numpy as jnp

    from pixparse_tpu.framework.config import OptimizationCfg
    from pixparse_tpu.framework.optimization import create_optimizer
    from pixparse_tpu.framework.train_state import (
        create_train_state,
        make_train_step,
    )
    from pixparse_tpu.models.config import get_model_config
    from pixparse_tpu.models.cruller import Cruller, resolve_cruller_cfgs
    from pixparse_tpu.ops.loss import cross_entropy_loss
    from pixparse_tpu.parallel.mesh import create_mesh, shard_batch

    cfg = get_model_config("cruller_test")
    vit_cfg, bart_cfg, _ = resolve_cruller_cfgs(cfg)
    model = Cruller(vit_cfg, bart_cfg)
    opt_cfg = OptimizationCfg(
        learning_rate=1e-3, clip_grad_value=1.0, clip_grad_mode="norm"
    )
    tx, _ = create_optimizer(
        opt_cfg, 10, 1, 10,
        encoder_depth=vit_cfg.depth, decoder_layers=bart_cfg.decoder_layers,
    )
    B, L = 8, 16
    example = (
        jnp.zeros((B, *vit_cfg.img_size, vit_cfg.in_chans)),
        jnp.zeros((B, L), jnp.int32),
    )
    mesh = create_mesh()
    state, _ = create_train_state(model, tx, mesh, example, seed=0)

    def loss_fn(params, batch, rng):
        logits = model.apply({"params": params}, batch["image"], batch["text"])
        loss, _ = cross_entropy_loss(logits, batch["target"])
        return loss, {}

    step = make_train_step(loss_fn, tx, mesh)
    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "image": rng.rand(B, *vit_cfg.img_size, vit_cfg.in_chans).astype(np.float32),
        "text": rng.randint(4, bart_cfg.vocab_size, (B, L)).astype(np.int32),
        "target": rng.randint(4, bart_cfg.vocab_size, (B, L)).astype(np.int32),
    })
    ref = []
    for _ in range(3):
        state, m = step(state, batch)
        ref.append(float(m["loss"]))
    np.testing.assert_allclose(worker_losses[0], ref, rtol=2e-5)


def test_two_process_mesh_env():
    port = str(_free_port())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "mp_worker.py")
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd=root, env=env,
            text=True,
        )
        for rank in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outputs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"proc {rank} failed:\n{out}"
        assert f"proc {rank}: OK" in out
