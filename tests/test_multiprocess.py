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
