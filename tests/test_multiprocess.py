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


def test_two_process_mesh_env():
    port = str(_free_port())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "mp_worker.py")
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
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
