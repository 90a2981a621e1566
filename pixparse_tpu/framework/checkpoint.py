"""Checkpoint save/load: full train state, interval-per-checkpoint.

The reference saves **model weights only** per interval
(``app/train.py:64-67`` in /root/reference: ``torch.save(task.model.
state_dict(), checkpoint-{i}.pt)``) and never restores optimizer/scheduler
state (SURVEY.md §5.3/§5.4 — ``state_dict`` gathers them but nothing saves
it, ``load_state_dict`` is a ``pass``). This module fixes that gap as the
survey directs: the native format checkpoints the *complete* train state
(params + optimizer state + step/interval counters + rng) via orbax, while
:mod:`pixparse_tpu.models.torch_interop` keeps a ``.pt`` model-weights
import/export shim for reference interop.

Layout: ``{output_dir}/checkpoint-{interval}/`` (orbax dir). Orbax handles
multi-host/sharded arrays natively (each host writes its shards; restore maps
back onto the mesh via the target tree's shardings).
"""

from __future__ import annotations

import logging
import os
import re
from typing import Any, Optional

import jax
import numpy as np

_logger = logging.getLogger(__name__)

_CKPT_RE = re.compile(r"checkpoint-(\d+)$")


def checkpoint_path(output_dir: str, interval: int) -> str:
    return os.path.join(output_dir, f"checkpoint-{interval}")


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Newest ``checkpoint-{i}`` dir under ``output_dir`` (None if none)."""
    wait_for_saves()
    if not os.path.isdir(output_dir):
        return None
    best, best_i = None, -1
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if m and int(m.group(1)) > best_i:
            best_i = int(m.group(1))
            best = os.path.join(output_dir, name)
    return best


_async_checkpointer = None


def _get_async_checkpointer():
    global _async_checkpointer
    if _async_checkpointer is None:
        import orbax.checkpoint as ocp

        _async_checkpointer = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_checkpointer


def wait_for_saves():
    """Block until any in-flight async checkpoint save has committed."""
    if _async_checkpointer is not None:
        _async_checkpointer.wait_until_finished()


def save_checkpoint(
    path: str, state: Any, metadata: Optional[dict] = None, async_save: bool = True
):
    """Write a train-state pytree (+ small metadata dict) to ``path``.

    ``async_save=True`` (default) returns as soon as device arrays are
    snapshotted and commits in the background, so the next interval trains
    while the previous state serializes (a full cruller_base state is ~2.4 GB;
    a synchronous save stalls the loop for its full write time). The previous
    in-flight save is always awaited first, and callers must
    :func:`wait_for_saves` before exiting."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    payload = {"state": state}
    if metadata:
        payload["metadata"] = {k: np.asarray(v) for k, v in metadata.items()}
    if async_save:
        ckptr = _get_async_checkpointer()
        ckptr.wait_until_finished()  # one in-flight save at a time
        ckptr.save(path, payload, force=True)
        _logger.info("checkpoint save started (async): %s", path)
        return
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    _logger.info("saved checkpoint %s", path)



def restore_train_state(path: str, state_template: Any):
    """Restore onto an existing (sharded) state: the template supplies
    shape/dtype/sharding for every leaf. Returns (state, metadata)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)

    def as_restore_type(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    wait_for_saves()  # never race a restore against an in-flight save
    template = jax.tree_util.tree_map(as_restore_type, state_template)
    with ocp.PyTreeCheckpointer() as ckptr:
        item = {"state": template}
        try:
            disk_tree = ckptr.metadata(path).item_metadata.tree
            if "metadata" in disk_tree:
                item["metadata"] = {
                    k: np.zeros(m.shape, m.dtype)
                    for k, m in disk_tree["metadata"].items()
                }
        except Exception as e:
            _logger.warning(
                "could not read checkpoint metadata from %s (%s) — interval/"
                "step counters will restart from 0", path, e,
            )
        restored = ckptr.restore(path, args=ocp.args.PyTreeRestore(item=item))
    metadata = restored.get("metadata") or {}
    metadata = {k: _to_py(v) for k, v in metadata.items()}
    return restored["state"], metadata


def _to_py(v):
    arr = np.asarray(v)
    if arr.ndim == 0:
        return arr.item()
    return arr
