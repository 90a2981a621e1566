"""Device mesh environment: the TPU-native replacement for the reference's
``DeviceEnv`` + NCCL process group (``framework/device.py`` in /root/reference).

Design (SURVEY.md §2c, §5.8):

- One global ``jax.sharding.Mesh`` with axes ``('data', 'fsdp', 'model')``.
  Reference parity (plain DDP) is ``fsdp=model=1``: batch sharded over
  ``data``, params replicated, XLA inserts the gradient all-reduce over ICI
  automatically inside the jitted train step. The extra axes open up
  ZeRO-style parameter sharding (``fsdp``) and tensor parallelism (``model``)
  without touching model code — params/activations carry *logical* axis names
  mapped here.
- Per-host process identity replaces LOCAL_RANK/SLURM env scanning: under
  ``jax.distributed`` every host runs one process and addresses
  ``jax.local_devices()``.
- Host-object sync (experiment-name broadcast, metric gathering —
  ``framework/device.py:153-166``) uses ``jax.experimental.multihost_utils``
  over a pickled uint8 array.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import pickle
from typing import Any, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_logger = logging.getLogger(__name__)

MESH_AXES = ("data", "fsdp", "model")

# logical axis name -> mesh axis (or tuple of mesh axes)
DEFAULT_LOGICAL_RULES: Tuple[Tuple[str, Any], ...] = (
    ("batch", ("data", "fsdp")),  # batch dim of activations
    ("embed", "fsdp"),            # model width (param sharding, ZeRO-style)
    ("mlp", "model"),             # FFN hidden
    ("heads", "model"),           # attention heads
    ("kv", None),                 # per-head dim
    # Embedding table: shard the vocab dim over BOTH model and fsdp, embed dim
    # replicated. Same per-shard bytes as (vocab->model, embed->fsdp), but the
    # gather backward (scatter-add) stays efficient — an fsdp-sharded embed dim
    # forces "[SPMD] Involuntary full rematerialization" of the (B, L, D)
    # activation gradient on fsdp>1 meshes.
    ("vocab", ("model", "fsdp")),
    ("vocab_embed", None),
    ("length", None),             # sequence dim (future sequence-parallel axis)
    ("image_length", None),
    ("patch", None),              # flattened patch input dim
    ("norm", None),
)


def is_distributed_env() -> bool:
    """Multi-host detection via JAX coordinator env (replaces WORLD_SIZE/SLURM
    scanning in reference ``framework/device.py:13-45``)."""
    return "JAX_COORDINATOR_ADDRESS" in os.environ or (
        int(os.environ.get("SLURM_NTASKS", 1)) > 1
    )


def create_mesh(
    data: int = 0,
    fsdp: int = 1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build the global mesh. ``data=0`` absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    fsdp = max(1, fsdp)
    model = max(1, model)
    if data in (0, None):
        if n % (fsdp * model):
            raise ValueError(f"{n} devices not divisible by fsdp*model={fsdp * model}")
        data = n // (fsdp * model)
    if data * fsdp * model != n:
        raise ValueError(
            f"mesh {data}x{fsdp}x{model} != {n} devices"
        )
    # mesh_utils places devices to favour ICI locality on real TPU topologies
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh((data, fsdp, model), devices=devices)
    except Exception:  # virtual CPU devices etc.
        dev_array = np.asarray(devices).reshape(data, fsdp, model)
    return Mesh(dev_array, MESH_AXES)


def logical_sharding(logical_spec: P, mesh: Mesh, rules=DEFAULT_LOGICAL_RULES) -> NamedSharding:
    """Map a PartitionSpec of *logical* axis names to a mesh NamedSharding.

    Rank-1 params (norm scales, biases) are always replicated: they are tiny,
    and sharding them (e.g. a 1-D ``embed`` layernorm scale over ``fsdp``)
    makes XLA reshard the full (B, L, D) activation gradient before the
    param-grad reduction — an "[SPMD] Involuntary full rematerialization" on
    fsdp/model meshes. Replicated, the grad is a cheap all-reduce of D floats.
    """
    if len(logical_spec) == 1:
        return NamedSharding(mesh, P(None))
    table = dict(rules)
    mesh_spec = []
    for axis in logical_spec:
        if axis is None:
            mesh_spec.append(None)
        elif isinstance(axis, (tuple, list)):
            resolved: List[str] = []
            for a in axis:
                r = table.get(a)
                if r is None:
                    continue
                resolved.extend(r if isinstance(r, (tuple, list)) else [r])
            mesh_spec.append(tuple(resolved) if resolved else None)
        else:
            mesh_spec.append(table.get(axis))
    return NamedSharding(mesh, P(*mesh_spec))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Leading-axis batch sharding over (data, fsdp); other dims replicated."""
    return NamedSharding(mesh, P(("data", "fsdp"), *([None] * (ndim - 1))))


def stacked_batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for micro-batch-stacked arrays (accum, B, ...): the batch
    axis is dim 1; the scan axis stays replicated."""
    return NamedSharding(
        mesh, P(None, ("data", "fsdp"), *([None] * (ndim - 2)))
    )


def shard_batch(mesh: Mesh, batch, stacked: bool = False):
    """Place a host-local pytree of numpy arrays onto the mesh, batch-sharded.

    Single-process: a plain sharded device_put. Multi-host: each process holds
    its own slice of the global batch (per-host data loading) and
    ``make_array_from_process_local_data`` assembles the global array.
    ``stacked``: arrays carry a leading micro-batch axis (grad accumulation);
    the batch axis is dim 1.
    """
    def _place(x):
        x = np.asarray(x)
        sharding = (
            stacked_batch_sharding(mesh, x.ndim) if stacked
            else batch_sharding(mesh, x.ndim)
        )
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(_place, batch)


@dataclasses.dataclass
class MeshEnv:
    """Process/mesh identity + host-object collectives.

    API parity with the reference ``DeviceEnv`` where it matters to callers:
    ``world_size``/``global_rank`` (process granularity, used for per-host
    data sharding), ``is_primary()``, ``broadcast_object``,
    ``all_gather_object``.
    """

    mesh: Mesh
    process_index: int
    process_count: int

    @classmethod
    def initialize(
        cls,
        data: int = 0,
        fsdp: int = 1,
        model: int = 1,
        devices: Optional[Sequence] = None,
    ) -> "MeshEnv":
        # NOTE: must run before ANY backend-initializing jax call
        # (jax.devices()/process_count() would bind a single-process backend
        # and make distributed init fail) — callers must not touch devices
        # before MeshEnv.initialize()
        if is_distributed_env():
            try:
                jax.distributed.initialize()
            except Exception as e:
                msg = str(e).lower()
                if "already" in msg or "initialized" in msg:
                    _logger.info("jax.distributed already initialized: %s", e)
                else:
                    # continuing would make every host rank 0 of world 1:
                    # duplicated data shards, clobbered outputs, silently
                    # wrong training — fail fast instead
                    raise RuntimeError(
                        "multi-host environment detected but "
                        "jax.distributed.initialize failed"
                    ) from e
        mesh = create_mesh(data=data, fsdp=fsdp, model=model, devices=devices)
        return cls(
            mesh=mesh,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )

    # --- identity ---------------------------------------------------------
    @property
    def world_size(self) -> int:
        return self.process_count

    @property
    def global_rank(self) -> int:
        return self.process_index

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    def is_primary(self) -> bool:
        return self.process_index == 0

    # --- host-object collectives -------------------------------------------
    def broadcast_object(self, obj: Any, src: int = 0) -> Any:
        if self.process_count == 1:
            return obj
        from jax.experimental import multihost_utils

        payload = pickle.dumps(obj) if self.process_index == src else b""
        # fixed-size length header then padded payload
        length = np.array([len(payload)], dtype=np.int32)
        length = multihost_utils.broadcast_one_to_all(length, self.process_index == src)
        buf = np.zeros(int(length[0]), dtype=np.uint8)
        if self.process_index == src:
            buf[:] = np.frombuffer(payload, dtype=np.uint8)
        buf = multihost_utils.broadcast_one_to_all(buf, self.process_index == src)
        return pickle.loads(buf.tobytes())

    def all_gather_object(self, obj: Any) -> List[Any]:
        if self.process_count == 1:
            return [obj]
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(
            _pickle_to_padded(obj), tiled=False
        )
        return [_unpickle_padded(row) for row in gathered]

    # --- data placement -----------------------------------------------------
    def shard_batch(self, batch, stacked: bool = False):
        return shard_batch(self.mesh, batch, stacked=stacked)

    def __str__(self):
        d = dict(zip(MESH_AXES, self.mesh.devices.shape))
        return (
            f"MeshEnv(process {self.process_index}/{self.process_count}, "
            f"devices={self.num_devices}, mesh={d})"
        )


_PAD_OBJ_BYTES = 1 << 20  # 1 MiB cap for gathered host objects


def _pickle_to_padded(obj: Any) -> np.ndarray:
    raw = pickle.dumps(obj)
    if len(raw) > _PAD_OBJ_BYTES - 8:
        raise ValueError(f"object too large to all-gather ({len(raw)} bytes)")
    buf = np.zeros(_PAD_OBJ_BYTES, dtype=np.uint8)
    buf[:8] = np.frombuffer(np.int64(len(raw)).tobytes(), dtype=np.uint8)
    buf[8:8 + len(raw)] = np.frombuffer(raw, dtype=np.uint8)
    return buf


def _unpickle_padded(buf: np.ndarray) -> Any:
    n = int(np.frombuffer(buf[:8].tobytes(), dtype=np.int64)[0])
    return pickle.loads(buf[8:8 + n].tobytes())
