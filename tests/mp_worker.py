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

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

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
    assert env.num_devices == 4 * num_processes, env.num_devices

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


if __name__ == "__main__":
    main()
