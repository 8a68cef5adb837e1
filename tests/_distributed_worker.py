"""Worker for the real two-process distributed test (run via subprocess).

Each process gets 4 virtual CPU devices (8 global), joins a
``jax.distributed`` world, contributes its local half of a global SyncNet
batch through ``global_batch_from_local``, and runs one jitted train step.
Prints machine-checkable lines the parent asserts on:

* ``BATCHSUM <v>``  — in-graph sum of the assembled global batch (must equal
  the concatenation of both processes' local data, which the parent
  recomputes from the seeds);
* ``PARAMHASH <v>`` — post-step parameter checksum (must be identical across
  processes: the gradient all-reduce is what keeps replicas in lockstep,
  replacing the reference's nn.DataParallel checkpoints,
  wav2lip_train.py:322-326).

Usage: python _distributed_worker.py <process_id> <num_processes> <port>
"""

import os
import sys


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    flags = os.environ.get("XLA_FLAGS", "")
    for f in ("--xla_force_host_platform_device_count=4",
              "--xla_cpu_max_isa=AVX2"):
        if f.split("=")[0] not in flags:
            flags += " " + f
    os.environ["XLA_FLAGS"] = flags.strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older/newer config name; initialize() may still work
    try:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    except Exception as e:  # no multiprocess CPU support in this build
        print("INIT_FAIL", repr(e), flush=True)
        return 17

    import numpy as np
    import optax

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from wav2lip_tpu.parallel import (
        global_batch_from_local,
        local_batch_size,
        make_mesh,
    )
    from wav2lip_tpu.train.state import TrainState
    from wav2lip_tpu.train.steps import make_syncnet_steps
    from wav2lip_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    mesh = make_mesh()

    # identical init on every process (same seed, deterministic init) — the
    # multi-host contract for replicated params
    from wav2lip_tpu.models import SyncNet

    tx = optax.adam(1e-4)
    variables = jax.jit(SyncNet().init)(
        jax.random.key(0),
        np.zeros((1, 80, 16, 1), np.float32),
        np.zeros((1, 48, 96, 15), np.float32),
    )
    state = TrainState.create(variables, tx)
    # mesh path: ONE fused cross-process gradient all-reduce over gloo
    # instead of the SPMD partitioner's per-tensor collectives
    train_step, _ = make_syncnet_steps(tx, mesh=mesh)

    # per-process local data (deterministic per process_id so the parent can
    # recompute the expected global concatenation)
    global_b = 8
    local_b = local_batch_size(global_b)
    rng = np.random.default_rng(100 + pid)
    local = {
        "mel": rng.standard_normal((local_b, 80, 16, 1)).astype(np.float32),
        "faces": rng.random((local_b, 48, 96, 15)).astype(np.float32),
        "y": np.ones((local_b, 1), np.float32),
    }
    batch = global_batch_from_local(mesh, local)

    # in-graph global reduction proves the assembled array holds BOTH
    # processes' data (a process can only read its addressable shards)
    import jax.numpy as jnp

    sums = jax.jit(lambda b: sum(jnp.sum(x.astype(jnp.float64))
                                 for x in jax.tree.leaves(b)))(batch)
    print(f"BATCHSUM {float(sums):.6f}", flush=True)

    state, metrics = train_step(state, batch["mel"], batch["faces"],
                                batch["y"])
    jax.block_until_ready(metrics)

    phash = sum(float(jnp.sum(jnp.abs(x.astype(jnp.float64))))
                for x in jax.tree.leaves(state.params))
    print(f"LOSS {float(metrics['loss']):.8f}", flush=True)
    print(f"PARAMHASH {phash:.6f}", flush=True)
    print("OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
