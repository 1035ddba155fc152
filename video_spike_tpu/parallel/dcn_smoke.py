"""Multi-process (DCN) smoke: one global-mesh train step across processes.

The reference's multi-process story is `accelerate launch` + NCCL DDP
(``/root/reference/config/accelerate/default.yaml:1-11``); here the entire
launcher layer is `jax.distributed.initialize` + a global mesh (SURVEY.md
§5.8). This module is the executable form of that claim — run one copy per
process:

    JAX_COORDINATOR_ADDRESS=localhost:12345 JAX_NUM_PROCESSES=2 \
    JAX_PROCESS_ID=<i> python -m video_spike_tpu.parallel.dcn_smoke

Each process: initializes the distributed runtime (through
``core.runtime.setup_runtime``'s env-var path), builds the global data mesh,
assembles its process-local batch rows into a global array with
``jax.make_array_from_process_local_data``, and runs one jitted Poisson-NLL
train step. The loss is a global mean, so every process must print the SAME
value — that equality is what the subprocess test asserts
(``tests/test_multiprocess_dcn.py``).

On CPU (the test harness), collectives ride gloo; on TPU pods the same code
rides ICI/DCN — only the device list changes.
"""

from __future__ import annotations

import os


def main() -> None:
    import jax

    if os.environ.get("DCN_SMOKE_FORCE_CPU"):
        # the axon plugin ignores JAX_PLATFORMS=cpu (CLAUDE.md); force it
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # newer jax: gloo is the default

    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from video_spike_tpu.ops.poisson import poisson_nll_mean

    pid = jax.process_index()
    nproc = jax.process_count()
    print(f"pid={pid} process_count={nproc} "
          f"local_devices={jax.local_device_count()} "
          f"global_devices={jax.device_count()}", flush=True)

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    batch_shd = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    # process-local rows -> one global batch (the reference's per-rank
    # DataLoader becomes host-local assembly, SURVEY.md §5.8)
    rng = np.random.default_rng(pid)
    rows_per_proc = 2 * jax.local_device_count()
    x_local = rng.normal(size=(rows_per_proc, 16)).astype(np.float32)
    y_local = rng.poisson(1.0, (rows_per_proc, 8)).astype(np.float32)
    x = jax.make_array_from_process_local_data(batch_shd, x_local)
    y = jax.make_array_from_process_local_data(batch_shd, y_local)

    w = jax.device_put(np.zeros((16, 8), np.float32), repl)

    @jax.jit
    def step(w, x, y):
        def loss_fn(w):
            return poisson_nll_mean(x @ w, y)

        loss, g = jax.value_and_grad(loss_fn)(w)
        return w - 0.1 * g, loss

    w, loss = step(w, x, y)
    w, loss = step(w, x, y)  # second step: gradient actually applied
    print(f"pid={pid} global_loss={float(loss):.6f}", flush=True)


if __name__ == "__main__":
    main()
