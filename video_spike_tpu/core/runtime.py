"""Process-level JAX runtime setup shared by every CLI.

Enables the persistent compilation cache (XLA programs here are large —
the flow pyramid, the 500M-param train step, Pallas kernels — and this
environment compiles TPU programs through a remote service where a cold
compile can take minutes; the cache makes reruns start in seconds) and
initializes multi-host JAX when driver env vars indicate a pod.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

_DONE = False


def setup_runtime(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    cache = Path(cache_dir or os.environ.get(
        "VST_COMPILE_CACHE", Path.home() / ".cache" / "video_spike_tpu"
        / "xla"))
    try:
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache

    # multi-host pods: initialize the distributed runtime when the
    # coordinator env vars are present. This must run BEFORE any backend
    # query (jax.devices()/process_count() would initialize the backend and
    # make initialize() a no-op — exactly the bug this guard used to have).
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord:
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc) if nproc else None,
                process_id=int(pid) if pid else None)
        except RuntimeError:
            pass  # already initialized (e.g. repeated setup in one process)
    _DONE = True
