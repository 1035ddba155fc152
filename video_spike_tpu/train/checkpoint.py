"""Checkpoint save/load.

The reference pickles whole model objects (``/root/reference/src/trainer/
base.py:285-291``) and never saves optimizer state. Here checkpoints are
Orbax pytrees holding params, optimizer state, and step/epoch, giving true
resume (a capability upgrade noted in SURVEY.md §5.4); artifact naming keeps
the ``model_best`` / ``model_last`` contract.
"""

from __future__ import annotations

import threading
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

# ONE lock for every orbax save in this process, whichever thread (trainer
# main loop, async flush daemons) issues it. Two reasons:
# - same path: orbax's tmp-dir protocol (`<name>.orbax-checkpoint-tmp*`
#   created, then renamed over the final dir) is not safe under overlap — a
#   second writer hits FileExistsError on the tmp mkdir and the artifact is
#   never written (seen as a flaky full-suite failure under CPU load);
# - different paths: orbax's async-save signaling (operation-id counter +
#   awaitable-signal keys in a process-global client) is not thread-safe
#   either — two concurrent saves (model_last + model_best flushes) can
#   leave one blocked on `awaitable_signals_contract_N/
#   step_directory_creation` until its 300 s barrier timeout.
# Only the orbax write serializes; the expensive device->host fetch
# (parallel_device_get) happens before the lock and still overlaps.
_SAVE_LOCK = threading.Lock()


def save_checkpoint(directory: str | Path, name: str, tree: Any) -> str:
    """Save `tree` under `directory/name`, replacing any previous copy
    CRASH-SAFELY: the new checkpoint is fully written to ``<name>.next``
    first, then swapped in with two renames (previous -> ``<name>.stale``,
    next -> ``<name>``). A kill at ANY point leaves a complete checkpoint
    recoverable — the naive rmtree-then-write protocol loses BOTH copies
    when the kill lands mid-write (observed: a SIGKILL during a periodic
    SSL flush left only ``last_model.orbax-checkpoint-tmp`` on disk).
    :func:`checkpoint_exists` heals the only losable window (between the
    two renames) by restoring ``.stale``.

    Multi-process: orbax's save embeds a global barrier, so EVERY process
    must call this (the primary host does the actual write). Only the
    primary swaps; a post-swap barrier keeps the others from reading the
    path mid-swap."""
    path = (Path(directory) / name).resolve()
    next_path = path.parent / (path.name + ".next")
    stale_path = path.parent / (path.name + ".stale")
    with _SAVE_LOCK:
        ckptr = ocp.StandardCheckpointer()
        if jax.process_index() == 0:
            import shutil
            # heal leftovers of a crashed/killed earlier save — orbax
            # refuses to reuse an existing tmp dir (safe here: any live
            # same-path save holds this lock). A leftover .next is an
            # incomplete write; a leftover .stale only coexists with a
            # complete <name> (checkpoint_exists restores it otherwise).
            shutil.rmtree(next_path, ignore_errors=True)
            if path.exists():
                shutil.rmtree(stale_path, ignore_errors=True)
            for tmp in path.parent.glob(path.name + "*.orbax-checkpoint-tmp*"):
                shutil.rmtree(tmp, ignore_errors=True)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"pre_save:{path}")
        ckptr.save(next_path, tree)
        ckptr.wait_until_finished()
        if jax.process_index() == 0:
            import os as _os
            import shutil
            if stale_path.exists():   # healed-but-unread leftover
                shutil.rmtree(stale_path, ignore_errors=True)
            if path.exists():
                _os.rename(path, stale_path)
            _os.rename(next_path, path)
            shutil.rmtree(stale_path, ignore_errors=True)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"post_save:{path}")
    return str(path)


def parallel_device_get(tree: Any, chunk_bytes: int = 32 << 20,
                        workers: int = 16) -> Any:
    """``jax.device_get`` with every device leaf fetched concurrently (big
    leaves additionally split into row chunks).

    Two measured reasons (scripts/profile_ckpt_flush.py, real chip):

    - bandwidth: the tunnel's download path runs ~26-37 MB/s per stream
      but ~2x that with ~16 concurrent fetches (536 MB staging array:
      20.6 s single-stream vs 8.1-8.6 s at 16-64 chunks);
    - **liveness**: a plain ``jax.device_get`` of a whole tree BLOCKS
      concurrently dispatched device work for its entire duration (45.4 s
      of stalled training on a 1.33 GB tree), while the same bytes as ~16
      concurrent per-leaf/per-chunk fetches stall it by ~0. The round-5
      durability drill hit exactly this: the 111M SSL tree has ~300 leaves
      all under the old 64 MB chunking threshold, so the "async" periodic
      flush silently took the plain path and froze the step loop 57-83 s
      per save. Hence: whole-leaf fetches go through the pool too.

    Single-host only — callers in multihost mode use ``jax.device_get``
    directly (slice fetches of globally sharded arrays would gather
    cross-host).
    """
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    if jax.process_count() > 1:
        return jax.device_get(tree)
    leaves, treedef = jax.tree.flatten(tree)
    jobs = []       # (leaf_idx, row_start, row_end) for big-leaf chunks
    whole = []      # leaf indices fetched whole on the pool
    chunked = set()
    for i, leaf in enumerate(leaves):
        nbytes = getattr(leaf, "nbytes", 0)
        shape = getattr(leaf, "shape", ())
        if not hasattr(leaf, "nbytes"):
            continue   # python scalar / non-array: plain fetch below
        if nbytes < 2 * chunk_bytes or not shape or shape[0] < 2:
            whole.append(i)
            continue
        chunked.add(i)
        rows_per = max(int(len(leaf) * chunk_bytes / nbytes), 1)
        jobs.extend((i, s, min(s + rows_per, shape[0]))
                    for s in range(0, shape[0], rows_per))
    if not jobs and not whole:
        return jax.device_get(tree)
    done = chunked | set(whole)
    out = [None if i in done else leaf for i, leaf in enumerate(leaves)]
    for i in chunked:
        out[i] = np.empty(leaves[i].shape, leaves[i].dtype)

    def fetch(job):
        if isinstance(job, tuple):
            i, s, e = job
            out[i][s:e] = jax.device_get(leaves[i][s:e])
        else:
            out[job] = jax.device_get(leaves[job])

    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(fetch, jobs + whole))
    rest = [leaf for i, leaf in enumerate(leaves) if i not in done]
    rest_np = jax.device_get(rest)
    it = iter(rest_np)
    out = [o if i in done else next(it) for i, o in enumerate(out)]
    return jax.tree.unflatten(treedef, out)


_PENDING: dict = {}
_ASYNC_ERRORS: list = []


def save_checkpoint_async(directory: str | Path, name: str,
                          tree: Any, after=None) -> None:
    """Fire-and-forget save for mid-training flushes.

    The expensive part on this host is not the disk write but the
    device->host fetch (a 504M-param tree is 1-2 GB through a ~1.2 GB/s
    link: ~25 s of stalled training per flush). The caller hands a tree of
    on-device arrays it will not donate (e.g. the trainer's best-params
    copy); the fetch AND the orbax write run on a background thread while
    training continues. A second save to the same path joins the first;
    call :func:`wait_for_checkpoints` before reading the artifact or
    exiting — it re-raises the first failure from any background save, so
    a died flush can't silently leave the artifact missing.

    ``after`` (optional, zero-arg) runs on the background thread only AFTER
    the checkpoint landed on disk — e.g. the SSL trainer's sampler sidecar,
    which must never stamp a checkpoint that failed to write. An ``after``
    failure is surfaced at the next :func:`wait_for_checkpoints` like a
    save failure.
    """
    key = str((Path(directory) / name).resolve())
    prev = _PENDING.get(key)
    if prev is not None:
        prev.join()

    def work():
        try:
            save_checkpoint(directory, name, parallel_device_get(tree))
            if after is not None:
                after()
        except BaseException as e:  # noqa: BLE001 — surfaced at the join
            _ASYNC_ERRORS.append(e)

    t = threading.Thread(target=work, daemon=True, name=f"ckpt:{name}")
    _PENDING[key] = t
    t.start()


def wait_for_checkpoints(raise_errors: bool = True) -> bool:
    """Join every in-flight async save (call before exit / artifact use).

    Raises the first error any background save hit — the caller is about
    to rely on the artifact existing. Preemption paths pass
    ``raise_errors=False`` (warn instead): their job is to get model_last
    written inside the cluster grace window, and a died best-flush must
    not abort that. Returns True when every joined save succeeded, so
    non-raising callers can re-save synchronously on failure."""
    for t in list(_PENDING.values()):
        t.join()
    _PENDING.clear()
    if _ASYNC_ERRORS:
        err = _ASYNC_ERRORS[0]
        _ASYNC_ERRORS.clear()
        if raise_errors:
            raise RuntimeError("background checkpoint save failed") from err
        import logging
        logging.getLogger("video_spike_tpu").warning(
            "background checkpoint save failed (continuing): %r", err)
        return False
    return True


def load_checkpoint(directory: str | Path, name: str,
                    target: Optional[Any] = None) -> Any:
    """Load the pytree at `directory/name`; `target` restores dtypes/shapes
    and shardings when given."""
    path = (Path(directory) / name).resolve()
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def checkpoint_exists(directory: str | Path, name: str) -> bool:
    """True when `directory/name` holds a checkpoint. Heals the one
    crash window :func:`save_checkpoint`'s swap protocol can leave open:
    a kill between its two renames leaves only ``<name>.stale`` (the
    complete previous checkpoint) — restore it."""
    path = Path(directory) / name
    if path.exists():
        return True
    stale = path.parent / (path.name + ".stale")
    if stale.exists():
        import os as _os
        try:
            _os.rename(stale, path)
        except OSError:   # concurrent healer (multi-process shared fs)
            return path.exists()
        return True
    return False
