"""Host->HBM streaming: background batch production + double-buffered
device_put.

The reference decodes mp4s synchronously inside the DataLoader worker and
pays a blocking H2D copy per batch (``/root/reference/src/loader/base.py:24``,
``/root/reference/src/utils/utils.py:61-66``). Here a producer thread keeps a
small queue of host batches while `jax.device_put` (async under the hood)
stages the next batch into HBM as the current step executes — the TPU never
waits on tar decode for cached epochs.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional, Sequence

import jax
import numpy as np

_SENTINEL = object()


def _producer(it: Iterable, q: "queue.Queue", err: list,
              stop: "threading.Event") -> None:
    try:
        for item in it:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.05)
                    break
                except queue.Full:
                    continue
            if stop.is_set():
                return
    except BaseException as e:  # propagate to consumer
        err.append(e)
    finally:
        # the sentinel must land even when the queue is momentarily full
        # (normal exhaustion with a slow consumer), but must not block
        # forever once the consumer has abandoned the queue (stop set)
        while not stop.is_set():
            try:
                q.put(_SENTINEL, timeout=0.05)
                break
            except queue.Full:
                continue


def background(iterable: Iterable, depth: int = 2) -> Iterator:
    """Run `iterable` in a daemon thread, yielding with `depth` readahead.

    Closing the generator (``.close()``, or abandoning it) stops the
    producer thread and JOINS it, so after close no code touches the source
    iterable or its rng streams — callers that snapshot sampler state for
    mid-epoch resume (``ContrastTrainer.fit``) rely on this quiescence."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err: list = []
    stop = threading.Event()
    t = threading.Thread(target=_producer, args=(iterable, q, err, stop),
                         daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        # The join must actually guarantee quiescence: a timed-out join that
        # silently proceeds would let the producer finish an in-flight draw
        # AFTER the caller snapshots sampler/rng state, corrupting mid-epoch
        # resume. The producer re-checks `stop` every 50 ms around puts, so
        # the only way to be alive after the grace window is a source draw
        # stuck for minutes (e.g. a blocked device transfer) — fail loudly
        # rather than hand back control with the source still in use.
        t.join(timeout=60.0)
        if t.is_alive():
            raise RuntimeError(
                "background() producer failed to quiesce within 60 s of "
                "close; the source iterable may still be mid-draw, so "
                "sampler-state snapshots taken now would be unsafe")


def device_put_batch(batch: Dict, sharding=None,
                     array_keys: Optional[Sequence[str]] = None) -> Dict:
    """device_put the array entries of a batch dict (strings stay on host)."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and (array_keys is None or k in array_keys):
            out[k] = jax.device_put(v, sharding) if sharding is not None \
                else jax.device_put(v)
        else:
            out[k] = v
    return out


def prefetch_to_device(iterable: Iterable[Dict], sharding=None,
                       depth: int = 2,
                       transform: Optional[Callable[[Dict], Dict]] = None
                       ) -> Iterator[Dict]:
    """Decode in a background thread and keep `depth` batches staged in HBM.

    `transform` runs on the host thread (e.g. padding to a mesh-divisible
    batch) before the device transfer.
    """
    staged: list = []
    for batch in background(iterable, depth=depth):
        if transform is not None:
            batch = transform(batch)
        staged.append(device_put_batch(batch, sharding))
        if len(staged) > depth:
            yield staged.pop(0)
    yield from staged
