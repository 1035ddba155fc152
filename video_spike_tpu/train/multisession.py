"""Multi-session sharded training for the end-to-end video->spike flagship.

BASELINE.json config 5: trials from several IBL sessions train one model,
session-sharded over the mesh ``data`` axis. Sessions have different neuron
counts, so spike targets are padded to ``max_neurons`` and the Poisson NLL
is masked per (valid-trial x valid-neuron) element; evaluation reports
bits-per-spike / R² per session over its real neurons only.

The reference has no multi-session trainer (its ``num_sessions`` config keys
are vestigial); this subsystem is the scaling path the TPU build adds.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax

from video_spike_tpu.core.logging import logging as make_logger
from video_spike_tpu.core.rng import KeySequence
from video_spike_tpu.data.dataset import SessionDataset, split_dataset
from video_spike_tpu.data.prefetch import background
from video_spike_tpu.ops.metrics import metrics_list
from video_spike_tpu.ops.poisson import poisson_nll
from video_spike_tpu.parallel import multihost as mh
from video_spike_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from video_spike_tpu.train.base import make_optimizer
from video_spike_tpu.train.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    parallel_device_get,
    save_checkpoint,
    save_checkpoint_async,
    wait_for_checkpoints,
)


def masked_poisson_nll(log_rates: jax.Array, targets: jax.Array,
                       neuron_mask: jax.Array,
                       n_valid_rows: jax.Array) -> jax.Array:
    """Mean Poisson NLL over (valid trial, any bin, valid neuron) elements.
    neuron_mask: (B, N_max) 0/1; n_valid_rows: scalar."""
    nll = poisson_nll(log_rates, targets)
    b, t = log_rates.shape[:2]
    rows = (jnp.arange(b) < n_valid_rows).astype(nll.dtype)
    mask = rows[:, None, None] * neuron_mask[:, None, :]  # (B, 1, N)
    # mask broadcasts over the T axis, so the element count is sum(mask) * T
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask) * t, 1.0)


class MultiSessionTrainer:
    """Round-robin per-session batches through one jitted sharded step."""

    def __init__(self, model, config, eids: Sequence[str],
                 data_dir: str, log_dir: str = "results_multi",
                 mesh=None, seed: int = 42, max_neurons: Optional[int] = None):
        self.model = model
        self.config = config
        self.eids = list(eids)
        self.sid = {e: i for i, e in enumerate(self.eids)}
        self.log = make_logger(header="[multisession]")
        if mesh is None:
            mesh_cfg = config.training.get("mesh", {}) or {}
            mesh = make_mesh(n_data=mesh_cfg.get("data"),
                             n_model=mesh_cfg.get("model", 1))
        self.mesh = mesh
        self.batch_shd = batch_sharding(self.mesh)
        self.repl = replicated(self.mesh)
        # multi-host: same program on every process over the global mesh
        # (SURVEY.md §5.8); each host streams its own shard of every
        # session's training trials into the global batch, eval stays
        # replicated, rank 0 owns artifacts (same contract as BaseTrainer)
        self._multihost = mh.is_multihost()
        self._is_main = jax.process_index() == 0
        self.log_dir = os.path.join(log_dir, "multi_" + "_".join(
            e[:5] for e in self.eids))
        os.makedirs(self.log_dir, exist_ok=True)
        self.keys = KeySequence(seed)
        from video_spike_tpu.core.tracking import Tracker
        self.tracker = Tracker(self.log_dir, name="multisession")

        mods = ["ap", "video", "timestamp"]
        bs = config.training.train_batch_size
        self.splits = {}
        self.train_loaders: Dict[str, SessionDataset] = {}
        self.val_loaders: Dict[str, SessionDataset] = {}
        self.test_loaders: Dict[str, SessionDataset] = {}
        self.n_neurons: Dict[str, int] = {}
        for eid in self.eids:
            split = split_dataset(data_dir, eid=eid, seed=seed)
            self.splits[eid] = split
            # host-local training shard (the per-rank DataLoader split of
            # the reference's DDP sampler); val/test stay replicated
            train_files = mh.shard_files_for_process(split["train"])
            self.train_loaders[eid] = SessionDataset(
                train_files, bs, shuffle=True, seed=seed, modalities=mods)
            self.val_loaders[eid] = SessionDataset(
                split["val"], bs, modalities=mods)
            self.test_loaders[eid] = SessionDataset(
                split["test"], bs, modalities=mods)
            probe = next(iter(self.val_loaders[eid]
                              if split["val"] else self.train_loaders[eid]))
            self.n_neurons[eid] = probe["ap"].shape[2]
        self.max_neurons = max_neurons or max(self.n_neurons.values())

        # global steps/epoch: in multihost each process contributes one
        # GLOBAL step per local batch of its shard, so divide by
        # process_count (else the OneCycle schedule never completes)
        steps_per_epoch = sum(len(split["train"]) // bs
                              for split in self.splits.values())
        steps_per_epoch //= jax.process_count()
        self.tx, self.schedule = make_optimizer(
            config, steps_per_epoch * config.training.num_epochs)
        self.params = None
        self.opt_state = None
        self._step_fn = None
        self._eval_fn = None
        self._gstep = 0
        self._start_epoch = 0
        self._best_bps = -np.inf
        # best-checkpoint discipline mirrors BaseTrainer: improvements stash
        # an on-device copy (~1 ms) and the disk write (a full device_get
        # through the host link) happens asynchronously at the save_every
        # cadence + once at the end
        self._best_params = None
        self._best_epoch = -1
        self._last_best_flush = -(1 << 30)
        self._save_every = int(config.training.get("save_every", 100) or 100)
        self._staged_bytes = 0
        self._rng = np.random.default_rng(seed)
        self._device_cache_enabled = bool(
            config.training.get("device_cache", True))
        self._device_cache_gb = float(
            config.training.get("device_cache_gb", 6.0))
        self._dev_data = None
        self._cached_step = None

    # ------------------------------------------------------------------
    def _pad_batch(self, batch: Dict[str, np.ndarray], eid: str):
        """Pad spikes to max_neurons and the batch to a mesh multiple."""
        video = np.asarray(batch["video"], dtype=np.uint8)
        ap = np.asarray(batch["ap"], dtype=np.float32)
        n = self.n_neurons[eid]
        if ap.shape[2] < self.max_neurons:
            ap = np.pad(ap, ((0, 0), (0, 0),
                             (0, self.max_neurons - ap.shape[2])))
        b = ap.shape[0]
        n_data = self.mesh.shape["data"]
        pad = (-b) % n_data
        if pad:
            video = np.concatenate([video, np.repeat(video[-1:], pad, 0)], 0)
            ap = np.concatenate([ap, np.repeat(ap[-1:], pad, 0)], 0)
        bp = ap.shape[0]
        sids = np.full((bp,), self.sid[eid], np.int32)
        nmask = np.zeros((bp, self.max_neurons), np.float32)
        nmask[:, :n] = 1.0
        if self._multihost:
            # eval path: every host holds the same rows; the replicated
            # host batch becomes one globally sharded array whose row
            # mask (n_valid=b) keeps only rank 0's copy in the loss
            from jax.sharding import PartitionSpec as P
            g = mh.replicated_rows_to_global(self.mesh, P("data"),
                                             video, ap, sids, nmask)
            return (*g, jnp.float32(b))
        return (jax.device_put(video, self.batch_shd),
                jax.device_put(ap, self.batch_shd),
                jax.device_put(sids, self.batch_shd),
                jax.device_put(nmask, self.batch_shd),
                jnp.float32(b))

    def _init_if_needed(self, video, sids) -> None:
        if self.params is not None:
            return
        with jax.default_device(jax.local_devices()[0]):
            params = self.model.init(self.keys(), jnp.asarray(video[:1]),
                                     jnp.asarray(sids[:1]))
        self.params = mh.replicate_tree(params, self.repl)
        # on replicated global inputs the eager tx.init output is already
        # replicated over the global mesh (device_put cannot target the
        # other hosts' devices)
        self.opt_state = (self.tx.init(self.params) if self._multihost
                          else jax.device_put(self.tx.init(self.params),
                                              self.repl))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.params))
        self.log.info(f"VTT: {n/1e6:.1f}M params, sessions={self.eids}, "
                      f"max_neurons={self.max_neurons}")
        model, tx = self.model, self.tx

        def train_step(params, opt_state, video, ap, sids, nmask, n_valid):
            def loss_fn(p):
                out = model.apply(p, video, sids)
                return masked_poisson_nll(out, ap, nmask, n_valid)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step_fn = jax.jit(train_step, donate_argnums=(0, 1))
        self._eval_fn = jax.jit(lambda p, v, s: model.apply(p, v, s))

    # ------------------------------------------------------------------
    def _interleaved_batches(self):
        """Round-robin over session loaders so every step is single-session
        (static shapes) but sessions mix within the epoch."""
        iters = {e: iter(background(iter(self.train_loaders[e]), depth=1))
                 for e in self.eids}
        live = set(self.eids)
        while live:
            for eid in list(self.eids):
                if eid not in live:
                    continue
                try:
                    yield eid, next(iters[eid])
                except StopIteration:
                    live.discard(eid)

    def _stage_device_dataset(self) -> bool:
        """Stage every session's trials in HBM with padded spike targets.

        With per-sample session ids and neuron masks, cached batches mix
        sessions freely (the model gathers each trial's head), unlike the
        streaming path's single-session round-robin.
        """
        if self._dev_data is not None:
            return True
        if self._multihost:
            # the per-step global index gather would ride DCN every step;
            # multihost streams host-local shards (BaseTrainer policy)
            return False
        if not self._device_cache_enabled:
            return False
        vids, aps, sids, masks = [], [], [], []
        for eid in self.eids:
            for batch in self.train_loaders[eid]:
                v = np.asarray(batch["video"], dtype=np.uint8)
                a = np.asarray(batch["ap"], dtype=np.float32)
                n = self.n_neurons[eid]
                if a.shape[2] < self.max_neurons:
                    a = np.pad(a, ((0, 0), (0, 0),
                                   (0, self.max_neurons - a.shape[2])))
                m = np.zeros((v.shape[0], self.max_neurons), np.float32)
                m[:, :n] = 1.0
                vids.append(v)
                aps.append(a)
                sids.append(np.full(v.shape[0], self.sid[eid], np.int32))
                masks.append(m)
        V = np.concatenate(vids, 0)
        A = np.concatenate(aps, 0)
        S = np.concatenate(sids, 0)
        M = np.concatenate(masks, 0)
        self._n_train = V.shape[0]
        if V.nbytes + A.nbytes > self._device_cache_gb * 1e9:
            self.log.info("dataset exceeds device cache cap; streaming")
            self._device_cache_enabled = False
            return False
        self._staged_bytes = V.nbytes + A.nbytes
        pad = (-V.shape[0]) % self.mesh.shape["data"]
        if pad:
            V, A, S, M = (np.concatenate([x, np.repeat(x[-1:], pad, 0)], 0)
                          for x in (V, A, S, M))
        self._init_if_needed(V[:1], S[:1])
        self._dev_data = tuple(
            jax.device_put(x, self.batch_shd) for x in (V, A, S, M))
        self.log.info(f"staged {V.nbytes/1e6:.0f} MB across "
                      f"{len(self.eids)} sessions in HBM")

        model, tx = self.model, self.tx

        def cached_step(params, opt_state, V, A, S, M, idx, n_valid):
            video = jnp.take(V, idx, axis=0)
            ap = jnp.take(A, idx, axis=0)
            sid = jnp.take(S, idx, axis=0)
            nmask = jnp.take(M, idx, axis=0)

            def loss_fn(p):
                out = model.apply(p, video, sid)
                return masked_poisson_nll(out, ap, nmask, n_valid)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._cached_step = jax.jit(cached_step, donate_argnums=(0, 1))
        return True

    def _train_epoch_cached(self) -> dict:
        V, A, S, M = self._dev_data
        bs = self.config.training.train_batch_size
        bs += (-bs) % self.mesh.shape["data"]
        perm = self._rng.permutation(self._n_train)
        losses = []
        for s in range(0, self._n_train, bs):
            idx = perm[s:s + bs]
            n_valid = len(idx)
            if n_valid < bs:
                idx = np.concatenate([idx, np.repeat(idx[-1:], bs - n_valid)])
            self.params, self.opt_state, loss = self._cached_step(
                self.params, self.opt_state, V, A, S, M,
                jax.device_put(idx.astype(np.int32), self.batch_shd),
                jnp.float32(n_valid))
            losses.append(loss)
            self._gstep += 1
        # one device_get per epoch (each float(scalar) is a ~29 ms RTT)
        loss_vals = np.asarray(jnp.stack(losses))
        return {"train_loss": round(float(loss_vals.mean()), 5),
                "lr": float(self.schedule(self._gstep))}

    def _train_epoch_multihost(self) -> dict:
        """One epoch across processes: each host round-robins its local
        session shards, drops ragged tail batches (DDP drop_last), hosts
        agree on the common step count, and every step assembles the
        global mixed-session batch from the local rows — per-row session
        ids/neuron masks make cross-host session mixing free."""
        bs = self.config.training.train_batch_size
        # common step count WITHOUT materializing the epoch (buffering all
        # sessions' raw video batches in a list cost GBs of host RAM and
        # starved the tunnel client): each loader batches its shard
        # sequentially, so full batches per session = num_trials // bs
        steps = mh.global_min(sum(dl.num_trials // bs
                                  for dl in self.train_loaders.values()))
        losses = []
        for eid, batch in self._interleaved_batches():
            if len(losses) >= steps:
                break
            video = np.asarray(batch["video"], dtype=np.uint8)
            ap = np.asarray(batch["ap"], dtype=np.float32)
            if video.shape[0] < bs:   # ragged tail (drop_last semantics)
                continue
            n = self.n_neurons[eid]
            if ap.shape[2] < self.max_neurons:
                ap = np.pad(ap, ((0, 0), (0, 0),
                                 (0, self.max_neurons - ap.shape[2])))
            sids = np.full((bs,), self.sid[eid], np.int32)
            nmask = np.zeros((bs, self.max_neurons), np.float32)
            nmask[:, :n] = 1.0
            self._init_if_needed(video, np.zeros(1, np.int32))
            g = mh.local_rows_to_global(self.batch_shd, video, ap, sids,
                                        nmask)
            n_valid = jnp.float32(bs * jax.process_count())
            self.params, self.opt_state, loss = self._step_fn(
                self.params, self.opt_state, *g, n_valid)
            losses.append(loss)
            self._gstep += 1
        if not losses:   # a host shard produced no full batch this epoch
            return {"train_loss": float("nan"),
                    "lr": float(self.schedule(self._gstep))}
        loss_vals = np.asarray(jnp.stack(losses))  # replicated scalars
        return {"train_loss": round(float(loss_vals.mean()), 5),
                "lr": float(self.schedule(self._gstep))}

    def train_epoch(self) -> dict:
        if self._multihost:
            return self._train_epoch_multihost()
        if self._stage_device_dataset():
            return self._train_epoch_cached()
        losses = []
        for eid, batch in self._interleaved_batches():
            video, ap, sids, nmask, n_valid = self._pad_batch(batch, eid)
            self._init_if_needed(np.asarray(batch["video"], np.uint8),
                                 np.zeros(1, np.int32))
            self.params, self.opt_state, loss = self._step_fn(
                self.params, self.opt_state, video, ap, sids, nmask, n_valid)
            losses.append(loss)
            self._gstep += 1
        loss_vals = np.asarray(jnp.stack(losses))  # one sync (see above)
        return {"train_loss": round(float(loss_vals.mean()), 5),
                "lr": float(self.schedule(self._gstep))}

    def _iter_staged_eval(self, loaders, need_ap: bool = True):
        """``need_ap=False`` drops the padded device ``ap`` tensor from the
        yielded item: only the on-device light metrics path reads it, so
        pinning it for the host path (multihost / return_outputs) would
        just inflate eval cache pressure."""
        for eid, loader in loaders.items():
            if loader.num_trials == 0:
                continue
            for batch in loader:
                self._init_if_needed(
                    np.asarray(batch["video"], np.uint8),
                    np.zeros(1, np.int32))
                video, ap, sids, nmask, n_valid = self._pad_batch(
                    batch, eid)
                yield (eid, video, sids, batch["ap"].shape[0],
                       np.asarray(batch["ap"]), ap if need_ap else None)

    def _eval_batches(self, loaders, phase: str, need_ap: bool = True):
        """Evaluation inputs are static: stage each session's batches on
        device once (same rationale as ``BaseTrainer._eval_batches`` — the
        video re-upload plus per-batch RTTs dominated eval wall time).
        Shares the train cache's ``device_cache_gb`` budget; splits beyond
        the remainder stream instead of pinning HBM."""
        import itertools
        cache = getattr(self, "_eval_input_cache", None)
        if cache is None:
            cache = self._eval_input_cache = {}
        if phase in cache:
            if cache[phase] is not None:
                return cache[phase]
            return self._iter_staged_eval(loaders, need_ap)  # too big: stream
        cap = max(self._device_cache_gb * 1e9 - self._staged_bytes, 0)
        staged, nbytes = [], 0
        it = self._iter_staged_eval(loaders, need_ap)
        for item in it:
            staged.append(item)
            nbytes += item[1].nbytes + (
                item[5].nbytes if item[5] is not None else 0)
            if nbytes > cap:
                self.log.info(f"{phase} split exceeds the remaining device "
                              f"cache budget; streaming eval inputs")
                cache[phase] = None
                return itertools.chain(staged, it)
        cache[phase] = staged
        return staged

    def _eval(self, loaders: Dict[str, SessionDataset], phase: str,
              return_outputs: bool = False) -> dict:
        per_session = {}
        gt_out, pred_out = {}, {}
        sess_out: Dict[str, list] = {}
        light = not return_outputs and not self._multihost
        for eid, video, sids, b, ap_np, ap_d in self._eval_batches(
                loaders, phase, need_ap=light):
            out = self._eval_fn(self.params, video, sids)
            sess_out.setdefault(eid, []).append((out, b, ap_np, ap_d))
            if ap_d is None:   # phase was staged for the host path
                light = False
        # light path: per-session metrics on device, one scalar fetch for
        # the whole eval (the host path fetches every session's preds and
        # runs numpy metrics — ~200 ms/epoch on a 1-core host). Arrays are
        # only materialized for the test contract / figures.
        if light:
            from video_spike_tpu.ops.metrics import device_eval_metrics
            import jax.numpy as jnp
            eids, scalars = [], []
            for eid, outs in sess_out.items():
                n = self.n_neurons[eid]
                out_cat = jnp.concatenate(
                    [o[:b, :, :n] for o, b, _, _ in outs], axis=0)
                gt_cat = jnp.concatenate(
                    [a[:b, :, :n] for o, b, _, a in outs], axis=0)
                bps, r2 = device_eval_metrics(out_cat, gt_cat)
                eids.append(eid)
                scalars.extend([bps, r2])
            vals = np.asarray(jnp.stack(scalars), np.float64)  # ONE sync
            for i, eid in enumerate(eids):
                per_session[eid] = {
                    "bps": float(vals[2 * i]),
                    "rsquared": float(vals[2 * i + 1])}
        else:
            for eid, outs in sess_out.items():
                n = self.n_neurons[eid]
                gts = [ap[:, :, :n] for _, _, ap, _ in outs]
                # device outputs fetched here, one transfer per batch
                preds = [np.exp(mh.gather_rows(o)[:b, :, :n])
                         for o, b, _, _ in outs]
                gt = np.concatenate(gts, 0)
                pr = np.concatenate(preds, 0)
                res = metrics_list(np.swapaxes(gt, 0, -1),
                                   np.swapaxes(pr, 0, -1),
                                   metrics=("bps", "rsquared"))
                per_session[eid] = res
                if return_outputs:
                    gt_out[eid], pred_out[eid] = gt, pr
        agg = {f"{phase}_bps": round(float(np.mean(
                   [r["bps"] for r in per_session.values()])), 5),
               f"{phase}_rsquared": round(float(np.mean(
                   [r["rsquared"] for r in per_session.values()])), 5)}
        out = {"per_session": per_session, **agg}
        if return_outputs:
            out["gt"], out["preds"] = gt_out, pred_out
        return out

    def _plot_figs(self, ev: dict, tag: str) -> None:
        """Best-epoch gt/pred + per-neuron R² figures per session, routed
        through the tracker figure channel (reference parity,
        ``/root/reference/src/trainer/base.py:122-127``)."""
        if not self.config.get("save_plot") or "gt" not in ev:
            return
        if not self._is_main:
            return
        from video_spike_tpu.viz.plots import plot_gt_pred, plot_neurons_r2
        import matplotlib.pyplot as plt
        for eid, gt in ev["gt"].items():
            pr = ev["preds"][eid]
            fig1 = plot_gt_pred(gt.mean(0).T, pr.mean(0).T, epoch=tag,
                                modality="ap")
            fig2 = plot_neurons_r2(gt.mean(0), pr.mean(0),
                                   neuron_idx=range(min(5, gt.shape[-1])),
                                   epoch=tag)
            for fig, kind in ((fig1, "trial"), (fig2, "neuron")):
                name = f"best_{kind}_{eid[:5]}_{tag}"
                path = os.path.join(self.log_dir, f"{name}.png")
                fig.savefig(path)
                self.tracker.log_figure(name, fig, step=self._gstep,
                                        path=path)
                plt.close(fig)

    def _save_last(self, epoch: int, block: bool = True) -> None:
        """True-resume checkpoint: params + optimizer state + counters.
        ``block=False`` (single-host, post-training only — the step loop
        must not donate these buffers again) runs the fetch + write on a
        background thread, overlapped with the test eval."""
        if self._multihost or block:
            save_checkpoint(self.log_dir, "model_last", {
                "params": parallel_device_get(self.params),
                "opt_state": parallel_device_get(self.opt_state),
                "epoch": epoch, "global_step": self._gstep,
                "best_bps": float(self._best_bps)})
        else:
            save_checkpoint_async(self.log_dir, "model_last", {
                "params": self.params, "opt_state": self.opt_state,
                "epoch": epoch, "global_step": self._gstep,
                "best_bps": float(self._best_bps)})

    def resume(self, name: str = "last") -> bool:
        """Restore params + optimizer state + epoch from ``model_last``
        (mirrors ``BaseTrainer.resume``)."""
        if not checkpoint_exists(self.log_dir, f"model_{name}"):
            return False
        eid = self.eids[0]
        probe = next(iter(self.train_loaders[eid]))   # fresh iterator; the
        # epoch loop re-iterates from the start so nothing is consumed
        self._init_if_needed(np.asarray(probe["video"], np.uint8),
                             np.zeros(1, np.int32))
        restored = load_checkpoint(
            self.log_dir, f"model_{name}",
            {"params": self.params, "opt_state": self.opt_state,
             "epoch": 0, "global_step": 0, "best_bps": 0.0})
        self.params = mh.replicate_tree(restored["params"], self.repl)
        self.opt_state = mh.replicate_tree(restored["opt_state"], self.repl)
        self._gstep = int(restored["global_step"])
        self._start_epoch = int(restored["epoch"]) + 1
        self._best_bps = float(restored["best_bps"])
        self.log.info(f"resumed from epoch {restored['epoch']} "
                      f"(step {self._gstep})")
        return True

    def _flush_best(self, block: bool = True) -> None:
        """Write the stashed best params; async keeps training running
        (the device_get of a large flagship stalls the loop otherwise)."""
        if self._best_params is None or self._last_best_flush == self._best_epoch:
            return    # nothing stashed, or this best is already on disk
        tree = {"params": self._best_params, "epoch": self._best_epoch}
        if self._multihost:
            # all-rank orbax barrier must stay in program order
            block = True
        if block:
            save_checkpoint(self.log_dir, "model_best",
                            parallel_device_get(tree))
        else:
            save_checkpoint_async(self.log_dir, "model_best", tree)

    def train(self) -> dict:
        from video_spike_tpu.core.preempt import graceful_stop

        want_figs = bool(self.config.get("save_plot"))
        t0 = time.time()
        with graceful_stop(self.log) as preempted:
            for epoch in range(self._start_epoch,
                               self.config.training.num_epochs):
                tr = self.train_epoch()
                ev = self._eval(self.val_loaders, "eval",
                                return_outputs=want_figs)
                line = {"epoch": epoch, **tr,
                        "eval_bps": ev["eval_bps"],
                        "eval_rsquared": ev["eval_rsquared"]}
                self.log.info(f"{line}")
                self.tracker.log(line, step=self._gstep)
                if ev["eval_bps"] > self._best_bps:
                    self._best_bps = ev["eval_bps"]
                    # on-device stash (~1 ms); disk flush at the save_every
                    # cadence on a background thread (BaseTrainer policy)
                    self._best_params = jax.tree.map(jnp.copy, self.params)
                    self._best_epoch = epoch
                    if epoch - self._last_best_flush >= self._save_every:
                        self._flush_best(block=False)
                        self._last_best_flush = epoch
                    if self._is_main:   # one writer per shared log_dir
                        self._plot_figs(ev, tag=str(epoch))
                # agree globally before diverging into the save barrier
                # (see BaseTrainer.train — a local flag deadlocks multihost)
                if mh.global_any(bool(preempted)):
                    # persist within the cluster grace window and return
                    # immediately — no best-restore, no test eval (a hard
                    # kill mid-eval would truncate test_results.npy)
                    wait_for_checkpoints(raise_errors=False)
                    self._save_last(epoch)
                    self._flush_best()
                    self.log.info(f"preempted at epoch {epoch}: "
                                  f"model_last saved, resume with --resume")
                    return {"preempted": True, "epoch": epoch,
                            "best_eval_bps": self._best_bps, "test": None}
            # post-loop: fetch+write overlap the test eval below (the
            # chunked full-tree fetch is still ~16 s on this link); the
            # async queue serializes same-key saves, and the trainer waits
            # before returning
            self._save_last(self.config.training.num_epochs - 1,
                            block=False)
        self._flush_best(block=False)
        best_bps = self._best_bps
        self.log.info(f"trained in {time.time()-t0:.1f}s; "
                      f"best eval_bps={best_bps}")
        if self._best_params is not None:
            self.params = self._best_params   # already device-resident
        elif checkpoint_exists(self.log_dir, "model_best"):
            restored = load_checkpoint(self.log_dir, "model_best",
                                       {"params": self.params, "epoch": 0})
            self.params = mh.replicate_tree(restored["params"], self.repl)
        test = self._eval(self.test_loaders, "test",
                          return_outputs=want_figs)
        wait_for_checkpoints()   # artifacts must exist before returning
        self._plot_figs(test, tag="test")
        if self._is_main:
            np.save(
                os.path.join(self.log_dir, "test_results.npy"),
                {"test_res": {"test_bps": test["test_bps"],
                              "test_rsquared": test["test_rsquared"]},
                 "per_session": {e: r
                                 for e, r in test["per_session"].items()}})
        self.log.info(f"test: {test['test_bps']} bps, "
                      f"{test['test_rsquared']} r2")
        return {"best_eval_bps": best_bps,
                "test": {k: v for k, v in test.items()
                         if k not in ("gt", "preds")}}
