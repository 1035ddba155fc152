"""Supervised trainer: epoch loop, Poisson-NLL objective, per-session
bits-per-spike / R² eval, best-checkpoint selection, test report.

Capability parity with ``/root/reference/src/trainer/base.py:15-291``:

- input assembly concatenates the flattened ``input: true`` modalities for
  the Linear family, raw video otherwise (``base.py:61-70``);
- loss = PoissonNLL(log_input) mean (``base.py:141-143``);
- eval accumulates gt/preds per session, exponentiates the log-rates, and
  reports nanmean bps + per-trial sklearn R² ("rsquared") (``base.py:161-206``);
- checkpoints ``model_best`` on best eval bps and ``model_last`` at the end,
  then reloads best for the test split and writes ``test_results.npy``
  (``base.py:106-256``).

TPU-first mechanics: a single jitted train step (params donated, batch
sharded over the mesh ``data`` axis so the gradient all-reduce rides ICI),
host-threaded decode with double-buffered HBM prefetch, and device-vectorized
metrics.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from video_spike_tpu.core.logging import logging as make_logger
from video_spike_tpu.core.rng import KeySequence
from video_spike_tpu.data.dataset import input_modalities
from video_spike_tpu.data.prefetch import background
from video_spike_tpu.ops.metrics import metrics_list
from video_spike_tpu.ops.poisson import poisson_nll_mean
from video_spike_tpu.parallel import multihost as mh
from video_spike_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from video_spike_tpu.train.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
    save_checkpoint_async,
    wait_for_checkpoints,
)


def make_optimizer(config, total_steps: int, frozen_paths: tuple = ()):
    """AdamW + OneCycle cosine schedule (torch OneCycleLR conventions:
    initial lr = max_lr / div_factor, final = initial / 1e4;
    ``/root/reference/src/train.py:44-57``), with optional gradient
    accumulation (``optimizer.gradient_accumulation_steps`` — present in the
    reference's config schema but inert there; here it wraps the optimizer
    in optax.MultiSteps).

    ``frozen_paths``: names of param subtrees excluded from optimization
    (the torch ``requires_grad=False`` analog — the reference's frozen
    VideoMAE backbone never sees the optimizer, so decoupled weight decay
    must not touch it either). Masked leaves keep no Adam moments."""
    opt = config.optimizer
    accum = int(opt.get("gradient_accumulation_steps", 1) or 1)
    # a handful of steps makes the warmup interval round to zero length
    # inside optax's piecewise interpolation -> nan lr; floor at 16
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps // accum, 16),
        peak_value=opt.lr,
        pct_start=opt.get("warmup_pct", 0.15),
        div_factor=opt.get("div_factor", 10),
        final_div_factor=1e4,
    )
    # HBM-bound updates (the raw-video Linear model is ~500M params) can opt
    # into reduced precision; default float32 matches the reference's torch
    # AdamW numerics.
    #   optimizer.param_dtype: bfloat16_sr -> bf16 params + grads + moments,
    #       stochastically-rounded updates (fastest: 16.0 -> 12.1 ms/step on
    #       the 504M readout, convergence-tested in tests/test_optim.py)
    #   optimizer.lowmem_state: true  -> both Adam moments in bf16
    #   optimizer.mu_dtype: bfloat16  -> first moment only (optax built-in)
    if opt.get("name", "adamw") == "adafactor_lean":
        # this framework's own factored-RMS transform (ops/optim): no
        # side passes at all and bf16 update emission — the fastest
        # HBM-bound update scheme measured (scripts/profile_adafactor.py)
        from video_spike_tpu.ops.optim import adafactor_lean
        tx = adafactor_lean(schedule)
    elif opt.get("name", "adamw") == "adafactor":
        # factored second moment (optax.adafactor): the full Adam moments of
        # a 504M-param readout are ~4 GB of HBM traffic per step; the
        # factored stats are ~2M elements. Opt-in via optimizer.name —
        # AdamW stays the reference-parity default
        # (/root/reference/src/train.py:44). Composes with
        # param_dtype: bfloat16_sr (the trainer's SR apply handles the
        # bf16 store; adafactor's stats stay f32 either way).
        # parameter-scale and update-clipping each cost a full f32 pass
        # over the big tensor (measured +4.2 ms on the 504M headline,
        # scripts/profile_adafactor.py); the "lean" production setting
        # turns both off (param_scale: false, clipping: null)
        tx = optax.adafactor(
            schedule,
            momentum=opt.get("momentum"),
            weight_decay_rate=opt.get("adafactor_wd"),
            multiply_by_parameter_scale=opt.get("param_scale", True),
            clipping_threshold=opt.get("clipping", 1.0))
    elif opt.get("param_dtype") == "bfloat16_sr":
        from video_spike_tpu.ops.optim import adamw_sr_bf16
        tx = adamw_sr_bf16(schedule, weight_decay=opt.get("wd", 0.01),
                           eps=opt.get("eps", 1e-8))
    elif opt.get("lowmem_state"):
        from video_spike_tpu.ops.optim import adamw_lowmem
        tx = adamw_lowmem(schedule, weight_decay=opt.get("wd", 0.01),
                          eps=opt.get("eps", 1e-8))
    else:
        mu_dtype = opt.get("mu_dtype", None)
        tx = optax.adamw(
            schedule, weight_decay=opt.get("wd", 0.01),
            eps=opt.get("eps", 1e-8),
            mu_dtype=jnp.bfloat16 if mu_dtype == "bfloat16" else None)
    if frozen_paths:
        frozen = frozenset(frozen_paths)

        def labels(params):
            def label(path, _):
                return ("freeze" if any(
                    getattr(k, "key", getattr(k, "name", None)) in frozen
                    for k in path) else "train")
            return jax.tree_util.tree_map_with_path(label, params)

        # set_to_zero emits zero updates for frozen leaves (robust even if a
        # grad leaked past stop_gradient) and keeps no optimizer state
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule


class BaseTrainer:
    def __init__(self, model, train_loader, eval_loader, test_loader,
                 config, eid: str, dataset_split_dict: dict,
                 log_dir: Optional[str] = None, mesh=None,
                 criterion=poisson_nll_mean, seed: Optional[int] = None):
        self.model = model
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self.test_loader = test_loader
        self.config = config
        self.eid = eid
        self.split = dataset_split_dict
        self.criterion = criterion
        self.metrics = ("bps", "rsquared")
        self.log = make_logger(header="[train]")
        self.input_mods = input_modalities(config)
        self.model_class = config.model.model_class

        # mesh shape from config (the Accelerate-config analog): e.g.
        # training.mesh: {data: 4, model: 2}; default = all devices on data
        if mesh is None:
            mesh_cfg = config.training.get("mesh", {}) or {}
            mesh = make_mesh(n_data=mesh_cfg.get("data"),
                             n_model=mesh_cfg.get("model", 1))
        self.mesh = mesh
        self.batch_shd = batch_sharding(self.mesh)
        self.repl = replicated(self.mesh)
        # multi-host: same single program on every process over the global
        # mesh; each host feeds its local trial shard into the global batch
        # (SURVEY.md §5.8 — the Accelerate launcher layer collapses here)
        self._multihost = mh.is_multihost()
        self._is_main = jax.process_index() == 0
        if self._multihost:
            bs = config.training.train_batch_size
            assert bs % jax.local_device_count() == 0, (
                f"multihost per-process batch {bs} must divide the "
                f"{jax.local_device_count()} local devices")

        base_log_dir = log_dir or config.dirs.log_dir
        self.log_dir = os.path.join(
            base_log_dir, eid[:5], "_".join(self.input_mods),
            type(model).__name__)
        os.makedirs(self.log_dir, exist_ok=True)

        self.keys = KeySequence(seed if seed is not None else config.get("seed", 42))
        # schedule horizon = global optimizer steps. In multihost, every
        # process takes ONE global step per local batch (the split dict is
        # the full dataset but each host iterates only its shard), so the
        # per-epoch step count divides by process_count — without this the
        # OneCycle schedule never finishes (training would end mid-cosine).
        total_steps = (len(dataset_split_dict["train"])
                       // (config.training.train_batch_size
                           * jax.process_count())
                       * config.training.num_epochs)
        frozen = getattr(model, "frozen_param_paths", None)
        self._frozen_paths = tuple(frozen()) if callable(frozen) else ()
        self.tx, self.schedule = make_optimizer(
            config, total_steps, frozen_paths=self._frozen_paths)
        # frozen-feature training: a model with frozen subtrees and an
        # encode/head split (VideoMAEProbe) computes embeddings ONCE per
        # trial and trains on cached features — the optimizer mask above
        # guarantees the frozen encoder cannot drift, so features staged at
        # init stay exact for the whole run. The reference re-runs the
        # frozen backbone on every batch of every epoch
        # (/root/reference/src/model/videomae.py:17-31, processor+backbone
        # inside forward under no_grad).
        self._frozen_split = bool(
            self._frozen_paths and callable(getattr(model, "encode", None))
            and callable(getattr(model, "head", None)))

        self.params = None
        self.opt_state = None
        self._step_fn = None
        self._eval_fn = None
        self._global_step = 0
        self._start_epoch = 0

        from video_spike_tpu.core.tracking import Tracker
        wandb_cfg = config.get("wandb", {}) or {}
        self.tracker = Tracker(
            self.log_dir, project=wandb_cfg.get("project", "ibl-video"),
            name=f"{eid[:5]}_{'_'.join(self.input_mods)}_"
                 f"{type(model).__name__}",
            use_wandb=bool(wandb_cfg.get("use", False)),
            config=config.to_plain() if hasattr(config, "to_plain") else None)
        prof = config.get("profiling", {}) or {}
        self._profile_dir = prof.get("dir") if prof.get("enable") else None
        self._profile_steps = prof.get("steps", 10)

        # device-resident dataset cache: IBL sessions are ~1-2 GB, far below
        # HBM, so trials are staged on-device once and every later epoch is
        # compute-bound (no per-epoch H2D). Caps at device_cache_gb.
        self._device_cache_enabled = bool(
            config.training.get("device_cache", True))
        self._device_cache_gb = float(
            config.training.get("device_cache_gb", 6.0))
        self._dev_data = None          # (X_all, ap_all) device arrays
        self._cached_step = None
        self._rng = np.random.default_rng(
            seed if seed is not None else config.get("seed", 42))
        self._best_params = None
        self._best_epoch = -1
        self._last_best_flush = -(1 << 30)
        self._save_every = int(config.training.get("save_every", 100) or 100)

        # bf16 parameter store with stochastically-rounded updates: halves
        # the HBM traffic of the (bandwidth-bound) big-model update. Small
        # leaves (< 64k elements: biases, norms) stay f32 — they cost
        # nothing and keep the sensitive scalars exact.
        self._sr_params = (config.optimizer.get("param_dtype")
                           == "bfloat16_sr")
        # fused low-rank readout update (ops/fused_readout): the giant
        # readout gradient is rank-batch, so its adafactor step never
        # materializes an (M, N) gradient. Eligible models: LinearModel
        # (first-Dense kernel) and the frozen-split VideoMAEProbe
        # (encoder_head over cached features). Incompatible with gradient
        # accumulation (MultiSteps wraps tx.update) and with frozen
        # subtrees that lack the encode/head split.
        self._fused_readout = bool(config.optimizer.get("fused_readout"))
        if self._fused_readout:
            opt_name = config.optimizer.get("name", "adamw")
            if int(config.optimizer.get(
                    "gradient_accumulation_steps", 1) or 1) > 1:
                self.log.info("fused_readout disabled: incompatible with "
                              "gradient accumulation")
                self._fused_readout = False
            elif self._frozen_paths and not self._frozen_split:
                self.log.info("fused_readout disabled: frozen paths "
                              "without an encode/head split")
                self._fused_readout = False
            elif opt_name not in ("adafactor", "adafactor_lean"):
                # the fused step IS adafactor numerics on the giant kernel;
                # pairing it with any other optimizer would silently train
                # that one layer with different numerics than configured
                # (the quality gate only ever validated the adafactor arm)
                self.log.info(
                    f"fused_readout disabled: it implements adafactor "
                    f"numerics but optimizer.name={opt_name} "
                    f"(set name: adafactor)")
                self._fused_readout = False
        self._fused_inner = None
        self._fused_is_head = False
        self._fused_split_fn = None
        if self._sr_params:
            from video_spike_tpu.ops.optim import apply_updates_sr
            self._apply_updates = apply_updates_sr
        else:
            self._apply_updates = (
                lambda params, updates, seed: optax.apply_updates(params,
                                                                  updates))

    # ------------------------------------------------------------------
    # input assembly (reference `_forward_model_outputs`)
    # ------------------------------------------------------------------
    def _assemble_inputs(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        if self.model_class == "Linear":
            if len(self.input_mods) == 1:
                mod = self.input_mods[0]
                # single modality keeps its dtype (uint8 video stays compact)
                return np.asarray(batch[mod]).reshape(
                    batch[mod].shape[0], -1)
            parts = [np.asarray(batch[mod], dtype=np.float32)
                     .reshape(batch[mod].shape[0], -1)
                     for mod in self.input_mods]
            return np.concatenate(parts, axis=-1)
        return np.asarray(batch["video"])

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------
    def _init_if_needed(self, sample_inputs: np.ndarray) -> None:
        if self.params is not None:
            return
        with jax.default_device(jax.local_devices()[0]):
            params = self.model.init(self.keys(), jnp.asarray(sample_inputs[:1]))
        pretrained = self.config.model.get("pretrained_backbone")
        if pretrained:
            # frozen-probe models (VideoMAE) load a pretrained backbone —
            # the reference's from_pretrained("MCG-NJU/videomae-base")
            # (/root/reference/src/model/videomae.py:8) becomes an explicit
            # on-disk checkpoint: orbax dir (our pretraining) or HF torch
            # state_dict / npz (released weights)
            from video_spike_tpu.models.hf_convert import (
                load_pretrained_into_probe)
            params = load_pretrained_into_probe(params, pretrained)
            self.log.info(f"loaded pretrained backbone from {pretrained}")
        if self._sr_params:
            params = jax.tree.map(
                lambda p: (p.astype(jnp.bfloat16)
                           if p.dtype == jnp.float32 and p.size >= (1 << 16)
                           else p), params)
        self.params = mh.replicate_tree(params, self.repl)
        self._fused_is_head = False
        self._fused_split_fn = None
        if self._fused_readout:
            from video_spike_tpu.ops import fused_readout as fr
            min_kernel = int(self.config.optimizer.get(
                "fused_min_kernel", 1 << 22))
            model_name = type(self.model).__name__
            kern = None
            if model_name == "LinearModel":
                kern = (params.get("params", {}).get("encoder", {})
                        .get("Dense_0", {}).get("kernel", None))
                if kern is not None and kern.ndim == 2 \
                        and kern.size >= min_kernel:
                    self._fused_inner = fr.make_fused_linear_step(
                        self.model, self.tx, self.schedule, self.criterion,
                        self._apply_updates)
                    self._fused_split_fn = fr.split_first_kernel
            elif model_name == "VideoMAEProbe" and self._frozen_split:
                kern = (params.get("params", {})
                        .get("encoder_head", {}).get("kernel", None))
                if kern is not None and kern.ndim == 2 \
                        and kern.size >= min_kernel:
                    # head-only fused step: consumes cached frozen
                    # features, so it is engaged by the HBM-cached path
                    # only (the streaming step keeps the standard update)
                    self._fused_inner = fr.make_fused_probe_head_step(
                        self.model, self.tx, self.schedule, self.criterion,
                        self._apply_updates)
                    self._fused_split_fn = fr.split_head_kernel
                    self._fused_is_head = True
            if self._fused_split_fn is not None:
                self.log.info(
                    f"fused readout update on {kern.shape} kernel "
                    f"(rank-B factored stats, no materialized gradient)")
            else:
                self.log.info("fused_readout requested but the model has "
                              "no eligible readout kernel; using the "
                              "standard step")
        # on replicated global inputs the eager tx.init output is already
        # replicated over the global mesh (device_put cannot target the
        # other hosts' devices)
        if self._fused_inner is not None:
            from video_spike_tpu.ops import fused_readout as fr
            f0, rest0 = fr.init_fused_opt_state(self.params, self.tx,
                                                split=self._fused_split_fn)
            if self._multihost:
                # tx.init on the replicated global params is already global
                # (see the comment above), but init_fused_state's fresh
                # zeros are process-local and must be lifted to the global
                # mesh explicitly or the first collective step rejects them
                self.opt_state = (mh.replicate_tree(f0, self.repl), rest0)
            else:
                self.opt_state = jax.device_put((f0, rest0), self.repl)
        else:
            self.opt_state = (self.tx.init(self.params) if self._multihost
                              else jax.device_put(self.tx.init(self.params),
                                                  self.repl))
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        self.log.info(f"initialized {type(self.model).__name__}: "
                      f"{n_params/1e6:.1f}M params")

        model, tx, criterion = self.model, self.tx, self.criterion
        apply_updates = self._apply_updates

        def train_step(params, opt_state, inputs, ap, n_valid, seed):
            def loss_fn(p):
                out = model.apply(p, inputs)
                return criterion(out, ap, n_valid)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = apply_updates(params, updates, seed)
            return params, opt_state, loss

        if self._fused_inner is not None:
            if self._fused_is_head:
                # opt_state carries the fused structure, so the streaming
                # step must use the fused head update too: encode (frozen,
                # gradient-free) then the fused head step on the features
                fused_inner = self._fused_inner

                def train_step(params, opt_state, inputs, ap, n_valid,
                               seed):
                    hidden = model.apply(params, inputs, method="encode")
                    return fused_inner(params, opt_state, hidden, ap,
                                       n_valid, seed)
            else:
                train_step = self._fused_inner

        self._train_step_raw = train_step   # unjitted: the multihost HBM
        # cache wraps it behind a block-local gather (_cached_step_mh)
        self._step_fn = jax.jit(train_step, donate_argnums=(0, 1))
        self._eval_fn = jax.jit(lambda p, x: model.apply(p, x))
        if self._frozen_split:
            self._encode_fn = jax.jit(
                lambda p, x: model.apply(p, x, method="encode"))
            self._head_fn = jax.jit(
                lambda p, x: model.apply(p, x, method="head"))

    # ------------------------------------------------------------------
    # epochs
    # ------------------------------------------------------------------
    def _pad_and_put(self, inputs: np.ndarray, ap: np.ndarray):
        """Pad the batch to a mesh-divisible size; returns device arrays and
        the valid-row count. In multihost mode every process holds the same
        rows (eval path) and the replicated host batch becomes one globally
        sharded array."""
        n_data = self.mesh.shape["data"]
        n = inputs.shape[0]
        pad = (-n) % n_data
        if pad:
            inputs = np.concatenate([inputs, np.repeat(inputs[-1:], pad, 0)], 0)
            ap = np.concatenate([ap, np.repeat(ap[-1:], pad, 0)], 0)
        if self._multihost:
            from jax.sharding import PartitionSpec as P
            x, ap_d = mh.replicated_rows_to_global(self.mesh, P("data"),
                                                   inputs, ap)
        else:
            x = jax.device_put(inputs, self.batch_shd)
            ap_d = jax.device_put(ap, self.batch_shd)
        return x, ap_d, jnp.float32(n)

    def _stage_device_dataset(self) -> bool:
        """Stage every training trial in HBM once; returns False if the
        dataset exceeds the configured cap (streaming path is used then)."""
        if self._dev_data is not None:
            return True
        if self._multihost:
            # multihost staging lives in _stage_device_dataset_multihost
            # (host-local shards + shard_map block-local gather)
            return False
        if not self._device_cache_enabled:
            return False
        xs, aps = [], []
        for batch in self.train_loader:
            xs.append(self._assemble_inputs(batch))
            aps.append(np.asarray(batch["ap"], dtype=np.float32))
        if not xs:
            return False
        X = np.concatenate(xs, axis=0)
        A = np.concatenate(aps, axis=0)
        self._n_train = X.shape[0]
        # pad the trial axis to the mesh so the staged arrays shard evenly
        # (padding rows are never sampled: the permutation covers n_train)
        pad = (-X.shape[0]) % self.mesh.shape["data"]
        if pad:
            X = np.concatenate([X, np.repeat(X[-1:], pad, 0)], axis=0)
            A = np.concatenate([A, np.repeat(A[-1:], pad, 0)], axis=0)
        if X.nbytes + A.nbytes > self._device_cache_gb * 1e9:
            self.log.info(
                f"dataset {X.nbytes/1e9:.1f} GB exceeds device cache cap; "
                f"streaming per step")
            self._device_cache_enabled = False
            return False
        self._staged_bytes = X.nbytes + A.nbytes
        self._init_if_needed(X[:1])
        self._dev_data = (jax.device_put(X, self.batch_shd),
                          jax.device_put(A, self.batch_shd))
        self.log.info(f"staged {X.nbytes/1e6:.0f} MB of trials in HBM "
                      f"({self._n_train} trials); epochs are now "
                      f"transfer-free")

        model, tx, criterion = self.model, self.tx, self.criterion
        apply_updates = self._apply_updates

        apply_fn = model.apply
        features_staged = False
        if self._frozen_split:
            F = self._encode_staged_trials()
            if F is not None:
                self._dev_data = (F, self._dev_data[1])
                self._staged_bytes = F.nbytes + A.nbytes
                apply_fn = (lambda p, x: model.apply(p, x, method="head"))
                features_staged = True
                self.log.info(
                    f"frozen-encoder features staged ({F.nbytes/1e6:.0f} MB,"
                    f" {F.dtype}); train steps are now head-only")

        fused_inner = self._fused_inner
        fused_needs_encode = self._fused_is_head and not features_staged

        def cached_step(params, opt_state, X_all, ap_all, idx, n_valid, seed):
            x = jnp.take(X_all, idx, axis=0)
            ap = jnp.take(ap_all, idx, axis=0)
            if fused_inner is not None:
                if fused_needs_encode:   # features not staged: encode first
                    x = model.apply(params, x, method="encode")
                return fused_inner(params, opt_state, x, ap, n_valid, seed)

            def loss_fn(p):
                return criterion(apply_fn(p, x), ap, n_valid)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = apply_updates(params, updates, seed)
            return params, opt_state, loss

        self._cached_step = jax.jit(cached_step, donate_argnums=(0, 1))
        return True

    def _encode_staged_trials(self):
        """Run the frozen encoder once over every staged trial and return
        the feature array (or None when it would blow the cache budget).
        One compile (fixed chunk shape, ragged tail padded); all slicing
        happens on device so nothing rides the host link."""
        X_all, A_all = self._dev_data
        rows = X_all.shape[0]
        bs = self.config.training.train_batch_size
        bs += (-bs) % self.mesh.shape["data"]
        bs = min(bs, rows)
        shape = jax.eval_shape(
            self._encode_fn, self.params,
            jax.ShapeDtypeStruct((bs,) + X_all.shape[1:], X_all.dtype))
        per_row = int(np.prod(shape.shape[1:])) * shape.dtype.itemsize
        feat_bytes = rows * per_row
        # budget the PEAK, not the end state: while staging, the raw video,
        # the per-chunk feature arrays, and the concatenated copy coexist
        # (~raw + 2x features) before the raw cache is dropped
        peak = X_all.nbytes + 2 * feat_bytes + A_all.nbytes
        if peak > self._device_cache_gb * 1e9:
            self.log.info(
                f"frozen features ({feat_bytes / 1e9:.1f} GB, staging peak "
                f"{peak / 1e9:.1f} GB) exceed the device cache cap; "
                f"keeping raw-input cached steps")
            return None
        take = jax.jit(lambda X, i: jnp.take(X, i, axis=0))
        chunks = []
        for s in range(0, rows, bs):
            idx = np.minimum(np.arange(s, s + bs), rows - 1).astype(np.int32)
            xc = take(X_all, jax.device_put(idx, self.batch_shd))
            chunks.append(self._encode_fn(self.params, xc))
        F = jnp.concatenate(chunks, axis=0)[:rows]
        del chunks   # free the chunk buffers before the re-shard copy
        return jax.device_put(F, self.batch_shd)

    def _train_epoch_cached(self) -> dict:
        X_all, ap_all = self._dev_data
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
                self.params, self.opt_state, X_all, ap_all,
                jax.device_put(idx.astype(np.int32), self.batch_shd),
                jnp.float32(n_valid),
                jnp.uint32(self._global_step & 0xFFFFFFFF))
            losses.append(loss)
            self._global_step += 1
        # one device_get for the whole epoch: each float(scalar) costs a
        # ~29 ms tunnel round trip (CLAUDE.md), so stack on device first
        loss_vals = np.asarray(jnp.stack(losses))
        return {
            "train_loss": round(float(loss_vals.mean()), 5),
            "lr": float(self.schedule(self._global_step)),
        }

    def _train_epoch_multihost(self) -> dict:
        """One epoch across processes: each host drops its ragged tail
        batch (DDP drop_last semantics), hosts agree on the common step
        count, and every step assembles the global batch from the local
        rows — XLA's gradient all-reduce spans hosts via DCN."""
        bs = self.config.training.train_batch_size
        # common step count WITHOUT materializing the epoch: the loader
        # batches its shuffled file list sequentially, so the number of
        # full batches is exactly num_trials // bs (buffering every raw
        # uint8 video batch in a list held 1-2 GB of host RAM per epoch
        # and starved the tunnel client — see CLAUDE.md timing notes)
        steps = mh.global_min(self.train_loader.num_trials // bs)
        losses = []
        for batch in background(iter(self.train_loader), depth=2):
            if len(losses) >= steps:
                break
            inputs = self._assemble_inputs(batch)
            if inputs.shape[0] < bs:   # ragged tail (drop_last semantics)
                continue
            ap = np.asarray(batch["ap"], np.float32)
            self._init_if_needed(inputs)
            x, ap_d = mh.local_rows_to_global(self.batch_shd, inputs, ap)
            n_valid = jnp.float32(bs * jax.process_count())
            self.params, self.opt_state, loss = self._step_fn(
                self.params, self.opt_state, x, ap_d, n_valid,
                jnp.uint32(self._global_step & 0xFFFFFFFF))
            losses.append(loss)
            self._global_step += 1
        if not losses:   # a host shard produced no full batch this epoch
            return {"train_loss": float("nan"),
                    "lr": float(self.schedule(self._global_step))}
        loss_vals = np.asarray(jnp.stack(losses))  # replicated scalars
        return {
            "train_loss": round(float(loss_vals.mean()), 5),
            "lr": float(self.schedule(self._global_step)),
        }

    def _stage_device_dataset_multihost(self) -> bool:
        """Multihost HBM trial cache: each process stages its HOST-LOCAL
        file shard once, split evenly across the data-axis row blocks its
        devices own, and every later epoch is transfer-free — the only
        per-step H2D is the tiny int32 index array (tracked in
        ``_cached_mh_h2d_bytes``), never the batch itself. The gather runs
        as a shard_map block-local ``jnp.take`` (zero collectives), so the
        DCN concern that forced streaming before does not arise; sampling
        shuffles WITHIN each device block (the DDP shuffle-within-shard
        contract, one granularity finer than the streaming path's
        shuffle-within-host). Falls back to the streaming path — agreed on
        by ALL processes via collectives, never one-sided — when a row
        block straddles hosts, the global batch does not divide the data
        axis, a shard is too small, or any process would blow the HBM cap.
        """
        if self._dev_data is not None:
            return True
        if not self._device_cache_enabled:
            return False
        if getattr(self, "_mh_cache_failed", False):
            return False

        n_data = self.mesh.shape["data"]
        bs_global = self.config.training.train_batch_size * jax.process_count()
        mine, g_min, private = mh.data_axis_blocks(self.mesh)
        if not private or g_min == 0 or bs_global % n_data:
            self.log.info(
                "multihost trial cache unavailable (blocks private across "
                f"hosts: {private}, min blocks/process: {g_min}, global "
                f"batch {bs_global} vs data axis {n_data}); streaming")
            self._mh_cache_failed = True
            return False
        rpb = bs_global // n_data   # batch rows gathered per device block

        xs, aps = [], []
        for batch in self.train_loader:
            xs.append(self._assemble_inputs(batch))
            aps.append(np.asarray(batch["ap"], dtype=np.float32))
        g = len(mine)
        n_local = sum(x.shape[0] for x in xs)
        # every block everywhere must hold the SAME row count R (a global
        # array is rectangular), so R is the all-process minimum; the
        # ≤(g-1)+imbalance local rows beyond g*R are dropped from the pool
        # (documented DDP drop_last analog; shards are near-balanced)
        r_block = mh.global_min(n_local // g if g else 0)
        over = False
        if r_block >= rpb:
            x_loc = np.concatenate(xs, axis=0)[: g * r_block]
            a_loc = np.concatenate(aps, axis=0)[: g * r_block]
            over = x_loc.nbytes + a_loc.nbytes > self._device_cache_gb * 1e9
        if mh.global_any(r_block < rpb or over):
            self.log.info(
                f"multihost trial cache fallback (rows/block {r_block} vs "
                f"{rpb} needed, over-cap: {over}); streaming per step")
            self._mh_cache_failed = True
            return False

        self._init_if_needed(x_loc[:1])
        global_rows = n_data * r_block
        self._dev_data = (
            jax.make_array_from_process_local_data(
                self.batch_shd, x_loc, (global_rows,) + x_loc.shape[1:]),
            jax.make_array_from_process_local_data(
                self.batch_shd, a_loc, (global_rows,) + a_loc.shape[1:]))
        self._mh_cache = {"R": r_block, "g": g, "rpb": rpb,
                          "steps": r_block // rpb}
        self._cached_mh_h2d_bytes = 0
        self.log.info(
            f"staged {(x_loc.nbytes + a_loc.nbytes) / 1e6:.0f} MB of local "
            f"trials in HBM ({g} blocks x {r_block} rows; "
            f"{self._mh_cache['steps']} steps/epoch); multihost epochs are "
            f"now transfer-free")

        take = mh.make_block_local_take(self.mesh)
        train_step = self._train_step_raw

        def cached_step(params, opt_state, x_all, ap_all, idx, n_valid,
                        seed):
            x, ap = take(x_all, ap_all, idx)
            return train_step(params, opt_state, x, ap, n_valid, seed)

        self._cached_step_mh = jax.jit(cached_step, donate_argnums=(0, 1))
        return True

    def _train_epoch_cached_multihost(self) -> dict:
        x_all, ap_all = self._dev_data
        info = self._mh_cache
        r_block, g, rpb, steps = (info["R"], info["g"], info["rpb"],
                                  info["steps"])
        # fresh within-block permutations every epoch (host-local RNG;
        # the step count is globally fixed, so streams may diverge freely)
        perms = np.stack(
            [self._rng.permutation(r_block) for _ in range(g)])
        n_valid = jnp.float32(self.mesh.shape["data"] * rpb)
        global_idx_shape = (self.mesh.shape["data"] * rpb,)
        losses = []
        for s in range(steps):
            idx_loc = np.ascontiguousarray(
                perms[:, s * rpb:(s + 1) * rpb].reshape(-1), dtype=np.int32)
            idx = jax.make_array_from_process_local_data(
                self.batch_shd, idx_loc, global_idx_shape)
            self._cached_mh_h2d_bytes += idx_loc.nbytes
            self.params, self.opt_state, loss = self._cached_step_mh(
                self.params, self.opt_state, x_all, ap_all, idx, n_valid,
                jnp.uint32(self._global_step & 0xFFFFFFFF))
            losses.append(loss)
            self._global_step += 1
        loss_vals = np.asarray(jnp.stack(losses))  # one sync per epoch
        return {
            "train_loss": round(float(loss_vals.mean()), 5),
            "lr": float(self.schedule(self._global_step)),
        }

    def train_epoch(self) -> dict:
        if self._multihost:
            if self._stage_device_dataset_multihost():
                return self._train_epoch_cached_multihost()
            return self._train_epoch_multihost()
        if self._stage_device_dataset():
            return self._train_epoch_cached()
        losses = []
        profiling = False
        for batch in background(iter(self.train_loader), depth=2):
            inputs = self._assemble_inputs(batch)
            self._init_if_needed(inputs)
            if (self._profile_dir and not profiling
                    and self._global_step > 2):
                jax.profiler.start_trace(self._profile_dir)
                profiling = True
                profile_until = self._global_step + self._profile_steps
            x, ap, n_valid = self._pad_and_put(inputs, np.asarray(batch["ap"]))
            self.params, self.opt_state, loss = self._step_fn(
                self.params, self.opt_state, x, ap, n_valid,
                jnp.uint32(self._global_step & 0xFFFFFFFF))
            losses.append(loss)
            self._global_step += 1
            if profiling and self._global_step >= profile_until:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
                self._profile_dir = None  # trace once per run
                profiling = False
        if profiling:  # epoch shorter than the profile window
            jax.block_until_ready(losses[-1])
            jax.profiler.stop_trace()
            self._profile_dir = None
        loss_vals = np.asarray(jnp.stack(losses))  # one sync (see above)
        return {
            "train_loss": round(float(loss_vals.mean()), 5),
            "lr": float(self.schedule(self._global_step)),
        }

    def _stage_eval_batch(self, batch):
        inputs = self._assemble_inputs(batch)
        self._init_if_needed(inputs)
        ap = np.asarray(batch["ap"])
        x, ap_d, n_valid = self._pad_and_put(inputs, ap)
        if self._frozen_split:
            # stage frozen features, not raw video: staged evals then rerun
            # only the head (the params the optimizer can actually move)
            x = self._encode_fn(self.params, x)
        return (x, ap_d, n_valid, ap, list(batch["eid"]))

    def _eval_batches(self, loader, phase: str):
        """Evaluation inputs are static across epochs: stage them on device
        once (the raw-video eval batch is ~30 MB re-uploaded every epoch
        otherwise — ~25 ms through this host link) and replay the device
        arrays on later calls. The eval cache shares the train cache's
        ``device_cache_gb`` budget: what the staged train set left over is
        the cap, and a split beyond it streams per eval instead of pinning
        HBM permanently."""
        import itertools
        cache = getattr(self, "_eval_input_cache", None)
        if cache is None:
            cache = self._eval_input_cache = {}
        if phase in cache:
            if cache[phase] is not None:
                return cache[phase]
            return (self._stage_eval_batch(b) for b in loader)  # too big
        cap = max(self._device_cache_gb * 1e9
                  - getattr(self, "_staged_bytes", 0), 0)
        staged, nbytes = [], 0
        it = (self._stage_eval_batch(b) for b in loader)
        for item in it:
            staged.append(item)
            nbytes += item[0].nbytes + item[1].nbytes
            if nbytes > cap:
                self.log.info(f"{phase} split exceeds the remaining device "
                              f"cache budget; streaming eval inputs")
                cache[phase] = None
                return itertools.chain(staged, it)
        cache[phase] = staged
        return staged

    def _run_eval(self, loader, split_eids, phase: str) -> Optional[dict]:
        if loader is None or loader.num_trials == 0:
            return None
        # light path: metrics on device, no gt/pred host round-trip. Full
        # arrays are only needed for figure plotting (save_plot) and the
        # test_results.npy contract; multi-eid grouping and multihost row
        # gathering keep the host path.
        light = (phase != "test" and len(split_eids) == 1
                 and not self._multihost
                 and not self.config.get("save_plot")
                 and tuple(self.metrics) == ("bps", "rsquared"))
        session = {e: {"gt": [], "preds": []} for e in split_eids}
        losses, dev_outs, dev_gts = [], [], []
        eval_fn = self._head_fn if self._frozen_split else self._eval_fn
        for x, ap_d, n_valid, ap, eids in self._eval_batches(loader, phase):
            out = eval_fn(self.params, x)
            # device scalar; converted once after the loop (syncs cost ~29 ms
            # RTT each on this runtime)
            losses.append(poisson_nll_mean(out, ap_d, n_valid))
            if light:
                k = ap.shape[0]          # valid rows (host-known, static)
                dev_outs.append(out[:k])
                dev_gts.append(ap_d[:k])
                continue
            out = mh.gather_rows(out)[: ap.shape[0]]
            for i, e in enumerate(eids):
                session[e]["gt"].append(ap[i])
                session[e]["preds"].append(out[i])
        if light:
            out_all = (dev_outs[0] if len(dev_outs) == 1
                       else jnp.concatenate(dev_outs, axis=0))
            gt_all = (dev_gts[0] if len(dev_gts) == 1
                      else jnp.concatenate(dev_gts, axis=0))
            from video_spike_tpu.ops.metrics import device_eval_metrics
            bps, r2 = device_eval_metrics(out_all, gt_all)
            vals = np.asarray(jnp.stack(  # ONE sync for the whole eval
                losses + [bps, r2]), dtype=np.float64)
            return {f"{phase}_res": {
                f"{phase}_loss": round(float(vals[:-2].mean()), 5),
                f"{phase}_bps": round(float(vals[-2]), 5),
                f"{phase}_rsquared": round(float(vals[-1]), 5)}}
        losses = np.asarray(jnp.stack(losses)).tolist()  # one sync
        gt, preds = {}, {}
        metric_acc = {k: [] for k in self.metrics}
        for idx, e in enumerate(split_eids):
            _gt = np.stack(session[e]["gt"], axis=0)
            _preds = np.exp(np.stack(session[e]["preds"], axis=0))
            gt[idx], preds[idx] = _gt, _preds
            res = metrics_list(np.swapaxes(_gt, 0, -1),
                               np.swapaxes(_preds, 0, -1),
                               metrics=self.metrics)
            for k, v in res.items():
                metric_acc[k].append(v)
        named = {f"{phase}_{k}": round(float(np.mean(v)), 5)
                 for k, v in metric_acc.items()}
        return {
            f"{phase}_gt": gt,
            f"{phase}_preds": preds,
            f"{phase}_res": {f"{phase}_loss": round(float(np.mean(losses)), 5),
                             **named},
        }

    def eval_epoch(self) -> Optional[dict]:
        return self._run_eval(self.eval_loader, self.split["eid"]["val"], "eval")

    # ------------------------------------------------------------------
    # full loop
    # ------------------------------------------------------------------
    def train(self) -> dict:
        from video_spike_tpu.core.preempt import graceful_stop

        best_bps = -np.inf
        best_loss = np.inf
        best_epoch = -1
        num_epochs = self.config.training.num_epochs
        eval_every = int(self.config.training.get("eval_every") or 1)
        t0 = time.time()
        with graceful_stop(self.log) as preempted:
            for epoch in range(self._start_epoch, num_epochs):
                train_res = self.train_epoch()
                # evaluate on the cadence and always on the final epoch (best-
                # checkpoint selection needs the last point)
                eval_res = (self.eval_epoch()
                            if (epoch % eval_every == 0
                                or epoch == num_epochs - 1) else None)
                line = {"epoch": epoch, **train_res}
                if eval_res:
                    line.update(eval_res["eval_res"])
                    if eval_res["eval_res"]["eval_bps"] > best_bps:
                        best_bps = eval_res["eval_res"]["eval_bps"]
                        best_loss = eval_res["eval_res"]["eval_loss"]
                        best_epoch = epoch
                        # stash best params as an on-device copy (~1 ms); a
                        # disk checkpoint device_gets the full model through
                        # the host link (25 s for the 500M-param readout), so
                        # it is written at the save_every cadence + at the end
                        self._best_params = jax.tree.map(jnp.copy, self.params)
                        self._best_epoch = epoch
                        # multihost: no mid-train async flush — a background
                        # device_get on one process interleaves runtime work
                        # against the others' collective program order; the
                        # stash is written once after the loop instead
                        if (not self._multihost and
                                epoch - self._last_best_flush >= self._save_every):
                            # background fetch+write: training continues
                            self.save_model("best", epoch, block=False)
                            self._last_best_flush = epoch
                        if self._is_main:   # one writer per shared log_dir
                            self._plot_figs(eval_res, epoch=epoch)
                self.log.info(f"{line}")
                self.tracker.log(line, step=self._global_step)
                # multihost: the TERM may have reached only some ranks this
                # epoch; agree globally BEFORE anyone diverges into the
                # save barrier (a lone rank inside orbax's global sync while
                # the others run another epoch of collectives = deadlock)
                if mh.global_any(bool(preempted)):
                    # cluster TERM (or Ctrl-C): persist the true-resume
                    # checkpoint and stop cleanly; --resume picks up here
                    wait_for_checkpoints(raise_errors=False)
                    self.save_model("last", epoch)
                    if self._best_params is not None:
                        self.save_model("best", self._best_epoch)
                    self.log.info(
                        f"preempted at epoch {epoch}: model_last saved, "
                        f"resume with --resume")
                    return {"preempted": True, "epoch": epoch,
                            "best_eval_bps": best_bps,
                            "best_epoch": best_epoch, "test_res": None}
        wait_for_checkpoints()   # don't race the in-flight best flush
        # final saves run in the background, overlapped with the test eval
        # (the full-tree fetch is ~16 s through this link even chunked —
        # parallel_device_get). The redundant best re-save is skipped when
        # the async cadence flush already wrote exactly the best epoch.
        final_async = not self._multihost
        if self._best_params is not None \
                and self._last_best_flush != self._best_epoch:
            self.save_model("best", self._best_epoch, block=not final_async)
        self.save_model("last", num_epochs - 1, block=not final_async)
        self.log.info(f"trained {num_epochs} epochs in {time.time()-t0:.1f}s; "
                      f"best eval_bps={best_bps} @ epoch {best_epoch}")

        test_res = self.test_model()
        wait_for_checkpoints()   # artifacts must exist before returning
        if test_res:
            if self._is_main:
                self._plot_figs(test_res, test=True)
            test_res["test_res"].update(best_eval_loss=best_loss,
                                        best_eval_bps=best_bps)
            if self._is_main:
                np.save(os.path.join(self.log_dir, "test_results.npy"),
                        test_res)
            self.log.info(f"{test_res['test_res']}")
        return {"best_eval_bps": best_bps, "best_epoch": best_epoch,
                "test_res": (test_res or {}).get("test_res")}

    def test_model(self) -> Optional[dict]:
        if self._best_params is not None:
            # best params are already resident on device
            self.params = self._best_params
        elif checkpoint_exists(self.log_dir, "model_best"):
            restored = load_checkpoint(self.log_dir, "model_best",
                                       {"params": self.params, "epoch": 0})
            self.params = mh.replicate_tree(restored["params"], self.repl)
        return self._run_eval(self.test_loader, self.split["eid"]["test"], "test")

    def save_model(self, name: str = "last", epoch: int = 0,
                   block: bool = True) -> None:
        """``model_best`` holds params only; ``model_last`` adds the
        optimizer state and step counter for true resume (a capability the
        reference lacks — its save is params-only, SURVEY.md §5.4).
        ``block=False`` runs the device fetch + write on a background
        thread (mid-training best flushes: the fetch alone stalls training
        ~25 s through this host link); the trainer waits for in-flight
        saves before testing/returning. Multihost: EVERY process calls in —
        the orbax save embeds a global barrier (an early return on non-main
        ranks deadlocks the primary there), and orbax writes from the
        primary host only; saves are forced synchronous so the barrier
        stays in program order on all ranks."""
        if self._multihost:
            block = True
        params = (self._best_params
                  if name == "best" and self._best_params is not None
                  else self.params)
        tree = {"params": params, "epoch": epoch}
        if name == "last":
            tree["opt_state"] = self.opt_state
            tree["global_step"] = self._global_step
        if block:
            from video_spike_tpu.train.checkpoint import parallel_device_get
            save_checkpoint(self.log_dir, f"model_{name}",
                            parallel_device_get(tree))
        else:
            if name == "last":
                # the live params/opt_state buffers are donated by the next
                # train step; hand the background fetch its own copy so an
                # async "last" save can never read freed buffers
                tree = jax.tree.map(
                    lambda v: jnp.copy(v) if hasattr(v, "dtype") else v,
                    tree)
            save_checkpoint_async(self.log_dir, f"model_{name}", tree)

    def resume(self, name: str = "last") -> bool:
        """Restore params + optimizer state + epoch from ``model_last``."""
        if not checkpoint_exists(self.log_dir, f"model_{name}"):
            return False
        # probe one batch to build params/opt_state structure first
        batch = next(iter(self.train_loader))
        self._init_if_needed(self._assemble_inputs(batch))
        restored = load_checkpoint(
            self.log_dir, f"model_{name}",
            {"params": self.params, "epoch": 0,
             "opt_state": self.opt_state, "global_step": 0})
        self.params = mh.replicate_tree(restored["params"], self.repl)
        self.opt_state = mh.replicate_tree(restored["opt_state"], self.repl)
        self._global_step = int(restored["global_step"])
        self._start_epoch = int(restored["epoch"]) + 1
        self.log.info(f"resumed from epoch {restored['epoch']} "
                      f"(step {self._global_step})")
        return True

    def _plot_figs(self, eval_results: dict, epoch: int = 0,
                   test: bool = False) -> None:
        if not self.config.get("save_plot"):
            return
        from video_spike_tpu.viz.plots import plot_gt_pred, plot_neurons_r2
        phase = "test" if test else "eval"
        tag = "test" if test else str(epoch)
        gt = eval_results[f"{phase}_gt"][0]
        preds = eval_results[f"{phase}_preds"][0]
        fig1 = plot_gt_pred(gt.mean(0).T, preds.mean(0).T, epoch=tag, modality="ap")
        fig2 = plot_neurons_r2(gt.mean(0), preds.mean(0),
                               neuron_idx=range(min(5, gt.shape[-1])), epoch=tag)
        p1 = os.path.join(self.log_dir, f"best_trial_{tag}.png")
        p2 = os.path.join(self.log_dir, f"best_neuron_{tag}.png")
        fig1.savefig(p1)
        fig2.savefig(p2)
        # figure channel (reference wandb-images parity, src/trainer/
        # base.py:122-127): wandb Image when enabled, JSONL path ref always
        self.tracker.log_figure(f"best_trial_{tag}", fig1,
                                step=self._global_step, path=p1)
        self.tracker.log_figure(f"best_neuron_{tag}", fig2,
                                step=self._global_step, path=p2)
        import matplotlib.pyplot as plt
        plt.close(fig1)
        plt.close(fig2)


def make_base_trainer(**kwargs) -> BaseTrainer:
    """Factory, parity with ``/root/reference/src/trainer/make.py:5-18``."""
    return BaseTrainer(**kwargs)
