"""Multi-process run of the REAL supervised trainer (not a toy step).

Two (or more) processes each load their host-local shard of a synthetic
session's training trials, run ``BaseTrainer.train()`` for a few epochs over
the global mesh, and print their per-epoch train/eval losses. Because the
loss is a global mean over the sharded batch, every process must print the
SAME numbers — ``tests/test_multiprocess_dcn.py`` asserts that equality plus
the process-0-only checkpoint artifacts.

    JAX_COORDINATOR_ADDRESS=localhost:12345 JAX_NUM_PROCESSES=2 \
    JAX_PROCESS_ID=<i> DCN_FIXTURE_DIR=... DCN_LOG_DIR=... \
    python -m video_spike_tpu.parallel.dcn_trainer_smoke

This is the production multi-host path (SURVEY.md §5.8): the reference's
per-rank DataLoader + DDP all-reduce becomes host-local loading +
``jax.make_array_from_process_local_data`` + XLA collectives.
"""

from __future__ import annotations

import json
import os


def main() -> None:
    import jax

    if os.environ.get("DCN_SMOKE_FAULTHANDLER"):
        import faulthandler
        faulthandler.dump_traceback_later(
            int(os.environ["DCN_SMOKE_FAULTHANDLER"]), repeat=True)

    if os.environ.get("DCN_SMOKE_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass

    from video_spike_tpu.core.runtime import setup_runtime
    setup_runtime()

    from video_spike_tpu.core.config import config_from_kwargs, update_config
    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.dataset import (
        get_metadata_from_loader, make_loader, split_dataset)
    from video_spike_tpu.parallel import multihost as mh
    from video_spike_tpu.train.base import BaseTrainer

    pid = jax.process_index()
    log_dir = os.environ["DCN_LOG_DIR"]
    eid = os.environ.get("DCN_EID", "dcntrain00")

    if os.environ.get("DCN_MODE") == "tensor":
        _tensor_sharded(jax)
        return
    if os.environ.get("DCN_MODE") == "ssl":
        _ssl(jax, os.environ["DCN_H5"], log_dir, eid)
        return
    if os.environ.get("DCN_MODE") == "ssl_resume":
        _ssl_resume(jax, os.environ["DCN_H5"], log_dir, eid)
        return
    data_dir = os.environ["DCN_FIXTURE_DIR"]
    if os.environ.get("DCN_MODE") == "multisession":
        _multisession(jax, data_dir, log_dir, eid.split(","))
        return

    config = config_from_kwargs(
        {"model": "include:configs/model/linear_me.yaml"})
    config = update_config("configs/train/linear_me.yaml", config)
    config["dirs"]["data_dir"] = data_dir
    config["training"]["num_epochs"] = 2
    config["training"]["train_batch_size"] = 2 * jax.local_device_count()
    # DCN_DEVICE_CACHE gates the multihost HBM trial cache so the test can
    # compare the cached and streaming paths head-to-head
    config["training"]["device_cache"] = (
        os.environ.get("DCN_DEVICE_CACHE", "1") != "0")

    split = split_dataset(data_dir, eid, seed=42)
    # host-local training shard; val/test stay replicated on every process
    local_split = dict(split)
    local_split["train"] = mh.shard_files_for_process(split["train"])
    train_dl, val_dl, test_dl = make_loader(config, local_split)
    meta = get_metadata_from_loader(train_dl, config)
    config["model"]["encoder"]["input_dim"] = meta["input_dim"]
    config["model"]["decoder"]["output_dim"] = meta["output_dim"]
    model = NAME2MODEL[config.model.model_class].from_config(config.model)

    trainer = BaseTrainer(model, train_dl, val_dl, test_dl, config,
                          eid=eid, dataset_split_dict=split,
                          log_dir=log_dir, seed=42)
    assert trainer._multihost, "expected a multi-process runtime"
    res = trainer.train()
    out = {"best_eval_bps": res["best_eval_bps"],
           "test_bps": res["test_res"]["test_bps"],
           "test_loss": res["test_res"]["test_loss"],
           "cached": trainer._dev_data is not None,
           "h2d_bytes": int(getattr(trainer, "_cached_mh_h2d_bytes", 0))}
    print(f"pid={pid} result={json.dumps(out)}", flush=True)


def _tensor_sharded(jax) -> None:
    """Tensor sharding whose ``model`` axis SPANS the process boundary —
    the layout where sharding-spec bugs live. Builds a {data:2, model:4}
    mesh over 2 processes x 4 virtual devices with the model axis
    interleaved across hosts, runs 3 full VTT training steps with the
    PRODUCTION sharding rules (``__graft_entry__._vtt_sharding_rules``),
    and asserts the session-head / wide-MLP kernel specs survive the
    update. Both ranks must print identical losses (the psum over the
    model axis rides DCN here)."""
    import numpy as np

    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import __graft_entry__ as graft
    from video_spike_tpu.parallel import multihost as mh
    from video_spike_tpu.train.multisession import masked_poisson_nll

    pid = jax.process_index()
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 global devices, got {len(devices)}"
    # reshape(4,2).T interleaves: data row 0 = [d0,d2,d4,d6] — its model
    # axis holds devices of BOTH processes
    arr = np.array(devices).reshape(4, 2).T
    mesh = Mesh(arr, axis_names=("data", "model"))
    for row in arr:
        assert len({d.process_index for d in row}) == 2, (
            "model axis does not span processes")

    t_frames, t_bins, max_n = 12, 100, 32
    batch = mesh.shape["data"] * 2
    model = graft._flagship(n_sessions=3, max_neurons=max_n,
                            t_frames=t_frames, hidden=128)
    rng = np.random.default_rng(7)   # same seed -> same batch on each host
    video = rng.integers(0, 255, (batch, t_frames, 1, 32, 32), dtype=np.uint8)
    ap = rng.poisson(1.0, (batch, t_bins, max_n)).astype(np.float32)
    sids = rng.integers(0, 3, (batch,)).astype(np.int32)
    nmask = np.ones((batch, max_n), np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(video[:1]),
                        jnp.asarray(sids[:1]))
    rules = graft._vtt_sharding_rules(params, mesh)
    params = mh.put_tree(jax.device_get(params), rules)
    tx = optax.adamw(optax.cosine_onecycle_schedule(100, 5e-5),
                     weight_decay=0.01)
    opt_state = tx.init(params)

    def train_step(params, opt_state, video, ap, sids, nmask, n_valid):
        def loss_fn(p):
            out = model.apply(p, video, sids)
            return masked_poisson_nll(out, ap, nmask, n_valid)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    # data blocks are shared across hosts here (model spans processes), so
    # every host feeds the SAME global batch: replicated rows -> sharded
    batch_args = mh.replicated_rows_to_global(
        mesh, P("data"), video, ap, sids, nmask)
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(*((params, opt_state) + batch_args),
                                       jnp.float32(batch))
        losses.append(round(float(loss), 8))
    heads = params["params"]["session_heads"]
    assert heads.sharding.spec == P(None, None, "model"), heads.sharding
    mlp = params["params"]["frame_encoder"]["Block_0"]["Dense_0"]["kernel"]
    assert mlp.sharding.spec == P(None, "model"), mlp.sharding
    assert all(np.isfinite(losses)), losses
    print(f"pid={pid} result="
          f"{json.dumps({'losses': losses, 'head_spec': str(heads.sharding.spec), 'mlp_spec': str(mlp.sharding.spec)})}",
          flush=True)


def _multisession(jax, data_dir: str, log_dir: str, eids) -> None:
    """2 epochs of the REAL MultiSessionTrainer over the global mesh:
    host-local per-session shards feed mixed-session global batches."""
    from video_spike_tpu.core.config import DictConfig
    from video_spike_tpu.models.vtt import VideoTemporalTransformer
    from video_spike_tpu.train.multisession import MultiSessionTrainer

    pid = jax.process_index()
    config = DictConfig({
        "training": {"num_epochs": 2,
                     "train_batch_size": 2 * jax.local_device_count(),
                     "test_batch_size": 2 * jax.local_device_count()},
        "optimizer": {"lr": 1e-3, "wd": 0.01, "eps": 1e-8,
                      "warmup_pct": 0.15, "div_factor": 10},
    })
    trainer = MultiSessionTrainer(model=None, config=config, eids=eids,
                                  data_dir=data_dir, log_dir=log_dir,
                                  seed=42)
    trainer.model = VideoTemporalTransformer.from_config({
        "n_sessions": len(eids), "max_neurons": trainer.max_neurons,
        "t_frames": 120, "t_bins": 100, "patch_size": 16,
        "hidden_size": 32, "frame_depth": 1, "temporal_depth": 1,
        "num_attention_heads": 2, "intermediate_size": 64,
        # the smoke checks cross-process metric equality, not quality;
        # encoding 30 of 120 frames quarters the dominant CPU cost
        "frame_stride": 4})
    assert trainer._multihost, "expected a multi-process runtime"
    res = trainer.train()
    print(f"pid={pid} result="
          f"{json.dumps({'best_eval_bps': res['best_eval_bps'], 'test_bps': res['test']['test_bps']})}",
          flush=True)


def _ssl(jax, h5_path: str, log_dir: str, eid: str) -> None:
    """A real multi-process ``ContrastTrainer.fit()`` — the TPU-native
    equivalent of the reference's only multi-device path (3-process DDP
    pretrain, ``/root/reference/src/pretrain.py:51-57``): rank-strided frame
    shards feed global triplet batches; the nested-RRR validation and the
    best checkpoint must agree bit-for-bit on every rank."""
    import json

    import numpy as np

    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.contrast import make_contrast_loader
    from video_spike_tpu.train.contrast import ContrastTrainer

    pid = jax.process_index()
    cfg = dict(image_size=16, patch_size=8, num_channels=1, hidden_size=32,
               num_hidden_layers=1, num_attention_heads=4,
               intermediate_size=64, decoder_hidden_size=32,
               decoder_num_hidden_layers=1, decoder_num_attention_heads=4,
               decoder_intermediate_size=64, mask_ratio=0.0,
               norm_pix_loss=False, embed_size=3)
    model = NAME2MODEL["ContrastViT"].from_config(cfg)
    common = dict(eid=eid, idx_offset=3, image_size=16, seed=0)
    dl, _ = make_contrast_loader(h5_path, mode="pretrain", batch_size=4,
                                 **common)
    train_dl, _ = make_contrast_loader(h5_path, mode="train", batch_size=4,
                                       shuffle=False, **common)
    val_dl, _ = make_contrast_loader(h5_path, mode="val", batch_size=4,
                                     shuffle=False, **common)
    trainer = ContrastTrainer(
        model, dl, {"lr": 1e-3}, val_data_loader=val_dl,
        train_data_loader=train_dl, max_steps=6, eid=eid,
        log_dir=log_dir, image_size=16, seed=42, validate_every=3)
    assert trainer._multihost, "expected a multi-process runtime"
    best = trainer.fit()
    emb = trainer.transform(train_dl)  # replicated-eval + all-gather path
    print(f"pid={pid} result="
          f"{json.dumps({'best_bps': round(float(best), 8), 'emb_sum': round(float(np.abs(emb).sum()), 4), 'emb_rows': int(emb.shape[0])})}",
          flush=True)


def _ssl_resume(jax, h5_path: str, log_dir: str, eid: str) -> None:
    """Draw-exact multi-process SSL mid-epoch resume: interrupt a 2-process
    ``ContrastTrainer`` run mid-epoch, resume from last_model + sampler
    sidecar with FRESH trainers, run to max_steps, and compare final params
    against an uninterrupted control — they must be bit-identical on every
    rank, because both the epoch shuffle and the pos/neg draws are derived
    from stateless counters (seed, epoch) / (seed, epoch, rank, batch).
    This is the draw-exact strengthening of the DDP sampler semantics
    behind the reference's ``accelerate launch``
    (``/root/reference/src/pretrain.py:51-57``)."""
    import hashlib
    import json

    import numpy as np

    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.contrast import make_contrast_loader
    from video_spike_tpu.train.checkpoint import parallel_device_get
    from video_spike_tpu.train.contrast import ContrastTrainer

    pid = jax.process_index()
    cfg = dict(image_size=16, patch_size=8, num_channels=1, hidden_size=32,
               num_hidden_layers=1, num_attention_heads=4,
               intermediate_size=64, decoder_hidden_size=32,
               decoder_num_hidden_layers=1, decoder_num_attention_heads=4,
               decoder_intermediate_size=64, mask_ratio=0.0,
               norm_pix_loss=False, embed_size=3)
    # batch 6 scales x2 per-device -> 12 local rows/step; 144 frames / 2
    # ranks / 12 = 6-step epochs. Stop at 8 = 2 batches into epoch 1
    # (mid-epoch), max_steps 16 ends mid-epoch-2: both seams crossed.
    MAX_STEPS, STOP_AT, CONSUMED = 16, 8, 2
    BATCH = 6

    def make_trainer(logs: str) -> ContrastTrainer:
        model = NAME2MODEL["ContrastViT"].from_config(cfg)
        common = dict(eid=eid, idx_offset=3, image_size=16, seed=0)
        dl, _ = make_contrast_loader(h5_path, mode="pretrain",
                                     batch_size=BATCH, **common)
        train_dl, _ = make_contrast_loader(h5_path, mode="train",
                                           batch_size=4, shuffle=False,
                                           **common)
        val_dl, _ = make_contrast_loader(h5_path, mode="val", batch_size=4,
                                         shuffle=False, **common)
        return ContrastTrainer(
            model, dl, {"lr": 1e-3}, val_data_loader=val_dl,
            train_data_loader=train_dl, max_steps=MAX_STEPS, eid=eid,
            log_dir=logs, image_size=16, seed=42, validate_every=10**6,
            save_every_min=None, flush_best=False)

    def digest(trainer: ContrastTrainer) -> str:
        h = hashlib.blake2b(digest_size=16)
        for leaf in jax.tree.leaves(parallel_device_get(trainer.params)):
            h.update(np.ascontiguousarray(leaf).tobytes())
        return h.hexdigest()

    ab_dir = os.path.join(log_dir, "ab")
    c_dir = os.path.join(log_dir, "c")

    # phase A: train to STOP_AT mid-epoch (log_dir nested by the FULL
    # max_steps first, then stop early — the same last_model + sidecar a
    # preemption would leave behind)
    ta = make_trainer(ab_dir)
    ta.max_steps = STOP_AT
    ta.fit()

    # phase B: fresh trainer (fresh loaders, fresh rng objects), resume
    tb = make_trainer(ab_dir)
    assert tb.resume(), "resume found no checkpoint"
    assert tb._start_step == STOP_AT, tb._start_step
    assert tb._resume_skip == CONSUMED, tb._resume_skip  # really mid-epoch
    tb.fit()

    # control: uninterrupted
    tc = make_trainer(c_dir)
    tc.fit()

    print(f"pid={pid} result="
          f"{json.dumps({'resumed': digest(tb), 'control': digest(tc)})}",
          flush=True)


if __name__ == "__main__":
    main()
