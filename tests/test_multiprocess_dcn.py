"""Two-process jax.distributed smoke over the DCN path (CPU + gloo).

Covers ``core/runtime.py``'s coordinator-env initialization and
``make_array_from_process_local_data`` batch assembly by actually spawning
two processes and asserting they agree on the global loss — the off-TPU
equivalent of a 2-host pod (SURVEY.md §5.8).
"""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh_step():
    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base.update({
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
        "DCN_SMOKE_FORCE_CPU": "1",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": os.pathsep.join(
            [os.getcwd(), env_base.get("PYTHONPATH", "")]),
    })
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "video_spike_tpu.parallel.dcn_smoke"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [p.communicate(timeout=150)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    losses = []
    for pid, out in enumerate(outs):
        assert f"pid={pid} process_count=2" in out, out
        assert "global_devices=4" in out, out
        m = re.search(r"global_loss=([-\d.]+)", out)
        assert m, out
        losses.append(float(m.group(1)))
    # the loss is a global mean over the sharded batch: identical everywhere
    assert losses[0] == losses[1], losses


@pytest.mark.slow
def test_two_process_real_trainer_epochs(tmp_path):
    """2 epochs of the REAL BaseTrainer across 2 processes: host-local
    train shards + make_array_from_process_local_data global batches +
    replicated eval. Both processes must report identical global metrics;
    only process 0 writes checkpoints/results."""
    import json

    from video_spike_tpu.data.synthetic import make_synthetic_session

    fixture = tmp_path / "fix"
    make_synthetic_session(fixture, eid="dcntrain00", n_trials=16,
                           n_neurons=5, seed=31, height=32, width=32)
    log_dir = tmp_path / "logs"

    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base.update({
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
        "DCN_SMOKE_FORCE_CPU": "1",
        "DCN_DEVICE_CACHE": "0",   # pin the per-step streaming path
        "DCN_FIXTURE_DIR": str(fixture),
        "DCN_LOG_DIR": str(log_dir),
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": os.pathsep.join(
            [os.getcwd(), env_base.get("PYTHONPATH", "")]),
    })
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "video_spike_tpu.parallel.dcn_trainer_smoke"],
            env=env, cwd=os.getcwd(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=280)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    results = []
    for pid, out in enumerate(outs):
        m = re.search(rf"pid={pid} result=(\{{.*\}})", out)
        assert m, out
        results.append(json.loads(m.group(1)))
    # global metrics agree bit-for-bit across processes
    assert results[0] == results[1], results
    # process-0-only artifacts exist exactly once
    run_dir = next(log_dir.glob("dcntr/*/LinearModel"))
    assert (run_dir / "model_best").exists()
    assert (run_dir / "test_results.npy").exists()


@pytest.mark.slow
def test_two_process_cached_device_dataset(tmp_path):
    """The multihost HBM trial cache across 2 REAL processes: each rank
    stages its host-local shard once (shard_map block-local gather), the
    only per-step H2D is the int32 index array, both ranks agree on every
    global metric bit-for-bit, and the cached run lands at the same loss
    scale as the streaming run on the identical fixture."""
    import json

    from video_spike_tpu.data.synthetic import make_synthetic_session

    fixture = tmp_path / "fix"
    make_synthetic_session(fixture, eid="dcncache00", n_trials=16,
                           n_neurons=5, seed=31, height=32, width=32)

    def run(tag: str, device_cache: str):
        port = _free_port()
        env_base = dict(os.environ)
        env_base.pop("JAX_PLATFORMS", None)
        env_base.update({
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "DCN_SMOKE_FORCE_CPU": "1",
            "DCN_DEVICE_CACHE": device_cache,
            "DCN_EID": "dcncache00",
            "DCN_FIXTURE_DIR": str(fixture),
            "DCN_LOG_DIR": str(tmp_path / f"logs_{tag}"),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "PYTHONPATH": os.pathsep.join(
                [os.getcwd(), env_base.get("PYTHONPATH", "")]),
        })
        procs = []
        for pid in range(2):
            env = dict(env_base)
            env["JAX_PROCESS_ID"] = str(pid)
            procs.append(subprocess.Popen(
                [sys.executable, "-m",
                 "video_spike_tpu.parallel.dcn_trainer_smoke"],
                env=env, cwd=os.getcwd(), stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True))
        outs = [p.communicate(timeout=280)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out
        results = []
        for pid, out in enumerate(outs):
            m = re.search(rf"pid={pid} result=(\{{.*\}})", out)
            assert m, out
            results.append(json.loads(m.group(1)))
        return results, outs

    cached, cached_outs = run("cached", "1")
    streaming, _ = run("streaming", "0")
    # global metrics agree bit-for-bit across processes on both paths
    assert cached[0] == cached[1], cached
    assert streaming[0] == streaming[1], streaming
    # the cached pair actually staged; streaming did not
    assert cached[0]["cached"] and not streaming[0]["cached"]
    assert any("multihost epochs are now transfer-free" in o
               for o in cached_outs)
    # per-step H2D is just the index array: 4 bytes x local batch rows x
    # steps — orders of magnitude below one ME trial (120 floats)
    assert 0 < cached[0]["h2d_bytes"] <= 4 * 4 * 2 * 16
    # same fixture, same loss scale (not bit-equal: different shuffles)
    assert abs(cached[0]["test_loss"] - streaming[0]["test_loss"]) < 0.2, (
        cached[0], streaming[0])


@pytest.mark.slow
def test_two_process_multisession_trainer(tmp_path):
    """2 epochs of the REAL MultiSessionTrainer across 2 processes:
    host-local per-session shards, mixed-session global batches, identical
    global metrics everywhere, rank-0 artifacts."""
    import json

    from video_spike_tpu.data.synthetic import make_synthetic_session

    fixture = tmp_path / "fix"
    for i, eid in enumerate(["dcnms00000", "dcnms11111"]):
        make_synthetic_session(fixture, eid=eid, n_trials=12,
                               n_neurons=4 + i, seed=77 + i,
                               height=32, width=32)
    log_dir = tmp_path / "logs"

    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base.update({
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
        "DCN_SMOKE_FORCE_CPU": "1",
        "DCN_MODE": "multisession",
        "DCN_EID": "dcnms00000,dcnms11111",
        "DCN_FIXTURE_DIR": str(fixture),
        "DCN_LOG_DIR": str(log_dir),
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": os.pathsep.join(
            [os.getcwd(), env_base.get("PYTHONPATH", "")]),
    })
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "video_spike_tpu.parallel.dcn_trainer_smoke"],
            env=env, cwd=os.getcwd(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=280)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    results = []
    for pid, out in enumerate(outs):
        m = re.search(rf"pid={pid} result=(\{{.*\}})", out)
        assert m, out
        results.append(json.loads(m.group(1)))
    assert results[0] == results[1], results
    run_dir = log_dir / "multi_dcnms_dcnms"
    assert (run_dir / "model_best").exists()
    assert (run_dir / "test_results.npy").exists()


@pytest.mark.slow
def test_two_process_tensor_sharding():
    """Tensor (model-axis) sharding ACROSS the process boundary: a
    {data:2, model:4} mesh over 2 processes x 4 devices with the model
    axis interleaved between hosts, 3 real VTT train steps under the
    production sharding rules. Asserts the session-head and wide-MLP
    kernel specs survive the optimizer update and that both ranks see
    bit-identical losses (the model-axis psum rides DCN here)."""
    import json

    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base.update({
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
        "DCN_SMOKE_FORCE_CPU": "1",
        "DCN_MODE": "tensor",
        "DCN_LOG_DIR": "/tmp",   # unused by this mode
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": os.pathsep.join(
            [os.getcwd(), env_base.get("PYTHONPATH", "")]),
    })
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "video_spike_tpu.parallel.dcn_trainer_smoke"],
            env=env, cwd=os.getcwd(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=280)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    results = []
    for pid, out in enumerate(outs):
        m = re.search(rf"pid={pid} result=(\{{.*\}})", out)
        assert m, out
        results.append(json.loads(m.group(1)))
    assert results[0] == results[1], results
    assert results[0]["head_spec"] == "PartitionSpec(None, None, 'model')"
    assert results[0]["mlp_spec"] == "PartitionSpec(None, 'model')"
    assert len(results[0]["losses"]) == 3
    # the loss actually moves (gradients flowed through the sharded heads)
    assert results[0]["losses"][0] != results[0]["losses"][-1]


@pytest.mark.slow
def test_two_process_ssl_trainer(tmp_path):
    """The reference's ONLY multi-device path (DDP SSL pretrain,
    /root/reference/src/pretrain.py:51-57) as a real 2-process run of
    ContrastTrainer: rank-strided frame shards -> global triplet batches,
    replicated transform/eval with all-gathered embeddings, identical
    best-val_bps (= identical best-checkpoint choice) on every rank, and
    rank-0 checkpoint artifacts."""
    import json

    import h5py
    import numpy as np

    eid = "sslshard00"
    h5_path = tmp_path / "frames.h5"
    rng = np.random.default_rng(5)
    with h5py.File(h5_path, "w") as f:
        grp = f.create_group(eid)
        t0 = 0.0
        for split, trials in {"train": 8, "val": 2, "test": 2}.items():
            X = rng.integers(0, 255, (trials, 12, 1, 16, 16), dtype=np.uint8)
            y = rng.poisson(1.0, (trials, 10, 5)).astype(np.float32)
            ts = (t0 + np.arange(trials * 12) / 60.0).reshape(trials, 12)
            t0 = ts[-1, -1] + 1.0
            grp.create_dataset(f"X_{split}", data=X)
            grp.create_dataset(f"y_{split}", data=y)
            grp.create_dataset(f"timestamp_{split}", data=ts)
    log_dir = tmp_path / "logs"

    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base.update({
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
        "DCN_SMOKE_FORCE_CPU": "1",
        "DCN_MODE": "ssl",
        "DCN_EID": eid,
        "DCN_H5": str(h5_path),
        "DCN_LOG_DIR": str(log_dir),
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": os.pathsep.join(
            [os.getcwd(), env_base.get("PYTHONPATH", "")]),
    })
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "video_spike_tpu.parallel.dcn_trainer_smoke"],
            env=env, cwd=os.getcwd(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=280)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    results = []
    for pid, out in enumerate(outs):
        m = re.search(rf"pid={pid} result=(\{{.*\}})", out)
        assert m, out
        results.append(json.loads(m.group(1)))
    # best-val_bps + transformed embeddings agree bit-for-bit across ranks
    assert results[0] == results[1], results
    assert results[0]["emb_rows"] == 8 * 12
    run_dir = log_dir / eid / "ContrastViT" / "6"
    assert (run_dir / "best_model").exists()
    assert (run_dir / "last_model").exists()


@pytest.mark.slow
def test_two_process_ssl_mid_epoch_resume_draw_exact(tmp_path):
    """Draw-exact multihost SSL resume (VERDICT r4 #5): a 2-process
    ContrastTrainer run interrupted MID-epoch and resumed from the
    last_model + sampler sidecar must reach final params BIT-identical to
    an uninterrupted run on every rank — possible because multi-process
    pos/neg draws are derived from stateless (seed, epoch, rank, batch)
    counters, not per-rank rng streams."""
    import json

    import h5py
    import numpy as np

    eid = "sslresum00"
    h5_path = tmp_path / "frames.h5"
    rng = np.random.default_rng(9)
    with h5py.File(h5_path, "w") as f:
        grp = f.create_group(eid)
        t0 = 0.0
        for split, trials in {"train": 8, "val": 2, "test": 2}.items():
            X = rng.integers(0, 255, (trials, 12, 1, 16, 16), dtype=np.uint8)
            y = rng.poisson(1.0, (trials, 10, 5)).astype(np.float32)
            ts = (t0 + np.arange(trials * 12) / 60.0).reshape(trials, 12)
            t0 = ts[-1, -1] + 1.0
            grp.create_dataset(f"X_{split}", data=X)
            grp.create_dataset(f"y_{split}", data=y)
            grp.create_dataset(f"timestamp_{split}", data=ts)
    log_dir = tmp_path / "logs"

    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base.update({
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
        "DCN_SMOKE_FORCE_CPU": "1",
        "DCN_MODE": "ssl_resume",
        "DCN_EID": eid,
        "DCN_H5": str(h5_path),
        "DCN_LOG_DIR": str(log_dir),
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": os.pathsep.join(
            [os.getcwd(), env_base.get("PYTHONPATH", "")]),
    })
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "video_spike_tpu.parallel.dcn_trainer_smoke"],
            env=env, cwd=os.getcwd(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=280)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    results = []
    for pid, out in enumerate(outs):
        m = re.search(rf"pid={pid} result=(\{{.*\}})", out)
        assert m, out
        results.append(json.loads(m.group(1)))
    # both ranks agree, and resumed == control bit-for-bit
    assert results[0] == results[1], results
    assert results[0]["resumed"] == results[0]["control"], results[0]
    # the resume really went through the mid-epoch sidecar path (6-step
    # epochs, stop at step 8 -> 2 consumed batches into epoch 1)
    assert any("sampler resumed mid-epoch: skipping 2" in o for o in outs)
