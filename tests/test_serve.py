"""Serving stack: bucketed InferenceSession, MicroBatcher coalescing, HTTP
round trip (CPU backend; tiny Linear model)."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_spike_tpu.models.linear import LinearModel
from video_spike_tpu.serve import InferenceSession, MicroBatcher, serve_http

N_FEAT, T_BINS, N_NEURONS = 24, 10, 4


@pytest.fixture(scope="module")
def session():
    model = LinearModel(encoder_hidden=(16,), encoder_out=8,
                        decoder_hidden=(), output_dim=T_BINS * N_NEURONS,
                        t_bins=T_BINS, compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, N_FEAT), jnp.float32))
    return InferenceSession(model, params, bucket_sizes=(1, 2, 4, 8))


def test_bucket_padding_matches_direct_apply(session):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, N_FEAT)).astype(np.float32)
    out = session.predict(x)
    assert out.shape == (3, T_BINS, N_NEURONS)
    direct = np.asarray(session.model.apply(session.params, jnp.asarray(x)))
    np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-6)
    # 3 rows rode the 4-bucket
    assert session.stats["padded_rows"] == 1


def test_bucket_reuse_no_recompile(session):
    before = session.stats["compiles"]
    rng = np.random.default_rng(1)
    for n in (3, 4, 2, 3):      # all fit existing buckets (2 and 4)
        session.predict(rng.normal(size=(n, N_FEAT)).astype(np.float32))
    assert session.stats["compiles"] <= before + 2


def test_batch_above_largest_bucket_rejected(session):
    with pytest.raises(ValueError, match="largest bucket"):
        session.predict(np.zeros((9, N_FEAT), np.float32))


def test_microbatcher_coalesces_and_matches(session):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(8, N_FEAT)).astype(np.float32)
    direct = session.predict(x)

    batcher = MicroBatcher(session.predict, max_batch=8, max_delay_ms=50)
    try:
        futs = [batcher.submit(row) for row in x]
        outs = np.stack([f.result(timeout=10) for f in futs])
        np.testing.assert_allclose(outs, direct, rtol=1e-5, atol=1e-6)
        stats = batcher.stats()
        assert stats["served"] == 8
        # 8 concurrent submits within the 50 ms window -> far fewer
        # dispatches than requests (usually 1-2)
        assert stats["dispatches"] <= 4
        assert stats["p99_ms"] >= stats["p50_ms"] > 0
    finally:
        batcher.close()


def test_microbatcher_propagates_errors():
    def boom(rows, **kw):
        raise RuntimeError("kaput")

    batcher = MicroBatcher(boom, max_batch=4, max_delay_ms=1)
    try:
        fut = batcher.submit(np.zeros((3,), np.float32))
        with pytest.raises(RuntimeError, match="kaput"):
            fut.result(timeout=10)
    finally:
        batcher.close()


def test_http_round_trip(session):
    batcher = MicroBatcher(session.predict, max_batch=8, max_delay_ms=2)
    server = serve_http(batcher, port=0, host="127.0.0.1", block=False)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # health
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert r.read() == b"ok"
        # predict one sample
        rng = np.random.default_rng(3)
        row = rng.normal(size=(N_FEAT,)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, row)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            out = np.load(io.BytesIO(r.read()))
        direct = session.predict(row[None])[0]
        np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-6)
        # stats
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["served"] >= 1
        # malformed body -> 400, not a hang
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"not-an-npy",
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 400
    finally:
        server.shutdown()
        batcher.close()


def test_http_unheadered_batch_fans_out(session):
    """A multi-row .npy POSTed without X-Batched must not reach the model
    with an extra leading dim: when the batcher knows the sample rank the
    server fans the rows out exactly like the X-Batched path."""
    batcher = MicroBatcher(session.predict, max_batch=8, max_delay_ms=2,
                           sample_ndim=1)
    server = serve_http(batcher, port=0, host="127.0.0.1", block=False)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(5)
        rows = rng.normal(size=(3, N_FEAT)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, rows)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST")   # note: no X-Batched header
        with urllib.request.urlopen(req, timeout=30) as r:
            out = np.load(io.BytesIO(r.read()))
        direct = session.predict(rows)
        assert out.shape == direct.shape
        np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-6)
    finally:
        server.shutdown()
        batcher.close()


def test_http_batched_header_single_row(session):
    """An explicit X-Batched payload with exactly ONE row must still be
    treated as a batch (leading dim stripped before the batcher), even when
    the batcher doesn't know the sample rank."""
    batcher = MicroBatcher(session.predict, max_batch=8, max_delay_ms=2)
    server = serve_http(batcher, port=0, host="127.0.0.1", block=False)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(9)
        rows = rng.normal(size=(1, N_FEAT)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, rows)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            headers={"X-Batched": "1"}, method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            out = np.load(io.BytesIO(r.read()))
        direct = session.predict(rows)
        assert out.shape == direct.shape
        np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-6)
    finally:
        server.shutdown()
        batcher.close()


def test_predict_rejects_empty_batch(session):
    """A zero-row request must fail with a clear ValueError, not an opaque
    shape error from inside the compiled executable."""
    with pytest.raises(ValueError, match="empty batch"):
        session.predict(np.zeros((0, N_FEAT), np.float32))


def test_from_checkpoint_both_restore_paths(tmp_path):
    """from_checkpoint restores with and without a sample-input target and
    builds the model through the registry from a plain-dict config."""
    from video_spike_tpu.train.checkpoint import save_checkpoint
    from video_spike_tpu.serve.session import InferenceSession as IS

    model = LinearModel(encoder_hidden=(16,), encoder_out=8,
                        decoder_hidden=(), output_dim=100 * 4,
                        compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, N_FEAT), jnp.float32))
    save_checkpoint(tmp_path, "model_best", {"params": params, "epoch": 3})

    cfg = {"model_class": "Linear",
           "encoder": {"hidden_dims": [16], "output_dim": 8},
           "decoder": {"hidden_dims": [], "output_dim": 100 * 4}}
    x = np.random.default_rng(0).normal(size=(2, N_FEAT)).astype(np.float32)

    for s in (IS.from_checkpoint(cfg, tmp_path),
              IS.from_checkpoint(cfg, tmp_path, sample_input=x[:1])):
        # params restored exactly
        for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # and predict() == the registry-built model applied directly
        # (from_config builds the production bf16-compute variant)
        direct = np.asarray(s.model.apply(s.params, jnp.asarray(x)))
        np.testing.assert_allclose(s.predict(x), direct, rtol=1e-5,
                                   atol=1e-6)


def test_serve_cli_app(tmp_path):
    """cli/serve builds a working app from config + checkpoint (the HTTP
    layer on top is covered by test_http_round_trip)."""
    import yaml
    from video_spike_tpu.cli.serve import make_app
    from video_spike_tpu.train.checkpoint import save_checkpoint

    model = LinearModel(encoder_hidden=(16,), encoder_out=8,
                        decoder_hidden=(), output_dim=100 * 4,
                        compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, N_FEAT), jnp.float32))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(ckpt, "model_best", {"params": params, "epoch": 0})
    cfg = tmp_path / "model.yaml"
    cfg.write_text(yaml.safe_dump({
        "model_class": "Linear",
        "encoder": {"hidden_dims": [16], "output_dim": 8},
        "decoder": {"hidden_dims": [], "output_dim": 400}}))

    _, session, batcher = make_app([
        "--model_config", str(cfg), "--ckpt_dir", str(ckpt),
        "--input_dim", str(N_FEAT), "--max_batch", "8"])
    try:
        assert session.stats["compiles"] == len(session.buckets)  # warmed
        out = batcher.submit(
            np.zeros((N_FEAT,), np.float32)).result(timeout=30)
        assert out.shape == (100, 4)
    finally:
        batcher.close()


def test_sharded_serving_matches_unsharded():
    """A session over a (data=4, model=2) mesh with the training-time
    tensor-sharding rules returns the same predictions (8-device CPU
    mesh; bf16 matmuls are deterministic either way on this shape)."""
    from video_spike_tpu.models.linear import first_layer_sharding_rules
    from video_spike_tpu.parallel.mesh import make_mesh

    model = LinearModel(encoder_hidden=(16,), encoder_out=8,
                        decoder_hidden=(), output_dim=T_BINS * N_NEURONS,
                        t_bins=T_BINS, compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, N_FEAT), jnp.float32))
    mesh = make_mesh(n_data=4, n_model=2)
    plain = InferenceSession(model, params, bucket_sizes=(4,))
    sharded = InferenceSession(
        model, params, bucket_sizes=(4,), mesh=mesh,
        sharding_rules=lambda p, m: first_layer_sharding_rules(p, m,
                                                               min_dim=8))
    kernel = sharded.params["params"]["encoder"]["Dense_0"]["kernel"]
    assert len(set(kernel.sharding.device_set)) > 1  # actually sharded
    x = np.random.default_rng(5).normal(size=(3, N_FEAT)).astype(np.float32)
    np.testing.assert_allclose(sharded.predict(x), plain.predict(x),
                               rtol=1e-5, atol=1e-6)


def test_session_ids_path_pads_and_matches():
    """Multi-session models route per-sample session ids through padding."""
    from video_spike_tpu.models.vtt import VideoTemporalTransformer

    model = VideoTemporalTransformer(
        n_sessions=3, max_neurons=10, t_frames=12, t_bins=10, patch_size=8,
        hidden=32, frame_depth=1, temporal_depth=1, heads=4, mlp_dim=64)
    rng = np.random.default_rng(6)
    video = rng.integers(0, 255, (3, 12, 1, 32, 32), dtype=np.uint8)
    sids = np.asarray([0, 2, 1], np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(video),
                        jnp.asarray(sids))
    s = InferenceSession(model, params, bucket_sizes=(4,),
                         needs_session_ids=True)
    out = s.predict(video, session_ids=sids)   # 3 rows ride the 4-bucket
    ref = np.asarray(model.apply(params, jnp.asarray(video),
                                 jnp.asarray(sids)))
    # bf16 matmuls fuse differently at batch 4 vs 3: agreement is to bf16
    # precision, not bitwise (the f32 Linear tests above check exactness)
    np.testing.assert_allclose(out, ref, atol=5e-3)
    # omitted ids default to session 0
    out0 = s.predict(video)
    ref0 = np.asarray(model.apply(params, jnp.asarray(video),
                                  jnp.zeros(3, jnp.int32)))
    np.testing.assert_allclose(out0, ref0, atol=5e-3)
