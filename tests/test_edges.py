"""Edge coverage: Poisson full/Stirling vs torch, runtime idempotence,
fixture CLI, sharding-rule small-kernel case, config Namespace merge."""

import argparse

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from video_spike_tpu.ops.poisson import poisson_nll


def test_poisson_full_stirling_matches_torch(rng):
    x = rng.normal(size=(5, 7)).astype(np.float32)
    t = rng.poisson(3.0, size=(5, 7)).astype(np.float32)
    ours = np.asarray(poisson_nll(jnp.asarray(x), jnp.asarray(t), full=True))
    ref = torch.nn.PoissonNLLLoss(log_input=True, full=True,
                                  reduction="none")(
        torch.from_numpy(x), torch.from_numpy(t)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_poisson_non_log_input(rng):
    rates = rng.uniform(0.1, 3.0, size=(4, 6)).astype(np.float32)
    t = rng.poisson(1.0, size=(4, 6)).astype(np.float32)
    ours = np.asarray(poisson_nll(jnp.asarray(rates), jnp.asarray(t),
                                  log_input=False))
    ref = torch.nn.PoissonNLLLoss(log_input=False, reduction="none")(
        torch.from_numpy(rates), torch.from_numpy(t)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_setup_runtime_idempotent(tmp_path):
    import video_spike_tpu.core.runtime as rt
    rt._DONE = False
    rt.setup_runtime(str(tmp_path / "cache"))
    rt.setup_runtime(str(tmp_path / "other"))  # second call is a no-op
    assert rt._DONE


def test_make_fixture_cli(tmp_path, capsys):
    from video_spike_tpu.cli.make_fixture import main

    main(["--out", str(tmp_path), "--eid", "fix000000", "--n_trials", "3",
          "--n_neurons", "4", "--height", "32", "--width", "32"])
    out = capsys.readouterr().out
    assert "wrote 3 trial shards" in out
    assert len(list(tmp_path.glob("*.tar"))) == 3


def test_sharding_rules_small_kernels_replicated(rng):
    from jax.sharding import PartitionSpec as P
    from video_spike_tpu.models.linear import (
        LinearModel, first_layer_sharding_rules)
    from video_spike_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_model=2)
    model = LinearModel(encoder_hidden=(8,), encoder_out=4,
                        decoder_hidden=(8,), output_dim=100)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64)))
    rules = first_layer_sharding_rules(params, mesh)
    for leaf in jax.tree.leaves(rules):
        assert leaf.spec == P()  # nothing crosses the size threshold


def test_update_config_namespace_overlay():
    from video_spike_tpu.core.config import update_config

    base = {"seed": 1, "dirs": {"log_dir": "a"}}
    ns = argparse.Namespace(seed=7, log_dir=None, extra="x")
    cfg = update_config(base, ns)
    assert cfg.seed == 7          # non-None namespace values overlay
    assert cfg.dirs.log_dir == "a"  # None values dropped, base preserved
    assert cfg.extra == "x"
