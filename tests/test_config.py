"""Config system parity: include:, deep merge, dot access, kwargs coercion."""

import yaml

from video_spike_tpu.core.config import (
    DictConfig,
    config_from_kwargs,
    convert_to_dtype,
    update_config,
)


def test_dot_access_nested():
    c = DictConfig({"a": {"b": {"c": 3}}})
    assert c.a.b.c == 3
    c["a"]["b"]["c"] = 4  # item assignment like the reference entry points
    assert DictConfig(c["a"]).b.c == 4


def test_include_resolution(tmp_path):
    inner = tmp_path / "inner.yaml"
    inner.write_text(yaml.safe_dump({"x": 1, "y": {"z": 2}}))
    outer = tmp_path / "outer.yaml"
    outer.write_text(yaml.safe_dump({"model": f"include:{inner}", "k": 5}))
    cfg = update_config(str(outer))
    assert cfg.model.x == 1
    assert cfg.model.y.z == 2
    assert cfg.k == 5


def test_deep_merge_overrides_and_creates(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(yaml.safe_dump({"opt": {"lr": 1e-3, "wd": 0.1}}))
    cfg = update_config(str(base), {"opt": {"lr": 5e-5}, "new": {"leaf": True}})
    assert cfg.opt.lr == 5e-5
    assert cfg.opt.wd == 0.1
    assert cfg.new.leaf is True


def test_kwargs_dotted_and_dtypes():
    cfg = config_from_kwargs({
        "model.encoder.dim": "64",
        "opt.lr": "5e-5",
        "flag": "true",
        "nothing": "null",
        "mods": "[a, 1, 2.5]",
    })
    assert cfg.model.encoder.dim == 64
    assert abs(cfg.opt.lr - 5e-5) < 1e-12
    assert cfg.flag is True
    assert cfg.nothing is None
    assert cfg.mods == ["a", 1, 2.5]


def test_convert_to_dtype_negative_int():
    assert convert_to_dtype("-12") == -12
    assert isinstance(convert_to_dtype("-12"), int)
    assert convert_to_dtype("hello") == "hello"


def test_vit_mae_turbo_config_is_capacity_identical():
    """The TPU-recommended SSL shape (BASELINE.md "SSL head-width sweep")
    must differ from the reference-parity config ONLY in attention head
    count, with head widths that tile the 128-wide MXU."""
    from pathlib import Path
    root = Path(__file__).resolve().parent.parent / "configs" / "model" / "vit_mae"
    base = yaml.safe_load((root / "vit_mae.yaml").read_text())
    turbo = yaml.safe_load((root / "vit_mae_turbo.yaml").read_text())
    assert set(base) == set(turbo)
    diff = {k for k in base if base[k] != turbo[k]}
    assert diff == {"num_attention_heads", "decoder_num_attention_heads"}
    for hidden, heads in ((turbo["hidden_size"], turbo["num_attention_heads"]),
                          (turbo["decoder_hidden_size"],
                           turbo["decoder_num_attention_heads"])):
        assert hidden % heads == 0
        assert (hidden // heads) % 128 == 0, (hidden, heads)


def test_cli_seed_flag_reaches_config(tmp_path):
    """--seed must override the yaml seed (the reference merges argparse
    values last, src/train.py:28-30); two different seeds must produce
    different trial splits."""
    from video_spike_tpu.data.dataset import split_dataset
    from video_spike_tpu.data.synthetic import make_synthetic_session

    d = tmp_path / "data"
    make_synthetic_session(d, eid="seedcheck0", n_trials=20, n_neurons=4,
                           seed=0, height=16, width=16)
    s1 = split_dataset(str(d), "seedcheck0", seed=7)
    s2 = split_dataset(str(d), "seedcheck0", seed=8)
    assert s1["train"] != s2["train"]

    # the CLI plumbs --seed into config (all 7 entry points share the
    # pattern; spot-check train.py by reading the merged config path)
    import inspect
    from video_spike_tpu.cli import train as train_cli
    src = inspect.getsource(train_cli.main)
    assert 'config["seed"] = args.seed' in src
