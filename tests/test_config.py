"""Config system tests: composition, overrides, interpolation, instantiate."""

import os

import pytest

from phantom_vlb_tpu.core.config import Config, instantiate, load_config


@pytest.fixture
def config_dir(tmp_path):
    (tmp_path / "experiment").mkdir()
    (tmp_path / "base.yaml").write_text(
        "subject: null\n"
        "random_state: 1234\n"
        "defaults:\n"
        "  - _self_\n"
        "  - experiment: null\n"
        "output_dir: ./results\n"
    )
    (tmp_path / "experiment" / "demo.yaml").write_text(
        "datamodule:\n"
        "  subject: ${subject}\n"
        "  seasons: [s1, s2]\n"
        "  batch_size: 5\n"
        "train:\n"
        "  seed: ${random_state}\n"
        "output_dir: ./results/${subject}\n"
    )
    return tmp_path


def test_compose_and_override(config_dir):
    cfg = load_config(config_dir, overrides=["experiment=demo", "subject=sub-01"])
    assert cfg.subject == "sub-01"
    assert cfg.datamodule.subject == "sub-01"
    assert cfg.train.seed == 1234            # typed interpolation
    assert cfg.output_dir == "./results/sub-01"
    assert cfg.datamodule.seasons == ["s1", "s2"]


def test_override_typing(config_dir):
    cfg = load_config(
        config_dir,
        overrides=["experiment=demo", "subject=sub-02", "datamodule.batch_size=3"],
    )
    assert cfg.datamodule.batch_size == 3
    assert isinstance(cfg.datamodule.batch_size, int)


def test_env_interpolation(config_dir, monkeypatch):
    monkeypatch.setenv("SCRATCH_PATH", "/scratch/x")
    (config_dir / "experiment" / "env.yaml").write_text(
        "paths:\n"
        "  a: $SCRATCH_PATH/data\n"
        "  b: ${env:SCRATCH_PATH}/data\n"
        "  c: ${env:NOPE_UNSET,fallback}\n"
    )
    cfg = load_config(config_dir, overrides=["experiment=env"])
    assert cfg.paths.a == "/scratch/x/data"
    assert cfg.paths.b == "/scratch/x/data"
    assert cfg.paths.c == "fallback"


def test_instantiate():
    node = Config(
        {
            "_target_": "collections.OrderedDict",
            "inner": {"_target_": "builtins.dict", "x": 1},
        }
    )
    obj = instantiate(node)
    assert obj["inner"] == {"x": 1}


def test_missing_env_raises(config_dir):
    (config_dir / "experiment" / "bad.yaml").write_text("x: ${env:DEFINITELY_UNSET_VAR}\n")
    with pytest.raises(KeyError):
        load_config(config_dir, overrides=["experiment=bad"])
