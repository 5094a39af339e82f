"""Config schema tests: the reference yaml surface + back-compat."""
import yaml

from adaa_tpu.config import ExperimentConfig, resolve_checkpoint_path


def test_path_schema(tmp_path):
    cfg = {
        "data": {"seed": 7, "adversarial_attacks": ["FGSM"]},
        "checkpoint": {"path": "/x/ckpt.msgpack"},
        "model": {"name": "lcnn", "parameters": {"input_channels": 1},
                  "optimizer": {"lr": 1e-4}},
    }
    ec = ExperimentConfig.from_dict(cfg)
    assert ec.seed == 7
    assert ec.checkpoint_path == "/x/ckpt.msgpack"
    assert ec.adversarial_attacks == ["FGSM"]
    assert ec.model.name == "lcnn"


def test_legacy_paths_schema():
    """The adversarial-training CLI writes checkpoint.paths (a list) —
    train_models_on_adversarial_attacks.py:143-149 vs :89 in the
    reference; both schemas must load."""
    assert resolve_checkpoint_path({"paths": ["/a", "/b"]}) == "/a"
    assert resolve_checkpoint_path({"path": "/c"}) == "/c"
    assert resolve_checkpoint_path({}) is None
    assert resolve_checkpoint_path({"path": ""}) is None


def test_yaml_roundtrip(tmp_path):
    cfg = {
        "data": {"seed": 42},
        "checkpoint": {"path": ""},
        "model": {"name": "specrnet", "parameters": {}, "optimizer": {}},
    }
    src = tmp_path / "c.yaml"
    src.write_text(yaml.dump(cfg))
    ec = ExperimentConfig.from_yaml(src)
    dst = tmp_path / "out.yaml"
    ec.dump_yaml(dst)
    again = ExperimentConfig.from_yaml(dst)
    assert again.model.name == "specrnet"
    assert again.seed == 42


def test_shipped_configs_parse():
    import glob

    for f in (glob.glob("configs/**/*.yaml", recursive=True)
              + ["config.yaml", "batch_config.yaml"]):
        loaded = yaml.safe_load(open(f))
        assert loaded, f
        if "model" in loaded:
            ec = ExperimentConfig.from_dict(loaded)
            assert ec.model.name in ("lcnn", "specrnet", "rawnet3"), f


def test_finetune_config_filename_set_mirrors_reference():
    """The yaml surface is frozen to the reference's: the finetune
    config set must match configs/aa_training/finetune/ file-for-file
    (reference repo, incl. the _fixedpath variants)."""
    import os

    expected = {
        "lcnn_all.yaml",
        "lcnn_fab.yaml",
        "lcnn_fgsm.yaml",
        "lcnn_pgdl2.yaml",
        "lcnn_pgdl2_fixedpath.yaml",
        "rawnet3_pgdl2_fixedpath.yaml",
        "specrnet_pgdl2_fixedpath.yaml",
    }
    assert set(os.listdir("configs/aa_training/finetune")) == expected
