import pytest
import yaml

from accel_tpu.config import default_config, load_config, update_config


def test_defaults_have_reference_vocabulary():
    cfg = default_config()
    assert cfg.dataset.NUM_CLASSES == 19
    assert cfg.TEST.KEY_FRAME_INTERVAL == 5
    assert cfg.TRAIN.lr > 0
    assert cfg.network.PIXEL_MEANS[2] > 100  # BGR means


def test_yaml_overlay(tmp_path):
    p = tmp_path / "exp.yaml"
    p.write_text(yaml.safe_dump({
        "network": {"name": "dff", "ref_depth": 50},
        "TEST": {"KEY_FRAME_INTERVAL": 10},
    }))
    cfg = load_config(str(p))
    assert cfg.network.name == "dff"
    assert cfg.network.ref_depth == 50
    assert cfg.TEST.KEY_FRAME_INTERVAL == 10
    # untouched defaults survive
    assert cfg.dataset.NUM_CLASSES == 19


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump({"network": {"nam": "typo"}}))
    cfg = default_config()
    with pytest.raises(KeyError):
        update_config(cfg, str(p))


def test_attribute_set_and_clone():
    cfg = default_config()
    cfg.network.ref_depth = 34
    c2 = cfg.clone()
    c2.network.ref_depth = 101
    assert cfg.network.ref_depth == 34
