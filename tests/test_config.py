import pytest
import yaml

from img2latex_tpu.config import Config, config_from_dict, load_config, set_by_path


def test_defaults():
    cfg = Config()
    assert cfg.model.name == "cnn_lstm"
    assert cfg.data.max_seq_length == 141
    assert cfg.training.clip_grad_norm == 5.0
    assert cfg.hardware.mesh_axes == ("data", "model")


def test_partial_dict_merge():
    cfg = config_from_dict({"model": {"name": "resnet_lstm"}, "training": {"epochs": 3}})
    assert cfg.model.name == "resnet_lstm"
    assert cfg.training.epochs == 3
    assert cfg.training.learning_rate == 1e-3  # untouched default


def test_unknown_keys_tolerated():
    cfg = config_from_dict({"bogus": {"x": 1}, "data": {"not_a_key": 2, "batch_size": 4}})
    assert cfg.data.batch_size == 4


def test_strict_mode_raises():
    with pytest.raises(ValueError):
        config_from_dict({"data": {"not_a_key": 2}}, strict=True)


def test_reference_yaml_loads():
    """The reference's own config file must load unchanged."""
    cfg = load_config("/root/reference/img2latex/configs/config.yaml")
    assert cfg.model.name == "resnet_lstm"
    assert cfg.data.batch_size == 128
    assert cfg.data.max_seq_length == 141
    assert cfg.model.decoder.lstm_layers == 2
    assert cfg.inference.beam_size == 2
    assert cfg.preprocessing.pad_value == 255


def test_overrides_and_set_by_path():
    cfg = load_config(overrides={"training.learning_rate": 3e-4, "model.name": "resnet_lstm"})
    assert cfg.training.learning_rate == 3e-4
    assert cfg.model.name == "resnet_lstm"
    set_by_path(cfg, "model.decoder.hidden_dim", 64)
    assert cfg.model.decoder.hidden_dim == 64
    with pytest.raises(AttributeError):
        set_by_path(cfg, "model.nope", 1)


def test_validation_errors():
    with pytest.raises(ValueError):
        config_from_dict({"model": {"name": "transformer"}})
    with pytest.raises(ValueError):
        config_from_dict({"model": {"name": "resnet_lstm", "encoder": {"resnet": {"model_name": "vgg"}}}})
    with pytest.raises(ValueError):
        config_from_dict({"training": {"label_smoothing": 1.5}})


def test_selective_signal_validation():
    # plain + composite forms accepted
    for sig in ("logp", "margin", "entropy", "margin_logp", "margin_logp:0.5"):
        cfg = config_from_dict({"inference": {"selective_signal": sig}})
        assert cfg.inference.selective_signal == sig
    # junk names and a non-numeric alpha rejected
    for sig in ("confidence", "margin_logp:abc", "margin_logpx"):
        with pytest.raises(ValueError):
            config_from_dict({"inference": {"selective_signal": sig}})


def test_yaml_roundtrip(tmp_path):
    cfg = Config()
    cfg.training.epochs = 7
    p = tmp_path / "cfg.yaml"
    cfg.to_yaml(p)
    cfg2 = load_config(p)
    assert cfg2.training.epochs == 7
    assert yaml.safe_load(p.read_text())["model"]["name"] == "cnn_lstm"


def test_image_shape_property():
    cfg = Config()
    assert cfg.image_shape == (64, 800, 1)
    cfg.model.name = "resnet_lstm"
    assert cfg.image_shape == (64, 800, 3)
