"""Config tree + CLI override grammar (maggie_tpu/config.py), mirroring the
reference's yacs semantics (``maggie/utils/config.py`` + ``tools/main.py``
dotted-pair opts)."""

import pytest

from maggie_tpu.config import load_config


def test_dotted_override_coercion():
    cfg = load_config()
    cfg.merge_from_list([
        "train.batch_size", "8",          # int
        "train.optimizer.lr", "1e-4",     # float
        "model.sync_bn", "false",         # bool word, any case
        "dataset.test.split", "natural",  # str stays str
    ])
    assert cfg.train.batch_size == 8
    assert cfg.train.optimizer.lr == pytest.approx(1e-4)
    assert cfg.model.sync_bn is False
    assert cfg.dataset.test.split == "natural"


def test_new_key_boolean_words_on_open_nodes():
    """encoder_args/decoder_args accept NEW keys; boolean words must parse to
    real bools — the string 'false' is truthy and would silently invert any
    downstream bool(arg) check."""
    cfg = load_config()
    cfg.merge_from_list(["model.encoder_args.s2d_stem", "false",
                         "model.decoder_args.some_flag", "True",
                         "model.decoder_args.opt_none", "none"])
    assert cfg.model.encoder_args.s2d_stem is False
    assert cfg.model.decoder_args.some_flag is True
    assert cfg.model.decoder_args.opt_none is None


def test_equals_form_and_errors():
    cfg = load_config()
    cfg.merge_from_list(["--train.batch_size=6", "name=run1"])
    assert cfg.train.batch_size == 6 and cfg.name == "run1"
    with pytest.raises(KeyError):
        cfg.merge_from_list(["train.not_a_key", "1"])
    with pytest.raises(ValueError):
        cfg.merge_from_list(["train.batch_size"])


def test_dump_roundtrip():
    import yaml
    cfg = load_config()
    cfg.merge_from_list(["model.encoder_args.s2d_stem", "true"])
    d = yaml.safe_load(cfg.dump())
    assert d["model"]["encoder_args"]["s2d_stem"] is True
