"""Config CLI/JSON overlay and mesh-helper unit tests."""

import json

import jax
import numpy as np
import pytest

from audio_tokens_tpu.config import AudioTokensConfig


def test_flag_type_coercion(tmp_path):
    cfg = AudioTokensConfig.from_args([
        "--base_dir", str(tmp_path),
        "--vocab_size", "1024",
        "--learning_rate", "3e-3",
        "--use_convolution", "true",
        "--normalize", "0",
        "--audio_source_sets", "bal_train,unbal_train",
        "--max_points_per_centroid", "256",
    ])
    assert cfg.vocab_size == 1024
    assert cfg.learning_rate == pytest.approx(3e-3)
    assert cfg.use_convolution is True
    assert cfg.normalize is False
    assert cfg.audio_source_sets == ["bal_train", "unbal_train"]
    assert cfg.max_points_per_centroid == 256


def test_optional_int_none(tmp_path):
    cfg = AudioTokensConfig.from_args(
        ["--base_dir", str(tmp_path), "--max_points_per_centroid", "none"]
    )
    assert cfg.max_points_per_centroid is None


def test_json_overlay_and_flag_precedence(tmp_path):
    blob = {"vocab_size": 77, "model_type": "bert", "epochs": 3}
    f = tmp_path / "cfg.json"
    f.write_text(json.dumps(blob))
    cfg = AudioTokensConfig.from_args([
        "--base_dir", str(tmp_path), "--config", str(f),
        "--vocab_size", "99",  # explicit flag beats the JSON value
    ])
    assert cfg.vocab_size == 99
    assert cfg.model_type == "bert"
    assert cfg.epochs == 3


def test_unknown_flags_ignored(tmp_path):
    cfg = AudioTokensConfig.from_args(
        ["--base_dir", str(tmp_path), "--not_a_field", "x"]
    )
    assert cfg.vocab_size == 500  # defaults intact


def test_make_mesh_shapes_and_errors():
    from audio_tokens_tpu.parallel.mesh import make_mesh

    devs = jax.devices()
    mesh = make_mesh(data=-1, model=2, devices=devs)
    assert mesh.shape == {"data": len(devs) // 2, "model": 2}
    with pytest.raises(ValueError, match="divisible"):
        make_mesh(data=-1, model=3, devices=devs)
    with pytest.raises(ValueError, match="exceeds"):
        make_mesh(data=len(devs), model=2, devices=devs)


def test_tp_param_specs_rule_rank_mismatch():
    from jax.sharding import PartitionSpec as P

    from audio_tokens_tpu.parallel.mesh import tp_param_specs

    params = {"dense": {"kernel": np.zeros((4, 4)), "bias": np.zeros(4)}}
    specs = tp_param_specs(params, [("dense/kernel", (None, "model"))])
    assert specs["dense"]["kernel"] == P(None, "model")
    assert specs["dense"]["bias"] == P()  # unmatched -> replicated
    with pytest.raises(ValueError, match="axes"):
        tp_param_specs(params, [("dense/kernel", (None, "model", None))])


def test_tokenized_dir_overrides_honored(tmp_path):
    """The reference's dataset reads config.tokenized_train_dir /
    tokenized_val_dir (datasets/tokenized_spec_dataset.py:33-38) — an
    explicit override must redirect the dataset, independent of
    dest_tokenized_path."""
    import json

    from audio_tokens_tpu.data.datasets import TokenizedSpecDataset

    custom = tmp_path / "elsewhere"
    custom.mkdir()
    np.save(custom / "ytid0.npy", np.array([1, 2, 3], np.int64))
    split_file = tmp_path / "split.json"
    split_file.write_text(json.dumps({"train": ["ytid0"], "validation": []}))
    cfg = AudioTokensConfig(
        base_dir=str(tmp_path), split_file=str(split_file),
        tokenized_train_dir=str(custom), token_cache=False,
    )

    class Meta:
        ytid_labels = {"ytid0": [0]}

    ds = TokenizedSpecDataset(cfg, Meta(), split="train")
    assert len(ds) == 1
    assert np.array_equal(ds.load_features(0), [1, 2, 3])


def test_dest_tokenized_path_override_propagates(tmp_path):
    """Overriding dest_tokenized_path alone must move the dataset READ dirs
    with it (writer and reader stay aligned); explicit per-split overrides
    still win."""
    cfg = AudioTokensConfig(base_dir=str(tmp_path),
                            dest_tokenized_path="/data/toks/")
    assert cfg.tokenized_train_dir == "/data/toks/train/"
    assert cfg.tokenized_val_dir == "/data/toks/validation/"
    cfg2 = AudioTokensConfig(base_dir=str(tmp_path),
                             dest_tokenized_path="/data/toks/",
                             tokenized_val_dir="/elsewhere/val")
    assert cfg2.tokenized_val_dir == "/elsewhere/val"


def test_lstm_backend_typo_raises(tmp_path):
    """A lstm_backend typo must not silently degrade to the XLA scan."""
    from audio_tokens_tpu.models.registry import get_model

    cfg = AudioTokensConfig(base_dir=str(tmp_path), model_type="lstm",
                            lstm_backend="Pallas")
    with pytest.raises(ValueError, match="lstm_backend"):
        get_model(cfg)


def test_parse_overrides_tool_overlay():
    """parse_overrides is the ONE overlay rule tools share (serve_bench
    etc.): --field value and --field=value coerce via the dataclass
    annotations; unknown fields and dangling values are rejected."""
    out = AudioTokensConfig.parse_overrides(
        ["--transformer_max_position", "1728", "--kmeans_wire=bf16",
         "--dropout", "0.5", "--reference_compat", "false"])
    assert out == {"transformer_max_position": 1728, "kmeans_wire": "bf16",
                   "dropout": 0.5, "reference_compat": False}
    assert AudioTokensConfig.parse_overrides([]) == {}
    with pytest.raises(SystemExit, match="unknown config field"):
        AudioTokensConfig.parse_overrides(["--not_a_field", "1"])
    with pytest.raises(SystemExit, match="dangling"):
        AudioTokensConfig.parse_overrides(["--dropout"])
