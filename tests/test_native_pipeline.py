"""Native vs python decode backends must produce identical spectrogram
artifacts through the full stage-1 pipeline."""

import json
from pathlib import Path

import numpy as np
import pytest

from audio_tokens_tpu.data import native_loader
from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
from audio_tokens_tpu.data.splitter import DatasetSplitter
from audio_tokens_tpu.processors.spectrogram_generator import SpectrogramGenerator
from tests import fixtures

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native decoder not built"
)


def test_native_backend_matches_python_backend(tmp_path):
    fixtures.make_workspace(tmp_path, n_clips=8)
    cfg_py = fixtures.test_config(tmp_path, audio_backend="python")
    DatasetSplitter(cfg_py).create_split_file(AudiosetMetadataProcessor(cfg_py))

    gen = SpectrogramGenerator(cfg_py)
    assert not gen.use_native
    gen.run()
    py_specs = {
        f.name: np.load(f)
        for f in sorted((Path(cfg_py.dest_spec_path) / "train").glob("*.npy"))
    }
    assert py_specs

    cfg_nat = fixtures.test_config(tmp_path, audio_backend="native")
    gen2 = SpectrogramGenerator(cfg_nat)
    assert gen2.use_native
    gen2.run()
    for name, py_spec in py_specs.items():
        nat_spec = np.load(Path(cfg_nat.dest_spec_path) / "train" / name)
        assert nat_spec.shape == py_spec.shape
        np.testing.assert_allclose(nat_spec, py_spec, atol=2e-4)
