"""Single-clip inference: wav file -> top-k label predictions.

Equivalent of the reference's manual tester "serve" path
(reference: tools/manual_tester.py:32-65: flac -> mel -> FAISS 1-NN tokens ->
saved checkpoint -> top-30 sigmoid predictions with '*' marking true labels),
but the whole wav -> logits path is two jitted programs: the fused tokenizer
and the classifier forward.

CLI:  python -m audio_tokens_tpu.infer --ytid <id> [--top_k 30] [--checkpoint name]
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from audio_tokens_tpu.config import AudioTokensConfig
from audio_tokens_tpu.data.audio_io import decode_audio, find_audio_file
from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
from audio_tokens_tpu.models import get_model, model_input_kind
from audio_tokens_tpu.tokenizer import FusedTokenizer
from audio_tokens_tpu.train.checkpoint import load_params
from audio_tokens_tpu.utils.seeding import key_for

logger = logging.getLogger(__name__)


class Predictor:
    """wav -> (token sequence, per-class probabilities)."""

    def __init__(self, config: AudioTokensConfig, checkpoint_name: str = "no-wandb-best"):
        self.config = config
        self.tokenizer = FusedTokenizer.from_artifacts(config)
        self.model = get_model(config)
        self.input_kind = model_input_kind(config)

        dummy = self._dummy_input()
        template = self.model.init(
            {"params": key_for(config.random_seed, "model_init")},
            dummy, lengths=None, deterministic=True,
        )["params"]
        self.params = load_params(config.checkpoint_dir, checkpoint_name, template)

    def _dummy_input(self):
        T = self.config.max_seq_len
        if self.input_kind == "tokens":
            return jnp.zeros((1, T), jnp.int32)
        if self.input_kind == "spec":
            return jnp.zeros((1, T, self.config.n_mels), jnp.float32)
        return jnp.zeros((1, T * self.config.n_mels), jnp.float32)

    def predict_waveform(self, wave: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        tokens = self.tokenizer.tokenize_waveforms([wave])[0]
        T = self.config.max_seq_len
        if self.input_kind == "tokens":
            inputs = np.zeros((1, T), np.int32)
            inputs[0, : min(len(tokens), T)] = tokens[:T]
        else:
            batch, wav_lens = self.tokenizer.frontend.prepare_batch([wave])
            if self.config.normalize:  # match the spec artifacts' scaling
                mel = np.asarray(
                    self.tokenizer.frontend.normalized(batch, wav_lens)
                )[0].T
            else:
                mel = np.asarray(self.tokenizer.frontend(batch))[0].T  # (T', M)
            buf = np.zeros((T, self.config.n_mels), np.float32)
            n = min(len(mel), T)
            buf[:n] = mel[:n]
            inputs = buf.reshape(1, -1) if self.input_kind == "flat" else buf[None]
        lengths = np.asarray([min(len(tokens), T)], np.int32)
        logits = self.model.apply(
            {"params": self.params},
            jnp.asarray(inputs),
            lengths=None if self.config.reference_compat else jnp.asarray(lengths),
            deterministic=True,
        )
        probs = np.asarray(1.0 / (1.0 + np.exp(-np.asarray(logits[0]))))
        return tokens, probs

    def predict_file(self, path) -> Tuple[np.ndarray, np.ndarray]:
        wave, _ = decode_audio(path, target_sr=self.config.common_sr)
        return self.predict_waveform(wave)


class ManualTester:
    """Reference-shaped report: ranked predictions annotated with truth."""

    def __init__(self, config: AudioTokensConfig, checkpoint_name: str = "no-wandb-best"):
        self.config = config
        self.metadata = AudiosetMetadataProcessor(config)
        self.predictor = Predictor(config, checkpoint_name)

    def find_audio_file(self, ytid: str) -> Optional[Path]:
        return find_audio_file(self.config, ytid)

    def run(self, ytid: str, top_k: int = 30) -> List[dict]:
        path = self.find_audio_file(ytid)
        if path is None:
            raise FileNotFoundError(f"no audio for ytid {ytid}")
        tokens, probs = self.predictor.predict_file(path)
        true_labels = set(self.metadata.get_ytid_labels(ytid))

        order = np.argsort(-probs)[:top_k]
        rows = []
        for rank, idx in enumerate(order, start=1):
            label_id = self.metadata.index_label.get(int(idx), "?")
            rows.append({
                "rank": rank,
                "class_index": int(idx),
                "score": float(probs[idx]),
                "name": self.metadata.label_name.get(label_id, label_id),
                "is_true": int(idx) in true_labels,
            })
        self._print(ytid, tokens, rows)
        return rows

    @staticmethod
    def _print(ytid: str, tokens: np.ndarray, rows: List[dict]) -> None:
        print(f"ytid: {ytid}  ({len(tokens)} tokens)")
        for r in rows:
            star = "*" if r["is_true"] else " "
            print(f"{star} {r['rank']:>3}  {r['score']:.4f}  {r['name']}")


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--ytid", required=True)
    parser.add_argument("--top_k", type=int, default=30)
    parser.add_argument("--checkpoint", default="no-wandb-best")
    args, rest = parser.parse_known_args()
    config = AudioTokensConfig.from_args(rest)
    ManualTester(config, args.checkpoint).run(args.ytid, args.top_k)
