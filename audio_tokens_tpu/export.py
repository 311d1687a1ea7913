"""AOT serving export: ONE wav -> (tokens, probs) program, serialized.

`infer.Predictor` runs two jitted programs with a host round-trip between
them (tokens are fetched, padded on host, re-uploaded).  For production
serving that round-trip is pure overhead: `ServingProgram` fuses
tokenization and classification into a single XLA program — waveforms in,
token IDs + per-class probabilities out, nothing touches the host in
between.

`export_serving` then serializes that program with `jax.export` (StableHLO
+ baked-in parameters/centroids) so a serving host can run it WITHOUT this
framework — deserialize + call is all it takes, and the artifact pins the
exact numerics of the training run.  The reference has no counterpart (its
serve path is tools/manual_tester.py:32-65: flac -> mel -> FAISS search ->
torch checkpoint, four libraries and three host/device crossings).

Portable exports (default) use the pure-XLA tokenizer path so the artifact
loads on any JAX platform (cpu/tpu); `portable=False` keeps the Pallas
megakernel (fastest, TPU-only, serialized with a custom-call safety
override).

CLI:
  python -m audio_tokens_tpu.export --out serving/ [--batch 64]
      [--checkpoint no-wandb-best] [--portable true]
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_tokens_tpu.config import AudioTokensConfig
from audio_tokens_tpu.models import get_model, model_input_kind
from audio_tokens_tpu.tokenizer import FusedTokenizer
from audio_tokens_tpu.train.checkpoint import load_params
from audio_tokens_tpu.utils.seeding import key_for

logger = logging.getLogger(__name__)

MANIFEST_NAME = "serving.json"
PROGRAM_NAME = "serving.jaxexport"


def _portable_config(config: AudioTokensConfig) -> AudioTokensConfig:
    """Config for custom-call-free (multi-platform-exportable) builds: the
    transformer's 'auto' attention resolution would otherwise pick the
    Pallas flash kernel on a TPU host, and a pallas_call cannot lower for
    platforms the exporting chip doesn't match."""
    import dataclasses

    return dataclasses.replace(config, transformer_attention="xla")


class ServingProgram:
    """End-to-end jitted (padded waveforms, sample lengths) -> predictions.

    Inputs:
      padded_batch: (B, alloc_len) float32 — `frontend.prepare_batch` rows
        (reflect-padded waveforms; int16 PCM wire also accepted).
      lengths: (B,) int32 true sample counts per clip (pre-padding).

    Outputs:
      tokens:  (B, frames_max) int32 — positions >= n_valid are only
               meaningful through n_valid below (fixed shapes).
      n_valid: (B,) int32 valid frame count per clip.
      probs:   (B, num_classes) float32 sigmoid probabilities.

    Semantics match `infer.Predictor` exactly (tested): token models see the
    valid tokens zero-padded to max_seq_len; spec/flat models see the mel
    frames; true lengths are masked unless `reference_compat`.
    """

    def __init__(self, config: AudioTokensConfig,
                 checkpoint_name: str = "no-wandb-best",
                 use_pallas: Optional[bool] = None):
        if use_pallas is False:
            config = _portable_config(config)
        tokenizer = FusedTokenizer.from_artifacts(config,
                                                  use_pallas=use_pallas)
        self._wire(config, tokenizer)
        self.params = load_params(config.checkpoint_dir, checkpoint_name,
                                  self._init_template())
        self.fn = jax.jit(self.serve)

    @classmethod
    def from_components(cls, config: AudioTokensConfig, tokenizer,
                        params=None) -> "ServingProgram":
        """Build from live pieces (no artifacts on disk): benches and tests
        that synthesize centroids/params use this instead of __init__."""
        self = cls.__new__(cls)
        self._wire(config, tokenizer)
        self.params = params if params is not None else self._init_template()
        self.fn = jax.jit(self.serve)
        return self

    def _wire(self, config, tokenizer):
        self.config = config
        self.tokenizer = tokenizer
        self.model = get_model(config)
        self.input_kind = model_input_kind(config)
        self._sharded = {}  # mesh -> (jitted shard_map, replicated params)

    def _init_template(self):
        """Parameter-tree template (shapes for checkpoint restore / random
        init) via one model.init at the serving input shape."""
        T = self.config.max_seq_len
        if self.input_kind == "tokens":
            dummy = jnp.zeros((1, T), jnp.int32)
        elif self.input_kind == "spec":
            dummy = jnp.zeros((1, T, self.config.n_mels), jnp.float32)
        else:
            dummy = jnp.zeros((1, T * self.config.n_mels), jnp.float32)
        return self.model.init(
            {"params": key_for(self.config.random_seed, "model_init")},
            dummy, lengths=None, deterministic=True,
        )["params"]

    def serve(self, padded_batch: jax.Array, lengths: jax.Array
              ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        return self._serve(self.params, padded_batch, lengths)

    def _serve(self, params, padded_batch: jax.Array, lengths: jax.Array
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        cfg = self.config
        from audio_tokens_tpu.tokenizer import decode_wire

        padded_batch = decode_wire(padded_batch)
        # clamp before ANY consumer: normalized()'s valid-frame mask would
        # otherwise include padding frames for clips longer than the window
        lengths = jnp.minimum(lengths.astype(jnp.int32), cfg.clip_samples)
        norm_lengths = lengths if cfg.normalize else None
        tokens = self.tokenizer._tokens_dispatch(padded_batch, norm_lengths)
        # valid frame count: the tokenizer's own traced implementation, so
        # the exported n_valid can never drift from the token trim
        n_valid = self.tokenizer.frontend.frame_counts(lengths)
        T = cfg.max_seq_len
        seq_lens = jnp.minimum(n_valid, T)

        if self.input_kind == "tokens":
            frames_max = tokens.shape[1]
            if frames_max >= T:
                x = tokens[:, :T]
            else:
                x = jnp.pad(tokens, ((0, 0), (0, T - frames_max)))
            # zero (= pad token, reference compat) beyond each clip's frames
            pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            x = jnp.where(pos < seq_lens[:, None], x, 0)
        else:
            if cfg.normalize:
                mel = jnp.transpose(
                    self.tokenizer.frontend.normalized(padded_batch, lengths),
                    (0, 2, 1))
            else:
                mel = self.tokenizer.frontend.mel_frames(padded_batch)
            b, t, m = mel.shape
            # Predictor copies min(T', T) frames untrimmed, zero-pads the rest
            if t >= T:
                x = mel[:, :T, :]
            else:
                x = jnp.pad(mel, ((0, 0), (0, T - t), (0, 0)))
            if self.input_kind == "flat":
                x = x.reshape(b, T * m)
        logits = self.model.apply(
            {"params": params}, x,
            lengths=None if cfg.reference_compat else seq_lens,
            deterministic=True,
        )
        return tokens, n_valid, jax.nn.sigmoid(logits)

    def __call__(self, padded_batch, lengths):
        return self.fn(padded_batch, lengths)

    def serve_sharded(self, padded_batch, lengths, mesh):
        """Multi-chip serving: batch sharded over the mesh's 'data' axis.

        Like FusedTokenizer.tokens_sharded, the program is embarrassingly
        batch-parallel but the Pallas tokenizer kernel can't be
        auto-partitioned by GSPMD, so each device runs the full fused
        wav->probs program on its local shard under shard_map (zero
        collectives).  Params enter as an explicit replicated OPERAND —
        checkpoint-restored trees are committed to one device and closing
        over them would conflict with the mesh placement.  The jitted
        program and the replicated param tree are cached per mesh, so
        repeat calls pay one dispatch like serve()."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.shape["data"]
        if padded_batch.shape[0] % n_dev:
            raise ValueError(
                f"batch {padded_batch.shape[0]} not divisible by "
                f"data={n_dev}")
        cached = self._sharded.get(mesh)
        if cached is None:
            params = jax.device_put(self.params, NamedSharding(mesh, P()))
            fn = jax.jit(jax.shard_map(
                self._serve, mesh=mesh,
                in_specs=(P(), P("data"), P("data")),
                out_specs=(P("data"), P("data"), P("data")),
                check_vma=False,  # pallas outputs carry no vma info
            ))
            cached = self._sharded[mesh] = (fn, params)
        fn, params = cached
        return fn(params, padded_batch, lengths)

    def predict_waveforms(self, waves) -> Tuple[list, np.ndarray]:
        """Host convenience mirroring Predictor: trimmed tokens + probs."""
        batch, lengths = self.tokenizer.frontend.prepare_batch(waves)
        tokens, n_valid, probs = self.fn(jnp.asarray(batch),
                                         jnp.asarray(lengths))
        tokens, n_valid = np.asarray(tokens), np.asarray(n_valid)
        out = [tokens[i, : n_valid[i]].astype(np.int64)
               for i in range(len(waves))]
        return out, np.asarray(probs)


def export_serving(config: AudioTokensConfig, out_dir,
                   batch_size: int = 64,
                   checkpoint_name: str = "no-wandb-best",
                   portable: bool = True) -> Path:
    """Serialize the serving program + a manifest into `out_dir`.

    portable=True forces the pure-XLA tokenizer (no custom calls; the
    artifact deserializes on any platform jax.export supports).  False keeps
    the platform-default path (Pallas megakernel on TPU — fastest, but the
    custom call ties the artifact to the exporting platform and needs the
    stability override).
    """
    from jax import export as jexport

    prog = ServingProgram(config, checkpoint_name,
                          use_pallas=False if portable else None)
    alloc_len = getattr(prog.tokenizer.frontend, "alloc_len",
                        prog.tokenizer.frontend.padded_len)
    args = (
        jax.ShapeDtypeStruct((batch_size, alloc_len), jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.int32),
    )
    kwargs = {}
    if portable:
        # multi-platform lowering: the artifact must run on serving hosts
        # that are not the exporting platform
        kwargs["platforms"] = ["cpu", "tpu"]
    else:
        kwargs["disabled_checks"] = [
            jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")
        ]
    exported = jexport.export(prog.fn, **kwargs)(*args)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    blob = exported.serialize()
    (out_dir / PROGRAM_NAME).write_bytes(blob)
    manifest = {
        "format": "jax.export.serialize",
        "platforms": list(exported.platforms),
        "portable": portable,
        "batch_size": batch_size,
        "alloc_len": int(alloc_len),
        "inputs": {
            "padded_batch": ["float32", [batch_size, int(alloc_len)]],
            "lengths": ["int32", [batch_size]],
        },
        "outputs": ["tokens int32 (B, frames_max)", "n_valid int32 (B,)",
                    "probs float32 (B, num_classes)"],
        "sample_rate": config.common_sr,
        "clip_samples": int(config.clip_samples),
        "hop_length": config.hop_length,
        "n_fft": config.n_fft,
        "n_mels": config.n_mels,
        "frames_max": int(prog.tokenizer.frontend.frames_max),
        "padded_len": int(prog.tokenizer.frontend.padded_len),
        "vocab_size": config.vocab_size,
        "num_classes": config.num_classes,
        "model_type": config.model_type,
        "checkpoint": checkpoint_name,
        # class index -> human-readable AudioSet label name, so a standalone
        # serving host can render predictions without this framework or the
        # ontology files
        "class_names": _class_names(config),
    }
    (out_dir / MANIFEST_NAME).write_text(json.dumps(manifest, indent=2))
    logger.info("exported serving program (%d bytes) to %s",
                len(blob), out_dir)
    return out_dir


def _class_names(config: AudioTokensConfig):
    """index -> label-name list (ontology ordering, metadata.load_class_names
    — no segment-CSV parse or RNG side effects); None when the ontology is
    unavailable."""
    try:
        from audio_tokens_tpu.data.metadata import load_class_names

        return load_class_names(config)
    except Exception as e:  # metadata optional for serving artifacts
        logger.info("class names omitted from manifest (%s)", e)
        return None


def load_serving(out_dir):
    """(exported, manifest): call `exported.call(padded_batch, lengths)`."""
    from jax import export as jexport

    out_dir = Path(out_dir)
    exported = jexport.deserialize(
        bytearray((out_dir / PROGRAM_NAME).read_bytes()))
    manifest = json.loads((out_dir / MANIFEST_NAME).read_text())
    return exported, manifest


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--checkpoint", default="no-wandb-best")
    parser.add_argument("--portable", default="true",
                        choices=("true", "false"))
    args, rest = parser.parse_known_args()
    cfg = AudioTokensConfig.from_args(rest)
    export_serving(cfg, args.out, args.batch, args.checkpoint,
                   portable=args.portable == "true")
