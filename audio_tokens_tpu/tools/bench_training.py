"""Training step-rate benchmark: full train step (fwd + bwd + AdamW) per
model family at configurable shapes.  Reproduces the BASELINE.md table.

Timing protocol (important on remote/experimental PJRT backends where
block_until_ready can return early): steps are chained through params, N
steps are queued, and ONE scalar value fetch of the final loss provides the
sync — in-order execution guarantees all N completed.

Usage: python -m audio_tokens_tpu.tools.bench_training
       [--models simple,bert,lstm] [--iters 20]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_tokens_tpu.config import AudioTokensConfig
from audio_tokens_tpu.models import get_model
from audio_tokens_tpu.utils.seeding import key_for

# (case name, model_type, batch, seq, config overrides)
DEFAULT_CASES = [
    ("simple", "simple", 64, 1728, dict(hidden_size=768)),
    ("bert", "bert", 32, 512, dict(hidden_size=768, num_layers=2, dropout=0.0)),
    # full-clip attention (transformer_max_position = whole 10 s clip); the
    # TPU-native mode SURVEY.md §5 names — ~11x the 512-window attention
    # FLOPs, so the batch drops to keep the (B, H, T, T) score tensor sane
    ("bert_full", "bert", 8, 1728, dict(hidden_size=768, num_layers=2,
                                        dropout=0.0,
                                        transformer_max_position=1728)),
    ("lstm", "lstm", 64, 1728, dict(lstm_embed_dim=256, lstm_hidden_dim=512,
                                    num_layers=1)),
    # spec-input families at the reference's full-clip spectrogram shape
    ("cnn", "cnn", 64, 1728, dict()),
    ("baseline", "baseline", 64, 1728, dict()),
    # bf16 HBM storage for the resident spec corpus (config
    # device_corpus_dtype): halves residency (a 22k-clip spec corpus is
    # ~9.8 GB f32 -> 4.9 GB bf16); step rate measured neutral (+1%,
    # interleaved A/B, BASELINE.md) — the gather is not the bottleneck
    ("baseline_bf16", "baseline", 64, 1728,
     dict(device_corpus_dtype="bfloat16")),
    ("cnn_bf16", "cnn", 64, 1728, dict(device_corpus_dtype="bfloat16")),
]


def _bench_inputs(cfg, batch: int, seq: int, rng):
    """Synthetic inputs matching what the model family consumes
    (models/registry.py::model_input_kind)."""
    from audio_tokens_tpu.models import model_input_kind

    kind = model_input_kind(cfg)
    if kind == "tokens":
        return jnp.asarray(
            rng.integers(0, cfg.vocab_size, (batch, seq)), jnp.int32)
    if kind == "spec":
        return jnp.asarray(
            rng.standard_normal((batch, seq, cfg.n_mels)), jnp.float32)
    return jnp.asarray(
        rng.standard_normal((batch, seq * cfg.n_mels)), jnp.float32)


def bench_case(model_type: str, batch: int, seq: int, iters: int, **overrides):
    cfg = AudioTokensConfig(
        model_type=model_type, vocab_size=500, num_classes=543,
        max_seq_len=seq, **overrides,
    )
    model = get_model(cfg)
    rng = np.random.default_rng(0)
    toks = _bench_inputs(cfg, batch, seq, rng)
    labels = jnp.asarray((rng.random((batch, cfg.num_classes)) < 0.05), jnp.float32)
    params = model.init(
        {"params": key_for(0, "bench")}, toks, lengths=None, deterministic=True
    )["params"]
    optimizer = optax.adamw(1e-4, weight_decay=0.01)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, toks, labels):
        def loss_fn(p):
            # deterministic=False mirrors the real train step (all bench
            # cases run dropout=0, so the math is unchanged) — and keeps
            # the transformer's 'auto' attention on its training (XLA)
            # path instead of differentiating the eval-only flash kernel
            logits = model.apply({"params": p}, toks, lengths=None,
                                 deterministic=False)
            return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, toks, labels)
    float(loss)  # sync
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, toks, labels)
    float(loss)  # single final sync; steps are chained through params
    ms = (time.perf_counter() - t0) / iters * 1e3

    flops = _train_flops(model_type, cfg, batch, seq)
    perf = ""
    if flops:
        from audio_tokens_tpu.ops.common import bf16_peak_flops

        tf = flops / (ms / 1e3) / 1e12
        pct = flops / (ms / 1e3) / bf16_peak_flops() * 100
        perf = f" (~{tf:.1f} TFLOP/s, ~{pct:.0f}% of bf16 peak)"
    print(
        f"{model_type:8s} B={batch} T={seq}: compile {compile_s:5.1f}s, "
        f"{ms:7.1f} ms/step -> {batch / ms * 1000:8.0f} clips/s{perf}"
    )
    return ms


def bench_forward_case(model_type: str, batch: int, seq: int, iters: int,
                       **overrides):
    """Deterministic forward rate (the eval-epoch / serving path — where
    the transformer's 'auto' attention engages the flash kernel on TPU)."""
    cfg = AudioTokensConfig(
        model_type=model_type, vocab_size=500, num_classes=543,
        max_seq_len=seq, **overrides,
    )
    model = get_model(cfg)
    rng = np.random.default_rng(0)
    toks = _bench_inputs(cfg, batch, seq, rng)
    params = model.init(
        {"params": key_for(0, "bench")}, toks, lengths=None,
        deterministic=True,
    )["params"]
    fwd = jax.jit(lambda p, t: model.apply({"params": p}, t, lengths=None,
                                           deterministic=True))
    probe = jax.jit(lambda o: o.reshape(-1)[0])
    float(probe(fwd(params, toks)))  # compile + sync
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fwd(params, toks)
    float(probe(out))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{model_type:8s} B={batch} T={seq} forward: {ms:7.2f} ms/batch "
          f"-> {batch / ms * 1000:8.0f} clips/s")
    return ms


def _train_flops(model_type, cfg, batch, seq):
    """Train-step GEMM FLOPs (fwd + ~2x bwd); None for families whose cost
    is gathers/pools rather than matmuls."""
    if model_type == "lstm":
        e, h = cfg.lstm_embed_dim, cfg.lstm_hidden_dim
        # layer 0 consumes the embedding (E wide); deeper layers consume the
        # bidirectional concat (2H wide)
        per_tok = 2.0 * (e * 4 * h + h * 4 * h) * 2  # both directions, fwd
        per_tok += (cfg.num_layers - 1) * 2.0 * (2 * h * 4 * h + h * 4 * h) * 2
        return 3.0 * per_tok * batch * seq
    if model_type == "bert":
        hs = cfg.hidden_size
        # the model truncates to its attention window (512 = reference)
        t = min(seq, cfg.transformer_max_position)
        per_tok_layer = 2.0 * 12 * hs * hs  # qkv/proj + 4x MLP, fwd
        attn = 4.0 * t * t * hs  # scores + weighted sum, fwd
        return 3.0 * (per_tok_layer * t + attn) * cfg.num_layers * batch
    if model_type == "cnn":
        t, m = seq, cfg.n_mels
        conv1 = 2.0 * t * m * 9 * 1 * 32
        conv2 = 2.0 * (t // 2) * (m // 2) * 9 * 32 * 64
        fc = 2.0 * ((t // 4) * (m // 4) * 64 * 256 + 256 * cfg.num_classes)
        return 3.0 * (conv1 + conv2 + fc) * batch
    if model_type == "baseline":
        d = seq * cfg.n_mels
        return 3.0 * 2.0 * (d * 512 + 512 * 256 + 256 * cfg.num_classes) * batch
    return None


class _MemLoader:
    """BatchLoader-shaped wrapper over prebuilt in-memory batches: isolates
    the Trainer loop's own overhead (device_put, RNG fold, async prediction
    fetch, metric flushes) from host disk/assembly throughput, which
    ``tools.bench_loader`` measures separately."""

    def __init__(self, batches):
        self._batches = batches
        self.ds = batches  # len(ds) > 0 check only

    def dummy_batch(self):
        return self._batches[0]

    def batches(self, epoch: int):
        yield from self._batches


def bench_real_loop(model_type: str, batch: int, seq: int, epochs: int,
                    n_batches: int, **overrides) -> None:
    """Epoch rate of the REAL ``Trainer._train_epoch`` loop (the code path
    ``Trainer.run()`` executes), vs the chained-step harness above.  Round 2
    fetched loss + predictions synchronously every step, capping the real
    loop at the host round-trip rate regardless of device speed."""
    from audio_tokens_tpu.train.trainer import Trainer

    kwargs = dict(
        model_type=model_type, vocab_size=500, num_classes=543,
        max_seq_len=seq, training_batch_size=batch, dropout=0.0,
        save_best_checkpoint=False,
    )
    kwargs.update(overrides)
    cfg = AudioTokensConfig(**kwargs)
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(n_batches):
        batches.append({
            "inputs": np.asarray(_bench_inputs(cfg, batch, seq, rng)),
            "lengths": np.full((batch,), seq, np.int32),
            "labels": (rng.random((batch, cfg.num_classes)) < 0.05).astype(np.float32),
            "n_valid": batch,
        })
    loader = _MemLoader(batches)
    trainer = Trainer(cfg)
    params, opt_state = trainer._init_state(loader)
    train_step, _ = trainer._build_steps()

    # warm epoch: compiles the step
    params, opt_state, step, _, _ = trainer._train_epoch(
        train_step, params, opt_state, loader, 0, 0)
    t0 = time.perf_counter()
    for e in range(1, epochs + 1):
        params, opt_state, step, loss, metrics = trainer._train_epoch(
            train_step, params, opt_state, loader, e, step)
    dt = time.perf_counter() - t0
    clips = batch * n_batches * epochs
    ms = dt / (n_batches * epochs) * 1e3
    print(
        f"{model_type:8s} B={batch} T={seq}: real Trainer._train_epoch loop "
        f"{ms:7.1f} ms/step -> {clips / dt:8.0f} clips/s "
        f"(incl. device_put, epoch mAP accumulation)"
    )


def bench_device_loop(model_type: str, batch: int, seq: int, epochs: int,
                      n_batches: int, **overrides) -> None:
    """Epoch rate of the device-resident path (train/device_epoch.py): the
    corpus lives in HBM, an epoch is ONE compiled program (scan over steps +
    on-device exact mAP), and the host fetches two scalars per epoch — the
    loop that replaces per-step device_put/prediction fetches entirely."""
    from audio_tokens_tpu.train.device_epoch import DeviceEpochRunner
    from audio_tokens_tpu.train.trainer import Trainer

    kwargs = dict(
        model_type=model_type, vocab_size=500, num_classes=543,
        max_seq_len=seq, training_batch_size=batch, dropout=0.0,
        save_best_checkpoint=False,
    )
    kwargs.update(overrides)
    from audio_tokens_tpu.models import model_input_kind

    cfg = AudioTokensConfig(**kwargs)
    rng = np.random.default_rng(0)
    n = batch * n_batches
    kind = model_input_kind(cfg)
    if kind == "tokens":
        inputs = rng.integers(0, cfg.vocab_size, (n, seq)).astype(np.uint16)
        init_inputs = inputs[:batch].astype(np.int32)
    else:
        from audio_tokens_tpu.train.device_epoch import _feature_dtype

        shape = (n, seq, cfg.n_mels) if kind == "spec" else (n, seq * cfg.n_mels)
        inputs = rng.standard_normal(shape).astype(_feature_dtype(cfg))
        init_inputs = inputs[:batch].astype(np.float32)
    lengths = np.full(n, seq, np.int32)
    labels = (rng.random((n, cfg.num_classes)) < 0.05).astype(np.uint8)
    init_batch = {
        "inputs": init_inputs,
        "lengths": lengths[:batch],
        "labels": labels[:batch].astype(np.float32),
        "n_valid": batch,
    }
    trainer = Trainer(cfg)
    params, opt_state = trainer._init_state(_MemLoader([init_batch]))
    # literally the Trainer's decision (shared policy fn; bench corpora
    # always fit, so no budget bound)
    from audio_tokens_tpu.train.device_epoch import should_materialize

    materialize, _ = should_materialize(cfg, kind, n)
    runner = DeviceEpochRunner(trainer.model, trainer.optimizer, cfg,
                               trainer.mesh, trainer.use_lengths,
                               materialize_train=materialize)
    runner.set_corpus_arrays("train", inputs, lengths, labels, n, batch)

    # warm epoch: compiles + the one-time corpus transfer already happened
    t0 = time.perf_counter()
    params, opt_state, step, _, _ = runner.train_epoch(
        params, opt_state, trainer._root_key, 0, 0)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for e in range(1, epochs + 1):
        params, opt_state, step, loss, m = runner.train_epoch(
            params, opt_state, trainer._root_key, e, step)
    dt = time.perf_counter() - t0
    clips = batch * n_batches * epochs
    ms = dt / (n_batches * epochs) * 1e3
    print(
        f"{model_type:8s} B={batch} T={seq}: device-resident epoch loop "
        f"[{'epoch' if materialize else 'step'}-gather] "
        f"{ms:7.1f} ms/step -> {clips / dt:8.0f} clips/s "
        f"(compile {compile_s:.1f}s; incl. on-device shuffle + exact mAP, "
        f"2 scalars fetched/epoch)"
    )


def bench_ensemble(model_type: str, batch: int, seq: int, epochs: int,
                   n_batches: int, k: int, **overrides) -> None:
    """Vmapped ensemble epoch rate (train/ensemble.py): K members training
    simultaneously over ONE shared device-resident corpus vs a 1-member run
    of the same program.  The per-member cost ratio is the ensemble win —
    the reference's equivalent is K sequential full runs
    (reference: processors/model_trainer.py:44-64)."""
    from audio_tokens_tpu.train.ensemble import EnsembleTrainer

    kwargs = dict(
        model_type=model_type, vocab_size=500, num_classes=543,
        max_seq_len=seq, training_batch_size=batch, dropout=0.0,
        save_best_checkpoint=False,
    )
    kwargs.update(overrides)
    from audio_tokens_tpu.models import model_input_kind

    cfg = AudioTokensConfig(**kwargs)
    rng = np.random.default_rng(0)
    n = batch * n_batches
    kind = model_input_kind(cfg)
    if kind == "tokens":
        inputs = rng.integers(0, cfg.vocab_size, (n, seq)).astype(np.uint16)
    else:
        shape = (n, seq, cfg.n_mels) if kind == "spec" else (n, seq * cfg.n_mels)
        inputs = rng.standard_normal(shape).astype(np.float32)
    lengths = np.full(n, seq, np.int32)
    labels = (rng.random((n, cfg.num_classes)) < 0.05).astype(np.uint8)
    val_n = batch
    times = {}
    for members in (1, k):
        ens = EnsembleTrainer(cfg, n_models=members)
        ens.set_corpus_arrays("train", inputs, lengths, labels, n, batch)
        ens.set_corpus_arrays("validation", inputs[:val_n], lengths[:val_n],
                              labels[:val_n], val_n, batch)
        params, opt_state = ens.init_state()
        # warm epoch compiles the whole-epoch program
        params, opt_state, step, _, _, _ = ens.train_epoch(
            params, opt_state, 0, 0)
        t0 = time.perf_counter()
        for e in range(1, epochs + 1):
            params, opt_state, step, losses, per, em = ens.train_epoch(
                params, opt_state, e, step)
        times[members] = (time.perf_counter() - t0) / epochs
    t1, tk = times[1], times[k]
    print(
        f"{model_type:8s} B={batch} T={seq}: ensemble epoch x{k} members "
        f"{tk * 1e3:8.1f} ms vs x1 {t1 * 1e3:7.1f} ms -> "
        f"{k * t1 / tk:4.1f}x the throughput of sequential runs "
        f"({tk / t1 / k:.2f}x cost per member)"
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--models", default="simple,bert,lstm",
        help="comma list of case names: "
             + ",".join(c[0] for c in DEFAULT_CASES))
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--forward", action="store_true",
                        help="also bench the deterministic forward "
                             "(eval/serving) rate per case")
    parser.add_argument("--real-loop", action="store_true",
                        help="also run the real Trainer epoch loop")
    parser.add_argument("--device-loop", action="store_true",
                        help="also run the device-resident epoch loop")
    parser.add_argument("--epochs", type=int, default=3,
                        help="epochs for --real-loop/--device-loop timing")
    parser.add_argument("--batches", type=int, default=32,
                        help="batches per epoch for --real-loop/--device-loop")
    parser.add_argument("--ensemble", type=int, default=0, metavar="K",
                        help="also bench a K-member vmapped ensemble epoch "
                             "vs a 1-member run (train/ensemble.py)")
    args = parser.parse_args()
    wanted = set(args.models.split(","))
    for name, model_type, batch, seq, overrides in DEFAULT_CASES:
        # match by case name only ('bert' selects the reference 512-window
        # case, not also 'bert_full' — which must be asked for by name)
        if name in wanted:
            bench_case(model_type, batch, seq, args.iters, **overrides)
            if args.forward:
                bench_forward_case(model_type, batch, seq, args.iters,
                                   **overrides)
            if args.real_loop:
                bench_real_loop(model_type, batch, seq, args.epochs,
                                args.batches, **overrides)
            if args.device_loop:
                bench_device_loop(model_type, batch, seq, args.epochs,
                                  args.batches, **overrides)
            if args.ensemble:
                bench_ensemble(model_type, batch, seq, args.epochs,
                               args.batches, args.ensemble, **overrides)


if __name__ == "__main__":
    main()
