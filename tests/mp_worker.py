"""Two-process CPU worker for the multi-host tests.

Usage: python tests/mp_worker.py <port> <pid> <nproc> <outdir>

Each process initializes ``jax.distributed`` against a shared local
coordinator with 2 virtual CPU devices (so the global mesh spans
2 processes x 2 devices), then:

  1. runs two epochs of REAL ``Trainer._train_epoch`` DP training (global
     batches assembled from per-process row slices, gradient psum across
     the process boundary, predictions replicated for metrics);
  2. runs the streaming K-means with each process feeding its strided shard
     of a shared corpus (per-process super-batch packing, cross-process
     psum of Lloyd statistics, lock-step feed schedule);

and writes ``result_<pid>.npz`` for the parent test to compare against the
single-process reference.
"""

import os
import sys


def main() -> None:
    port, pid, nproc, outdir = sys.argv[1:5]
    pid, nproc = int(pid), int(nproc)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    # Initialize through the PRODUCTION path (parallel/distributed.py reading
    # the AUDIO_TOKENS_* env vars) — not by calling jax.distributed directly —
    # so the test exercises exactly what a real multi-host stage launch does.
    os.environ["AUDIO_TOKENS_COORDINATOR"] = f"localhost:{port}"
    os.environ["AUDIO_TOKENS_NUM_PROCESSES"] = str(nproc)
    os.environ["AUDIO_TOKENS_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from audio_tokens_tpu.parallel import distributed

    assert distributed.maybe_initialize(None)
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc
    # launcher-already-initialized tolerance: a second init attempt (fresh
    # module state, runtime already up) must succeed, not crash
    distributed._initialized = False
    assert distributed.maybe_initialize(None)

    import numpy as np
    from jax.sharding import Mesh

    from audio_tokens_tpu.config import AudioTokensConfig
    from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming
    from audio_tokens_tpu.tools.bench_training import _MemLoader
    from audio_tokens_tpu.train.trainer import Trainer

    # ---- part A: real-Trainer DP training over the process boundary ----
    cfg = AudioTokensConfig(
        model_type="simple", vocab_size=32, hidden_size=16, num_classes=7,
        max_seq_len=24, training_batch_size=8, dropout=0.0,
        save_best_checkpoint=False, base_dir=outdir,
    )
    rng = np.random.default_rng(0)  # identical batches on every process
    batches = []
    for _ in range(6):
        batches.append({
            "inputs": rng.integers(0, cfg.vocab_size, (8, 24)).astype(np.int32),
            "lengths": np.full((8,), 24, np.int32),
            "labels": (rng.random((8, cfg.num_classes)) < 0.3).astype(np.float32),
            "n_valid": 8,
        })
    loader = _MemLoader(batches)
    trainer = Trainer(cfg)
    params, opt_state = trainer._init_state(loader)
    assert trainer.mesh is not None and trainer.mesh.shape["data"] == 2 * nproc
    train_step, eval_step = trainer._build_steps()
    step = 0
    train_losses = []
    for epoch in range(2):
        params, opt_state, step, loss, metrics = trainer._train_epoch(
            train_step, params, opt_state, loader, epoch, step
        )
        train_losses.append(loss)
    eval_loss, eval_metrics = trainer._eval_epoch(eval_step, params, loader)

    # ---- part B: streaming K-means, per-process shards, psum'd stats ----
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 5
    idx = rng.integers(0, 8, 4096)
    x = (centers[idx] + 0.1 * rng.standard_normal((4096, 16))).astype(np.float32)
    init = x[rng.choice(4096, 8, replace=False)].copy()
    local = x[pid::nproc]
    feeds = [local[i : i + 300] for i in range(0, len(local), 300)]
    mesh = Mesh(np.array(jax.devices()), ("data",))
    # through the DISK-SPILL tier: a 0 MB RAM budget forces every super-batch
    # to the per-process spill file on iteration 0, and iterations 2..niter
    # replay it — the lock-step cross-process feed schedule must hold off
    # disk exactly as it does off the live stream (each process spills only
    # its own shard)
    stream_calls = {"n": 0}

    def batches():
        stream_calls["n"] += 1
        return iter(feeds)

    spill = os.path.join(outdir, f"kmeans_spill_{pid}.bin")
    centroids, obj, n_total = kmeans_fit_streaming(
        batches, 8, niter=3, d=16, init_centroids=init,
        mesh=mesh, superbatch_rows=1024, chunk=128,
        cache_mb=0, cache_spill_path=spill, cache_spill_mb=64,
    )
    assert not os.path.exists(spill), "spill scratch must be deleted"

    # ---- part C: SpecTokenizer stage with per-process ytid sharding ----
    # proc 0 synthesizes a shared workspace (spectrograms + centroids);
    # every process runs the SAME stage command; the artifacts must jointly
    # cover all clips with per-shard ownership and bitwise-stable tokens.
    from pathlib import Path

    from audio_tokens_tpu.parallel import distributed
    from audio_tokens_tpu.processors.spec_tokenizer import SpecTokenizer

    ws = Path(outdir) / "tok_ws"
    n_clips, n_mels = 9, 16
    srng = np.random.default_rng(11)
    cents = srng.standard_normal((8, n_mels)).astype(np.float32)
    specs = {f"clip{i:03d}": srng.standard_normal(
        (n_mels, 20 + 3 * i)).astype(np.float32) for i in range(n_clips)}
    if distributed.is_coordinator():
        for split in ("train", "validation"):
            d = ws / "spectrograms" / split
            d.mkdir(parents=True, exist_ok=True)
        for name, s in specs.items():
            np.save(ws / "spectrograms" / "train" / f"{name}.npy", s)
        np.save(ws / "spectrograms" / "validation" / "vclip.npy",
                srng.standard_normal((n_mels, 25)).astype(np.float32))
        (ws / "output").mkdir(exist_ok=True)
        np.save(ws / "output" / "centroids.npy", cents)
    distributed.barrier("mp-tok-workspace")
    tok_cfg = AudioTokensConfig(
        base_dir=str(ws), n_mels=n_mels, vocab_size=8, incremental=False,
        device_batch_size=4, use_convolution=False,
    )
    SpecTokenizer(tok_cfg).run()
    # run() barriers after each split, so every shard's artifacts exist now
    files = sorted((ws / "tokenized_audio" / "train").glob("*.npy"))
    assert len(files) == n_clips, [f.name for f in files]
    token_cat = np.concatenate([np.load(f) for f in files])

    # ---- part D: SpectrogramGenerator stage, ytids sharded per process ----
    # proc 0 builds a wav fixture workspace + split file; both processes run
    # the same stage command; the joint artifact set must cover every clip.
    from tests import fixtures

    sws = Path(outdir) / "spec_ws"
    if distributed.is_coordinator():
        fixtures.make_workspace(sws, n_clips=8)
    distributed.barrier("mp-spec-workspace")
    spec_cfg = fixtures.test_config(sws, dataset_ratio=1.0)
    if distributed.is_coordinator():
        from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
        from audio_tokens_tpu.data.splitter import DatasetSplitter

        DatasetSplitter(spec_cfg).create_split_file(
            AudiosetMetadataProcessor(spec_cfg))
    distributed.barrier("mp-spec-split")
    from audio_tokens_tpu.processors.spectrogram_generator import (
        SpectrogramGenerator,
    )

    SpectrogramGenerator(spec_cfg).run()
    spec_files = sorted((sws / "spectrograms" / "train").glob("*.npy"))
    spec_cat = np.concatenate(
        [np.load(f).ravel() for f in spec_files]) if spec_files else np.zeros(0)

    # ---- part E: the FULL remaining pipeline on part D's workspace ----
    # clustering (streaming Lloyd psum across processes), tokenization
    # (sharded ytids), and Trainer.run() (cross-process DP) — the capstone
    # "run_pipeline on a pod slice" proof.
    full_cfg = fixtures.test_config(
        sws, dataset_ratio=1.0, kmeans_mode="full", epochs=2,
        training_batch_size=4, save_best_checkpoint=False, model_type="simple",
    )
    from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
    from audio_tokens_tpu.processors.model_trainer import ModelTrainer
    from audio_tokens_tpu.processors.spec_tokenizer import SpecTokenizer as ST

    pipeline_centroids = ClusterCreator(full_cfg).run()
    ST(full_cfg).run()
    distributed.barrier("mp-pipeline-tokenized")
    tok_files = sorted((sws / "tokenized_audio" / "train").glob("*.npy"))
    pipeline_tokens = np.concatenate([np.load(f) for f in tok_files])
    val_loss, val_metrics = ModelTrainer(full_cfg).run()

    np.savez(
        os.path.join(outdir, f"result_{pid}.npz"),
        pipeline_centroids=np.asarray(pipeline_centroids, np.float32),
        pipeline_tokens=pipeline_tokens,
        pipeline_val_loss=np.float64(val_loss),
        pipeline_val_map=np.float64(val_metrics["mAP"]),
        spec_names=np.array([f.name for f in spec_files]),
        spec_cat=spec_cat.astype(np.float32),
        train_losses=np.asarray(train_losses, np.float64),
        eval_loss=np.float64(eval_loss),
        eval_map=np.float64(eval_metrics["mAP"]),
        centroids=centroids,
        obj=np.float64(obj),
        n_total=np.int64(n_total),
        token_cat=token_cat,
    )
    print(f"[proc {pid}] OK: losses={train_losses} eval_mAP={eval_metrics['mAP']:.4f} "
          f"kmeans_obj={obj:.4f} n={n_total} tokens={token_cat.shape}", flush=True)


if __name__ == "__main__":
    main()
