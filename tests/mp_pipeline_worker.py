"""Composed-pipeline worker: the FULL 4-stage pipeline in one process of an
N-process group (VERDICT r4 #1).

Usage: python tests/mp_pipeline_worker.py <port> <pid> <nproc> <ndev> <ws> <outdir>

Runs ``run_pipeline.main`` — fused mode (clustering's all-device feed, the
resident-frames handoff into the tokenizer) + device-resident DP training —
against the workspace at ``ws``.  With nproc=1 this is the single-process
reference; with nproc=2 the same code composes across two real processes
(jax.distributed over a local coordinator), which is what exercises the
barriers, per-process feed shards, ledger psums, and handoff interplay that
per-stage bit-equality tests (tests/mp_worker.py) cannot.  The global device
count (nproc x ndev) must match between the runs being compared so the DP
mesh — and therefore batch assembly — is identical.

Writes ``result_<pid>.npz`` (val_loss, val_map) for the parent to compare.
"""

import os
import sys


def main() -> None:
    port, pid, nproc, ndev, ws, outdir = sys.argv[1:7]
    pid, nproc, ndev = int(pid), int(nproc), int(ndev)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev}")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if nproc > 1:
        # production multi-host handshake (parallel/distributed.py)
        os.environ["AUDIO_TOKENS_COORDINATOR"] = f"localhost:{port}"
        os.environ["AUDIO_TOKENS_NUM_PROCESSES"] = str(nproc)
        os.environ["AUDIO_TOKENS_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import logging

    logging.basicConfig(level=logging.INFO)

    import numpy as np

    import run_pipeline
    from tests import fixtures

    cfg = fixtures.test_config(
        ws,
        fused_pipeline=True,
        kmeans_mode="full",  # the only multi-host-capable schedule
        # the all-device HBM feed is single-process by design
        # (cluster_creator._use_fused_device_feed); the streaming psum'd
        # Lloyd loop is the multi-host clustering path — force it for BOTH
        # runs so they fit through the same algorithm
        kmeans_streaming="always",
        model_type="simple",
        epochs=2,
        dropout=0.0,
        device_corpus="on",
        save_best_checkpoint=False,
    )
    val_loss, val_metrics = run_pipeline.main(cfg)
    assert jax.process_count() == nproc
    np.savez(
        os.path.join(outdir, f"result_{pid}.npz"),
        val_loss=np.float64(val_loss),
        val_map=np.float64(val_metrics["mAP"]),
    )


if __name__ == "__main__":
    main()
