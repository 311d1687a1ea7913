"""pjit training loop: multi-label classifier training with DP sharding.

Behavioral equivalent of the reference's ModelTrainer
(reference: processors/model_trainer.py:24-204): BCE-with-logits loss, AdamW
(torch defaults: b1=0.9 b2=0.999 eps=1e-8 wd=0.01), per-epoch train+val loops
accumulating sigmoid predictions for macro mAP, best-val-mAP checkpointing,
optional wandb, stdlib logging.

TPU-native redesign:
  * one compiled ``train_step`` / ``eval_step`` per run (static shapes from
    the fixed-size BatchLoader) instead of eager per-batch dispatch;
  * data parallelism over the ``data`` mesh axis: params replicated, batch
    sharded, gradient psum inserted by GSPMD — the reference was single-GPU;
  * final partial batches are padded and masked via per-row weights so the
    loss/metrics exactly match ragged-batch semantics;
  * optimizer exists from step 0 (the reference lazily created it after the
    first forward because of torch lazy layers — SURVEY.md §2.7.7);
  * checkpoints (orbax) carry optimizer state + step for exact resume, and a
    real early-stopping option replaces the reference's no-op stub (:192-193).
"""

from __future__ import annotations

import json
import logging
import time
from functools import partial
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from audio_tokens_tpu.config import AudioTokensConfig
from audio_tokens_tpu.data.datasets import BatchLoader, DataLoaderCreator
from audio_tokens_tpu.models import get_model
from audio_tokens_tpu.parallel import distributed
from audio_tokens_tpu.parallel.mesh import data_mesh, make_mesh, tp_shardings
from audio_tokens_tpu.train import checkpoint as ckpt
from audio_tokens_tpu.utils.metrics import MetricsCalculator
from audio_tokens_tpu.utils.profiling import WIRE
from audio_tokens_tpu.utils.seeding import key_for, set_seed

logger = logging.getLogger(__name__)


@jax.jit
def _stack_predictions(ps):
    return jnp.stack(ps)


class _AsyncCollector:
    """Single worker thread that fetches stacked prediction windows and folds
    them into the mAP accumulator, overlapping device->host wire time with
    the main thread's step dispatches."""

    def __init__(self, acc):
        import queue as _queue
        import threading

        self.acc = acc
        self._q = _queue.Queue(maxsize=2)
        self._exc = None

        def work():
            while True:
                item = self._q.get()
                if item is None:
                    return
                try:
                    stacked, metas = item
                    arrs = np.asarray(stacked)
                    for (labels, n), parr in zip(metas, arrs):
                        self.acc.update(labels[:n], parr[:n])
                except BaseException as e:  # surfaced at join()
                    self._exc = e

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def submit(self, stacked, metas):
        if self._exc is not None:
            raise self._exc
        self._q.put((stacked, metas))

    def join(self):
        self._q.put(None)
        self._thread.join()
        if self._exc is not None:
            raise self._exc


class _LossMean:
    """Running mean of per-step device loss scalars: accumulate ON DEVICE
    (one tiny async add per step), fetch ONCE at epoch end.  A stack-then-
    mean would build a concatenate with n_steps operands — ~31k at the 2M-
    clip corpus — which XLA cannot reasonably compile."""

    def __init__(self):
        self._sum = None
        self._n = 0

    def add(self, loss) -> None:
        self._sum = loss if self._sum is None else self._sum + loss
        self._n += 1

    def result(self) -> float:
        if self._n == 0:
            return float("nan")
        return float(np.asarray(self._sum)) / self._n


class Trainer:
    def __init__(self, config: AudioTokensConfig):
        self.config = config
        distributed.maybe_initialize(config)
        if (
            config.model_type == "lstm"
            and config.lstm_backend in ("pallas", "pallas_interpret")
            and config.model_parallel > 1
        ):
            # the Pallas sequence kernel can only run under the shard_map DP
            # steps (GSPMD cannot auto-partition pallas_call); failing here
            # beats an opaque Mosaic/SPMD compile error later
            raise ValueError(
                "lstm_backend='pallas' requires a DP-only mesh: set "
                "model_parallel=1 (TP applies to model_type='bert' only) or "
                "use lstm_backend='xla'"
            )
        if config.sequence_parallel > 1:
            if config.model_type != "bert":
                raise ValueError(
                    "sequence_parallel > 1 applies to the transformer only "
                    "(model_type='bert')")
            if config.transformer_max_position % config.sequence_parallel:
                raise ValueError(
                    f"transformer_max_position "
                    f"({config.transformer_max_position}) must be divisible "
                    f"by sequence_parallel ({config.sequence_parallel})")
        set_seed(config.random_seed)
        self.model = get_model(config)
        self.metrics_calculator = MetricsCalculator()
        self.use_lengths = not config.reference_compat
        self.run_name = self._initialize_wandb()
        self.mesh = None  # decided once batch size is known

        self.optimizer = optax.adamw(
            config.learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01
        )
        self._root_key = key_for(config.random_seed, "trainer")

    # ------------------------------------------------------------------
    def run(self) -> Tuple[float, Dict[str, float]]:
        cfg = self.config
        train_loader, val_loader = DataLoaderCreator(cfg).get_dataloaders()
        if len(train_loader.ds) == 0:
            raise RuntimeError("no training data found — run the pipeline stages first")

        params, opt_state = self._init_state(train_loader)
        runner = self._maybe_device_runner(train_loader, val_loader)
        train_step = eval_step = None
        if runner is None:
            train_step, eval_step = self._build_steps()

        # seeded BELOW any real mAP (not the reference's 0.0,
        # model_trainer.py:46) so the first epoch always checkpoints: a
        # degenerate run whose val mAP stays exactly 0.0 would otherwise
        # never save and a later evaluate()/resume would crash on the
        # missing '{run}-best' directory
        best_metric = -1.0
        epochs_since_best = 0
        step = 0
        start_epoch = 0
        if cfg.resume_from:
            fresh_opt_state = opt_state
            params, opt_state, step, best_metric, start_epoch = (
                ckpt.load_checkpoint(
                    cfg.checkpoint_dir, cfg.resume_from, params, opt_state
                )
            )
            params = self._shard_params(params)
            if opt_state is None:
                # checkpoint had no opt_state dir (e.g. params-only export):
                # fall back to the freshly initialized optimizer state rather
                # than failing later with an opaque tree-structure error
                logger.warning(
                    "checkpoint %s has no optimizer state; starting the "
                    "optimizer fresh", cfg.resume_from,
                )
                opt_state = fresh_opt_state
            elif self.mesh is not None:
                # opt_state mirrors the params tree structure; re-derive its
                # placement by re-initializing shardings from the params and
                # copying restored values in (zeros_like inherits placement)
                template = self.optimizer.init(params)
                opt_state = jax.tree_util.tree_map(
                    lambda restored, t: jax.device_put(restored, t.sharding),
                    opt_state, template,
                )
            del fresh_opt_state  # or the unused init moments stay in HBM
            # the epoch counter resumes too: epoch drives the shuffle
            # permutations (seed+epoch) and the remaining-epoch budget, so
            # restarting at 0 would replay consumed permutations and train
            # cfg.epochs EXTRA epochs.  To fine-tune a finished run instead,
            # raise cfg.epochs above the checkpoint's epoch.
            logger.info(
                "resumed from %s at step %d, epoch %d (best mAP %.4f)",
                cfg.resume_from, step, start_epoch, best_metric,
            )
            if start_epoch >= cfg.epochs:
                logger.warning(
                    "checkpoint is already at epoch %d >= epochs=%d — "
                    "nothing to train (raise epochs to continue)",
                    start_epoch, cfg.epochs,
                )
        val_loss, val_metrics = float("nan"), {"mAP": 0.0}

        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            if runner is not None:
                params, opt_state, step, train_loss, train_metrics = (
                    runner.train_epoch(params, opt_state, self._root_key,
                                       epoch, step, cfg.max_train_steps)
                )
                val_loss, val_metrics = runner.eval_epoch(params)
            else:
                params, opt_state, step, train_loss, train_metrics = self._train_epoch(
                    train_step, params, opt_state, train_loader, epoch, step
                )
                val_loss, val_metrics = self._eval_epoch(eval_step, params, val_loader)
            if (cfg.diagnostics_every and epoch % cfg.diagnostics_every == 0
                    and distributed.is_coordinator()):
                self._run_diagnostics(params, train_loader, epoch)
            self._log_epoch_results(
                epoch, train_loss, train_metrics, val_loss, val_metrics,
                time.time() - t0,
            )

            if val_metrics["mAP"] > best_metric:
                logger.info(
                    "val mAP of %.4f > %.4f. Saving model.",
                    val_metrics["mAP"], best_metric,
                )
                best_metric = val_metrics["mAP"]
                epochs_since_best = 0
                if cfg.save_best_checkpoint and distributed.is_coordinator():
                    # params/opt_state are replicated (or TP-sharded within
                    # one host): process 0 owns the checkpoint artifact
                    ckpt.save_checkpoint(
                        cfg.checkpoint_dir, f"{self.run_name}-best",
                        params, opt_state, step, best_metric,
                        epoch=epoch + 1,  # resume continues AFTER this epoch
                    )
            else:
                epochs_since_best += 1

            if (
                cfg.early_stopping_patience
                and epochs_since_best >= cfg.early_stopping_patience
            ):
                logger.info("early stopping at epoch %d", epoch)
                break
            if cfg.max_train_steps and step >= cfg.max_train_steps:
                logger.info("reached max_train_steps=%d", cfg.max_train_steps)
                break

        if not np.isfinite(val_loss) and start_epoch >= cfg.epochs:
            # resumed with an exhausted epoch budget: no training ran —
            # return the restored checkpoint's validation numbers instead
            # of NaN so callers (and the stage contract) get real metrics
            if runner is not None:
                val_loss, val_metrics = runner.eval_epoch(params)
            else:
                val_loss, val_metrics = self._eval_epoch(
                    eval_step, params, val_loader)

        self._final_params = params
        return val_loss, val_metrics

    # ------------------------------------------------------------------
    def evaluate(
        self, checkpoint_name: Optional[str] = None
    ) -> Tuple[float, Dict[str, float]]:
        """Evaluate a saved checkpoint on the validation split (no training)."""
        cfg = self.config
        if checkpoint_name is None:
            if cfg.use_wandb:
                raise ValueError(
                    "with use_wandb=True each run gets a fresh name — pass the "
                    "training run's checkpoint name to evaluate() explicitly"
                )
            checkpoint_name = f"{self.run_name}-best"
        train_loader, val_loader = DataLoaderCreator(cfg).get_dataloaders()
        params, _ = self._init_state(train_loader, with_optimizer=False)
        params = ckpt.load_params(cfg.checkpoint_dir, checkpoint_name, params)
        params = self._shard_params(params)
        runner = self._maybe_device_runner(train_loader, val_loader,
                                           eval_only=True)
        if runner is not None:
            val_loss, val_metrics = runner.eval_epoch(params)
        else:
            _, eval_step = self._build_steps()
            val_loss, val_metrics = self._eval_epoch(eval_step, params,
                                                     val_loader)
        logger.info("Eval: loss %.4f, mAP %.4f", val_loss, val_metrics["mAP"])
        return val_loss, val_metrics

    # ------------------------------------------------------------------
    def _init_state(self, loader: BatchLoader, with_optimizer: bool = True):
        cfg = self.config
        batch = loader.dummy_batch()  # shapes only; no producer thread
        devices = getattr(self, "_mesh_devices", None)
        if cfg.model_parallel > 1 or cfg.sequence_parallel > 1:
            # DP x (SP x) TP mesh; transformer weights shard via TP_RULES
            # below, activations via the model's sp_mesh constraint
            mesh = make_mesh(data=cfg.data_parallel, model=cfg.model_parallel,
                             seq=cfg.sequence_parallel, devices=devices)
        else:
            mesh = data_mesh(cfg, devices=devices)
        if mesh is not None and (
            cfg.training_batch_size % mesh.shape["data"]
            or cfg.eval_batch_size % mesh.shape["data"]
        ):
            if cfg.model_parallel > 1 or cfg.sequence_parallel > 1:
                # the user explicitly asked for TP/SP; silently dropping it
                # would change memory/placement intent — fail loudly instead
                raise ValueError(
                    f"batch sizes ({cfg.training_batch_size} train / "
                    f"{cfg.eval_batch_size} eval) must be divisible by the "
                    f"data axis ({mesh.shape['data']}) when model_parallel="
                    f"{cfg.model_parallel} / sequence_parallel="
                    f"{cfg.sequence_parallel} is requested"
                )
            logger.warning(
                "batch size %d not divisible by %d devices; training single-device",
                cfg.training_batch_size, mesh.shape["data"],
            )
            mesh = None
        self.mesh = mesh
        if (mesh is not None and mesh.shape.get("sequence", 1) > 1
                and getattr(self.model, "sp_mesh", None) is None):
            # activations get the (data, sequence, None) constraint; params
            # stay as _shard_params places them
            self.model = self.model.clone(sp_mesh=mesh)

        local_b = (cfg.training_batch_size // mesh.shape["data"]
                   if mesh is not None else cfg.training_batch_size)
        local_eb = (cfg.eval_batch_size // mesh.shape["data"]
                    if mesh is not None else cfg.eval_batch_size)
        if (
            mesh is not None
            and mesh.shape.get("model", 1) == 1
            and cfg.model_type == "lstm"
            and cfg.lstm_backend == "auto"
            # remat configs run the scan regardless (models/lstm.py routes
            # remat_chunk>0 before the backend branch) — keep the jit/GSPMD
            # path and an accurate log for them
            and cfg.lstm_remat_chunk == 0
            and jax.devices()[0].platform == "tpu"
            # the kernel's hardware-tile alignment, per LOCAL shard
            and local_b % 8 == 0
            and local_eb % 8 == 0
            and cfg.lstm_hidden_dim % 128 == 0
        ):
            # 'auto' resolved to the scan because a bare jit can't partition
            # pallas_call — but under a DP-only mesh the trainer builds
            # shard_map steps, so the fast sequence kernel applies after all
            import dataclasses as _dc

            self.model = get_model(_dc.replace(cfg, lstm_backend="pallas"))
            logger.info("lstm: Pallas sequence kernel under shard_map DP")

        params = self.model.init(
            {"params": key_for(cfg.random_seed, "model_init"),
             "dropout": key_for(cfg.random_seed, "dropout_init")},
            jnp.asarray(batch["inputs"]),
            lengths=jnp.asarray(batch["lengths"]) if self.use_lengths else None,
            deterministic=True,
        )["params"]
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        logger.info("model %s: %.2fM params", self.config.model_type, n_params / 1e6)
        params = self._shard_params(params)
        if not with_optimizer:
            # inference-only callers (evaluate): AdamW moments would be 2x
            # params of dead HBM
            return params, None
        # optimizer state mirrors params (zeros_like inherits shardings)
        opt_state = self.optimizer.init(params)
        return params, opt_state

    def _maybe_device_runner(self, train_loader, val_loader,
                             eval_only: bool = False):
        """Build the device-resident epoch runner (train/device_epoch.py)
        when configured and the corpora fit ``device_corpus_budget_mb`` of
        HBM.  Returns None to use the streaming per-step paths (TP meshes,
        over-budget corpora, or ``device_corpus='off'``).  ``eval_only``
        loads just the validation corpus (the evaluate() entry point)."""
        cfg = self.config
        mode = getattr(cfg, "device_corpus", "auto")
        if mode not in ("auto", "on", "off"):
            raise ValueError(
                f"device_corpus must be 'auto', 'on' or 'off', got '{mode}'")
        if mode == "off":
            return None
        if self.mesh is not None and (
                self.mesh.shape.get("model", 1) > 1
                or self.mesh.shape.get("sequence", 1) > 1):
            if mode == "on":
                raise ValueError(
                    "device_corpus='on' is incompatible with model_parallel "
                    "or sequence_parallel > 1 (the epoch programs assume a "
                    "DP-only mesh); set device_corpus='off' or a DP-only mesh"
                )
            return None
        if getattr(train_loader.ds, "kind", None) is None:
            return None  # non-ClipDataset loader (e.g. bench harnesses)
        from audio_tokens_tpu.train.device_epoch import (
            DeviceEpochRunner, corpus_nbytes,
        )

        wanted = ((val_loader, cfg.eval_batch_size),) if eval_only else (
            (train_loader, cfg.training_batch_size),
            (val_loader, cfg.eval_batch_size),
        )
        feat_itemsize = 2 if cfg.device_corpus_dtype == "bfloat16" else 4

        def estimate(map_bins):
            return sum(
                corpus_nbytes(len(loader.ds), bs, cfg.max_seq_len,
                              cfg.n_mels, loader.ds.kind, cfg.num_classes,
                              cfg.vocab_size, feat_itemsize, map_bins)
                for loader, bs in wanted
            )

        est = estimate(cfg.device_map_bins)
        budget = cfg.device_corpus_budget_mb * 2**20
        if est > budget:
            msg = ("device corpus %s: estimated %.0f MB exceeds "
                   "device_corpus_budget_mb=%d")
            if mode == "on":  # forced: proceed, but say so
                logger.warning(msg + " (forced on)", "over budget",
                               est / 2**20, cfg.device_corpus_budget_mb)
            else:
                # map_bins=1: the corpus bytes alone (metric term ~0) — if
                # THAT fits, the exact metric's prediction buffer is what
                # blew the budget and the histogram metric is the fix
                if cfg.device_map_bins == 0 and estimate(1) <= budget:
                    logger.info(
                        "device corpus disabled by the exact epoch-mAP "
                        "buffer, not the corpus: set device_map_bins "
                        "(e.g. 8192) to train device-resident")
                logger.info(msg + "; streaming batches instead", "disabled",
                            est / 2**20, cfg.device_corpus_budget_mb)
                return None
        # epoch-gather materialization (train split only): one transient
        # permuted copy of the training inputs; see config.device_epoch_gather
        materialize = False
        if not eval_only:
            from audio_tokens_tpu.train.device_epoch import should_materialize

            kind = train_loader.ds.kind
            materialize, copy_bytes = should_materialize(
                cfg, kind, len(train_loader.ds), feat_itemsize, est, budget)
            if materialize and est + copy_bytes > budget:
                logger.warning(
                    "device_epoch_gather='epoch': permuted-corpus copy "
                    "(%.0f MB) pushes the estimate over the budget "
                    "(forced on)", copy_bytes / 2**20)
            elif (not materialize and cfg.device_epoch_gather == "auto"
                  and kind in ("spec", "flat")):
                logger.info(
                    "device epoch: permuted-corpus copy (%.0f MB) over "
                    "budget; keeping per-step gathers", copy_bytes / 2**20)
        runner = DeviceEpochRunner(self.model, self.optimizer, cfg,
                                   self.mesh, self.use_lengths,
                                   materialize_train=materialize)
        if not eval_only:
            runner.set_corpus("train", train_loader.ds,
                              cfg.training_batch_size, cfg.max_seq_len)
        runner.set_corpus("validation", val_loader.ds,
                          cfg.eval_batch_size, cfg.max_seq_len)
        return runner

    def _shard_params(self, params):
        """Place params on the mesh: TP_RULES shardings when a model axis is
        active, replicated otherwise.  Used by init, resume and evaluate so
        all entry points agree."""
        if self.mesh is None:
            return params
        if "model" in self.mesh.axis_names and self.mesh.shape.get("model", 1) > 1:
            if self.config.model_type != "bert":
                raise ValueError(
                    "model_parallel > 1 is only meaningful for the "
                    "transformer (model_type='bert')"
                )
            from audio_tokens_tpu.models.transformer import TP_RULES

            shardings = tp_shardings(self.mesh, params, TP_RULES)
            return jax.tree_util.tree_map(jax.device_put, params, shardings)
        return jax.device_put(params, NamedSharding(self.mesh, P()))

    def _build_steps(self):
        if self._use_shard_map_steps():
            return self._build_steps_shard_map()
        optimizer = self.optimizer
        from audio_tokens_tpu.train.objective import make_loss_fn

        loss_fn = make_loss_fn(self.model, self.use_lengths)

        replicate_preds = (self.mesh is not None
                           and distributed.is_multiprocess())
        mesh = self.mesh

        def finish_preds(logits):
            p = jax.nn.sigmoid(logits)
            if replicate_preds:
                # multi-process: replicate so every host can fetch the full
                # prediction matrix for metric accumulation (tiny: B x C)
                p = jax.lax.with_sharding_constraint(
                    p, NamedSharding(mesh, P()))
            return p

        # params/opt_state are donated: the caller always replaces them with
        # the step's outputs, and without donation every step transiently
        # holds TWO copies of params + AdamW moments (~6x params peak HBM
        # instead of ~3x) — the budget-relevant term for the big families
        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, root_key, inputs, lengths, labels,
                       row_w, step_idx):
            key = jax.random.fold_in(root_key, step_idx)
            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, inputs, lengths, labels, row_w, key, False
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, finish_preds(logits)

        @jax.jit
        def eval_step(params, inputs, lengths, labels, row_w, step_idx):
            del step_idx
            loss, logits = loss_fn(params, inputs, lengths, labels, row_w, None, True)
            return loss, finish_preds(logits)

        return train_step, eval_step

    def _use_shard_map_steps(self) -> bool:
        """Pallas kernels cannot be auto-partitioned by GSPMD; when the model
        runs one (the LSTM sequence kernel) under a DP-only mesh, the train
        and eval steps are built as explicit shard_map programs instead —
        batch sharded over 'data', params replicated, gradients psum'd."""
        return (
            self.mesh is not None
            and self.mesh.shape.get("model", 1) == 1
            and getattr(self.model, "lstm_backend", "xla")
            in ("pallas", "pallas_interpret")
        )

    def _build_steps_shard_map(self):
        optimizer = self.optimizer
        mesh = self.mesh
        from audio_tokens_tpu.train.objective import make_local_loss

        # per-device numerator of the GLOBAL weighted-mean loss (the jit
        # path's (bce*w).sum() / max(w.sum()*C, 1) computed with psum'd
        # totals — identical semantics under sharding)
        local_loss = make_local_loss(self.model, self.use_lengths)

        n_classes = self.config.num_classes

        def local_train(params, opt_state, root_key, inputs, lengths, labels,
                        row_w, step_idx):
            key = jax.random.fold_in(root_key, step_idx)
            (num, logits), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(params, inputs, lengths, labels, row_w, key, False)
            denom = jnp.maximum(
                jax.lax.psum(row_w.sum(), "data") * n_classes, 1.0
            )
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, "data") / denom, grads
            )
            loss = jax.lax.psum(num, "data") / denom
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, jax.nn.sigmoid(logits)

        def local_eval(params, inputs, lengths, labels, row_w, step_idx):
            del step_idx
            num, logits = local_loss(params, inputs, lengths, labels, row_w,
                                     None, True)
            denom = jnp.maximum(
                jax.lax.psum(row_w.sum(), "data") * n_classes, 1.0
            )
            return jax.lax.psum(num, "data") / denom, jax.nn.sigmoid(logits)

        mp = distributed.is_multiprocess()

        def gather_preds(sig):
            # multi-process: all_gather so every host can fetch predictions
            return jax.lax.all_gather(sig, "data", axis=0, tiled=True) \
                if mp else sig

        d = P("data")
        train_step = jax.jit(jax.shard_map(
            lambda *a: (lambda r: (*r[:3], gather_preds(r[3])))(
                local_train(*a)),
            mesh=mesh,
            in_specs=(P(), P(), P(), d, d, d, d, P()),
            out_specs=(P(), P(), P(), P() if mp else d),
            check_vma=False,  # pallas outputs carry no vma info
        ), donate_argnums=(0, 1))  # same ~2x params+moments saving as above
        eval_step = jax.jit(jax.shard_map(
            lambda *a: (lambda r: (r[0], gather_preds(r[1])))(
                local_eval(*a)),
            mesh=mesh,
            in_specs=(P(), d, d, d, d, P()),
            out_specs=(P(), P() if mp else d),
            check_vma=False,
        ))
        logger.info("DP steps built with shard_map (Pallas LSTM backend)")
        return train_step, eval_step

    def _put_batch(self, batch, step: int = 0):
        """ONE device_put of the whole batch tuple (a put per array costs a
        dispatch round-trip each on high-latency hosts).  Wire format is
        minimized — labels as uint8 (multi-hot 0/1, exact) and token inputs
        as uint16 (exact for vocab <= 65535); both are cast back on device in
        the loss.  The global step rides along as a scalar so the dropout key
        derives ON device (a per-step host fold_in costs a dispatch)."""
        row_w = (np.arange(len(batch["lengths"])) < batch["n_valid"]).astype(
            np.float32
        )
        inputs = batch["inputs"]
        if inputs.dtype == np.int32 and self.config.vocab_size <= 0xFFFF:
            inputs = inputs.astype(np.uint16)
        host = (inputs, batch["lengths"],
                np.asarray(batch["labels"], np.uint8), row_w, np.int32(step))
        if self.mesh is not None:
            d = NamedSharding(self.mesh, P("data"))
            r = NamedSharding(self.mesh, P())
            if distributed.is_multiprocess():
                # every process computes the same global batch (seeded
                # loader); each contributes its contiguous row slice
                lo, hi = distributed.local_row_bounds(len(row_w))
                WIRE.h2d(*(v[lo:hi] for v in host[:4]))  # local shard only
                return tuple(
                    jax.make_array_from_process_local_data(
                        sh, v[lo:hi] if sh is d else v,
                        global_shape=v.shape)
                    for v, sh in zip(host, (d, d, d, d, r))
                )
            WIRE.h2d(*host[:4])
            return jax.device_put(host, (d, d, d, d, r))
        WIRE.h2d(*host[:4])
        return jax.device_put(host)

    def _prefetch(self, batch_iter, start_step: int, depth: int = 2):
        """Background-thread device_put pipeline: the next batch's transfer
        overlaps the current step's compute, so the loop runs at
        max(wire, compute) instead of wire + compute.

        Built on utils/worker.BoundedProducer: the producer exits promptly
        on ANY consumer exit — including an early break (max_train_steps) or
        an exception mid-epoch — so no thread is left blocked holding
        device-resident batches."""
        from audio_tokens_tpu.utils.worker import BoundedProducer

        items = ((self._put_batch(b, start_step + i), b)
                 for i, b in enumerate(batch_iter))
        return BoundedProducer(items, depth=depth)

    def _metric_accumulator(self):
        """Exact mAP by default (reference semantics); constant-memory
        histogram mAP when config.streaming_map_bins > 0 (corpus scale)."""
        from audio_tokens_tpu.utils.metrics import ExactMAP, StreamingMAP

        if self.config.streaming_map_bins > 0:
            return StreamingMAP(self.config.num_classes,
                                bins=self.config.streaming_map_bins)
        return ExactMAP()

    # The hot loops below never block on the device: losses stay device
    # scalars until the epoch ends, and per-batch predictions start an async
    # device->host copy immediately and are folded into the mAP accumulator
    # in bounded flushes — the reference fetched loss AND predictions every
    # step (reference: processors/model_trainer.py:93-94,120), which on a
    # dispatch-latency host caps step rate at the round-trip time.
    _PENDING_FLUSH = 8  # small windows overlap fetch wire time with stepping

    @staticmethod
    def _flush_pending(pending, collector):
        if not pending:
            return
        # ONE stacked device array per flush window (N separate np.asarray
        # fetches would cost a dispatch round-trip each); the collector
        # thread blocks on the wire so the step loop doesn't
        stacked = _stack_predictions([p for _, p, _ in pending])
        WIRE.d2h(stacked)  # per-batch sigmoids: the streaming loop's d2h
        metas = [(labels, n) for labels, _, n in pending]
        pending.clear()
        collector.submit(stacked, metas)

    def _train_epoch(self, train_step, params, opt_state, loader, epoch, step):
        losses = _LossMean()
        pending = []
        acc = self._metric_accumulator()
        collector = _AsyncCollector(acc)
        try:
            for put, batch in self._prefetch(loader.batches(epoch), step):
                # budget check BEFORE the update (matching the device-corpus
                # runner): resuming a checkpoint saved exactly at the cap
                # must not train one extra step
                if (self.config.max_train_steps
                        and step >= self.config.max_train_steps):
                    break
                inputs, lengths, lab, row_w, step_idx = put
                params, opt_state, loss, p = train_step(
                    params, opt_state, self._root_key, inputs, lengths, lab,
                    row_w, step_idx,
                )
                losses.add(loss)  # device-resident running sum
                pending.append((batch["labels"], p, batch["n_valid"]))
                if len(pending) >= self._PENDING_FLUSH:
                    self._flush_pending(pending, collector)
                step += 1
                if (self.config.log_every_steps
                        and step % self.config.log_every_steps == 0):
                    # progress only — fetching the loss here would sync the
                    # device every N steps and cap the loop at RPC latency
                    logger.info("epoch %d: step %d", epoch, step)
                if self.config.max_train_steps and step >= self.config.max_train_steps:
                    break
            self._flush_pending(pending, collector)
        finally:
            collector.join()
        return params, opt_state, step, losses.result(), acc.result()

    def _eval_epoch(self, eval_step, params, loader):
        losses = _LossMean()
        pending = []
        acc = self._metric_accumulator()
        collector = _AsyncCollector(acc)
        try:
            for put, batch in self._prefetch(loader.batches(0), 0):
                inputs, lengths, lab, row_w, step_idx = put
                loss, p = eval_step(params, inputs, lengths, lab, row_w,
                                    step_idx)
                losses.add(loss)
                pending.append((batch["labels"], p, batch["n_valid"]))
                if len(pending) >= self._PENDING_FLUSH:
                    self._flush_pending(pending, collector)
            self._flush_pending(pending, collector)
        finally:
            collector.join()
        metrics = acc.result()
        return losses.result(), metrics

    # ------------------------------------------------------------------
    def _run_diagnostics(self, params, loader, epoch: int) -> None:
        """Gradient-flow report on one batch (the reference wired this hook
        but left it disabled — reference: processors/model_trainer.py:56-58)."""
        from audio_tokens_tpu.utils.diagnostics import gradient_flow, make_batch_loss

        if distributed.is_multiprocess():
            # this hook runs on the coordinator only, but params live on
            # the GLOBAL mesh — dispatching the diagnostic grad program
            # from one process over non-addressable devices would desync
            # the hosts' SPMD programs (deadlock).  Fully-replicated params
            # are readable locally: rehost them so the diagnostic compiles
            # on this process's devices alone.
            if not all(getattr(a, "is_fully_replicated", True)
                       for a in jax.tree_util.tree_leaves(params)):
                logger.warning(
                    "diagnostics skipped: params are sharded across "
                    "processes (TP under multi-host) and cannot be "
                    "inspected from the coordinator alone")
                return
            params = jax.device_get(params)
        batch = next(iter(loader.batches(epoch)))
        loss_fn = make_batch_loss(self.model, batch, self.use_lengths)
        plot = Path(self.config.checkpoint_dir) / f"{self.run_name}-gradflow-e{epoch}.png"
        gradient_flow(loss_fn, params, plot_path=plot)

    # ------------------------------------------------------------------
    def _log_epoch_results(
        self, epoch, train_loss, train_metrics, val_loss, val_metrics, seconds
    ):
        logger.info("Epoch %d (%.1fs)", epoch, seconds)
        logger.info("Train Loss: %.4f, Train mAP: %.4f", train_loss, train_metrics["mAP"])
        logger.info("Val Loss: %.4f, Val mAP: %.4f", val_loss, val_metrics["mAP"])
        if not distributed.is_coordinator():
            return  # metrics history/wandb are single-writer artifacts
        # durable metrics history next to the checkpoints (wandb-independent)
        try:
            metrics_path = Path(self.config.checkpoint_dir) / f"{self.run_name}-metrics.jsonl"
            metrics_path.parent.mkdir(parents=True, exist_ok=True)
            with metrics_path.open("a") as f:
                f.write(json.dumps({
                    "epoch": epoch,
                    "train_loss": train_loss,
                    "train_mAP": train_metrics["mAP"],
                    "val_loss": val_loss,
                    "val_mAP": val_metrics["mAP"],
                    "seconds": round(seconds, 2),
                }) + "\n")
        except OSError as e:
            logger.warning("could not append metrics history: %s", e)
        if self._wandb is not None:
            self._wandb.log(
                {
                    "epoch": epoch,
                    "train_loss": train_loss,
                    "train_mAP": train_metrics["mAP"],
                    "val_loss": val_loss,
                    "val_mAP": val_metrics["mAP"],
                }
            )

    def _initialize_wandb(self) -> str:
        self._wandb = None
        if self.config.use_wandb and distributed.is_coordinator():
            try:
                import wandb

                run = wandb.init(
                    project=self.config.wandb_project, config=self.config.to_dict()
                )
                self._wandb = wandb
                return run.name
            except Exception as e:
                logger.warning("wandb unavailable (%s); continuing without", e)
        return "no-wandb"
