"""Training-algorithm parity vs a torch mirror of the reference.

BASELINE.md target row 3 ("AudioSet val mAP parity at matched config") can't
run on real AudioSet in this sandbox; this harness proves the *algorithm* is
the reference's: with transplanted weights the JAX LSTM classifier computes
the same function as the torch reference stack (forward parity), follows the
same AdamW/BCE training trajectory (golden-trajectory parity), and the full
Trainer reaches the same val mAP on a shared fixture corpus.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audio_tokens_tpu.models import get_model
from tests import fixtures
from tests.torch_mirror import (
    TorchLSTMClassifier,
    train_reference_mirror,
    transplant_from_flax,
)

VOCAB, EMBED, HIDDEN, CLASSES = 32, 16, 24, 7


def _jax_model_and_params(num_layers=1, seed=0):
    cfg = fixtures.test_config(
        Path("/tmp"), model_type="lstm", vocab_size=VOCAB,
        lstm_embed_dim=EMBED, lstm_hidden_dim=HIDDEN, num_classes=CLASSES,
        num_layers=num_layers,
    )
    model = get_model(cfg)
    tokens = jnp.zeros((2, 12), jnp.int32)
    params = model.init({"params": jax.random.key(seed)}, tokens,
                        lengths=None, deterministic=True)["params"]
    return model, params


def _batches(rng, n_batches=8, bs=4, t=20):
    out = []
    for _ in range(n_batches):
        toks = rng.integers(0, VOCAB, (bs, t))
        labs = (rng.random((bs, CLASSES)) < 0.3).astype(np.float32)
        out.append((toks, labs))
    return out


def test_forward_logits_match_torch(rng):
    """Transplanted weights -> identical classifier function."""
    model, params = _jax_model_and_params()
    tm = TorchLSTMClassifier(VOCAB, EMBED, HIDDEN, 1, CLASSES)
    transplant_from_flax(tm, jax.device_get(params))

    toks = rng.integers(0, VOCAB, (5, 30))
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(toks, jnp.int32),
                                  lengths=None, deterministic=True))
    import torch

    tm.eval()
    with torch.no_grad():
        theirs = tm(torch.from_numpy(toks.astype(np.int64))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_forward_logits_match_torch_two_layers(rng):
    model, params = _jax_model_and_params(num_layers=2)
    tm = TorchLSTMClassifier(VOCAB, EMBED, HIDDEN, 2, CLASSES)
    transplant_from_flax(tm, jax.device_get(params))
    toks = rng.integers(0, VOCAB, (3, 17))
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(toks, jnp.int32),
                                  lengths=None, deterministic=True))
    import torch

    tm.eval()
    with torch.no_grad():
        theirs = tm(torch.from_numpy(toks.astype(np.int64))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-5, rtol=1e-4)


def test_training_trajectory_matches_torch(rng):
    """Same weights, same batches, same AdamW/BCE -> same loss trajectory
    (the golden-trajectory harness from VERDICT r1 #9)."""
    model, params = _jax_model_and_params()
    tm = TorchLSTMClassifier(VOCAB, EMBED, HIDDEN, 1, CLASSES)
    transplant_from_flax(tm, jax.device_get(params))

    batches = _batches(rng, n_batches=16)
    lr = 3e-3
    torch_losses = train_reference_mirror(tm, batches, lr=lr)

    optimizer = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, toks, labs):
        def loss_fn(p):
            logits = model.apply({"params": p}, toks, lengths=None,
                                 deterministic=True)
            return optax.sigmoid_binary_cross_entropy(logits, labs).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jax_losses = []
    for toks, labs in batches:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(toks, jnp.int32),
            jnp.asarray(labs, jnp.float32),
        )
        jax_losses.append(float(loss))

    torch_losses = np.asarray(torch_losses)
    jax_losses = np.asarray(jax_losses)
    # step 0 is pure forward+loss parity: exact to f32 noise.  Beyond that,
    # Adam's ~sign(g) first steps amplify backend fp differences on near-zero
    # gradient coordinates, so the trajectories track, not match bitwise.
    assert abs(jax_losses[0] - torch_losses[0]) < 2e-6
    np.testing.assert_allclose(jax_losses, torch_losses, atol=2e-2)
    # both optimizers made the same progress
    assert jax_losses[-1] < jax_losses[0]
    assert abs(jax_losses[-1] - torch_losses[-1]) < 2e-2


def _jax_simple_model_and_params(seed=0):
    cfg = fixtures.test_config(
        Path("/tmp"), model_type="simple", vocab_size=VOCAB,
        hidden_size=HIDDEN, num_classes=CLASSES,
    )
    model = get_model(cfg)
    tokens = jnp.zeros((2, 12), jnp.int32)
    params = model.init({"params": jax.random.key(seed)}, tokens,
                        lengths=None, deterministic=True)["params"]
    return model, params


def test_simple_forward_logits_match_torch(rng):
    """The count-GEMM mean-pool reformulation computes the reference simple
    classifier's function exactly (second family with a torch mirror,
    VERDICT r2 #5)."""
    from tests.torch_mirror import (
        TorchSimpleClassifier,
        transplant_simple_from_flax,
    )

    model, params = _jax_simple_model_and_params()
    tm = TorchSimpleClassifier(VOCAB, HIDDEN, CLASSES)
    transplant_simple_from_flax(tm, jax.device_get(params))

    toks = rng.integers(0, VOCAB, (5, 30))
    ours = np.asarray(model.apply({"params": params},
                                  jnp.asarray(toks, jnp.int32),
                                  lengths=None, deterministic=True))
    import torch

    tm.eval()
    with torch.no_grad():
        theirs = tm(torch.from_numpy(toks.astype(np.int64))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_simple_training_trajectory_matches_torch(rng):
    """Golden-trajectory parity for the simple family: same weights, same
    batches, same AdamW/BCE -> same loss trajectory."""
    from tests.torch_mirror import (
        TorchSimpleClassifier,
        transplant_simple_from_flax,
    )

    model, params = _jax_simple_model_and_params()
    tm = TorchSimpleClassifier(VOCAB, HIDDEN, CLASSES)
    transplant_simple_from_flax(tm, jax.device_get(params))

    batches = _batches(rng, n_batches=16)
    lr = 3e-3
    torch_losses = train_reference_mirror(tm, batches, lr=lr)

    optimizer = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, toks, labs):
        def loss_fn(p):
            logits = model.apply({"params": p}, toks, lengths=None,
                                 deterministic=True)
            return optax.sigmoid_binary_cross_entropy(logits, labs).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jax_losses = []
    for toks, labs in batches:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(toks, jnp.int32),
            jnp.asarray(labs, jnp.float32),
        )
        jax_losses.append(float(loss))

    torch_losses = np.asarray(torch_losses)
    jax_losses = np.asarray(jax_losses)
    assert abs(jax_losses[0] - torch_losses[0]) < 2e-6
    np.testing.assert_allclose(jax_losses, torch_losses, atol=2e-2)
    assert jax_losses[-1] < jax_losses[0]
    assert abs(jax_losses[-1] - torch_losses[-1]) < 2e-2


def test_cnn_forward_logits_match_torch(rng):
    """Fourth family mirror: the NHWC conv/pool stack computes the reference
    CNN's function (NCHW) exactly under weight transplant (flatten-order
    permutation included)."""
    import torch

    from audio_tokens_tpu.models.cnn import CNNClassifier
    from tests.torch_mirror import TorchCNNClassifier, transplant_cnn_from_flax

    t, m, classes = 24, 16, 7
    model = CNNClassifier(num_classes=classes)
    x = rng.standard_normal((3, t, m)).astype(np.float32)
    params = model.init({"params": jax.random.key(0)}, jnp.asarray(x),
                        lengths=None, deterministic=True)["params"]
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                  lengths=None, deterministic=True))
    tm = TorchCNNClassifier(t, m, classes)
    transplant_cnn_from_flax(tm, jax.device_get(params), t, m)
    tm.eval()
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_mlp_forward_logits_match_torch(rng):
    """Fifth family mirror: the baseline MLP matches the reference's
    lazy-init MLP function under weight transplant — all five model
    families now have reference-stack forward-parity mirrors."""
    import torch

    from audio_tokens_tpu.models.mlp import BaselineMLPClassifier
    from tests.torch_mirror import TorchMLPClassifier, transplant_mlp_from_flax

    d, classes = 96, 7
    model = BaselineMLPClassifier(num_classes=classes)
    x = rng.standard_normal((4, d)).astype(np.float32)
    params = model.init({"params": jax.random.key(0)}, jnp.asarray(x),
                        lengths=None, deterministic=True)["params"]
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                  lengths=None, deterministic=True))
    tm = TorchMLPClassifier(d, classes)
    transplant_mlp_from_flax(tm, jax.device_get(params))
    tm.eval()
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def _spec_trajectory_harness(model, params, tm, batches, lr=3e-3):
    """Shared AdamW/BCE golden-trajectory check for the float-input families
    (cnn, baseline): same transplanted weights, same batches -> same loss
    trajectory as the torch reference stack (reference training loop:
    processors/model_trainer.py:99-144)."""
    from tests.torch_mirror import train_reference_mirror

    torch_losses = train_reference_mirror(tm, batches, lr=lr)

    optimizer = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, x, labs):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, lengths=None,
                                 deterministic=True)
            return optax.sigmoid_binary_cross_entropy(logits, labs).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jax_losses = []
    for x, labs in batches:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x, jnp.float32),
            jnp.asarray(labs, jnp.float32),
        )
        jax_losses.append(float(loss))

    torch_losses = np.asarray(torch_losses)
    jax_losses = np.asarray(jax_losses)
    assert abs(jax_losses[0] - torch_losses[0]) < 2e-6
    np.testing.assert_allclose(jax_losses, torch_losses, atol=2e-2)
    assert abs(jax_losses[-1] - torch_losses[-1]) < 2e-2


def test_cnn_training_trajectory_matches_torch(rng):
    """Golden-trajectory parity for the cnn family — with this and the mlp
    harness below, all FIVE model families have AdamW/BCE trajectory parity
    against the reference stack (completes VERDICT r3 weak #5).  Max-pool
    tie-breaking could diverge between backends, but ties have measure zero
    on continuous random inputs."""
    from audio_tokens_tpu.models.cnn import CNNClassifier
    from tests.torch_mirror import TorchCNNClassifier, transplant_cnn_from_flax

    t, m, classes = 24, 16, 7
    model = CNNClassifier(num_classes=classes)
    x0 = jnp.zeros((2, t, m), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x0,
                        lengths=None, deterministic=True)["params"]
    tm = TorchCNNClassifier(t, m, classes)
    transplant_cnn_from_flax(tm, jax.device_get(params), t, m)

    batches = []
    for _ in range(12):
        batches.append((rng.standard_normal((4, t, m)).astype(np.float32),
                        (rng.random((4, classes)) < 0.3).astype(np.float32)))
    _spec_trajectory_harness(model, params, tm, batches)


def test_mlp_training_trajectory_matches_torch(rng):
    """Golden-trajectory parity for the baseline MLP family (fifth of five)."""
    from audio_tokens_tpu.models.mlp import BaselineMLPClassifier
    from tests.torch_mirror import TorchMLPClassifier, transplant_mlp_from_flax

    d, classes = 96, 7
    model = BaselineMLPClassifier(num_classes=classes)
    x0 = jnp.zeros((2, d), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x0,
                        lengths=None, deterministic=True)["params"]
    tm = TorchMLPClassifier(d, classes)
    transplant_mlp_from_flax(tm, jax.device_get(params))

    batches = []
    for _ in range(16):
        batches.append((rng.standard_normal((4, d)).astype(np.float32),
                        (rng.random((4, classes)) < 0.3).astype(np.float32)))
    _spec_trajectory_harness(model, params, tm, batches)


@pytest.mark.slow
def test_bert_forward_logits_match_hf(rng):
    """Third family with a reference-stack mirror: transplanted weights make
    our in-repo transformer compute the same function as the actual HF
    ``BertModel(BertConfig(vocab_size, num_hidden_layers, hidden_size))`` +
    linear head the reference instantiated
    (reference: models/custom_bert_classifier.py:8-28).  Requires HF
    defaults our encoder mirrors exactly: 12 heads at hidden 768, 4x MLP,
    exact-erf GELU, layer_norm_eps 1e-12, post-LN."""
    import torch

    from audio_tokens_tpu.models.transformer import TransformerClassifier

    vocab, layers, classes, hidden = 64, 2, 7, 768
    model = TransformerClassifier(
        vocab_size=vocab, num_layers=layers, num_classes=classes,
        hidden_size=hidden, dropout=0.0,
    )
    toks = rng.integers(0, vocab, (2, 16))
    params = model.init({"params": jax.random.key(0)},
                        jnp.asarray(toks, jnp.int32), lengths=None,
                        deterministic=True)["params"]
    ours = np.asarray(model.apply({"params": params},
                                  jnp.asarray(toks, jnp.int32),
                                  lengths=None, deterministic=True))

    from tests.torch_mirror import (
        TorchBertClassifier,
        transplant_bert_from_flax,
    )

    tm = TorchBertClassifier(vocab, layers, hidden, classes)
    transplant_bert_from_flax(tm, jax.device_get(params), hidden, layers)
    tm.eval()
    with torch.no_grad():
        theirs = tm(torch.from_numpy(toks.astype(np.int64))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_bert_full_clip_forward_logits_match_hf(rng):
    """External anchor for the FULL-CLIP mode (VERDICT r4 #4): an actual HF
    ``BertModel(BertConfig(max_position_embeddings=1728))`` with transplanted
    weights computes the same logits as our transformer at T=1728 under
    TRUE-LENGTH masks — the position-embedding extension and full-length
    masking are no longer validated only against this repo's own code.
    Full-clip attention is the repo's declared improvement over the
    reference's 512-token truncation (custom_bert_classifier.py:21-22)."""
    import torch

    from audio_tokens_tpu.models.transformer import TransformerClassifier
    from tests.torch_mirror import (
        TorchBertClassifier,
        transplant_bert_from_flax,
    )

    vocab, layers, classes, hidden, t = 64, 2, 7, 768, 1728
    model = TransformerClassifier(
        vocab_size=vocab, num_layers=layers, num_classes=classes,
        hidden_size=hidden, dropout=0.0, max_position=t,
    )
    toks = rng.integers(0, vocab, (3, t))
    # one full-length row, one mid, one short: masking must hold everywhere
    lengths = np.array([t, 911, 37], np.int32)
    params = model.init({"params": jax.random.key(0)},
                        jnp.asarray(toks, jnp.int32), lengths=None,
                        deterministic=True)["params"]
    assert params["pos_embed"]["embedding"].shape[0] == t
    ours = np.asarray(model.apply({"params": params},
                                  jnp.asarray(toks, jnp.int32),
                                  lengths=jnp.asarray(lengths),
                                  deterministic=True))

    tm = TorchBertClassifier(vocab, layers, hidden, classes, max_position=t)
    transplant_bert_from_flax(tm, jax.device_get(params), hidden, layers)
    tm.eval()
    with torch.no_grad():
        theirs = tm(torch.from_numpy(toks.astype(np.int64)),
                    lengths=torch.from_numpy(lengths.astype(np.int64))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)

    # and the masks are load-bearing: all-ones masks give different logits
    # for the short rows (so the comparison above actually exercised them)
    ours_unmasked = np.asarray(model.apply({"params": params},
                                           jnp.asarray(toks, jnp.int32),
                                           lengths=None, deterministic=True))
    assert np.abs(ours_unmasked[1:] - ours[1:]).max() > 1e-3


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bert_full_clip_training_trajectory_matches_torch(seed):
    """3-seed trajectory parity AT the full-clip window (VERDICT r4 #4):
    same transplanted weights, same T=1728 batches, same AdamW/BCE as the
    HF stack with max_position_embeddings=1728.  Reference-compat all-ones
    masks (the mirror trains the way the reference did); the known
    token_type-row-0 parameterization difference applies as in the
    512-window harness above."""
    import torch

    from audio_tokens_tpu.models.transformer import TransformerClassifier
    from tests.torch_mirror import (
        TorchBertClassifier,
        train_reference_mirror,
        transplant_bert_from_flax,
    )

    vocab, layers, classes, hidden, t = 64, 2, 7, 768, 1728
    model = TransformerClassifier(
        vocab_size=vocab, num_layers=layers, num_classes=classes,
        hidden_size=hidden, dropout=0.0, max_position=t,
    )
    rng = np.random.default_rng(seed)
    toks0 = jnp.zeros((1, t), jnp.int32)
    params = model.init({"params": jax.random.key(seed)}, toks0,
                        lengths=None, deterministic=True)["params"]
    torch.manual_seed(seed)
    tm = TorchBertClassifier(vocab, layers, hidden, classes, max_position=t)
    transplant_bert_from_flax(tm, jax.device_get(params), hidden, layers)

    batches = []
    for _ in range(5):
        batches.append((rng.integers(0, vocab, (2, t)),
                        (rng.random((2, classes)) < 0.3).astype(np.float32)))
    lr = 1e-4  # reference default; see the 512-window harness note
    torch_losses = train_reference_mirror(tm, batches, lr=lr)

    optimizer = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, toks, labs):
        def loss_fn(p):
            logits = model.apply({"params": p}, toks, lengths=None,
                                 deterministic=True)
            return optax.sigmoid_binary_cross_entropy(logits, labs).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jax_losses = []
    for toks, labs in batches:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(toks, jnp.int32),
            jnp.asarray(labs, jnp.float32),
        )
        jax_losses.append(float(loss))

    torch_losses = np.asarray(torch_losses)
    jax_losses = np.asarray(jax_losses)
    assert abs(jax_losses[0] - torch_losses[0]) < 5e-6
    np.testing.assert_allclose(jax_losses, torch_losses, atol=2e-2)


@pytest.mark.slow
def test_trainer_val_map_parity_on_fixture_corpus(tmp_path):
    """The full Trainer vs the reference-mirror loop end-to-end: matched
    config on a shared tokenized fixture corpus.  Multi-seed (3 independent
    init/order draws per framework) so the comparison is between the
    frameworks' MEAN val mAPs — tolerance 0.05, a fifth of the round-2
    single-seed tolerance (VERDICT r2 #5)."""
    import torch

    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
    from audio_tokens_tpu.data.splitter import DatasetSplitter
    from audio_tokens_tpu.processors import (
        ClusterCreator, ModelTrainer, SpecTokenizer, SpectrogramGenerator,
    )
    from audio_tokens_tpu.utils.metrics import macro_mean_average_precision

    fixtures.make_workspace(tmp_path)
    cfg = fixtures.test_config(
        tmp_path, model_type="lstm", epochs=4, learning_rate=3e-3,
        training_batch_size=4, save_best_checkpoint=False,
    )
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    SpectrogramGenerator(cfg).run()
    ClusterCreator(cfg).run()
    SpecTokenizer(cfg).run()

    seeds = (4242, 7, 123)
    jax_maps = []
    for s in seeds:
        cfg_s = fixtures.test_config(
            tmp_path, model_type="lstm", epochs=4, learning_rate=3e-3,
            training_batch_size=4, save_best_checkpoint=False, random_seed=s,
        )
        _, jax_metrics = ModelTrainer(cfg_s).run()
        jax_maps.append(jax_metrics["mAP"])

    # reference mirror on the same artifacts: same arch dims, same epochs
    meta = AudiosetMetadataProcessor(cfg)
    split = json.loads(Path(cfg.split_file).read_text())

    def load_split(name):
        toks, labs = [], []
        for ytid in split[name]:
            f = Path(cfg.dest_tokenized_path) / name / f"{ytid}.npy"
            if f.exists():
                seq = np.load(f)[: cfg.max_seq_len]
                pad = np.zeros(cfg.max_seq_len, np.int64)
                pad[: len(seq)] = seq
                toks.append(pad)
                labs.append(meta.multi_hot(ytid, cfg.num_classes))
        return np.stack(toks), np.stack(labs)

    tr_x, tr_y = load_split("train")
    va_x, va_y = load_split("validation")
    torch_maps = []
    for s in seeds:
        torch.manual_seed(s)
        tm = TorchLSTMClassifier(cfg.vocab_size, cfg.lstm_embed_dim,
                                 cfg.lstm_hidden_dim, cfg.num_layers,
                                 cfg.num_classes)
        order = np.random.default_rng(s)
        bs = cfg.training_batch_size
        batches = []
        for _ in range(cfg.epochs):
            idx = order.permutation(len(tr_x))
            for i in range(0, len(idx), bs):
                sel = idx[i : i + bs]
                batches.append((tr_x[sel], tr_y[sel]))
        train_reference_mirror(tm, batches, lr=cfg.learning_rate)
        tm.eval()
        with torch.no_grad():
            scores = torch.sigmoid(tm(torch.from_numpy(va_x))).numpy()
        torch_maps.append(macro_mean_average_precision(va_y, scores))

    jax_mean = float(np.mean(jax_maps))
    torch_mean = float(np.mean(torch_maps))
    assert abs(jax_mean - torch_mean) < 0.05, (
        f"jax mAPs {jax_maps} (mean {jax_mean:.3f}) vs torch mirror "
        f"{torch_maps} (mean {torch_mean:.3f})"
    )


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bert_training_trajectory_matches_torch(seed):
    """Golden-trajectory parity for the transformer family (VERDICT r3 #5):
    same transplanted weights, same batches, same AdamW/BCE -> same loss
    trajectory as the actual HF BertModel stack the reference trained.  The
    most numerically delicate family (LayerNorm/softmax/GELU interacting
    with AdamW); 3 seeds.  Known parameterization difference, documented:
    the HF stack also trains token_type row 0 (we have no segment
    embeddings), an extra additive degree of freedom — trajectories track
    within the lstm harness's tolerance, step 0 matches to f32 noise."""
    import torch

    from audio_tokens_tpu.models.transformer import TransformerClassifier
    from tests.torch_mirror import (
        TorchBertClassifier,
        train_reference_mirror,
        transplant_bert_from_flax,
    )

    vocab, layers, classes, hidden = 64, 2, 7, 768
    model = TransformerClassifier(
        vocab_size=vocab, num_layers=layers, num_classes=classes,
        hidden_size=hidden, dropout=0.0,
    )
    rng = np.random.default_rng(seed)
    toks0 = jnp.zeros((2, 16), jnp.int32)
    params = model.init({"params": jax.random.key(seed)}, toks0,
                        lengths=None, deterministic=True)["params"]
    torch.manual_seed(seed)
    tm = TorchBertClassifier(vocab, layers, hidden, classes)
    transplant_bert_from_flax(tm, jax.device_get(params), hidden, layers)

    batches = []
    for _ in range(8):
        batches.append((rng.integers(0, vocab, (4, 16)),
                        (rng.random((4, classes)) < 0.3).astype(np.float32)))
    lr = 1e-4  # the reference's default (audio_tokens_config.py:72); larger
    # rates make the 768-hidden stack's early steps chaotic and useless for
    # trajectory comparison
    torch_losses = train_reference_mirror(tm, batches, lr=lr)

    optimizer = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, toks, labs):
        def loss_fn(p):
            logits = model.apply({"params": p}, toks, lengths=None,
                                 deterministic=True)
            return optax.sigmoid_binary_cross_entropy(logits, labs).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jax_losses = []
    for toks, labs in batches:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(toks, jnp.int32),
            jnp.asarray(labs, jnp.float32),
        )
        jax_losses.append(float(loss))

    torch_losses = np.asarray(torch_losses)
    jax_losses = np.asarray(jax_losses)
    assert abs(jax_losses[0] - torch_losses[0]) < 5e-6
    np.testing.assert_allclose(jax_losses, torch_losses, atol=2e-2)
    # (no loss-decrease assertion: 8 steps at the reference lr on random
    # labels measure parity, not optimization progress)
    assert abs(jax_losses[-1] - torch_losses[-1]) < 2e-2
