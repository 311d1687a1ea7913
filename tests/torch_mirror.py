"""Torch mirror of the reference's LSTM training algorithm, for parity tests.

Rebuilds exactly what the reference trained (reference:
models/simple_lstm_token_classifier.py:10-43 + processors/model_trainer.py:
99-144): Embedding -> bidirectional nn.LSTM -> concat last fwd/bwd hidden ->
ReLU -> dropout -> Linear, BCEWithLogitsLoss, AdamW at torch defaults.
Weights can be transplanted from the JAX model's params so forward passes and
training trajectories are directly comparable (same function, same init).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn


class TorchLSTMClassifier(nn.Module):
    """reference SimpleLSTMTokenClassifier, single layer wiring identical."""

    def __init__(self, vocab_size, embed_dim, hidden_dim, num_layers,
                 num_classes):
        super().__init__()
        self.embedding = nn.Embedding(vocab_size, embed_dim)
        self.lstm = nn.LSTM(
            embed_dim, hidden_dim, num_layers=num_layers, batch_first=True,
            bidirectional=True,
        )
        self.fc = nn.Linear(hidden_dim * 2, num_classes)

    def forward(self, x):
        emb = self.embedding(x)
        # all-ones masks (reference quirk SURVEY §2.7.1): no packing needed,
        # every sequence runs full length
        _, (h_n, _) = self.lstm(emb)
        last = torch.cat([h_n[-2], h_n[-1]], dim=1)  # fwd, bwd of top layer
        return self.fc(torch.relu(last))


class TorchSimpleClassifier(nn.Module):
    """reference SimpleTokenClassifier (models/simple_token_classifier.py:
    5-16): Embedding -> AdaptiveAvgPool1d over the padded sequence -> Linear
    (the attention mask is accepted and ignored, reference quirk §2.7.1)."""

    def __init__(self, vocab_size, hidden_size, num_classes):
        super().__init__()
        self.embedding = nn.Embedding(vocab_size, hidden_size)
        self.classifier = nn.Linear(hidden_size, num_classes)

    def forward(self, x):
        return self.classifier(self.embedding(x).mean(dim=1))


def transplant_simple_from_flax(model: TorchSimpleClassifier,
                                params: dict) -> None:
    """Copy the JAX simple model's params (models/simple.py param tree) into
    the torch mirror so both compute the identical function."""
    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    with torch.no_grad():
        model.embedding.weight.copy_(t(params["embedding"]["embedding"]))
        model.classifier.weight.copy_(t(params["classifier"]["kernel"]).T
                                      .contiguous())
        model.classifier.bias.copy_(t(params["classifier"]["bias"]))


class TorchCNNClassifier(nn.Module):
    """reference CNNClassifier (models/cnn_classifier.py:16-43) with the
    lazy first-batch layer setup replaced by explicit dims."""

    def __init__(self, t, m, num_classes):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 32, kernel_size=3, padding=1)
        self.conv2 = nn.Conv2d(32, 64, kernel_size=3, padding=1)
        self.pool = nn.MaxPool2d(2, 2)
        self.fc1 = nn.Linear(64 * (t // 4) * (m // 4), 256)
        self.fc2 = nn.Linear(256, num_classes)

    def forward(self, x):  # x: (B, T, M)
        x = x.unsqueeze(1)
        x = self.pool(torch.relu(self.conv1(x)))
        x = self.pool(torch.relu(self.conv2(x)))
        x = x.view(x.size(0), -1)
        return self.fc2(torch.relu(self.fc1(x)))


def transplant_cnn_from_flax(model: TorchCNNClassifier, params: dict,
                             t: int, m: int) -> None:
    """Copy the JAX CNN params (models/cnn.py, NHWC) into the torch mirror
    (NCHW).  The flatten order differs (torch is channel-major), so fc1's
    input dimension is permuted accordingly."""
    def tt(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    h, w = t // 4, m // 4
    with torch.no_grad():
        for name in ("conv1", "conv2"):
            # flax (kh, kw, in, out) -> torch (out, in, kh, kw)
            model_layer = getattr(model, name)
            model_layer.weight.copy_(
                tt(params[name]["kernel"]).permute(3, 2, 0, 1).contiguous())
            model_layer.bias.copy_(tt(params[name]["bias"]))
        # flax flatten is (h, w, c)-major; torch is (c, h, w)-major
        k = tt(params["fc1"]["kernel"]).reshape(h, w, 64, 256)
        model.fc1.weight.copy_(
            k.permute(2, 0, 1, 3).reshape(-1, 256).T.contiguous())
        model.fc1.bias.copy_(tt(params["fc1"]["bias"]))
        model.fc2.weight.copy_(tt(params["fc2"]["kernel"]).T.contiguous())
        model.fc2.bias.copy_(tt(params["fc2"]["bias"]))


class TorchMLPClassifier(nn.Module):
    """reference BaselineMLPClassifier (models/baseline_MLP_classifier.py:
    16-28) with the lazy input-size inference replaced by an explicit dim."""

    def __init__(self, input_size, num_classes):
        super().__init__()
        self.fc1 = nn.Linear(input_size, 512)
        self.fc2 = nn.Linear(512, 256)
        self.fc3 = nn.Linear(256, num_classes)

    def forward(self, x):
        return self.fc3(torch.relu(self.fc2(torch.relu(self.fc1(x)))))


def transplant_mlp_from_flax(model: TorchMLPClassifier, params: dict) -> None:
    def tt(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    with torch.no_grad():
        for name in ("fc1", "fc2", "fc3"):
            layer = getattr(model, name)
            layer.weight.copy_(tt(params[name]["kernel"]).T.contiguous())
            layer.bias.copy_(tt(params[name]["bias"]))


def transplant_from_flax(model: TorchLSTMClassifier, params: dict) -> None:
    """Copy the JAX model's params into the torch mirror (same function).

    JAX layout (models/lstm.py): w_ih (E, 4H), w_hh (H, 4H), one bias (4H,);
    torch layout: weight_ih_l0 (4H, E), weight_hh_l0 (4H, H), two biases
    (summed by torch) -> b_ih gets the JAX bias, b_hh zero. Gate order (i,
    f, g, o) matches by construction.
    """
    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    with torch.no_grad():
        model.embedding.weight.copy_(t(params["embedding"]["embedding"]))
        n_layers = model.lstm.num_layers
        for layer in range(n_layers):
            for direction, suffix in ((f"lstm_l{layer}_fwd", ""),
                                      (f"lstm_l{layer}_bwd", "_reverse")):
                p = params[direction]
                getattr(model.lstm, f"weight_ih_l{layer}{suffix}").copy_(
                    t(p["w_ih"]).T.contiguous())
                getattr(model.lstm, f"weight_hh_l{layer}{suffix}").copy_(
                    t(p["w_hh"]).T.contiguous())
                getattr(model.lstm, f"bias_ih_l{layer}{suffix}").copy_(
                    t(p["bias"]))
                getattr(model.lstm, f"bias_hh_l{layer}{suffix}").zero_()
        model.fc.weight.copy_(t(params["fc"]["kernel"]).T.contiguous())
        model.fc.bias.copy_(t(params["fc"]["bias"]))


def train_reference_mirror(
    model: TorchLSTMClassifier,
    batches,
    lr: float,
    epochs: int = 1,
) -> list:
    """The reference's training loop over pre-built (tokens, labels) numpy
    batches; returns the per-step losses.  AdamW at torch defaults matches
    processors/model_trainer.py:143-144."""
    criterion = nn.BCEWithLogitsLoss()
    optimizer = torch.optim.AdamW(model.parameters(), lr=lr)
    losses = []
    model.train()
    for _ in range(epochs):
        for tokens, labels in batches:
            # token families feed int64 ids; cnn/baseline feed float specs
            in_dtype = (np.int64 if np.issubdtype(tokens.dtype, np.integer)
                        else np.float32)
            inputs = torch.from_numpy(tokens.astype(in_dtype))
            target = torch.from_numpy(labels.astype(np.float32))
            optimizer.zero_grad()
            loss = criterion(model(inputs), target)
            loss.backward()
            optimizer.step()
            losses.append(float(loss))
    return losses


class TorchBertClassifier(nn.Module):
    """The reference's exact transformer stack: HF ``BertModel(BertConfig)``
    + linear head on position 0, input truncated to 512 tokens
    (reference: models/custom_bert_classifier.py:8-28).  Dropout probs are
    zeroed so training trajectories are deterministic and comparable."""

    def __init__(self, vocab_size, num_layers, hidden_size, num_classes,
                 max_position=512):
        from transformers import BertConfig, BertModel

        super().__init__()
        # max_position>512 is the external anchor for the repo's full-clip
        # mode (config.transformer_max_position): the same HF stack the
        # reference instantiated, with the position table sized to the clip
        self.bert = BertModel(BertConfig(
            vocab_size=vocab_size, num_hidden_layers=num_layers,
            hidden_size=hidden_size, max_position_embeddings=max_position,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        ))
        self.max_position = max_position
        self.head = nn.Linear(hidden_size, num_classes)

    def forward(self, x, lengths=None):
        # reference truncation (custom_bert_classifier.py:21-22) generalized
        # to the configured window; lengths=None keeps the reference's
        # all-ones masks
        x = x[:, : self.max_position]
        if lengths is None:
            mask = torch.ones_like(x)
        else:
            pos = torch.arange(x.shape[1])[None, :]
            mask = (pos < torch.clamp(lengths, max=x.shape[1])[:, None]).long()
        out = self.bert(input_ids=x, attention_mask=mask)
        return self.head(out.last_hidden_state[:, 0, :])


def transplant_bert_from_flax(model: TorchBertClassifier, params: dict,
                              hidden: int, layers: int) -> None:
    """Copy the flax transformer's weights into the HF stack (segment
    embeddings zeroed — our encoder has none; the HF pooler is unused)."""

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    p = params
    hf = model.bert
    with torch.no_grad():
        emb = hf.embeddings
        emb.word_embeddings.weight.copy_(t(p["tok_embed"]["embedding"]))
        emb.position_embeddings.weight[: p["pos_embed"]["embedding"].shape[0]] \
            .copy_(t(p["pos_embed"]["embedding"]))
        emb.token_type_embeddings.weight.zero_()
        emb.LayerNorm.weight.copy_(t(p["embed_ln"]["scale"]))
        emb.LayerNorm.bias.copy_(t(p["embed_ln"]["bias"]))
        for i in range(layers):
            src = p[f"layer_{i}"]
            dst = hf.encoder.layer[i]
            att = src["attention"]
            for name in ("query", "key", "value"):
                lin = getattr(dst.attention.self, name)
                # flax MHA kernel (H, heads, head_dim) -> HF (H_out, H_in)
                lin.weight.copy_(t(att[name]["kernel"]).reshape(hidden, hidden).T)
                lin.bias.copy_(t(att[name]["bias"]).reshape(hidden))
            dst.attention.output.dense.weight.copy_(
                t(att["out"]["kernel"]).reshape(hidden, hidden).T)
            dst.attention.output.dense.bias.copy_(t(att["out"]["bias"]))
            dst.attention.output.LayerNorm.weight.copy_(t(src["attn_ln"]["scale"]))
            dst.attention.output.LayerNorm.bias.copy_(t(src["attn_ln"]["bias"]))
            dst.intermediate.dense.weight.copy_(t(src["mlp_in"]["kernel"]).T)
            dst.intermediate.dense.bias.copy_(t(src["mlp_in"]["bias"]))
            dst.output.dense.weight.copy_(t(src["mlp_out"]["kernel"]).T)
            dst.output.dense.bias.copy_(t(src["mlp_out"]["bias"]))
            dst.output.LayerNorm.weight.copy_(t(src["mlp_ln"]["scale"]))
            dst.output.LayerNorm.bias.copy_(t(src["mlp_ln"]["bias"]))
        model.head.weight.copy_(t(p["classifier"]["kernel"]).T)
        model.head.bias.copy_(t(p["classifier"]["bias"]))
