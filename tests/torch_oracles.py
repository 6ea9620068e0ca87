"""PyTorch oracles used to validate numerical parity.

These build torch modules with the same architecture and *reference
semantics* (including the batch-as-time quirk, reference models.py:133,
168-169) and expose their weights under the reference's state-dict key
names so the converter path is exercised too. Oracles run on CPU in
float32; framework parity tests request precision="highest".
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)


class TorchPolicyOracle(nn.Module):
    """Reference-equivalent policy net (reference models.py:33-84)."""

    def __init__(self, vocab, feat_dim=512, emb_dim=512, hidden=512, bidirectional=False):
        super().__init__()
        nd = 2 if bidirectional else 1
        self.bidirectional = bidirectional
        self.caption_embedding = nn.Embedding(vocab, emb_dim)
        self.cnn2linear = nn.Linear(feat_dim, hidden * nd)
        self.lstm = nn.LSTM(emb_dim, hidden, batch_first=True, bidirectional=bidirectional)
        self.linear2vocab = nn.Linear(hidden * nd, vocab)

    def forward(self, features, captions):
        # features: [1, N, F] (leading direction axis as in the reference)
        x = self.caption_embedding(captions)
        h0 = self.cnn2linear(features)
        if self.bidirectional:
            h0 = torch.cat(torch.split(h0, h0.shape[-1] // 2, dim=-1), dim=0)
        c0 = torch.zeros_like(h0)
        out, _ = self.lstm(x, (h0, c0))
        return self.linear2vocab(out)


class TorchValueOracle(nn.Module):
    """Reference-equivalent value net incl. batch-as-time statefulness
    (reference models.py:87-180)."""

    def __init__(self, vocab, feat_dim=512, emb_dim=512, hidden=512, bidirectional=False):
        super().__init__()
        self.hidden = hidden
        self.bidirectional = bidirectional
        self.nd = 2 if bidirectional else 1
        self.caption_embedding = nn.Embedding(vocab, emb_dim)
        self.lstm = nn.LSTM(emb_dim, hidden, bidirectional=bidirectional)
        self.linear1 = nn.Linear(feat_dim + hidden, hidden)
        self.linear2 = nn.Linear(hidden, 1)
        if bidirectional:
            self.rnn_linear = nn.Linear(2 * hidden, hidden)
        self.reset_hidden()

    def reset_hidden(self):
        self.hidden_cell = (
            torch.zeros(self.nd, 1, self.hidden),
            torch.zeros(self.nd, 1, self.hidden),
        )

    def forward_compat(self, features, captions):
        # reference semantics: per column, feed the batch as the time axis
        for t in range(captions.shape[1]):
            emb = self.caption_embedding(captions[:, t])
            out, self.hidden_cell = self.lstm(emb.view(len(emb), 1, -1), self.hidden_cell)
        if self.bidirectional:
            out = self.rnn_linear(out)
        rnn_out = out.squeeze(1)
        state = torch.cat((features, rnn_out), dim=1)
        return self.linear2(self.linear1(state))

    def forward_batched(self, features, captions):
        # clean per-sample semantics (our default mode)
        emb = self.caption_embedding(captions)  # [N, T, E]
        out, _ = self.lstm(emb.transpose(0, 1))  # time-major, zero init
        rnn_out = out[-1]  # torch output[-1] convention (bidi: [N, 2H])
        if self.bidirectional:
            rnn_out = self.rnn_linear(rnn_out)
        state = torch.cat((features, rnn_out), dim=1)
        return self.linear2(self.linear1(state))


class TorchRewardOracle(nn.Module):
    """Reference-equivalent reward net (reference models.py:183-262)."""

    def __init__(self, vocab, feat_dim=512, emb_dim=512, hidden=512, bidirectional=False):
        super().__init__()
        self.hidden = hidden
        self.nd = 2 if bidirectional else 1
        self.caption_embedding = nn.Embedding(vocab, emb_dim)
        self.gru = nn.GRU(emb_dim, hidden, bidirectional=bidirectional)
        self.visual_embed = nn.Linear(feat_dim, hidden)
        self.semantic_embed = nn.Linear(self.nd * hidden, hidden)
        self.reset_hidden()

    def reset_hidden(self):
        self.hidden_cell = torch.zeros(self.nd, 1, self.hidden)

    def forward_compat(self, features, captions):
        for t in range(captions.shape[1]):
            emb = self.caption_embedding(captions[:, t])
            out, self.hidden_cell = self.gru(emb.view(len(emb), 1, -1), self.hidden_cell)
        rnn_out = out.squeeze(1)
        return self.visual_embed(features), self.semantic_embed(rnn_out)

    def forward_batched(self, features, captions):
        emb = self.caption_embedding(captions)
        out, _ = self.gru(emb.transpose(0, 1))
        return self.visual_embed(features), self.semantic_embed(out[-1])


def policy_state_dict(m: TorchPolicyOracle) -> dict:
    """State dict under the reference's key names."""
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def value_state_dict(m: TorchValueOracle) -> dict:
    sd = {}
    for k, v in m.state_dict().items():
        if k.startswith(("caption_embedding", "lstm")):
            sd["valrnn." + k] = v.detach().numpy()
        else:
            sd[k] = v.detach().numpy()
    return sd


def reward_state_dict(m: TorchRewardOracle) -> dict:
    sd = {}
    for k, v in m.state_dict().items():
        if k.startswith(("caption_embedding", "gru")):
            sd["rewrnn." + k] = v.detach().numpy()
        else:
            sd[k] = v.detach().numpy()
    return sd


def rand_features(rng: np.random.Generator, n: int, d: int = 512) -> np.ndarray:
    return rng.standard_normal((n, d), dtype=np.float32)


def rand_captions(rng: np.random.Generator, n: int, t: int, vocab: int) -> np.ndarray:
    """Random captions in the bundle's format: <START> body <END> <NULL>*."""
    caps = rng.integers(4, vocab, size=(n, t)).astype(np.int64)
    caps[:, 0] = 1  # <START>
    end_pos = rng.integers(2, t, size=n)
    for i in range(n):
        caps[i, end_pos[i]] = 2  # <END>
        caps[i, end_pos[i] + 1 :] = 0  # <NULL>
    return caps
