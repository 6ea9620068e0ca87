"""Typed configuration for the whole framework.

The reference buries its hyperparameters in module constants and
hard-coded literals (image_captioner.py:17-35, trainers.py:39,97,155,
218,275,378); here every knob is a field on a frozen dataclass so runs
are reproducible and jit caches key on static config.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

from . import MAX_SEQ_LEN


@dataclasses.dataclass(frozen=True)
class NetConfig:
    """Shared shape/architecture config for all four networks."""

    vocab_size: int
    input_dim: int = 512  # VGG16 fc7 (PCA) feature dim
    wordvec_dim: int = 512
    hidden_dim: int = 512
    bidirectional: bool = False
    freeze_embeddings: bool = False  # True when pretrained word vectors are used
    max_seq_len: int = MAX_SEQ_LEN
    precision: Optional[str] = None  # None | "high" | "highest" (MXU precision)

    @property
    def num_directions(self) -> int:
        return 2 if self.bidirectional else 1

    @staticmethod
    def for_vocab(word_to_idx, pretrained_embeddings=None, bidirectional=False, **kw):
        """Build a config the way the reference constructs its nets:
        vocab from ``word_to_idx``; pretrained vectors override
        ``wordvec_dim`` and freeze the embedding table
        (reference models.py:61-65)."""
        if pretrained_embeddings is not None:
            kw.setdefault("wordvec_dim", int(pretrained_embeddings.shape[1]))
            kw.setdefault("freeze_embeddings", True)
        return NetConfig(
            vocab_size=len(word_to_idx), bidirectional=bidirectional, **kw
        )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters of the four trainers (reference defaults)."""

    batch_size: int = 512
    reward_lr: float = 1e-4  # trainers.py:275
    policy_lr: float = 1e-3  # trainers.py:218
    value_lr: float = 1e-3  # trainers.py:155
    a2c_lr: float = 1e-4  # trainers.py:378
    reward_epochs: int = 50
    policy_epochs: int = 100
    value_epochs: int = 50
    a2c_epochs: int = 100
    vse_beta: float = 0.2  # trainers.py:39
    curriculum: Optional[Sequence[int]] = None  # e.g. (3, 6, 9, 12, 15)
    seed: int = 0
    # Semantics switches (fidelity vs. fix — SURVEY.md §2.6):
    compat_batch_as_time: bool = False  # Q1: emulate reference value/reward RNN statefulness


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    beam_size: int = 5  # trainers.py:73
    value_weight: float = 0.6  # trainers.py:97
    logprob_weight: float = 0.4  # trainers.py:97
    max_seq_len: int = MAX_SEQ_LEN
    # Faithful mode ranks one shared beam by batch-mean score and scores
    # with log(raw logit) — reference quirk Q2. Per-sample mode keeps an
    # independent beam per image and uses log-softmax.
    per_sample_beams: bool = True
