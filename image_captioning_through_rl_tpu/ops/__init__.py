"""Compute ops: RNN cells, sampling, losses, reward scoring.

Pure-XLA implementations live here; Pallas TPU kernels for the hot
decode path live in :mod:`.pallas_decode`.
"""

from .linalg import dense, matmul
from .rnn import (
    gru_cell,
    gru_scan,
    lstm_cell,
    lstm_scan,
    bilstm_scan,
    flat_stream_scan,
)
from .sampling import log_prob_of, sample_categorical
from .losses import (
    a2c_losses,
    visual_semantic_embedding_loss,
    weighted_caption_xe_loss,
)
from .reward_ops import cosine_embedding_reward

__all__ = [
    "dense",
    "matmul",
    "lstm_cell",
    "gru_cell",
    "lstm_scan",
    "gru_scan",
    "bilstm_scan",
    "flat_stream_scan",
    "sample_categorical",
    "log_prob_of",
    "a2c_losses",
    "visual_semantic_embedding_loss",
    "weighted_caption_xe_loss",
    "cosine_embedding_reward",
]
