"""SPMD parallelism over a TPU device mesh.

The reference is strictly single-device (SURVEY §2: no DataParallel, no
torch.distributed). The TPU-native scaling model here is SPMD:

  * a 1-D or 2-D :class:`jax.sharding.Mesh` — ``data`` for batch
    (episode) parallelism, ``model`` for tensor parallelism over the
    vocabulary axis of the embedding table and output head;
  * inputs committed to shardings with ``device_put`` — jit then
    partitions every training step automatically and inserts the
    gradient ``psum`` / logits collectives over ICI;
  * no NCCL/MPI analog needed: the XLA runtime owns the collectives.

Pipeline, sequence and expert parallelism are deliberately absent: the
workload is a single-layer LSTM over 17 tokens (SURVEY §5) — batch and
vocab are the axes that exist. Multi-host runs gate host I/O on
``jax.process_index() == 0``.
"""

from .hostbatch import GlobalBatcher
from .mesh import (
    is_main_process,
    local_device_count,
    make_mesh,
    maybe_init_distributed,
)
from .serve import (sharded_beam_tokens, sharded_greedy_tokens,
                    sharded_sample_tokens)
from .shard_map_step import make_shard_map_a2c_step
from .sharding import (
    a2c_param_spec,
    policy_param_spec,
    replicate,
    shard_batch,
    shard_params,
    value_param_spec,
    reward_param_spec,
)

__all__ = [
    "GlobalBatcher",
    "make_mesh",
    "local_device_count",
    "is_main_process",
    "maybe_init_distributed",
    "make_shard_map_a2c_step",
    "sharded_greedy_tokens",
    "sharded_beam_tokens",
    "sharded_sample_tokens",
    "replicate",
    "shard_batch",
    "shard_params",
    "policy_param_spec",
    "value_param_spec",
    "reward_param_spec",
    "a2c_param_spec",
]
