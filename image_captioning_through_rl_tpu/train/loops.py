"""Trainer drivers: the public training/eval API of the framework.

These mirror the reference's orchestration layer (trainers.py) —
``train_{reward,policy,value}_network``, ``train_a2c_network``,
``a2c_training``, ``a2c_curriculum_training``, ``test_a2c_network`` —
with the same control flow, checkpoint cadence, TensorBoard tags and
file outputs, but each minibatch is one jitted device step.

Reproduced reference behaviors:
  * best-loss checkpointing saves the weights *entering* the best
    minibatch (the reference saves before the optimizer step,
    trainers.py:182-186,244-248,293-297 — quirk Q12);
  * the A2C model saves every epoch to both save paths
    (trainers.py:498, utilities.py:286-296);
  * curriculum appends level 16 ("full training") when missing
    (trainers.py:389-390) and skips minibatches whose
    ``curr_seq_len < 1`` (trainers.py:550);
  * the TB step counter is ``epoch * batch_size + minibatch_id``
    (utilities.py:204-212, quirk Q10);
  * evaluation draws ``data_size`` random val samples *with
    replacement* (trainers.py:639, quirk Q8) and walks them in
    127-wide slices per 128 stride (trainers.py:643-645, quirk Q9).
"""

from __future__ import annotations

import math
import os as _os
import random as pyrandom
import time as _time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from .. import END_ID, MAX_SEQ_LEN
from ..config import DecodeConfig, NetConfig, TrainConfig
from ..data.coco import CocoData, decode_captions, get_coco_batch, get_coco_minibatches
from ..decode.beam import beam_search
from ..models import policy as policy_mod
from ..models import reward as reward_mod
from ..models import value as value_mod
from ..utils.io import append_results, global_minibatch_number
from ..parallel.mesh import is_main_process
from ..utils.logging import make_metrics_writer, print_green, print_red
from . import checkpoint as ckpt
from . import steps
from .guard import check_finite
from .optim import adam

# single source of truth for the reference hyperparameter defaults: the
# trainer signatures below draw their defaults from TrainConfig so the
# typed config and the loops cannot drift
_T = TrainConfig()


def _cfg_for(data: CocoData, bidirectional: bool,
             net_dims: Optional[Dict[str, int]] = None) -> NetConfig:
    """Model config for a dataset. ``net_dims`` overrides the reference's
    hard-coded architecture constants (models.py:17-18 buries
    input/wordvec/hidden = 512 in module constants; here they surface as
    config/CLI knobs per SURVEY §5). Pretrained embedding tables fix the
    word-vector width, so a ``wordvec_dim`` override is dropped when the
    dataset ships vectors (the CLI help documents this precedence)."""
    net_dims = dict(net_dims or {})
    if data.embeddings is not None:
        net_dims.pop("wordvec_dim", None)
    # input_dim must equal the dataset's feature width for any forward
    # to run (the rollout consumes features directly), so infer it from
    # the data unless explicitly overridden — the reference hard-codes
    # 512 (models.py:17-18) and simply cannot run its own
    # pca_features=False 4096-d variant (utilities.py:61-64).
    net_dims.setdefault("input_dim", int(data.train_features.shape[-1]))
    return NetConfig.for_vocab(
        data.word_to_idx, data.embeddings, bidirectional=bidirectional,
        **net_dims
    )


def describe_params(name: str, params) -> str:
    lines = [f"{name}:"]
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        lines.append(f"  {key}: {tuple(leaf.shape)} {leaf.dtype}")
    return "\n".join(lines)


def _epoch_batches(data: CocoData, batch_size: int, rng: np.random.Generator, tables=None):
    """Epoch iterator; with HBM-resident ``tables`` only the index vector
    crosses the host boundary per step (data/device.py)."""
    total = math.ceil(data.train_captions.shape[0] / batch_size)
    if tables is not None:
        gen = ((caps, feats, None) for caps, feats in tables.minibatches(batch_size, rng=rng))
        return gen, total
    return get_coco_minibatches(data, batch_size=batch_size, split="train", rng=rng), total


def _device_tables(data: CocoData, device_data: bool):
    if not device_data:
        return None
    from ..data.device import DeviceCocoTables

    return DeviceCocoTables(data, split="train")


def _mesh_io(mesh, train_data: CocoData):
    """Multi-device/host input plumbing for the trainer loops.

    Returns ``(batcher, tables)``: a
    :class:`..parallel.hostbatch.GlobalBatcher` committing each
    minibatch to the ``data``-sharded global layout (each process
    uploads only its addressable shard) and host-side tables (device
    tables would need ``device_put`` to non-addressable devices on a
    multi-process mesh). Works identically on single-process meshes, so
    the CPU suite exercises the same path the multi-host job runs.
    """
    from ..data.device import HostCocoTables
    from ..parallel.hostbatch import GlobalBatcher

    return GlobalBatcher(mesh), HostCocoTables(train_data, split="train")



def _diverged_path(save_paths) -> Optional[str]:
    """Post-mortem dump path for the divergence guard: next to the
    trainer's first checkpoint path (``None`` when the caller saves
    nowhere — e.g. library use with ``save_paths=[]``)."""
    if isinstance(save_paths, (list, tuple)):
        if not save_paths:
            return None
        save_paths = save_paths[0]
    return str(save_paths) + ".diverged"


class _DeferredBookkeeper:
    """One-step-deferred scalar bookkeeping.

    The reference reads the loss after every minibatch (best-loss
    tracking, trainers.py:182 etc.); a synchronous read costs a full
    host round trip per step. Deferring the read by one step lets the
    host resolve step i's scalars while step i+1 executes on device —
    identical artifacts (same losses compared, same pre-update weights
    saved), round trip hidden behind compute.
    """

    def __init__(self, resolve_fn):
        self._resolve = resolve_fn
        self._pending = None

    def push(self, *payload):
        if self._pending is not None:
            self._resolve(*self._pending)
        self._pending = payload

    def flush(self):
        if self._pending is not None:
            self._resolve(*self._pending)
            self._pending = None


def _epoch_throughput(writer, tag: str, steps_done: int, dt_s: float, epoch: int):
    """Opt-in per-epoch throughput scalar (ICRL_STEP_TIMING=1): wires the
    observability layer's timing meter into every trainer without
    touching the default metric-log artifact (extra tags only when asked
    — the JSONL/TB logs otherwise carry exactly the reference's tags)."""
    if _os.environ.get("ICRL_STEP_TIMING") and dt_s > 0 and steps_done:
        writer.add_scalar(f"{tag}-steps_per_sec", steps_done / dt_s, epoch)


def _drive_best_loss_training(
    desc: str,
    tag: str,
    ckpt_path: str,
    writer,
    epochs: int,
    batch_size: int,
    rng: np.random.Generator,
    train_data: CocoData,
    tables,
    params,
    opt_state,
    single_step,
    chunk_step=None,
    chunk_steps: int = 16,
    train_state_path: Optional[str] = None,
    start_epoch: int = 0,
    resume_best: Optional[float] = None,
    extra_state_fn=None,
    fused_used: Optional[bool] = None,
):
    """Shared epoch driver for the three best-loss-checkpointed
    pretrainers (reference trainers.py:160-197, 225-257, 280-309).

    ``train_state_path`` snapshots the full training state after every
    epoch (weights, Adam moments, the numpy RNG, plus whatever
    JSON-able object ``extra_state_fn()`` returns — the value trainer's
    stdlib prefix-length stream rides there); ``start_epoch`` /
    ``resume_best`` re-enter the loop from a restored snapshot. The Q12
    best-weights checkpoint needs no separate restore: the file already
    holds them, ``resume_best`` gates further saves, and a re-run of the
    interrupted epoch deterministically re-writes anything it had
    written. See :func:`a2c_training` for the resume semantics.

    ``single_step(params, opt, feats, caps) -> (params, opt, loss)``
    runs one minibatch; with ``chunk_step`` (steps.make_*_chunk_step)
    and device tables, ``chunk_steps`` minibatch updates run per host
    dispatch with the best-loss/Q12 bookkeeping carried on device —
    identical artifacts (same losses logged at the same TB steps, the
    checkpoint file converges to the same bytes: the weights entering
    the first minibatch attaining the global-minimum loss), but the
    host round trip is paid once per chunk instead of once per step.
    """
    state = {"best": float("inf") if resume_best is None else resume_best,
             "bar": None}

    def snapshot(epoch, params, opt_state):
        if train_state_path and is_main_process():
            ckpt.save_train_state(
                train_state_path, params, opt_state,
                np.zeros((2,), np.uint32),  # pretrainers hold no jax key
                {"kind": "best_loss", "tag": tag, "epoch_done": epoch + 1,
                 "best": state["best"],
                 "rng_state": rng.bit_generator.state,
                 # the probed kernel choice: resume pins it so a
                 # weight-dependent re-probe can't flip compilers
                 # mid-run (see _resume_pin_fused)
                 "fused": fused_used,
                 "extra": None if extra_state_fn is None
                 else extra_state_fn()})

    def resolve(prev, loss_dev, epoch, minibatch_id):
        loss = float(loss_dev)
        check_finite(loss, desc, f"epoch {epoch + 1}, minibatch {minibatch_id}",
                     dump_tree=prev, dump_path=ckpt_path + ".diverged")
        if loss < state["best"]:
            state["best"] = loss
            if is_main_process():
                ckpt.save_pytree(prev, ckpt_path)  # Q12: weights entering
            state["bar"].set_description_str(
                f"{desc} ({epoch + 1}/{epochs}): Best Loss {loss}")
        writer.add_scalar(tag, loss,
                          global_minibatch_number(epoch, minibatch_id, batch_size))

    keeper = _DeferredBookkeeper(resolve)
    use_chunks = chunk_step is not None and chunk_steps > 1 and tables is not None
    for epoch in range(start_epoch, epochs):
        _t_epoch = _time.perf_counter()
        if use_chunks:
            num = tables.num_captions
            perm = rng.permutation(num)
            total = math.ceil(num / batch_size)
            bar = tqdm(total=total,
                       desc=f"{desc} ({epoch + 1}/{epochs}): Best Loss {state['best']}")
            state["bar"] = bar
            i = 0
            minibatch_id = 0
            while i < num:
                k = min(chunk_steps, (num - i) // batch_size)
                if k >= 1:
                    caps_b, feats_b = tables.gather(perm[i : i + k * batch_size])
                    (params, opt_state, losses, best_prev, _,
                     improved) = chunk_step(
                        params, opt_state, jnp.float32(state["best"]),
                        feats_b.reshape(k, batch_size, -1),
                        caps_b.reshape(k, batch_size, -1),
                    )
                    if bool(improved) and is_main_process():
                        ckpt.save_pytree(jax.device_get(best_prev), ckpt_path)
                    for loss in jax.device_get(losses):
                        loss = float(loss)
                        check_finite(
                            loss, desc,
                            f"epoch {epoch + 1}, minibatch {minibatch_id}",
                            dump_tree=params,  # post-chunk tree (entering
                            # weights aren't materialized in chunked mode)
                            dump_path=ckpt_path + ".diverged")
                        if loss < state["best"]:
                            state["best"] = loss
                            bar.set_description_str(
                                f"{desc} ({epoch + 1}/{epochs}): Best Loss {loss}")
                        writer.add_scalar(
                            tag, loss,
                            global_minibatch_number(epoch, minibatch_id, batch_size))
                        minibatch_id += 1
                    i += k * batch_size
                    bar.update(k)
                else:  # ragged tail: one single-step call
                    caps_b, feats_b = tables.gather(perm[i:])
                    prev = params
                    params, opt_state, loss = single_step(
                        params, opt_state, feats_b, caps_b)
                    resolve(prev, loss, epoch, minibatch_id)
                    minibatch_id += 1
                    i = num
                    bar.update(1)
            bar.close()
            _epoch_throughput(writer, tag, minibatch_id,
                              _time.perf_counter() - _t_epoch, epoch)
            snapshot(epoch, params, opt_state)
        else:
            batches, total = _epoch_batches(train_data, batch_size, rng, tables)
            bar = tqdm(batches, total=total,
                       desc=f"{desc} ({epoch + 1}/{epochs}): Best Loss {state['best']}")
            state["bar"] = bar
            minibatch_id = -1
            for minibatch_id, (captions, features, _) in enumerate(bar):
                prev = params
                params, opt_state, loss = single_step(
                    params, opt_state, jnp.asarray(features), jnp.asarray(captions))
                keeper.push(prev, loss, epoch, minibatch_id)
            keeper.flush()
            _epoch_throughput(writer, tag, minibatch_id + 1,
                              _time.perf_counter() - _t_epoch, epoch)
            snapshot(epoch, params, opt_state)
    return params


def train_reward_network(
    train_data: CocoData,
    network_paths: Dict[str, str],
    plot_dir: Optional[str],
    bidirectional: bool,
    epochs: int = _T.reward_epochs,
    batch_size: int = _T.batch_size,
    lr: float = _T.reward_lr,
    seed: int = 0,
    compat_batch_as_time: bool = False,
    device_data: bool = True,
    fused_chain=None,
    chunk_steps: int = 16,
    mesh=None,
    resume: bool = False,
    net_dims: Optional[Dict[str, int]] = None,
):
    """VSE-loss training of the reward network (trainers.py:260-309).

    ``resume=True`` restores the per-epoch full-state snapshot
    (``<ckpt>.trainstate``: weights + Adam moments + the batch-sampling
    RNG + epoch position) and continues bit-identically to the
    uninterrupted run; no snapshot -> fresh start (see
    :func:`a2c_training`).

    ``fused_chain=None`` (auto) probes the fused Pallas GRU-chain step
    once and uses it when its loss agrees with the XLA step.

    ``mesh``: a :class:`jax.sharding.Mesh` with a ``data`` axis scales
    the loop across chips AND hosts: minibatches commit to the global
    data-sharded layout (each process uploads only its shard), GSPMD
    inserts the gradient all-reduce, and ``is_main_process`` gates the
    checkpoint/metric writes. The fused single-chip kernels step aside
    (GSPMD serves the mesh)."""
    cfg = _cfg_for(train_data, bidirectional, net_dims)
    writer = make_metrics_writer(plot_dir if is_main_process() else None)
    rng = np.random.default_rng(seed)
    params = reward_mod.init(jax.random.PRNGKey(seed), cfg, train_data.embeddings)
    tx = adam(lr, params, cfg.freeze_embeddings)
    opt_state = tx.init(params)
    train_state_path = network_paths["reward_network"] + ".trainstate"
    params, opt_state, start_epoch, resume_best, resume_fused = \
        _resume_pretrainer(
            resume, train_state_path, "Reward Network-loss", params,
            opt_state, rng, mesh is not None and jax.process_count() > 1)
    if start_epoch >= epochs and mesh is None:
        # already complete: skip the kernel probe + step compilation
        print_green(f"[Training] Reward Network already trained "
                    f"({start_epoch}/{epochs} epochs) — nothing to resume")
        writer.close()
        return params
    if compat_batch_as_time or cfg.bidirectional or mesh is not None:
        _forced_fused_conflict(fused_chain, "fused_chain",
                               "with compat/bidirectional/mesh")
        fused_chain = False
    elif fused_chain is None:
        fused_chain = _resume_pin_fused(
            resume_fused,
            lambda: _probe_fused_pair(
                lambda p, f, c: steps.reward_loss_fused(p, cfg, f, c),
                lambda p, f, c: steps.reward_loss(p, cfg, f, c), cfg, params),
            "VSE step",
            announce=lambda f: print_green(
                f"[Training] fused GRU-chain kernels "
                f"{'verified — Pallas VSE step' if f else 'unavailable — XLA VSE step'}"))
    step = steps.make_reward_step(cfg, tx, compat=compat_batch_as_time, fused=fused_chain)
    chunk = None
    if mesh is not None:
        batcher, tables = _mesh_io(mesh, train_data)
        params, opt_state = batcher.replicate((params, opt_state))
        raw_step = step

        def step(p, o, f, c):  # noqa: F811
            return raw_step(p, o, *batcher.shard(f, c))

        if chunk_steps > 1 and not compat_batch_as_time and not cfg.bidirectional:
            raw_chunk = steps.make_reward_chunk_step(cfg, tx)

            def chunk(p, o, best, f, c):
                return raw_chunk(p, o, best, *batcher.shard_stacked(f, c))
    else:
        tables = _device_tables(train_data, device_data)
        if chunk_steps > 1 and not compat_batch_as_time and not cfg.bidirectional:
            chunk = steps.make_reward_chunk_step(cfg, tx, fused=fused_chain)

    print_green("[Training] Training Reward Network")
    params = _drive_best_loss_training(
        "Training Reward Network", "Reward Network-loss",
        network_paths["reward_network"], writer, epochs, batch_size, rng,
        train_data, tables, params, opt_state, step, chunk, chunk_steps,
        train_state_path=train_state_path, start_epoch=start_epoch,
        resume_best=resume_best, fused_used=fused_chain,
    )
    writer.close()
    return params


def train_policy_network(
    train_data: CocoData,
    network_paths: Dict[str, str],
    plot_dir: Optional[str],
    bidirectional: bool,
    epochs: int = _T.policy_epochs,
    batch_size: int = _T.batch_size,
    lr: float = _T.policy_lr,
    seed: int = 0,
    device_data: bool = True,
    fused_chain=None,
    chunk_steps: int = 16,
    mesh=None,
    resume: bool = False,
    net_dims: Optional[Dict[str, int]] = None,
):
    """Teacher-forced XE pretraining of the policy (trainers.py:202-257).

    ``fused_chain=None`` (auto) probes the fused Pallas LSTM-chain step
    once and uses it when its loss agrees with the XLA step (TPU,
    unidirectional); ``True``/``False`` force a side. ``mesh`` scales
    across chips/hosts, ``resume`` continues from the per-epoch
    full-state snapshot (see :func:`train_reward_network`)."""
    cfg = _cfg_for(train_data, bidirectional, net_dims)
    writer = make_metrics_writer(plot_dir if is_main_process() else None)
    rng = np.random.default_rng(seed + 1)
    params = policy_mod.init(jax.random.PRNGKey(seed + 1), cfg, train_data.embeddings)
    tx = adam(lr, params, cfg.freeze_embeddings)
    opt_state = tx.init(params)
    train_state_path = network_paths["policy_network"] + ".trainstate"
    params, opt_state, start_epoch, resume_best, resume_fused = \
        _resume_pretrainer(
            resume, train_state_path, "Policy Network-loss", params,
            opt_state, rng, mesh is not None and jax.process_count() > 1)
    if start_epoch >= epochs and mesh is None:
        print_green(f"[Training] Policy Network already trained "
                    f"({start_epoch}/{epochs} epochs) — nothing to resume")
        writer.close()
        return params
    if cfg.bidirectional or mesh is not None:
        _forced_fused_conflict(fused_chain, "fused_chain",
                               "with bidirectional/mesh")
        fused_chain = False
    elif fused_chain is None:
        fused_chain = _resume_pin_fused(
            resume_fused, lambda: _probe_fused_policy(cfg, params), "XE step",
            announce=lambda f: print_green(
                f"[Training] fused LSTM-chain kernels "
                f"{'verified — Pallas XE step' if f else 'unavailable — XLA XE step'}"))
    step = steps.make_policy_step(cfg, tx, fused=fused_chain)
    chunk = None
    if mesh is not None:
        batcher, tables = _mesh_io(mesh, train_data)
        params, opt_state = batcher.replicate((params, opt_state))
        raw_step = step

        def step(p, o, f, c):  # noqa: F811
            return raw_step(p, o, *batcher.shard(f, c))

        if chunk_steps > 1 and not cfg.bidirectional:
            raw_chunk = steps.make_policy_chunk_step(cfg, tx)

            def chunk(p, o, best, f, c):
                return raw_chunk(p, o, best, *batcher.shard_stacked(f, c))
    else:
        tables = _device_tables(train_data, device_data)
        if chunk_steps > 1 and not cfg.bidirectional:
            chunk = steps.make_policy_chunk_step(cfg, tx, fused=fused_chain)

    print_green("[Training] Training Policy Network")
    params = _drive_best_loss_training(
        "Training Policy Network", "Policy Network-loss",
        network_paths["policy_network"], writer, epochs, batch_size, rng,
        train_data, tables, params, opt_state, step, chunk, chunk_steps,
        train_state_path=train_state_path, start_epoch=start_epoch,
        resume_best=resume_best, fused_used=fused_chain,
    )
    writer.close()
    return params


def train_value_network(
    train_data: CocoData,
    network_paths: Dict[str, str],
    plot_dir: Optional[str],
    bidirectional: bool,
    epochs: int = _T.value_epochs,
    batch_size: int = _T.batch_size,
    lr: float = _T.value_lr,
    seed: int = 0,
    compat_batch_as_time: bool = False,
    device_data: bool = True,
    chunk_steps: int = 16,
    mesh=None,
    resume: bool = False,
    net_dims: Optional[Dict[str, int]] = None,
):
    """MSE training of the critic against embedding rewards of greedy
    rollouts from the frozen policy (trainers.py:125-199). ``mesh``
    scales across chips/hosts, ``resume`` continues from the per-epoch
    full-state snapshot — including the stdlib prefix-length stream
    ``py_rng``, which rides in the snapshot's ``extra`` slot (see
    :func:`train_reward_network`)."""
    cfg = _cfg_for(train_data, bidirectional, net_dims)
    writer = make_metrics_writer(plot_dir if is_main_process() else None)
    rng = np.random.default_rng(seed + 2)
    py_rng = pyrandom.Random(seed + 2)

    rparams = _load_or_fail_sync("reward", network_paths["reward_network"], cfg, train_data, bidirectional, mesh)
    pparams = _load_or_fail_sync("policy", network_paths["policy_network"], cfg, train_data, bidirectional, mesh)

    params = value_mod.init(jax.random.PRNGKey(seed + 2), cfg, train_data.embeddings)
    tx = adam(lr, params, cfg.freeze_embeddings)
    opt_state = tx.init(params)

    def _set_py_rng(s):  # JSON round-trips tuples as lists
        py_rng.setstate((s[0], tuple(s[1]), s[2]))

    train_state_path = network_paths["value_network"] + ".trainstate"
    params, opt_state, start_epoch, resume_best, resume_fused = \
        _resume_pretrainer(
            resume, train_state_path, "Value Network-loss", params, opt_state,
            rng, mesh is not None and jax.process_count() > 1,
            set_extra=_set_py_rng)
    if start_epoch >= epochs and mesh is None:
        print_green(f"[Training] Value Network already trained "
                    f"({start_epoch}/{epochs} epochs) — nothing to resume")
        writer.close()
        return params
    if compat_batch_as_time or cfg.bidirectional or mesh is not None:
        fused_chain = False
    else:  # auto: probe the REAL fused value step (chain + fused rollout)
        fused_chain = _resume_pin_fused(
            resume_fused,
            lambda: _probe_fused_value(cfg, params, pparams, rparams),
            "value step",
            announce=lambda f: print_green(
                f"[Training] fused value-step kernels "
                f"{'verified — Pallas value step' if f else 'unavailable — XLA value step'}"))
    step = steps.make_value_step(cfg, tx, compat=compat_batch_as_time, fused=fused_chain)
    batcher = None
    if mesh is not None:
        batcher, tables = _mesh_io(mesh, train_data)
        params, opt_state, pparams, rparams = batcher.replicate(
            (params, opt_state, pparams, rparams))
    else:
        tables = _device_tables(train_data, device_data)

    # random prefix length per minibatch, shared by the batch
    # (trainers.py:177) — drawn in minibatch order by BOTH paths so the
    # host RNG stream is identical whether or not dispatches are chunked
    def single_step(params, opt_state, feats, caps):
        prefix_len = py_rng.randint(1, MAX_SEQ_LEN)
        if batcher is not None:
            feats, caps = batcher.shard(feats, caps)
        return step(params, opt_state, pparams, rparams, feats, caps, prefix_len)

    chunk = None
    if chunk_steps > 1 and not compat_batch_as_time and not cfg.bidirectional:
        chunk_fn = steps.make_value_chunk_step(cfg, tx, fused=fused_chain)

        def chunk(params, opt_state, best_loss, feats_k, caps_k):
            k = feats_k.shape[0]
            prefix_lens = jnp.asarray(
                [py_rng.randint(1, MAX_SEQ_LEN) for _ in range(k)], jnp.int32)
            if batcher is not None:
                feats_k, caps_k = batcher.shard_stacked(feats_k, caps_k)
            return chunk_fn(params, opt_state, best_loss, pparams, rparams,
                            feats_k, caps_k, prefix_lens)

    print_green("[Training] Training Value Network")
    params = _drive_best_loss_training(
        "Training Value Network", "Value Network-loss",
        network_paths["value_network"], writer, epochs, batch_size, rng,
        train_data, tables, params, opt_state, single_step, chunk, chunk_steps,
        train_state_path=train_state_path, start_epoch=start_epoch,
        resume_best=resume_best, fused_used=fused_chain,
        extra_state_fn=lambda: list(py_rng.getstate()),
    )
    writer.close()
    return params


def _load_or_fail(kind: str, path: str, cfg: NetConfig, data: CocoData, bidirectional: bool):
    init_fn = {"reward": reward_mod.init, "policy": policy_mod.init, "value": value_mod.init}[kind]
    template = init_fn(jax.random.PRNGKey(0), cfg, data.embeddings)
    return ckpt.load_network(kind, path, template=template, bidirectional=bidirectional)


def _sync_load(load_fn, template_fn, multiprocess: bool):
    """Cross-host-consistent checkpoint load.

    Branching on LOCAL file existence deadlocks a multi-host job when
    ranks disagree (e.g. no shared filesystem: only rank 0 wrote the
    checkpoint, so rank 0 would skip training while the others enter
    it and block in its first collective). When ``multiprocess``,
    process 0 alone attempts ``load_fn``; its success bit and — on
    success — the loaded values broadcast to every rank, so all ranks
    take the same branch with the same weights. Single-process: plain
    ``load_fn()``.
    """
    if not multiprocess:
        return load_fn()
    import numpy as _np
    from jax.experimental import multihost_utils

    # the verdict bit MUST broadcast on every control path: an uncaught
    # exception on rank 0 before the broadcast would strand every other
    # rank in the collective (the exact hang this function prevents)
    params, code, err = None, 1, None
    if is_main_process():
        try:
            params = load_fn()
        except FileNotFoundError as e:
            code, err = 0, e
        except Exception as e:  # corrupt/mismatched checkpoint etc.
            code, err = 2, e
    code = int(multihost_utils.broadcast_one_to_all(_np.int32(code)))
    if code == 0:
        raise err if err is not None else FileNotFoundError(
            "checkpoint absent on process 0")
    if code == 2:
        if err is not None:
            raise err
        raise RuntimeError(
            "checkpoint load failed on process 0 (see its log for the "
            "original error)")
    if params is None:  # non-main ranks contribute the template structure
        params = template_fn()
    return multihost_utils.broadcast_one_to_all(
        jax.tree.map(np.asarray, jax.device_get(params))
    )


def _load_train_state_sync(path: str, params_template, opt_state_template,
                           multiprocess: bool, meta_check=None):
    """Load a full train-state snapshot; missing file -> ``None`` (the
    caller falls back to weights-only resume); parse errors raise.

    Multi-host: rank 0 alone reads the file and broadcasts its RAW BYTES
    (length first, then the padless buffer), so every rank parses an
    identical snapshot even without a shared filesystem — same
    every-control-path broadcast discipline as :func:`_sync_load`.
    """
    if not multiprocess:
        try:
            return ckpt.load_train_state(path, params_template,
                                         opt_state_template, meta_check)
        except FileNotFoundError:
            return None
    from jax.experimental import multihost_utils

    data, code, err = None, 0, None
    if jax.process_index() == 0:
        try:
            with open(path, "rb") as f:
                data = np.frombuffer(f.read(), dtype=np.uint8)
        except FileNotFoundError:
            code = 2
        except Exception as e:  # broadcast the verdict BEFORE raising
            err, code = e, 3
    code = int(multihost_utils.broadcast_one_to_all(np.int32(code)))
    if code == 3:
        raise err if err is not None else RuntimeError(
            f"train-state load failed on rank 0: {path}")
    if code == 2:
        return None
    n = int(multihost_utils.broadcast_one_to_all(
        np.int64(0 if data is None else len(data))))
    buf = data if jax.process_index() == 0 else np.zeros((n,), np.uint8)
    buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return ckpt.train_state_from_bytes(buf.tobytes(), params_template,
                                       opt_state_template, meta_check)


def _exists_sync(path: str, multiprocess: bool) -> bool:
    """Rank-0 file existence, broadcast so every rank branches alike."""
    if not multiprocess:
        return _os.path.exists(path)
    from jax.experimental import multihost_utils

    bit = np.int32(_os.path.exists(path) if jax.process_index() == 0 else 0)
    return bool(int(multihost_utils.broadcast_one_to_all(bit)))


def _resume_pretrainer(resume: bool, train_state_path: str, tag: str,
                       params, opt_state, rng: np.random.Generator,
                       multiprocess: bool, set_extra=None):
    """Restore a pretrainer's full train state (exact resume).

    Returns ``(params, opt_state, start_epoch, resume_best,
    resume_fused)`` — the fresh inputs unchanged (and ``resume_fused``
    None) when ``resume`` is off or no snapshot exists. ``set_extra``
    consumes the snapshot's trainer-specific RNG extra (the value
    trainer's stdlib prefix stream); ``resume_fused`` is the original
    run's probed kernel choice (see :func:`_resume_pin_fused`).
    """
    if not resume:
        return params, opt_state, 0, None, None

    def meta_check(meta):  # pre-parse: a wrong-network snapshot must
        # raise this diagnosis, not a template-structure mismatch
        if meta.get("kind") != "best_loss" or meta.get("tag") != tag:
            raise ValueError(
                f"train-state at {train_state_path} is for "
                f"{meta.get('tag') or meta.get('kind')!r}, not {tag!r}")

    rs = _load_train_state_sync(train_state_path, params, opt_state,
                                multiprocess, meta_check)
    if rs is None:
        return params, opt_state, 0, None, None
    meta = rs["meta"]
    rng.bit_generator.state = meta["rng_state"]
    if set_extra is not None and meta.get("extra") is not None:
        set_extra(meta["extra"])
    print_green(f"[Training] resumed full {tag.replace('-loss', '')} train "
                f"state (epoch {meta['epoch_done']} done)")
    return (rs["params"], rs["opt_state"], meta["epoch_done"], meta["best"],
            meta.get("fused"))


def _resume_pin_fused(resume_fused, probe_fn, what: str,
                      announce=None) -> bool:
    """Kernel choice for an auto (``fused=None``) trainer honoring a
    resumed snapshot's recorded choice.

    The Pallas and XLA steps round bf16 accumulations in different
    orders, so flipping compilers mid-run breaks the bit-identical
    resume contract. The original run's probe verdict is weight-
    dependent (trained weights can verify where random init did not),
    so re-probing on resume could silently flip: a recorded False pins
    the XLA step WITHOUT probing; a recorded True still probes — the
    verify canary must pass on THIS machine — and warns loudly if the
    kernels no longer verify. Fresh runs (``resume_fused`` None,
    including pre-pinning snapshots) just probe."""
    if resume_fused is False:
        print_green(f"[Training] resumed snapshot pins the XLA {what} "
                    f"(kernel choice recorded by the original run)")
        return False
    fused = probe_fn()
    if announce is not None:
        announce(fused)
    if resume_fused is True and not fused:
        print_red(f"[Training] WARNING: the interrupted run trained with "
                  f"the fused Pallas {what}, but the kernels do not verify "
                  f"on this machine — continuing with the XLA step; the "
                  f"continuation is NOT bit-identical to the original run")
    return fused


def _load_or_fail_sync(kind: str, path: str, cfg: NetConfig, data: CocoData,
                       bidirectional: bool, mesh) -> dict:
    """:func:`_load_or_fail` with the multi-host agreement of
    :func:`_sync_load` when ``mesh`` spans processes."""
    init_fn = {"reward": reward_mod.init, "policy": policy_mod.init,
               "value": value_mod.init}[kind]
    return _sync_load(
        lambda: _load_or_fail(kind, path, cfg, data, bidirectional),
        lambda: init_fn(jax.random.PRNGKey(0), cfg, data.embeddings),
        mesh is not None and jax.process_count() > 1,
    )


def train_a2c_network(
    train_data: CocoData,
    save_paths: Dict[str, str],
    network_paths: Dict[str, str],
    plot_dir: Optional[str],
    bidirectional: bool,
    epochs: int,
    batch_size: int,
    retrain_all: bool = False,
    curriculum: Optional[Sequence[int]] = None,
    seed: int = 0,
    compat_batch_as_time: bool = False,
    resume: bool = False,
    fused_rollout=None,
    chunk_steps: int = 16,
    a2c_lr: float = _T.a2c_lr,
    mesh=None,
    net_dims: Optional[Dict[str, int]] = None,
):
    """Orchestrator (trainers.py:312-399): train or load the three
    sub-networks, freeze the reward net, then run (curriculum) A2C.

    ``resume=True`` restores full per-epoch train-state snapshots at
    every stage: an interrupted SUB-NETWORK pretraining continues
    bit-identically (instead of the reference's silent use of the
    half-trained best-loss checkpoint), and the A2C loop itself resumes
    weights + Adam moments + RNG streams + epoch position from
    ``a2cNetwork.ckpt.trainstate``. Checkpoints from before the
    snapshots existed fall back to weights-only resume
    (trainers.py:338-370 semantics).

    ``mesh`` threads through every sub-trainer and the A2C loop: one
    global data-sharded mesh over all chips/hosts (see
    :func:`train_reward_network`)."""
    cfg = _cfg_for(train_data, bidirectional, net_dims)
    multiprocess = mesh is not None and jax.process_count() > 1

    if retrain_all:
        print_green("[Training] Training all the networks")
        rparams = train_reward_network(train_data, network_paths, plot_dir, bidirectional, batch_size=batch_size, seed=seed, compat_batch_as_time=compat_batch_as_time, chunk_steps=chunk_steps, mesh=mesh, resume=resume, net_dims=net_dims)
        pparams = train_policy_network(train_data, network_paths, plot_dir, bidirectional, batch_size=batch_size, seed=seed, chunk_steps=chunk_steps, mesh=mesh, resume=resume, net_dims=net_dims)
        vparams = train_value_network(train_data, network_paths, plot_dir, bidirectional, batch_size=batch_size, seed=seed, compat_batch_as_time=compat_batch_as_time, chunk_steps=chunk_steps, mesh=mesh, resume=resume, net_dims=net_dims)
        print_green("[Training] All networks trained")
    else:
        # load-or-train fallback per sub-network (trainers.py:338-370);
        # with --resume, an in-flight pretraining (trainstate present)
        # CONTINUES instead of silently reusing the partial best-loss
        # checkpoint the reference would load here
        def _sub(kind, train_fn):
            path = network_paths[f"{kind}_network"]
            # the exists probe costs one int32 broadcast at startup; the
            # full snapshot is still read/broadcast once (inside
            # train_fn's _resume_pretrainer). If the file vanishes
            # between probe and load, the trainer falls back to
            # training from scratch — safe.
            if resume and _exists_sync(path + ".trainstate", multiprocess):
                return train_fn()
            try:
                p = _load_or_fail_sync(kind, path, cfg, train_data,
                                       bidirectional, mesh)
                print(f"[Training] loaded {kind} network")
                return p
            except FileNotFoundError:
                print(f"[Training] {kind} network not found")
                return train_fn()

        rparams = _sub("reward", lambda: train_reward_network(train_data, network_paths, plot_dir, bidirectional, batch_size=batch_size, seed=seed, compat_batch_as_time=compat_batch_as_time, chunk_steps=chunk_steps, mesh=mesh, resume=resume, net_dims=net_dims))
        pparams = _sub("policy", lambda: train_policy_network(train_data, network_paths, plot_dir, bidirectional, batch_size=batch_size, seed=seed, chunk_steps=chunk_steps, mesh=mesh, resume=resume, net_dims=net_dims))
        vparams = _sub("value", lambda: train_value_network(train_data, network_paths, plot_dir, bidirectional, batch_size=batch_size, seed=seed, compat_batch_as_time=compat_batch_as_time, chunk_steps=chunk_steps, mesh=mesh, resume=resume, net_dims=net_dims))

    a2c_params = {"value": vparams, "policy": pparams}
    tx = adam(a2c_lr, a2c_params, cfg.freeze_embeddings)  # trainers.py:378
    opt_state = tx.init(a2c_params)
    train_state_path = network_paths["a2c_network"] + ".trainstate"
    resume_state = None
    if resume:
        resume_state = _load_train_state_sync(
            train_state_path, a2c_params, opt_state, multiprocess)
        if resume_state is not None:
            m = resume_state["meta"]
            where = (f"level index {m['level_idx']}, epoch {m['epoch_done']}"
                     if m["kind"] == "a2c_curriculum"
                     else f"epoch {m['epoch_done']}")
            print_green(f"[Training] resumed full A2C train state "
                        f"({where} done) from {train_state_path}")
        else:
            # weights-only fallback: checkpoints written before the
            # train-state snapshots existed (fresh Adam/RNG, epoch 0 —
            # the reference's resume semantics, trainers.py:338-370)
            try:
                template = a2c_params
                a2c_params = _sync_load(
                    lambda: ckpt.load_network(
                        "a2c", network_paths["a2c_network"], template=template,
                        bidirectional=bidirectional,
                    ),
                    lambda: template,
                    multiprocess,
                )
                print_green("[Training] resumed A2C weights from checkpoint")
            except FileNotFoundError:
                print("[Training] no A2C checkpoint to resume; starting fresh")

    print(f"[Training] train_data len = {len(train_data.train_captions)}")
    print(f"[Training] episodes = {batch_size}")
    print(f"[Training] epochs = {epochs}")

    all_save_paths = [save_paths["model_path"], network_paths["a2c_network"]]
    if curriculum is None:
        a2c_params = a2c_training(
            train_data, a2c_params, rparams, tx, opt_state, cfg, plot_dir,
            all_save_paths, batch_size, epochs, seed=seed,
            compat_batch_as_time=compat_batch_as_time,
            fused_rollout=fused_rollout, chunk_steps=chunk_steps, mesh=mesh,
            train_state_path=train_state_path, resume_state=resume_state,
        )
    else:
        curriculum = list(curriculum)
        if 16 not in curriculum:
            curriculum.append(16)  # final level = full training (trainers.py:389-390)
        a2c_params = a2c_curriculum_training(
            train_data, a2c_params, rparams, tx, opt_state, cfg, plot_dir,
            all_save_paths, batch_size, epochs, curriculum, seed=seed,
            compat_batch_as_time=compat_batch_as_time,
            fused_rollout=fused_rollout, chunk_steps=chunk_steps, mesh=mesh,
            train_state_path=train_state_path, resume_state=resume_state,
        )

    if is_main_process():
        append_results(save_paths["results_path"], describe_params("AdvantageActorCriticNetwork", a2c_params), header="network")
    return a2c_params, rparams, cfg




def _forced_fused_conflict(flag, what: str, why: str):
    """Explicitly forced fused kernels must not silently degrade: raise,
    matching the serving path's use_fused_kernel=True contract
    (api.Captioner errors rather than serving a different program)."""
    if flag:
        raise ValueError(
            f"{what} was explicitly forced but cannot be honored {why} — "
            "the fused Pallas kernels are single-chip, unidirectional, "
            "non-compat; drop the force flag or the conflicting mode"
        )


def _probe_batch(cfg: NetConfig):
    """Tiny synthetic (features, captions) batch shared by the four
    fused-kernel auto-probes: <START> column, <END> in the last slot."""
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((8, cfg.input_dim), dtype=np.float32))
    caps = rng.integers(4, cfg.vocab_size, size=(8, cfg.max_seq_len)).astype(np.int32)
    caps[:, 0] = 1
    caps[:, -1] = END_ID
    return feats, jnp.asarray(caps)


def _losses_agree(lf, lx, rtol: float = 1e-2) -> bool:
    """Fused-vs-XLA agreement at bf16-accumulation-order tolerance."""
    return bool(abs(float(lf) - float(lx)) <= rtol * max(1.0, abs(float(lx))))


def _grads_agree(gf, gx, cos_min: float = 0.99, norm_rtol: float = 0.05) -> bool:
    """Gradient fingerprint agreement, fused vs XLA, per leaf.

    A backward-kernel regression can preserve the forward loss while
    corrupting the gradients (the round-2 probes checked only the loss);
    requiring per-leaf cosine >= ``cos_min`` and norm ratio within
    ``norm_rtol`` catches scale AND direction corruption while staying
    far above the measured bf16-accumulation-order drift between the
    hand-written VJPs and XLA autodiff (~1e-3 relative).
    """
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
        if na == 0.0 and nb == 0.0:  # e.g. frozen embeddings: both zero
            continue
        if abs(na - nb) > norm_rtol * max(na, nb):
            return False
        if na == 0.0 or nb == 0.0 or float(a @ b) / (na * nb) < cos_min:
            return False
    return True


def _probe_fused_pair(fused_loss, xla_loss, cfg: NetConfig, params,
                      interpret: bool = False) -> bool:
    """Compare a fused loss AND its parameter gradients against the XLA
    twin on a tiny batch. ``fused_loss``/``xla_loss`` are
    ``(params, features, captions) -> loss``; ``interpret=True`` runs
    the Pallas kernels in interpreter mode (CPU testing of the probe
    logic itself)."""
    if not interpret and jax.devices()[0].platform == "cpu":
        return False
    try:
        feats, caps = _probe_batch(cfg)
        lf, gf = jax.value_and_grad(fused_loss)(params, feats, caps)
        lx, gx = jax.value_and_grad(xla_loss)(params, feats, caps)
        return _losses_agree(lf, lx) and _grads_agree(gf, gx)
    except Exception:
        return False


def _probe_fused_value(cfg: NetConfig, vparams, pparams, rparams,
                       interpret: bool = False) -> bool:
    """Probe the actual fused value loss (fused LSTM chain + fused greedy
    rollout) against the XLA loss — value and gradients — on a tiny
    batch."""
    if not interpret and jax.devices()[0].platform == "cpu":
        return False
    try:
        feats, caps = _probe_batch(cfg)
        lf, gf = jax.value_and_grad(steps.value_episode_loss)(
            vparams, cfg, pparams, rparams, feats, caps, jnp.int32(3),
            fused=True, interpret=interpret)
        lx, gx = jax.value_and_grad(steps.value_episode_loss)(
            vparams, cfg, pparams, rparams, feats, caps, jnp.int32(3))
        return _losses_agree(lf, lx) and _grads_agree(gf, gx)
    except Exception:
        return False


def _probe_fused_policy(cfg: NetConfig, params, interpret: bool = False) -> bool:
    """Auto-dispatch probe for the fused LSTM-chain XE step: loss and
    gradients must agree with the XLA step on a tiny batch; False on
    CPU/Mosaic failure."""
    if not interpret and jax.devices()[0].platform == "cpu":
        return False
    try:
        feats, caps = _probe_batch(cfg)
        caplens = steps.batch_caption_lens(caps)
        lf, gf = jax.value_and_grad(steps.policy_loss_fused)(
            params, cfg, feats, caps, caplens, interpret=interpret)
        lx, gx = jax.value_and_grad(steps.policy_loss)(
            params, cfg, feats, caps, caplens)
        return _losses_agree(lf, lx) and _grads_agree(gf, gx)
    except Exception:
        return False


def _probe_fused_rollout(cfg: NetConfig, a2c_params, reward_params,
                         per_step_mean: bool = False,
                         curriculum: bool = False,
                         interpret: bool = False) -> bool:
    """Auto-dispatch probe for the fused training kernels: compile and
    run one tiny fused rollout loss and require agreement with the XLA
    rollout on the loss AND the parameter gradients (same keys -> same
    sampled trajectory; differences are bf16-accumulation-order level,
    measured ~1e-4 on the loss). The probe runs the SERVED
    configuration: curriculum probes add a mid-rollout ``curr_seq_len``
    so the teacher-forced token branch is exercised, and
    ``per_step_mean`` matches the curriculum loss. Returns False on
    CPU or when Mosaic lowering fails, so auto mode degrades cleanly."""
    if not interpret and jax.devices()[0].platform == "cpu":
        return False
    try:
        feats, caps = _probe_batch(cfg)
        currs = [jnp.int32(1)]
        if curriculum:  # teacher branch active for the first half
            currs.append(jnp.int32(max(2, cfg.max_seq_len // 2)))
        for curr in currs:
            args = (cfg, reward_params, feats, caps,
                    curr, jnp.int32(cfg.max_seq_len), jax.random.PRNGKey(0))
            (lf, _), gf = jax.value_and_grad(
                steps.a2c_rollout_loss_fused, has_aux=True)(
                a2c_params, *args, per_step_mean=per_step_mean,
                interpret=interpret)
            (lx, _), gx = jax.value_and_grad(
                steps.a2c_rollout_loss, has_aux=True)(
                a2c_params, *args, per_step_mean=per_step_mean)
            if not (_losses_agree(lf, lx) and _grads_agree(gf, gx)):
                return False
        return True
    except Exception:
        return False

def _drive_a2c_epoch(
    *, epoch, desc, level, tables, train_data, batch_size, chunk_steps,
    use_chunks, chunk_fn, step, a2c_params, opt_state, reward_params,
    rng, key, resolve, keeper, state,
):
    """One epoch of (curriculum) A2C minibatch updates — the single
    definition of the chunked/non-chunked walk shared by
    :func:`a2c_training` (``level=None``: ``curr_seq_len = 1``) and
    :func:`a2c_curriculum_training` (``level`` set: on-device
    ``curr_seq_len = caplen - level`` with the skip rule). Returns
    ``(a2c_params, opt_state, key)``."""
    def host_curr(caps_b) -> int:
        """curriculum window for one minibatch — the ONE host-side copy
        of the max-END-position+1 convention (on-device twin:
        steps.batch_caption_lens; reference trainers.py:547)."""
        caplen = int(np.max(
            np.argmax(np.asarray(caps_b) == END_ID, axis=1)) + 1)
        return caplen - level

    if use_chunks:
        num = tables.num_captions
        perm = rng.permutation(num)
        total = math.ceil(num / batch_size)
        bar = tqdm(total=total, desc=desc)
        state["bar"] = bar
        i = 0
        minibatch_id = 0
        while i < num:
            k = min(chunk_steps, (num - i) // batch_size)
            if k >= 1:
                # per-minibatch keys with the single-step loop's own
                # split discipline: chunked and chunk_steps=1 runs
                # consume the same PRNG stream (same artifacts);
                # curriculum draws for skipped minibatches too
                subs = []
                for _ in range(k):
                    key, sub = jax.random.split(key)
                    subs.append(sub)
                caps_b, feats_b = tables.gather(perm[i : i + k * batch_size])
                a2c_params, opt_state, stats, valid = chunk_fn(
                    a2c_params, opt_state, reward_params,
                    feats_b.reshape(k, batch_size, -1),
                    caps_b.reshape(k, batch_size, -1),
                    jnp.int32(1 if level is None else level), jnp.stack(subs),
                )
                state["params"] = a2c_params  # for the divergence guard's dump
                host_stats = jax.device_get(stats)
                host_valid = np.asarray(valid)
                for j in range(k):
                    # curriculum skip rule: invalid minibatches log nothing
                    if level is None or host_valid[j]:
                        resolve(jax.tree.map(lambda x, j=j: x[j], host_stats),
                                epoch, minibatch_id)
                    minibatch_id += 1
                i += k * batch_size
                bar.update(k)
            else:  # ragged tail: one single-step call
                key, sub = jax.random.split(key)
                caps_b, feats_b = tables.gather(perm[i:])
                curr = 1 if level is None else host_curr(caps_b)
                if curr >= 1:
                    a2c_params, opt_state, stats = step(
                        a2c_params, opt_state, reward_params,
                        feats_b, caps_b, jnp.int32(curr), sub,
                    )
                    state["params"] = a2c_params
                    resolve(stats, epoch, minibatch_id)
                minibatch_id += 1
                i = num
                bar.update(1)
        bar.close()
    else:
        batches, total = _epoch_batches(train_data, batch_size, rng, tables)
        bar = tqdm(batches, total=total, desc=desc)
        state["bar"] = bar
        for minibatch_id, (captions, features, _) in enumerate(bar):
            # draw BEFORE the skip rule: skipped minibatches consume a
            # key in the chunked path too (identical PRNG streams)
            key, sub = jax.random.split(key)
            if level is None:
                curr = 1  # rollout from <START>
            else:
                curr = host_curr(captions)
                if curr < 1:  # trainers.py:550
                    continue
            a2c_params, opt_state, stats = step(
                a2c_params, opt_state, reward_params,
                jnp.asarray(features), jnp.asarray(captions),
                jnp.int32(curr), sub,
            )
            state["params"] = a2c_params
            keeper.push(stats, epoch, minibatch_id)
        keeper.flush()
    return a2c_params, opt_state, key


def a2c_training(
    train_data: CocoData,
    a2c_params,
    reward_params,
    tx,
    opt_state,
    cfg: NetConfig,
    plot_dir: Optional[str],
    save_paths,
    batch_size: int,
    epochs: int,
    seed: int = 0,
    compat_batch_as_time: bool = False,
    device_data: bool = True,
    chunk_steps: int = 16,
    fused_rollout=None,
    mesh=None,
    train_state_path: Optional[str] = None,
    resume_state: Optional[dict] = None,
):
    """Core A2C loop (trainers.py:402-500).

    ``train_state_path`` snapshots the FULL training state (weights,
    Adam moments, both RNG streams, epoch position, best-loss
    bookkeeping) after every epoch via :func:`checkpoint
    .save_train_state`; passing the loaded snapshot back as
    ``resume_state`` continues the run bit-identically to the
    uninterrupted one on the same platform/kernel configuration (the
    reference restarts with fresh optimizer state and RNG streams,
    trainers.py:338-370). An interrupt mid-epoch loses only that
    epoch's work.

    ``chunk_steps > 1`` drives that many minibatch updates per host
    dispatch (one jitted scan — steps.make_a2c_chunk_step). The host
    derives one rollout key per minibatch with the same split discipline
    at every chunk length, so runs are bit-identical across
    ``chunk_steps`` settings (same trajectories, scalars, checkpoints);
    per-minibatch TB scalars come back one per step.

    ``mesh``: global data-sharded SPMD over all chips/hosts — params
    replicate, each process uploads only its shard of every episode
    batch, and GSPMD inserts the gradient all-reduce (see
    :func:`train_reward_network`).
    """
    writer = make_metrics_writer(plot_dir if is_main_process() else None)
    rng = np.random.default_rng(seed + 3)
    key = jax.random.PRNGKey(seed + 3)
    start_epoch, resume_best, resume_fused = 0, None, None
    if resume_state is not None:
        meta = resume_state["meta"]
        if meta.get("kind") != "a2c":
            raise ValueError(
                f"train-state kind {meta.get('kind')!r} cannot resume a "
                f"plain (non-curriculum) A2C run")
        a2c_params = resume_state["params"]
        opt_state = resume_state["opt_state"]
        key = resume_state["key"]
        rng.bit_generator.state = meta["rng_state"]
        start_epoch, resume_best = meta["epoch_done"], meta["best"]
        resume_fused = meta.get("fused")
    if start_epoch >= epochs and mesh is None:
        print_green(f"[Training] A2C Network already trained "
                    f"({start_epoch}/{epochs} epochs) — nothing to resume")
        writer.close()
        return a2c_params
    if compat_batch_as_time or cfg.bidirectional or mesh is not None:
        _forced_fused_conflict(fused_rollout, "--fused_rollout",
                               "with compat/bidirectional/--spmd")
        fused_rollout = False
    elif fused_rollout is None:  # auto: fused kernels when they verify
        fused_rollout = _resume_pin_fused(
            resume_fused,
            lambda: _probe_fused_rollout(cfg, a2c_params, reward_params),
            "rollout",
            announce=lambda f: print_green(
                f"[Training] fused rollout kernels "
                f"{'verified — training with Pallas rollout' if f else 'unavailable — XLA rollout'}"))
    step = steps.make_a2c_step(cfg, tx, per_step_mean=False, compat=compat_batch_as_time,
                               donate=True, fused=fused_rollout)
    batcher = None
    if mesh is not None:
        batcher, tables = _mesh_io(mesh, train_data)
        a2c_params, opt_state, reward_params = batcher.replicate(
            (a2c_params, opt_state, reward_params))
        raw_step = step

        def step(p, o, rp, f, c, curr, sub):  # noqa: F811
            return raw_step(p, o, rp, *batcher.shard(f, c), curr, sub)
    else:
        tables = _device_tables(train_data, device_data)
    use_chunks = chunk_steps > 1 and not compat_batch_as_time and tables is not None
    if use_chunks:
        raw_chunk = steps.make_a2c_chunk_step(cfg, tx, per_step_mean=False, fused=fused_rollout)
        if batcher is None:
            chunk_fn = raw_chunk
        else:
            def chunk_fn(p, o, rp, f, c, curr, subs):
                return raw_chunk(p, o, rp, *batcher.shard_stacked(f, c), curr, subs)

    state = {"best": float("inf") if resume_best is None else resume_best,
             "bar": None}

    def resolve(stats, epoch, minibatch_id):
        loss = float(stats.loss)
        check_finite(loss, "A2C Network",
                     f"epoch {epoch + 1}, minibatch {minibatch_id}",
                     dump_tree=state.get("params"),
                     dump_path=_diverged_path(save_paths))
        if loss < state["best"]:
            state["best"] = loss
            state["bar"].set_description_str(
                f"Training A2C Network ({epoch + 1}/{epochs}): Best Loss {loss}")
        n = global_minibatch_number(epoch, minibatch_id, batch_size)
        writer.add_scalar("A2C Network-episodic-loss", loss, n)
        writer.add_scalar("A2C Network-episodic-mean-rewards", float(stats.mean_reward), n)
        writer.add_scalar("A2C Network-episodic-mean-advantage", float(stats.mean_advantage), n)

    keeper = _DeferredBookkeeper(resolve)
    print_green("[Training] Training Advantage Actor-Critic Network")
    for epoch in range(start_epoch, epochs):
        _t_epoch = _time.perf_counter()
        a2c_params, opt_state, key = _drive_a2c_epoch(
            epoch=epoch,
            desc=f"Training A2C Network ({epoch + 1}/{epochs}): Best Loss {state['best']}",
            level=None, tables=tables, train_data=train_data,
            batch_size=batch_size, chunk_steps=chunk_steps,
            use_chunks=use_chunks,
            chunk_fn=chunk_fn if use_chunks else None, step=step,
            a2c_params=a2c_params, opt_state=opt_state,
            reward_params=reward_params, rng=rng, key=key,
            resolve=resolve, keeper=keeper, state=state,
        )
        _epoch_throughput(writer, "A2C Network",
                          math.ceil(tables.num_captions / batch_size)
                          if tables is not None
                          else math.ceil(train_data.train_captions.shape[0] / batch_size),
                          _time.perf_counter() - _t_epoch, epoch)
        if is_main_process():
            ckpt.save_to_paths(a2c_params, save_paths)  # every epoch (trainers.py:498)
            if train_state_path:
                ckpt.save_train_state(
                    train_state_path, a2c_params, opt_state, key,
                    {"kind": "a2c", "epoch_done": epoch + 1,
                     "best": state["best"],
                     "fused": fused_rollout,
                     "rng_state": rng.bit_generator.state})
    writer.close()
    return a2c_params


def a2c_curriculum_training(
    train_data: CocoData,
    a2c_params,
    reward_params,
    tx,
    opt_state,
    cfg: NetConfig,
    plot_dir: Optional[str],
    save_paths,
    batch_size: int,
    epochs: int,
    curriculum: Sequence[int],
    seed: int = 0,
    compat_batch_as_time: bool = False,
    device_data: bool = True,
    chunk_steps: int = 16,
    fused_rollout=None,
    mesh=None,
    train_state_path: Optional[str] = None,
    resume_state: Optional[dict] = None,
):
    """Curriculum A2C (trainers.py:503-616): per level, teacher-force the
    ground-truth prefix of length ``caplen - level`` and roll out the
    final ``level`` tokens.

    Like :func:`a2c_training`, ``chunk_steps > 1`` drives that many
    minibatch updates per host dispatch; the per-minibatch skip rule
    (``curr_seq_len < 1`` -> no update, no scalars, trainers.py:550)
    moves on device as a masked update, reported back through the
    chunk's validity mask so the logged artifacts are identical.
    ``mesh`` scales across chips/hosts exactly as in
    :func:`a2c_training`.

    ``train_state_path``/``resume_state``: per-epoch full-state
    snapshots carrying the curriculum position (level index + epoch
    within level) for bit-identical resume across level boundaries —
    see :func:`a2c_training`.
    """
    writer = make_metrics_writer(plot_dir if is_main_process() else None)
    rng = np.random.default_rng(seed + 4)
    key = jax.random.PRNGKey(seed + 4)
    curriculum = list(curriculum)
    start_level, start_epoch, resume_best, resume_fused = 0, 0, None, None
    if resume_state is not None:
        meta = resume_state["meta"]
        if meta.get("kind") != "a2c_curriculum":
            raise ValueError(
                f"train-state kind {meta.get('kind')!r} cannot resume a "
                f"curriculum A2C run")
        if meta["curriculum"] != curriculum:
            raise ValueError(
                f"train-state curriculum {meta['curriculum']} does not "
                f"match the requested {curriculum}")
        a2c_params = resume_state["params"]
        opt_state = resume_state["opt_state"]
        key = resume_state["key"]
        rng.bit_generator.state = meta["rng_state"]
        start_level, start_epoch = meta["level_idx"], meta["epoch_done"]
        resume_best = meta["best"]
        resume_fused = meta.get("fused")
        if start_epoch >= epochs:  # resumed at a level boundary
            start_level, start_epoch, resume_best = start_level + 1, 0, None
    if start_level >= len(curriculum) and mesh is None:
        print_green(f"[Training] curriculum already complete "
                    f"({len(curriculum)} levels) — nothing to resume")
        writer.close()
        return a2c_params
    if compat_batch_as_time or cfg.bidirectional or mesh is not None:
        _forced_fused_conflict(fused_rollout, "--fused_rollout",
                               "with compat/bidirectional/--spmd")
        fused_rollout = False
    elif fused_rollout is None:  # auto: fused kernels when they verify
        fused_rollout = _resume_pin_fused(
            resume_fused,
            lambda: _probe_fused_rollout(cfg, a2c_params, reward_params,
                                         per_step_mean=True, curriculum=True),
            "rollout",
            announce=lambda f: print_green(
                f"[Training] fused rollout kernels "
                f"{'verified — training with Pallas rollout' if f else 'unavailable — XLA rollout'}"))
    step = steps.make_a2c_step(cfg, tx, per_step_mean=True, compat=compat_batch_as_time,
                               donate=True, fused=fused_rollout)
    batcher = None
    if mesh is not None:
        batcher, tables = _mesh_io(mesh, train_data)
        a2c_params, opt_state, reward_params = batcher.replicate(
            (a2c_params, opt_state, reward_params))
        raw_step = step

        def step(p, o, rp, f, c, curr, sub):  # noqa: F811
            return raw_step(p, o, rp, *batcher.shard(f, c), curr, sub)
    else:
        tables = _device_tables(train_data, device_data)
    use_chunks = chunk_steps > 1 and not compat_batch_as_time and tables is not None
    if use_chunks:
        raw_chunk = steps.make_a2c_chunk_step(cfg, tx, per_step_mean=True, curriculum=True,
                                              fused=fused_rollout)
        if batcher is None:
            chunk_fn = raw_chunk
        else:
            def chunk_fn(p, o, rp, f, c, curr, subs):
                return raw_chunk(p, o, rp, *batcher.shard_stacked(f, c), curr, subs)

    print_green("[Training] Training Advantage Actor-Critic Network")
    print_green(f"[Training] mode set to curriculum training using levels: {list(curriculum)}")
    for level_idx, level in enumerate(curriculum):
        if level_idx < start_level:
            continue  # resumed past this level
        print_green(f"[Training] Training curriculum level: {level}")
        state = {"best": (resume_best if level_idx == start_level
                          and resume_best is not None else float("inf")),
                 "bar": None}

        def resolve(stats, epoch, minibatch_id, level=level, state=state):
            loss = float(stats.loss)
            check_finite(loss, f"A2C Curriculum Level {level}",
                         f"epoch {epoch + 1}, minibatch {minibatch_id}",
                         dump_tree=state.get("params"),
                         dump_path=_diverged_path(save_paths))
            if loss < state["best"]:
                state["best"] = loss
                state["bar"].set_description_str(
                    f"Training A2C Curriculum Level {level} ({epoch}/{epochs}): Best Loss: {loss}")
            n = global_minibatch_number(epoch, minibatch_id, batch_size)
            writer.add_scalar(f"A2C Curriculum Level-{level}-loss", loss, n)
            writer.add_scalar(f"A2C Curriculum Level-{level}-mean-rewards", float(stats.mean_reward), n)
            writer.add_scalar(f"A2C Curriculum Level-{level}-mean-advantage", float(stats.mean_advantage), n)

        keeper = _DeferredBookkeeper(resolve)
        first_epoch = start_epoch if level_idx == start_level else 0
        for epoch in range(first_epoch, epochs):
            a2c_params, opt_state, key = _drive_a2c_epoch(
                epoch=epoch,
                desc=(f"Training A2C Curriculum Level {level} "
                      f"({epoch}/{epochs}): Best Loss: {state['best']}"),
                level=level, tables=tables, train_data=train_data,
                batch_size=batch_size, chunk_steps=chunk_steps,
                use_chunks=use_chunks,
                chunk_fn=chunk_fn if use_chunks else None, step=step,
                a2c_params=a2c_params, opt_state=opt_state,
                reward_params=reward_params, rng=rng, key=key,
                resolve=resolve, keeper=keeper, state=state,
            )
            if is_main_process():
                ckpt.save_to_paths(a2c_params, save_paths)
                if train_state_path:
                    ckpt.save_train_state(
                        train_state_path, a2c_params, opt_state, key,
                        {"kind": "a2c_curriculum", "curriculum": curriculum,
                         "level_idx": level_idx, "epoch_done": epoch + 1,
                         "best": state["best"],
                         "fused": fused_rollout,
                         "rng_state": rng.bit_generator.state})
    writer.close()
    return a2c_params


def test_a2c_network(
    a2c_params,
    cfg: NetConfig,
    test_data: CocoData,
    image_caption_data: Dict[str, str],
    data_size: int,
    validation_batch_size: int = 128,
    dcfg: Optional[DecodeConfig] = None,
    seed: int = 0,
    eval_superbatch: int = 8,
    compat_dump: bool = False,
    use_fused_kernel=None,
    mesh=None,
):
    """Evaluation pass (trainers.py:619-665): value-guided beam decode of
    random val draws, dumping real/generated captions + image urls.

    Default (per-sample) mode pads ragged tail slices to the compiled
    batch width and trims after decode, so beam search compiles for
    exactly one shape. Faithful mode (``dcfg.per_sample_beams=False``)
    instead runs every slice at its exact size — padding rows would
    participate in the batch-mean beam ranking (Q2a) and perturb real
    samples — and uses the Q1-stateful beam (decode.beam_compat), whose
    value-encoder ``hidden_cell`` threads through all candidate
    evaluations within a slice and resets per slice, exactly like the
    reference (trainers.py:96,661) — including bidirectional models
    (per-direction carries).

    ``compat_dump=True`` reproduces quirk Q13: the reference writes each
    slice with ``file.write("\\n".join(lines))`` and *no trailing
    newline* (trainers.py:652-654), so the last line of slice ``i``
    merges with the first line of slice ``i+1`` — its shipped 40k-draw
    dump is 39,871 lines, not ~40,188. Both ref and hypo files merge
    identically (lines stay aligned), and the reference's published
    BLEU/CIDEr were computed on the merged corpus, so byte-faithful
    reproduction requires this mode. Default writes clean lines.

    ``use_fused_kernel``: ``None`` (default) = verified dispatch — the
    fused Pallas beam kernel serves the eval after token-exact agreement
    with the XLA beam on the first group, otherwise XLA does;
    ``True``/``False`` force one side. Applies to the default
    (per-sample, unidirectional) mode only.

    ``mesh``: a :class:`jax.sharding.Mesh` with a ``data`` axis shards
    each decode group across chips (per-sample mode only — the Q2
    batch-mean mode couples the whole batch); the fused kernel is
    single-chip, so a mesh takes precedence over it.
    """
    dcfg = dcfg or DecodeConfig(max_seq_len=cfg.max_seq_len)
    rng = np.random.default_rng(seed + 5)

    captions_all, features_all, urls_all = get_coco_batch(
        test_data, batch_size=data_size, split="val", rng=rng
    )

    faithful = not dcfg.per_sample_beams
    if use_fused_kernel:  # explicitly forced: never silently degrade
        if faithful:
            _forced_fused_conflict(True, "use_fused_kernel=True",
                                   "in faithful (batch-mean Q2) mode")
        if cfg.bidirectional:
            _forced_fused_conflict(True, "use_fused_kernel=True",
                                   "with a bidirectional model")
        if mesh is not None:
            _forced_fused_conflict(True, "use_fused_kernel=True",
                                   "on a mesh (the kernel is single-chip)")
    if faithful:
        from ..decode.beam_compat import beam_search_compat

        # Q1-stateful beam: fresh zero carry per slice (trainers.py:661)
        compat_jit = jax.jit(
            lambda pp, vp, f, s: beam_search_compat(pp, vp, cfg, dcfg, f, s)
        )
        decode = lambda f, s: compat_jit(  # noqa: E731
            a2c_params["policy"], a2c_params["value"], f, s
        )[:2]
    else:
        # carried-state beam serves both direction modes (bidi: one
        # extra backward cell per step — models/policy.py); params as
        # jit arguments (closures embed them as program constants)
        decode_jit = jax.jit(lambda pp, vp, f, s: beam_search(pp, vp, cfg, dcfg, f, s))
        xla_decode = lambda f, s: decode_jit(  # noqa: E731
            a2c_params["policy"], a2c_params["value"], f, s
        )
        decode = xla_decode
        if mesh is not None:
            # serve.sharded_beam_tokens shards the per-sample beam
            # (bidirectional models ride the same carried scan)
            from ..parallel.serve import sharded_beam_tokens

            decode = lambda f, s: sharded_beam_tokens(  # noqa: E731
                mesh, a2c_params["policy"], a2c_params["value"], cfg, dcfg, f, s
            )
        elif not cfg.bidirectional and use_fused_kernel is not False:
            # Fused Pallas beam via verified dispatch: the first group is
            # decoded by both the kernel and the XLA beam; exact token
            # agreement locks in the kernel (~2.3x) for the remaining
            # groups, anything else (divergence on near-tie-dominated
            # weights, no Mosaic backend on CPU) locks in XLA.
            def fused_decode(f, s):
                from ..ops.pallas_beam import fused_beam_search

                return fused_beam_search(
                    a2c_params["policy"], a2c_params["value"], f, s,
                    max_len=dcfg.max_seq_len, beam=dcfg.beam_size, block_n=0,
                    value_weight=dcfg.value_weight,
                    logprob_weight=dcfg.logprob_weight,
                )

            if use_fused_kernel:  # explicitly forced
                decode = fused_decode
            else:
                from ..utils.dispatch import VerifiedDispatch

                decode = VerifiedDispatch(
                    fused_decode, xla_decode,
                    equal=lambda a, b: np.array_equal(
                        np.asarray(a[0][:, 0]), np.asarray(b[0][:, 0])
                    ),
                    on_verdict=lambda ok, exc: print_green(
                        "[Testing] fused beam kernel "
                        + ("verified on canary batch — serving with the Pallas kernel"
                           if ok
                           else "diverged/unavailable on canary — using the XLA beam")
                    ),
                )

    width = validation_batch_size - 1  # Q9: 127-wide slices per 128 stride
    # Q9 slices of the random draw, exactly as the reference walks them
    slices = [
        (captions_all[i : i + width], features_all[i : i + width], urls_all[i : i + width])
        for i in range(0, len(captions_all), validation_batch_size)
    ]
    slices = [s for s in slices if s[0].shape[0] > 0]
    # Per-sample beams are independent across images, so consecutive
    # slices can share one device call (8x fewer dispatches) without
    # changing any output line. The faithful batch-mean mode couples the
    # whole decode batch (Q2), so it keeps one call per slice and runs
    # the ragged tail at its exact size (one extra compile).
    group = eval_superbatch if dcfg.per_sample_beams else 1
    gwidth = width * group

    def write_slice(f, lines):
        if compat_dump:
            f.write("\n".join(lines))  # Q13: no trailing newline
        else:
            f.write("\n".join(lines) + "\n")

    # multi-host: every process participates in the sharded decodes, but
    # only process 0 materializes the caption dumps
    def _open_gated(path: str):
        import os as _os

        return open(path if is_main_process() else _os.devnull, "a")

    with _open_gated(image_caption_data["real_captions_path"]) as real_f, \
         _open_gated(image_caption_data["generated_captions_path"]) as gen_f, \
         _open_gated(image_caption_data["image_urls_path"]) as url_f:
        for g in tqdm(range(0, len(slices), group), desc="Testing model"):
            batch = slices[g : g + group]
            captions_real = np.concatenate([b[0] for b in batch], axis=0)
            features_real = np.concatenate([b[1] for b in batch], axis=0)
            n_real = captions_real.shape[0]
            if n_real < gwidth and not faithful:  # pad to the compiled width
                pad = gwidth - n_real
                features_real = np.concatenate(
                    [features_real, np.repeat(features_real[-1:], pad, axis=0)], axis=0
                )
                captions_real = np.concatenate(
                    [captions_real, np.repeat(captions_real[-1:], pad, axis=0)], axis=0
                )
            toks, _ = decode(jnp.asarray(features_real), jnp.asarray(captions_real[:, 0]))
            gen_all = np.asarray(toks[:n_real, 0])  # most_likely = beam 0
            # write per original slice, preserving the reference's cadence
            off = 0
            for caps_s, _, urls_s in batch:
                n_s = caps_s.shape[0]
                gen_strs = decode_captions(gen_all[off : off + n_s], test_data.idx_to_word)
                real_strs = decode_captions(caps_s, test_data.idx_to_word)
                write_slice(real_f, real_strs)
                write_slice(gen_f, gen_strs)
                write_slice(url_f, urls_s.tolist())
                off += n_s
            real_f.flush(); gen_f.flush(); url_f.flush()


def load_a2c_models(model_path: str, train_data: CocoData, network_paths: Dict[str, str], bidirectional: bool, mesh=None, net_dims: Optional[Dict[str, int]] = None):
    """Load a finished A2C model for testing (utilities.py:299-323):
    policy and value nets from their own checkpoints, then the joint
    a2c checkpoint layered on top.

    ``mesh``: on a multi-process mesh the load runs rank-0-only and
    broadcasts (:func:`_sync_load`) — ranks branching on LOCAL file
    existence would disagree without a shared filesystem and hang the
    first sharded-eval collective."""
    cfg = _cfg_for(train_data, bidirectional, net_dims)

    def load():
        pparams = _load_or_fail("policy", network_paths["policy_network"], cfg, train_data, bidirectional)
        vparams = _load_or_fail("value", network_paths["value_network"], cfg, train_data, bidirectional)
        template = {"value": vparams, "policy": pparams}
        return ckpt.load_network("a2c", model_path, template=template, bidirectional=bidirectional)

    def template():
        return {
            "value": value_mod.init(jax.random.PRNGKey(0), cfg, train_data.embeddings),
            "policy": policy_mod.init(jax.random.PRNGKey(0), cfg, train_data.embeddings),
        }

    a2c_params = _sync_load(
        load, template, mesh is not None and jax.process_count() > 1)
    return a2c_params, cfg
