"""Failure detection: the non-finite-loss guard (train/guard.py).

The reference has no failure detection (SURVEY §5): a NaN loss poisons
Adam and the run keeps going. Here the first non-finite loss raises
TrainingDiverged with a post-mortem weight dump, at every loss-readback
site (best-loss pretrainers, chunked and not; A2C; curriculum).
"""

import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_captioning_through_rl_tpu.train.guard import (TrainingDiverged,
                                                         check_finite)


def test_check_finite_passes_finite():
    check_finite(0.0, "X", "here")
    check_finite(-1e30, "X", "here")


@pytest.mark.parametrize("bad", [float("nan"), float("inf"), float("-inf")])
def test_check_finite_raises(bad):
    with pytest.raises(TrainingDiverged, match="X loss became"):
        check_finite(bad, "X", "epoch 1, minibatch 2")


def test_check_finite_env_escape_hatch(monkeypatch):
    monkeypatch.setenv("ICRL_NO_NAN_GUARD", "1")
    check_finite(float("nan"), "X", "here")  # reference behavior: no raise


@pytest.mark.parametrize("val", ["0", "", "false", "no"])
def test_guard_stays_armed_on_falsy_env(monkeypatch, val):
    """ICRL_NO_NAN_GUARD=0 (a wrapper's 'do not disable') must keep the
    guard ON — only an affirmative value disables it."""
    monkeypatch.setenv("ICRL_NO_NAN_GUARD", val)
    with pytest.raises(TrainingDiverged):
        check_finite(float("nan"), "X", "here")


def test_check_finite_dumps_weights(tmp_path):
    tree = {"w": jnp.arange(4.0)}
    path = str(tmp_path / "net.ckpt.diverged")
    with pytest.raises(TrainingDiverged, match="dumped to"):
        check_finite(float("nan"), "X", "here", dump_tree=tree,
                     dump_path=path)
    assert os.path.exists(path)
    from image_captioning_through_rl_tpu.train import checkpoint as ckpt

    restored = ckpt.load_pytree({"w": jnp.zeros(4)}, path)
    np.testing.assert_array_equal(np.asarray(restored["w"]), [0, 1, 2, 3])


def test_dump_failure_does_not_mask(tmp_path):
    # unserializable tree -> the dump fails but the diagnosis survives
    with pytest.raises(TrainingDiverged, match="dump .* failed"):
        check_finite(float("inf"), "X", "here",
                     dump_tree={"w": object()},
                     dump_path=str(tmp_path / "sub" / "x.diverged"))


# ---- integration: the drivers raise at their real call sites ----


@pytest.fixture(scope="module")
def coco_data(tmp_path_factory):
    from image_captioning_through_rl_tpu.data import make_synthetic_coco
    from image_captioning_through_rl_tpu.data.coco import load_data

    d = make_synthetic_coco(
        str(tmp_path_factory.mktemp("coco")), num_train_images=8,
        num_val_images=4, captions_per_image=2, vocab_size=30,
        feature_dim=16, seed=3)
    return load_data(d)


def test_best_loss_driver_raises_non_chunked(coco_data, tmp_path):
    from image_captioning_through_rl_tpu.train.loops import (
        _drive_best_loss_training)
    from image_captioning_through_rl_tpu.utils.logging import (
        make_metrics_writer)

    calls = {"n": 0}

    def nan_after_two(params, opt, feats, caps):
        calls["n"] += 1
        loss = jnp.float32(1.0 if calls["n"] < 3 else float("nan"))
        return params, opt, loss

    ckpt_path = str(tmp_path / "policyNetwork.ckpt")
    with pytest.raises(TrainingDiverged, match="Policy .* minibatch 2"):
        _drive_best_loss_training(
            "Training Policy Network", "Policy Network-loss", ckpt_path,
            make_metrics_writer(None), epochs=1, batch_size=4,
            rng=np.random.default_rng(0), train_data=coco_data,
            tables=None, params={"w": jnp.zeros(2)}, opt_state=None,
            single_step=nan_after_two)
    assert os.path.exists(ckpt_path + ".diverged")


def test_best_loss_driver_raises_chunked(tmp_path):
    from image_captioning_through_rl_tpu.train.loops import (
        _drive_best_loss_training)
    from image_captioning_through_rl_tpu.utils.logging import (
        make_metrics_writer)

    class FakeTables:
        num_captions = 8

        def gather(self, idx):
            n = len(idx)
            return (jnp.zeros((n, 4), jnp.int32), jnp.zeros((n, 4)))

    def chunk_step(params, opt, best, feats, caps):
        k = feats.shape[0]
        losses = jnp.full((k,), 1.0).at[1].set(jnp.float32("nan"))
        return params, opt, losses, params, jnp.float32(1.0), jnp.bool_(False)

    ckpt_path = str(tmp_path / "rewardNetwork.ckpt")
    with pytest.raises(TrainingDiverged, match="Reward .* minibatch 1"):
        _drive_best_loss_training(
            "Training Reward Network", "Reward Network-loss", ckpt_path,
            make_metrics_writer(None), epochs=1, batch_size=4,
            rng=np.random.default_rng(0), train_data=None,
            tables=FakeTables(), params={"w": jnp.zeros(2)},
            opt_state=None, single_step=None, chunk_step=chunk_step,
            chunk_steps=2)
    assert os.path.exists(ckpt_path + ".diverged")


def test_a2c_training_raises_and_dumps(coco_data, tmp_path, monkeypatch):
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import NetConfig
    from image_captioning_through_rl_tpu.train.optim import adam

    def fake_make_a2c_step(cfg, tx, **kw):
        def step(p, o, rp, feats, caps, curr, sub):
            stats = types.SimpleNamespace(
                loss=jnp.float32("nan"), mean_reward=jnp.float32(0),
                mean_advantage=jnp.float32(0))
            return p, o, stats
        return step

    monkeypatch.setattr(loops.steps, "make_a2c_step", fake_make_a2c_step)
    cfg = NetConfig.for_vocab(coco_data.word_to_idx, None, input_dim=16,
                              wordvec_dim=8, hidden_dim=8)
    tx = adam(1e-3)
    params = {"w": jnp.zeros(3)}
    save_path = str(tmp_path / "a2cNetwork.ckpt")
    with pytest.raises(TrainingDiverged, match="A2C Network .* minibatch 0"):
        loops.a2c_training(
            coco_data, params, {"r": jnp.zeros(2)}, tx, tx.init(params),
            cfg, None, [save_path], batch_size=4, epochs=1,
            device_data=False, chunk_steps=1, fused_rollout=False)
    assert os.path.exists(save_path + ".diverged")
