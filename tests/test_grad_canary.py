"""Gradient-level canaries for the fused-kernel auto-probes.

Round-2 probes compared only the LOSS of the fused Pallas training
steps against their XLA twins — a backward-kernel regression that
preserves the forward value would have passed the canary and silently
corrupted training. The round-3 probes add a gradient fingerprint
(per-leaf cosine + norm ratio, train/loops.py:_grads_agree); these
tests prove the fingerprint rejects a deliberately perturbed VJP whose
FORWARD VALUE IS UNCHANGED, and accepts honest kernels.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import a2c, policy, reward, value
from image_captioning_through_rl_tpu.train import loops, steps

CFG = NetConfig(vocab_size=32, input_dim=8, wordvec_dim=8, hidden_dim=8,
                max_seq_len=9)


def _grad_scaled(fn, scale):
    """Wrap ``fn(params, ...)`` so its value is identical but its
    parameter gradient is multiplied by ``scale`` — the canonical
    loss-preserving backward corruption.

    ``params + (scale-1)*(params - stop_grad(params))`` evaluates to
    ``params`` exactly, while d/dparams picks up the factor."""
    def wrapped(params, *args, **kwargs):
        p2 = jax.tree.map(
            lambda x: jax.lax.stop_gradient(x)
            + scale * (x - jax.lax.stop_gradient(x)),
            params,
        )
        return fn(p2, *args, **kwargs)
    return wrapped


def test_grads_agree_accepts_self_and_rejects_scale_and_direction():
    g = {"w": jnp.asarray(np.random.default_rng(0).standard_normal((4, 4))),
         "b": jnp.zeros(4)}
    assert loops._grads_agree(g, g) is True
    scaled = jax.tree.map(lambda x: 1.2 * x, g)
    assert loops._grads_agree(scaled, g) is False  # norm ratio
    flipped = {"w": -g["w"], "b": g["b"]}
    assert loops._grads_agree(flipped, g) is False  # cosine


@pytest.mark.slow
def test_policy_probe_rejects_value_preserving_vjp_corruption(monkeypatch):
    params = policy.init(jax.random.PRNGKey(0), CFG)

    # honest twin: fused == XLA exactly -> probe accepts (on CPU via the
    # interpret escape hatch; losses and grads are bitwise equal)
    monkeypatch.setattr(
        steps, "policy_loss_fused",
        lambda p, cfg, f, c, l, **kw: steps.policy_loss(p, cfg, f, c, l),
    )
    assert loops._probe_fused_policy(CFG, params, interpret=True) is True

    # corrupted VJP: same loss, gradient x1.3 -> the round-2 loss-only
    # probe would PASS this; the gradient fingerprint must reject it
    monkeypatch.setattr(
        steps, "policy_loss_fused",
        _grad_scaled(lambda p, cfg, f, c, l, **kw: steps.policy_loss(p, cfg, f, c, l), 1.3),
    )
    assert loops._probe_fused_policy(CFG, params, interpret=True) is False


def test_rollout_probe_rejects_value_preserving_vjp_corruption(monkeypatch):
    aparams = a2c.init(jax.random.PRNGKey(1), CFG)
    rparams = reward.init(jax.random.PRNGKey(2), CFG)

    monkeypatch.setattr(
        steps, "a2c_rollout_loss_fused",
        lambda p, *a, interpret=False, **kw: steps.a2c_rollout_loss(p, *a, **kw),
    )
    assert loops._probe_fused_rollout(CFG, aparams, rparams, interpret=True) is True

    monkeypatch.setattr(
        steps, "a2c_rollout_loss_fused",
        _grad_scaled(
            lambda p, *a, interpret=False, **kw: steps.a2c_rollout_loss(p, *a, **kw),
            1.3,
        ),
    )
    assert loops._probe_fused_rollout(CFG, aparams, rparams, interpret=True) is False


def test_reward_probe_rejects_value_preserving_vjp_corruption():
    params = reward.init(jax.random.PRNGKey(3), CFG)
    xla = lambda p, f, c: steps.reward_loss(p, CFG, f, c)  # noqa: E731
    assert loops._probe_fused_pair(xla, xla, CFG, params, interpret=True) is True
    assert loops._probe_fused_pair(
        _grad_scaled(xla, 1.3), xla, CFG, params, interpret=True
    ) is False


def test_value_probe_rejects_value_preserving_vjp_corruption(monkeypatch):
    vparams = value.init(jax.random.PRNGKey(4), CFG)
    pparams = policy.init(jax.random.PRNGKey(5), CFG)
    rparams = reward.init(jax.random.PRNGKey(6), CFG)

    orig = steps.value_episode_loss

    def honest(vp, cfg, pp, rp, f, c, pl, fused=False, interpret=False):
        # route "fused" through the XLA path so the probe runs on CPU
        return orig(vp, cfg, pp, rp, f, c, pl, fused=False)

    monkeypatch.setattr(steps, "value_episode_loss", honest)
    assert loops._probe_fused_value(
        CFG, vparams, pparams, rparams, interpret=True) is True

    def corrupted(vp, cfg, pp, rp, f, c, pl, fused=False, interpret=False):
        if not fused:
            return orig(vp, cfg, pp, rp, f, c, pl, fused=False)
        return _grad_scaled(
            lambda v, *a: orig(v, cfg, pp, rp, f, c, pl, fused=False), 1.3
        )(vp)

    monkeypatch.setattr(steps, "value_episode_loss", corrupted)
    assert loops._probe_fused_value(
        CFG, vparams, pparams, rparams, interpret=True) is False


@pytest.mark.slow
def test_policy_probe_accepts_real_fused_kernels_interpret():
    """The REAL Pallas LSTM-chain kernels (interpreter mode) pass the
    gradient-level probe — the hand-written VJP agrees with XLA autodiff
    at fingerprint tolerance."""
    params = policy.init(jax.random.PRNGKey(7), CFG)
    assert loops._probe_fused_policy(CFG, params, interpret=True) is True
