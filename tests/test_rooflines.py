"""The analytic roofline/scaling model is load-bearing for BENCHMARKS'
%-of-SOL and weak-scaling claims — pin its arithmetic so an edit can't
silently shift the published numbers."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

import rooflines as rf  # noqa: E402


def test_hand_derived_sol_numbers_reproduced():
    """BENCHMARKS.md's hand-derived rooflines (greedy 16.7 ms, A2C
    ~1.7 ms MXU-bound) fall out of the shape constants."""
    flops, hbm = rf.path_greedy(32768)
    assert flops / rf.MXU_BF16 * 1e3 == pytest.approx(16.7, rel=0.01)
    flops, hbm = rf.path_a2c(512)
    assert flops / rf.MXU_BF16 * 1e3 == pytest.approx(1.67, rel=0.01)
    # every training path is MXU-bound (HBM ms < MXU ms)
    for name in ("policy_xe", "reward_vse", "value_mse", "a2c"):
        f, b = rf.PATHS[name][0](rf.PATHS[name][1])
        assert f / rf.MXU_BF16 >= b / rf.HBM


def test_a2c_grads_are_policy_plus_value():
    """The A2C step trains exactly the policy+value stacks — its psum
    payload must be their sum (the frozen reward net contributes no
    gradient)."""
    assert rf.params_a2c() == rf.params_policy() + rf.params_value()


def test_allreduce_ring_identity():
    # 1 chip: no collective
    assert rf.allreduce_ms(1e9, 1) == 0.0
    # 2-chip ring moves 2*V*(1/2) = V bytes over the axis
    assert rf.allreduce_ms(9.0e10, 2) == pytest.approx(1e3)
    # doubling axes halves it; N->inf approaches 2V/W
    assert rf.allreduce_ms(1e8, 8, axes=2) == pytest.approx(
        rf.allreduce_ms(1e8, 8, axes=1) / 2)
    assert rf.allreduce_ms(1e8, 10**6) == pytest.approx(
        2e8 / rf.ICI_AXIS * 1e3, rel=1e-3)


def test_dp_model_bounds():
    comms, e_serial, e_overlap = rf.dp_model(3.0, rf.params_a2c(), 8)
    assert 0 < comms < 3.0          # psum shorter than the step
    assert 0.5 < e_serial < 1.0     # serial floor is a real tax
    assert e_overlap == 1.0         # ...that full overlap hides
    assert e_serial == pytest.approx(3.0 / (3.0 + comms))
    # bf16 grads halve the payload
    c2, _, _ = rf.dp_model(3.0, rf.params_a2c(), 8, grad_bytes_per_param=2)
    assert c2 == pytest.approx(comms / 2)


def test_every_path_has_a_grad_entry():
    assert set(rf.GRAD_PARAMS) == set(rf.PATHS)
    # decode/extract paths carry no collectives
    for name in ("greedy@32768", "beam5@127", "vgg_f32@64", "vgg_bf16@64"):
        assert rf.GRAD_PARAMS[name] is None
