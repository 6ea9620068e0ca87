"""Utils: metric writers, profiling timer, live-array report."""

import json
import os

import jax.numpy as jnp

from image_captioning_through_rl_tpu.utils import (
    StepTimer,
    global_minibatch_number,
    live_array_report,
    make_metrics_writer,
)


def test_jsonl_writer_tags(tmp_path):
    w = make_metrics_writer(str(tmp_path), tensorboard=False)
    w.add_scalar("Reward Network-loss", 1.5, 0)
    w.add_scalar("A2C Network-episodic-loss", 0.25, 7)
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0] == {"tag": "Reward Network-loss", "value": 1.5, "step": 0}
    assert lines[1]["step"] == 7


def test_global_minibatch_number_reference_formula():
    # epoch * batch_size + batch_id (quirk Q10)
    assert global_minibatch_number(3, 5, 512) == 3 * 512 + 5


def test_step_timer_skips_warmup():
    t = StepTimer(skip=1)
    for _ in range(3):
        with t:
            pass
    assert len(t.samples_ms) == 2
    assert t.mean_ms >= 0.0


def test_live_array_report():
    x = jnp.ones((128, 128))
    report = live_array_report()
    assert "live device arrays" in report
    del x
