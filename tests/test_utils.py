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


def test_step_timing_meter_opt_in(tmp_path, monkeypatch):
    """ICRL_STEP_TIMING=1 adds per-epoch throughput scalars; the default
    metric log carries only the reference's tags."""
    import json

    import jax

    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import NetConfig as NC
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco

    monkeypatch.setattr(
        loops, "_cfg_for",
        lambda d, b, nd=None: NC.for_vocab(d.word_to_idx, d.embeddings, bidirectional=b,
                                  input_dim=16, wordvec_dim=8, hidden_dim=8),
    )
    fixture = make_synthetic_coco(str(tmp_path / "coco"), num_train_images=4,
                                  num_val_images=2, vocab_size=30,
                                  feature_dim=16, seed=2)
    data = load_data(fixture)

    def tags_of(sub, timing):
        if timing:
            monkeypatch.setenv("ICRL_STEP_TIMING", "1")
        else:
            monkeypatch.delenv("ICRL_STEP_TIMING", raising=False)
        plot = tmp_path / sub
        plot.mkdir()
        loops.train_policy_network(
            data, {"policy_network": str(tmp_path / f"{sub}.ckpt")},
            str(plot), False, epochs=1, batch_size=8, seed=0, chunk_steps=2)
        log = next(plot.glob("**/*.jsonl"), None)
        if log is None:
            return set()
        return {json.loads(l)["tag"] for l in open(log) if l.strip()}

    plain = tags_of("plain", False)
    timed = tags_of("timed", True)
    assert not any("steps_per_sec" in t for t in plain)
    assert any("steps_per_sec" in t for t in timed)


def test_atomic_write_contract(tmp_path):
    """The shared writer (utils.io.atomic_write) publishes complete
    files with umask-governed permissions (not mkstemp's 0600 — the
    ADVICE-r2 regression) and leaves nothing behind on error."""
    import os
    import stat

    from image_captioning_through_rl_tpu.utils.io import UMASK, atomic_write

    p = tmp_path / "sub" / "out.bin"
    with atomic_write(str(p)) as f:
        f.write(b"payload")
    assert p.read_bytes() == b"payload"
    assert stat.S_IMODE(os.stat(p).st_mode) == 0o666 & ~UMASK

    class Boom(Exception):
        pass

    try:
        with atomic_write(str(tmp_path / "sub" / "bad.bin")) as f:
            f.write(b"partial")
            raise Boom()
    except Boom:
        pass
    # no temp or partial file published
    assert sorted(x.name for x in (tmp_path / "sub").iterdir()) == ["out.bin"]


def test_atomic_path_contract(tmp_path):
    """The path-yielding variant (for h5py/np.savez writers) shares the
    atomic_write contract: complete publish, umask perms, nothing left
    behind on error."""
    import os
    import stat

    from image_captioning_through_rl_tpu.utils.io import UMASK, atomic_path

    p = tmp_path / "sub" / "out.h5"
    with atomic_path(str(p)) as tmp:
        with open(tmp, "wb") as f:
            f.write(b"h5payload")
    assert p.read_bytes() == b"h5payload"
    assert stat.S_IMODE(os.stat(p).st_mode) == 0o666 & ~UMASK

    class Boom(Exception):
        pass

    try:
        with atomic_path(str(tmp_path / "sub" / "bad.h5")) as tmp:
            with open(tmp, "wb") as f:
                f.write(b"partial")
            raise Boom()
    except Boom:
        pass
    assert sorted(x.name for x in (tmp_path / "sub").iterdir()) == ["out.h5"]


def test_trace_writes_device_trace(tmp_path):
    """utils.profiling.trace captures a loadable profiler trace (CPU
    here; the axon tunnel hangs start_trace — documented, TPU-pod
    deployments use real backends). Reached from the CLI via
    --profile_dir."""
    import jax
    import jax.numpy as jnp

    from image_captioning_through_rl_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        jnp.dot(jnp.ones((8, 8)), jnp.ones((8, 8))).block_until_ready()
    produced = [p for p in tmp_path.rglob("*") if p.is_file()]
    assert produced, "no trace artifacts written"


def test_profile_dir_flag_exists():
    from image_captioning_through_rl_tpu.cli.main import build_arg_parser

    ns = build_arg_parser().parse_args(["--profile_dir", "/tmp/x"])
    assert ns.profile_dir == "/tmp/x"
