"""Crash recovery, end to end and for real: SIGKILL a live CLI training
run mid-A2C, rerun with ``--resume``, and the final checkpoint must be
byte-identical to an uninterrupted run's.

This is the whole failure-recovery stack under a genuine ``kill -9``
(no atexit, no finally blocks): atomic snapshot writes survive the
kill, the orchestrator continues completed pretraining from its
trainstates, and the A2C loop resumes weights + Adam moments + RNG
streams + epoch position exactly. The reference has nothing comparable
(SURVEY §5 "failure detection: absent"; its resume reloads weights
only, trainers.py:338-370).
"""

import os
import signal
import subprocess
import sys
import time

import pytest

from image_captioning_through_rl_tpu.data import make_synthetic_coco

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # prepend, never overwrite (the TPU plugin path must survive)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _cli_args(fixture, mp_dir, epochs, extra=()):
    return [sys.executable, os.path.join(REPO, "image_captioner.py"),
            "--data_dir", fixture, "--epochs", str(epochs),
            "--batch_size", "8", "--test_size", "4",
            "--chunk_steps", "2", "--seed", "1",
            "--input_dim", "32", "--wordvec_dim", "16", "--hidden_dim", "16",
            "--pretrained_path", mp_dir, *extra]


def test_cli_sigkill_resume(tmp_path):
    fixture = make_synthetic_coco(
        str(tmp_path / "coco"), num_train_images=24, num_val_images=8,
        captions_per_image=2, vocab_size=30, feature_dim=32, seed=9)
    env = _env()
    epochs = 10  # enough A2C epochs that the kill lands mid-run
    # (the SIGKILL fires as soon as the FIRST a2c snapshot appears, so
    # any epoch count that keeps the process alive past epoch 1 works;
    # 10 keeps the three CLI runs ~3x cheaper than 30 in the suite)

    # --- uninterrupted oracle run ---
    mp_a = str(tmp_path / "mpA")
    cwd_a = str(tmp_path / "runA")
    os.makedirs(mp_a), os.makedirs(cwd_a)
    subprocess.run(_cli_args(fixture, mp_a, epochs), env=env, cwd=cwd_a,
                   check=True, timeout=1800, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)

    # --- interrupted run: SIGKILL once the first A2C snapshot lands ---
    mp_b = str(tmp_path / "mpB")
    cwd_b = str(tmp_path / "runB")
    os.makedirs(mp_b), os.makedirs(cwd_b)
    ts_file = os.path.join(mp_b, "a2cNetwork.ckpt.trainstate")
    proc = subprocess.Popen(_cli_args(fixture, mp_b, epochs), env=env,
                            cwd=cwd_b, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 1800
        while not os.path.exists(ts_file):
            if proc.poll() is not None:
                pytest.fail("CLI run exited before the first A2C snapshot")
            if time.time() > deadline:
                pytest.fail("timed out waiting for the first A2C snapshot")
            time.sleep(0.2)
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)  # kill -9: nothing cleans up
        proc.wait(timeout=60)
    assert proc.returncode != 0  # really died

    # --- resume to completion ---
    cwd_c = str(tmp_path / "runC")
    os.makedirs(cwd_c)
    subprocess.run(_cli_args(fixture, mp_b, epochs, extra=("--resume",)),
                   env=env, cwd=cwd_c, check=True, timeout=1800,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    with open(os.path.join(mp_a, "a2cNetwork.ckpt"), "rb") as f:
        oracle = f.read()
    with open(os.path.join(mp_b, "a2cNetwork.ckpt"), "rb") as f:
        recovered = f.read()
    assert oracle == recovered  # byte-identical final weights
