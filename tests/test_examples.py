"""The examples/ scripts must actually run.

Each is executed as a user would (fresh subprocess, repo root on
PYTHONPATH) with ICRL_EXAMPLE_CPU=1 so the drive works on any machine;
a failing example is a broken public-API contract, not a docs problem.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(REPO, "examples")) if f.endswith(".py")
)


def test_every_example_is_covered():
    """Catch a new example script that forgets to land in EXPECTED (and
    therefore in the README table)."""
    assert EXAMPLES == [
        "01_train_and_eval.py",
        "02_caption_and_sample.py",
        "03_serve_and_client.py",
        "04_spmd_mesh.py",
        "05_reference_checkpoints.py",
    ]
    readme = open(os.path.join(REPO, "examples", "README.md")).read()
    for name in EXAMPLES:
        assert name in readme


@pytest.mark.slow
@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs(script):
    env = dict(os.environ)
    env["ICRL_EXAMPLE_CPU"] = "1"
    # never OVERWRITE PYTHONPATH (the TPU plugin rides it in some envs)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{script} failed\n--- stdout ---\n{proc.stdout}\n"
        f"--- stderr ---\n{proc.stderr}"
    )
    assert proc.stdout.strip()  # every example prints something
