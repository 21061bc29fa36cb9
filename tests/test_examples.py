"""Smoke-run every example script (~30 iters, CPU, reduced scale).

The reference's de-facto validation layer is its example scripts
(tf1_examples/, tf2_examples/ — SURVEY.md §4); ours are kept runnable by
this test so they cannot silently rot. Each example honours
OPENREC_EXAMPLE_ITERS / OPENREC_EXAMPLE_EVAL_INTERVAL /
OPENREC_EXAMPLE_SMALL quick-run overrides.

Each example runs in a subprocess (examples configure their own
trainers/devices); the subprocess forces the CPU backend before the
example executes (the axon sitecustomize registers the TPU in every
process — CLAUDE.md).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES_DIR = os.path.join(REPO, "examples")

MULTICHIP = {"multichip_trainer.py", "dlrm_criteo_multichip.py"}

EXAMPLES = sorted(f for f in os.listdir(EXAMPLES_DIR)
                  if f.endswith(".py"))


def test_every_example_is_covered():
    """New example scripts must stay in the smoke matrix."""
    assert EXAMPLES, EXAMPLES_DIR


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_smoke(name, tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["OPENREC_EXAMPLE_ITERS"] = "31"
    env["OPENREC_EXAMPLE_EVAL_INTERVAL"] = "30"
    env["OPENREC_EXAMPLE_SMALL"] = "1"
    if name in MULTICHIP:
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    driver = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import runpy; "
        f"runpy.run_path({os.path.join(EXAMPLES_DIR, name)!r}, "
        "run_name='__main__')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", driver],
        cwd=tmp_path, env=env, timeout=600,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    assert proc.returncode == 0, f"{name} failed:\n{proc.stdout[-4000:]}"
