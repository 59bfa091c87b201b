"""CLI smoke tests: every entry point imports and prints --help (catches
wiring/import regressions without TPU runs)."""
import subprocess
import sys

import pytest

CLIS = ["train_shape_ae", "train_diffusion", "sample", "sample_sweep",
        "evaluate", "build_profiles"]


@pytest.mark.parametrize("cli", CLIS)
def test_cli_help(cli):
    out = subprocess.run(
        [sys.executable, "-m", f"shapemol_tpu.cli.{cli}", "--help"],
        capture_output=True, text=True, timeout=240,
        env={"PYTHONPATH": "/root/repo:/root/.axon_site",
             "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
             "PATH": "/usr/local/bin:/usr/bin:/bin:/opt/venv/bin",
             "HOME": "/root"})
    assert out.returncode == 0, out.stderr[-500:]
    assert "usage" in out.stdout.lower()
