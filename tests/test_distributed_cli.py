"""2-process fake-cluster test of the CLI entry points (VERDICT r2 item 7):
stage-1 training through cli.train_shape_ae's sharded step and one
cli.sample_sweep bucket with per-process target auto-sharding."""
import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cli_cluster(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("PALLAS_AXON")}     # keep workers off the TPU
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "_dist_cli_worker.py"),
         str(port), str(pid), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]

    checks, sweeps = {}, {}
    for out in outs:
        m = re.search(r"S1RESULT pid=(\d) checksum=([\d.]+)", out)
        assert m, out[-4000:]
        checks[int(m.group(1))] = m.group(2)
        m = re.search(r"SWEEPRESULT pid=(\d) targets=(\[[\d, ]*\])", out)
        assert m, out[-4000:]
        sweeps[int(m.group(1))] = m.group(2)
    # stage-1 params identical across hosts (synchronized SPMD training)
    assert checks[0] == checks[1], checks
    # sweep auto-sharding: process p handles targets [p::2]
    assert sweeps[0] == "[0, 2]" and sweeps[1] == "[1, 3]", sweeps
