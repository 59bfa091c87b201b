"""Multi-host runtime: 2-process CPU fake cluster over 8 virtual devices.

Launches two real OS processes that join one jax.distributed runtime,
each feeding its own host-local batch shard into the sharded train step
(the per-host loading path the train CLI uses). Both must finish with the
same parameter checksum — proof the SPMD training stays synchronized."""
import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_fake_cluster():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("PALLAS_AXON")}     # keep workers off the TPU
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "_dist_worker.py"),
         str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    checksums = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d) checksum=([\d.]+) loss=([\d.]+)",
                      out)
        assert m, out[-3000:]
        checksums[int(m.group(1))] = (m.group(2), m.group(3))
    assert len(checksums) == 2
    # identical params AND identical (psum-averaged) loss on both hosts
    assert checksums[0] == checksums[1], checksums
