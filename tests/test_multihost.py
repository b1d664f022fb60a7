"""REAL multi-process execution: 2 JAX processes x 4 CPU devices each, one
global 8-device mesh, gloo cross-process collectives (the CPU stand-in for
DCN). Each worker asserts sharded-lookup + streaming parity for its own
rows (tests/multihost_worker.py); this driver only orchestrates."""

import os
import pytest

pytestmark = pytest.mark.slow
import socket
import subprocess
import sys

HERE = os.path.dirname(__file__)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_parity(dict_k31, tmp_path):
    idx_path = str(tmp_path / "idx.npz")
    dict_k31.save(idx_path)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers pin their own 4-device count
    # workers must import sshash_tpu without a pip install, from any cwd
    repo = os.path.dirname(HERE)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(i), "2", str(port), idx_path],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(HERE))
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK {i}" in out, out[-4000:]
