"""Multi-host (multi-process jax.distributed) test on localhost CPU.

Launches two worker processes (4 virtual CPU devices each), which join a
global 8-device mesh via ``multihost.initialize`` and run the sharded
prover core with real cross-process collectives (gloo).  Each worker
bit-compares the replicated outputs against the single-process host
golden and writes a digest; the parent asserts the digests agree across
processes (the framework's cross-host determinism contract, SURVEY.md §8
/ VERDICT #5).
"""

import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_core(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "scripts", "multihost_worker.py")
    port = _free_port()

    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # workers set their own device count

    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"proc{pid}.txt"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))

    results = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        results.append((p.returncode, stdout.decode(errors="replace")))

    for code, log in results:
        assert code == 0, f"worker failed:\n{log[-3000:]}"

    lines = [out.read_text().split() for out in outs]
    # both saw the full 8-device mesh and produced identical digests
    assert all(line[1] == "8" for line in lines), lines
    assert lines[0][2] == lines[1][2], lines
    # full-prover (mesh-streaming) proof bytes also agree across processes
    assert lines[0][3] == lines[1][3], lines
