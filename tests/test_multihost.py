"""Multi-host DCN camera batching, CPU-simulated (SURVEY §2.3 new-work item).

Spawns two real OS processes that rendezvous through jax.distributed
(gloo CPU collectives), form one global 2-host x 2-device ('dp',) mesh,
and run one camera-batch DP train step whose gradient pmean crosses the
process boundary — the CPU stand-in for a 2-host TPU pod slice over DCN.
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "materialrefgs_tpu.parallel.multihost",
                "--coordinator", f"localhost:{port}",
                "--num_processes", "2",
                "--process_id", str(pid),
                "--local_devices", "2",
            ],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST OK" in out, f"worker {pid} no OK line:\n{out[-3000:]}"

    # The cross-host pmean must leave both processes with identical params.
    digests = [
        line.split("digest=")[1].split()[0]
        for out in outs
        for line in out.splitlines()
        if "MULTIHOST OK" in line
    ]
    assert len(digests) == 2 and digests[0] == digests[1], digests
