"""Multi-host bring-up: 2 real processes rendezvous via jax.distributed
(127.0.0.1 coordinator) and drive one TP/DP-sharded decode step over the
GLOBAL mesh (VERDICT r1 item 9; reference surface: the DP stateless
process group, `src/doc/VLLM_V1_Interface.md:90`)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.integration
def test_two_process_jax_distributed_decode_step():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    env = {**os.environ, "PYTHONPATH": os.pathsep.join(
        filter(None, [os.environ.get("PYTHONPATH"), repo])
    )}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    sums = []
    for i, out in enumerate(outs):
        marker = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK")]
        assert marker, f"worker {i} printed no MULTIHOST_OK:\n{out[-4000:]}"
        sums.append(int(marker[0].split()[2]))
    # both processes saw the same (allgathered) decode output
    assert sums[0] == sums[1]
