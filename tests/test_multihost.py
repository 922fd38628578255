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


@pytest.mark.integration
def test_two_process_full_engine_token_parity():
    """Round-2 review item 9: the ACTUAL LLM/engine stack (scheduler,
    runner, spec decode) runs over the 2-process global (dp=2, tp=4)
    mesh — replicated-driver SPMD, per-host device shards — and the
    emitted tokens are identical across processes AND identical to a
    single-process run of the same config."""
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    env = {**os.environ, "PYTHONPATH": os.pathsep.join(
        filter(None, [os.environ.get("PYTHONPATH"), repo])
    )}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), "engine"],
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
        assert p.returncode == 0, f"engine worker {i} failed:\n{out[-4000:]}"
    toks = []
    for i, out in enumerate(outs):
        marker = [l for l in out.splitlines() if l.startswith("ENGINE_TOKENS")]
        assert marker, f"worker {i} printed no ENGINE_TOKENS:\n{out[-4000:]}"
        toks.append(eval(marker[0].split(" ", 2)[2]))  # noqa: S307 - our own repr
    assert toks[0] == toks[1], (toks[0], toks[1])

    # single-process reference: same config over an in-process
    # (dp=2, tp=4) mesh of this test session's 8 CPU devices
    from vllm_omni_draft_tpu.config import ParallelConfig
    from vllm_omni_draft_tpu.core.request import SamplingParams
    from vllm_omni_draft_tpu.engine.llm import LLM
    from tests.multihost_worker import ENGINE_PROMPTS, engine_cfg

    pcfg = ParallelConfig(tensor_parallel_size=4, data_parallel_size=2)
    llm = LLM(engine_cfg(pcfg))
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    ref = [o.outputs[0].token_ids
           for o in llm.generate(ENGINE_PROMPTS, sp)]
    assert toks[0] == ref, (toks[0], ref)
