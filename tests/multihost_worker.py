"""Worker script for the 2-process multi-host bring-up test.

Run (by tests/test_multihost.py) as:
    python tests/multihost_worker.py <host_id> <num_hosts> <port>

Each process pins JAX to CPU with 4 fake local devices, rendezvouses at
the 127.0.0.1 coordinator through `parallel.mesh.init_distributed`
(jax.distributed — the analog of the reference's DP stateless process
group, `src/doc/VLLM_V1_Interface.md:90`), builds the GLOBAL (dp=2, tp=4)
mesh spanning both processes, and drives ONE sharded decode step of the
qwen2 forward (TP-sharded weights + KV, dp-sharded batch) plus an
explicit cross-process psum. Prints 'MULTIHOST_OK <host_id> <token_sum>'
on success; both processes must print the same token_sum (the decode
output is replicated by the allgather, so agreement proves the
cross-process collectives ran coherently).
"""

import os
import sys

if __name__ == "__main__":
    # env must be pinned BEFORE jax imports; only when run as a script
    # (the parity test imports engine_cfg/ENGINE_PROMPTS from this module
    # inside an already-initialized pytest process)
    host_id = int(sys.argv[1])
    num_hosts, port = int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "raw"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
else:
    host_id = num_hosts = port = 0
    mode = "raw"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vllm_omni_draft_tpu.config import ModelConfig, ParallelConfig  # noqa: E402
from vllm_omni_draft_tpu.models import qwen2  # noqa: E402
from vllm_omni_draft_tpu.ops.attention import AttentionMetadata  # noqa: E402
from vllm_omni_draft_tpu.parallel import sharding as shd  # noqa: E402
from vllm_omni_draft_tpu.parallel.mesh import init_distributed, make_mesh  # noqa: E402


def engine_cfg(pcfg):
    """Tiny engine config shared by the multi-process run and the
    single-process parity reference (tests/test_multihost.py)."""
    from vllm_omni_draft_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
        SpeculativeConfig,
    )

    target = ModelConfig.tiny(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_heads=8, num_kv_heads=4, head_dim=8, quantization="int8",
        max_model_len=128,
    )
    draft = ModelConfig.tiny(
        vocab_size=512, hidden_size=32, intermediate_size=64,
        num_heads=4, num_kv_heads=2, head_dim=8, max_model_len=128,
    )
    return EngineConfig(
        model=target,
        cache=CacheConfig(block_size=8, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=64,
            prefill_buckets=(16, 64),
        ),
        parallel=pcfg,
        speculative=SpeculativeConfig(
            draft_model=draft, num_speculative_tokens=2
        ),
        seed=0,
    )


ENGINE_PROMPTS = [[1, 2, 3, 4, 5], [7, 8, 9], [11, 12, 13, 14, 15, 16], [2]]


def run_engine(pcfg):
    """The FULL LLM/engine stack over the global mesh (SURVEY §7 step 7:
    every host runs the same deterministic schedule — replicated-driver
    SPMD — and the sharded device steps span processes). Prints one
    ENGINE_TOKENS line whose payload must be identical on every host AND
    identical to a single-process run of the same config."""
    from vllm_omni_draft_tpu.core.request import SamplingParams
    from vllm_omni_draft_tpu.engine.llm import LLM

    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    llm = LLM(engine_cfg(pcfg))
    outs = llm.generate(ENGINE_PROMPTS, sp)
    toks = [o.outputs[0].token_ids for o in outs]
    stats = llm.get_stats()["spec_decode"]
    assert stats.num_draft_tokens > 0
    print(f"ENGINE_TOKENS {host_id} {toks!r}", flush=True)


def main():
    pcfg = ParallelConfig(
        tensor_parallel_size=4,
        data_parallel_size=2,
        num_hosts=num_hosts,
        host_id=host_id,
        coordinator_address=f"127.0.0.1:{port}",
        distributed_init=True,
    )
    init_distributed(pcfg)
    assert jax.process_count() == num_hosts, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())  # global devices
    assert len(jax.local_devices()) == 4

    if mode == "engine":
        run_engine(pcfg)
        return

    # explicit cross-process collective sanity: psum over all devices
    from jax.experimental import multihost_utils

    local = np.array([float(host_id + 1)])
    summed = multihost_utils.process_allgather(local).sum()
    assert summed == sum(range(1, num_hosts + 1)), summed

    # one TP/DP-sharded decode step across the global mesh
    mesh = make_mesh(pcfg)
    cfg = ModelConfig.tiny(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_heads=8, num_kv_heads=4, head_dim=8, max_model_len=64,
    )
    params = qwen2.init_params(cfg)          # deterministic per seed =>
    params = shd.shard_params(params, mesh)  # identical on both processes
    fwd = qwen2.make_forward(cfg)
    bs = 8
    B = 4

    def step(params, last_tokens, seq_lens, block_tables):
        # throwaway KV allocated in-trace: multi-process jit inputs must
        # be global or replicated-host values, not process-local arrays
        kv = qwen2.init_kv_cache(cfg, num_blocks=16, block_size=bs)
        positions = (seq_lens - 1)[:, None]
        pos = jnp.maximum(positions, 0)
        bid = jnp.take_along_axis(block_tables, pos // bs, axis=1)
        slots = jnp.where(positions < 0, -1, bid * bs + pos % bs)
        meta = AttentionMetadata(
            block_tables=block_tables,
            kv_lens=seq_lens,
            positions=positions,
            slot_mapping=slots,
        )
        hidden, kv = fwd(params, last_tokens[:, None], positions, kv, meta)
        logits = qwen2.compute_logits(cfg, params, hidden[:, 0])
        return jnp.argmax(logits, axis=-1)

    last = np.arange(1, B + 1, dtype=np.int32)
    lens = np.full((B,), 5, np.int32)
    bt = (
        np.tile(np.arange(1, 3, dtype=np.int32)[None, :], (B, 1))
        + 2 * np.arange(B, dtype=np.int32)[:, None]
    )
    toks = jax.jit(step)(params, last, lens, bt)
    toks_np = multihost_utils.process_allgather(toks, tiled=True)

    token_sum = int(np.asarray(toks_np).sum())
    print(f"MULTIHOST_OK {host_id} {token_sum}", flush=True)


if __name__ == "__main__":
    main()
