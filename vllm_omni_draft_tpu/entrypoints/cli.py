"""CLI: `vot serve | generate | bench` (console script in pyproject).

Capability parity with the reference's console scripts
(`vllm` / `vllm-omni` -> cli main, reference `pyproject.toml:74-76`) and
the example CLI surface (`--model --prompts ...`,
`src/CI_test/tests/test_end2end.py:98-146`).
"""

from __future__ import annotations

import argparse
import sys


def _engine_config(args) -> "EngineConfig":
    from vllm_omni_draft_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        ParallelConfig,
        SchedulerConfig,
        SpeculativeConfig,
    )

    if args.model and not args.synthetic:
        model = ModelConfig.from_hf_config(
            args.model,
            dtype=args.dtype,
            quantization=args.quantization,
            kv_cache_dtype=args.kv_cache_dtype,
            max_model_len=args.max_model_len,
        )
        tokenizer = args.tokenizer or args.model
    else:
        model = ModelConfig.tiny(
            vocab_size=258, max_model_len=args.max_model_len
        )
        tokenizer = args.tokenizer  # None => byte tokenizer

    spec = None
    if args.draft_model:
        spec = SpeculativeConfig(
            draft_model=ModelConfig.from_hf_config(
                args.draft_model, dtype=args.dtype,
                max_model_len=args.max_model_len,
            ),
            num_speculative_tokens=args.num_speculative_tokens,
        )
    return EngineConfig(
        model=model,
        cache=CacheConfig(
            block_size=args.block_size,
            gpu_memory_utilization=args.gpu_memory_utilization,
        ),
        scheduler=SchedulerConfig(
            max_num_seqs=args.max_num_seqs,
            max_num_batched_tokens=args.max_num_batched_tokens,
            decode_steps=args.decode_steps,
            max_model_len=args.max_model_len,
        ),
        parallel=ParallelConfig(
            tensor_parallel_size=args.tensor_parallel_size,
            data_parallel_size=args.data_parallel_size,
        ),
        speculative=spec,
        tokenizer=tokenizer,
        seed=args.seed,
    )


def _add_engine_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default=None, help="HF checkpoint dir")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="tiny random model + byte tokenizer (smoke tests)")
    p.add_argument("--draft-model", default=None, help="spec-decode draft dir")
    p.add_argument("--num-speculative-tokens", type=int, default=4)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--quantization", default=None, choices=[None, "int8", "int4"])
    p.add_argument("--kv-cache-dtype", default="bfloat16",
                   choices=["bfloat16", "float32", "fp8"])
    p.add_argument("--max-model-len", type=int, default=4096)
    p.add_argument("--block-size", type=int, default=16)
    p.add_argument("--gpu-memory-utilization", type=float, default=0.9)
    p.add_argument("--max-num-seqs", type=int, default=64)
    p.add_argument("--max-num-batched-tokens", type=int, default=1024)
    p.add_argument("--decode-steps", type=int, default=1)
    p.add_argument("--tensor-parallel-size", "-tp", type=int, default=1)
    p.add_argument("--data-parallel-size", "-dp", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="vot", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_serve = sub.add_parser("serve", help="start the HTTP API server")
    _add_engine_args(p_serve)
    p_serve.add_argument("--host", default="127.0.0.1")
    p_serve.add_argument("--port", type=int, default=8000)

    p_gen = sub.add_parser("generate", help="offline generation")
    _add_engine_args(p_gen)
    p_gen.add_argument("--prompts", nargs="+", required=True)
    p_gen.add_argument("--max-tokens", type=int, default=64)
    p_gen.add_argument("--temperature", type=float, default=0.0)
    p_gen.add_argument("--top-p", type=float, default=1.0)
    p_gen.add_argument("--top-k", type=int, default=0)

    args = parser.parse_args(argv)
    cfg = _engine_config(args)

    if args.cmd == "serve":
        from vllm_omni_draft_tpu.entrypoints.api_server import run_server

        run_server(cfg, host=args.host, port=args.port,
                   model_name=args.model or "synthetic")
        return 0

    if args.cmd == "generate":
        from vllm_omni_draft_tpu.core.request import SamplingParams
        from vllm_omni_draft_tpu.engine.llm import LLM

        llm = LLM(cfg)
        sp = SamplingParams(
            max_tokens=args.max_tokens,
            temperature=args.temperature,
            top_p=args.top_p,
            top_k=args.top_k,
        )
        for out in llm.generate(list(args.prompts), sp):
            print(f"Request ID: {out.request_id}")
            print(f"Text Output: {out.outputs[0].text if out.outputs else ''}")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
