"""Fused multi-iteration decode (decode_steps > 1): outputs must be
identical to single-step decoding — same tokens, same stop handling."""

import json
import os

import numpy as np
import pytest

from vllm_omni_draft_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from vllm_omni_draft_tpu.core.request import SamplingParams
from vllm_omni_draft_tpu.engine.llm import LLM

TINY_HF = dict(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=256,
    rope_theta=10000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM
    from safetensors.torch import save_file

    path = tmp_path_factory.mktemp("tiny_qwen2_ms")
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(Qwen2Config(**TINY_HF)).eval().to(torch.float32)
    save_file(
        {k: v.contiguous() for k, v in model.state_dict().items()},
        os.path.join(path, "model.safetensors"),
    )
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({**TINY_HF, "model_type": "qwen2"}, f)
    return str(path), model


def _config(path, decode_steps, spec=None):
    return EngineConfig(
        model=ModelConfig.from_hf_config(path, dtype="float32", max_model_len=128),
        cache=CacheConfig(block_size=4, num_blocks=256),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            prefill_buckets=(16, 64),
            decode_steps=decode_steps,
        ),
        speculative=spec,
        seed=0,
    )


def _hf_greedy(model, prompt_ids, n):
    import torch

    with torch.no_grad():
        out = model.generate(
            torch.tensor([prompt_ids]), max_new_tokens=n, do_sample=False,
            pad_token_id=0,
        )
    return out[0, len(prompt_ids):].tolist()


def test_multi_step_greedy_matches_hf(hf_checkpoint):
    path, hf = hf_checkpoint
    llm = LLM(_config(path, decode_steps=4))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 100, size=n).tolist() for n in (5, 12)]
    sp = SamplingParams(max_tokens=10, temperature=0.0, ignore_eos=True)
    outs = llm.generate(prompts, [sp] * 2)
    for p, o in zip(prompts, outs):
        assert o.outputs[0].token_ids == _hf_greedy(hf, p, 10), p


def test_multi_step_stop_token_truncates(hf_checkpoint):
    path, hf = hf_checkpoint
    llm = LLM(_config(path, decode_steps=4))
    prompt = [5, 6, 7, 8]
    ref = _hf_greedy(hf, prompt, 12)
    stop_tok = ref[5]  # lands mid-fused-call
    out = llm.generate(
        [prompt],
        [SamplingParams(max_tokens=12, temperature=0.0, stop_token_ids=(stop_tok,))],
    )[0]
    assert out.outputs[0].finish_reason == "stop"
    assert out.outputs[0].token_ids == ref[:6]


def test_multi_step_spec_decode_lossless(hf_checkpoint, tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM
    from safetensors.torch import save_file

    path, hf = hf_checkpoint
    dkw = dict(TINY_HF, num_hidden_layers=1, hidden_size=16, intermediate_size=32,
               num_attention_heads=2, num_key_value_heads=1)
    dpath = tmp_path_factory.mktemp("tiny_draft_ms")
    torch.manual_seed(9)
    dm = Qwen2ForCausalLM(Qwen2Config(**dkw)).eval().to(torch.float32)
    save_file({k: v.contiguous() for k, v in dm.state_dict().items()},
              os.path.join(dpath, "model.safetensors"))
    with open(os.path.join(dpath, "config.json"), "w") as f:
        json.dump({**dkw, "model_type": "qwen2"}, f)

    spec = SpeculativeConfig(
        draft_model=ModelConfig.from_hf_config(str(dpath), dtype="float32",
                                               max_model_len=128),
        num_speculative_tokens=2,
    )
    llm = LLM(_config(path, decode_steps=3, spec=spec))
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 100, size=n).tolist() for n in (6, 14)]
    sp = SamplingParams(max_tokens=11, temperature=0.0, ignore_eos=True)
    outs = llm.generate(prompts, [sp] * 2)
    for p, o in zip(prompts, outs):
        assert o.outputs[0].token_ids == _hf_greedy(hf, p, 11), p
