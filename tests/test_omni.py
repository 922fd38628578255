"""Omni multi-stage pipeline contract tests — mirrors the reference's
spec-by-test for OmniLLM (`src/CI_test/tests/test_omni_llm.py`):
stage-config loading, sampling-params validation, stage chaining,
final-output aggregation."""

import json
import os

import pytest

from vllm_omni_draft_tpu.config import StageConfig, load_stage_configs_from_model
from vllm_omni_draft_tpu.entrypoints.omni import (
    OmniLLM,
    OmniRequestOutput,
    OmniStage,
    OmniStageLLM,
)


class _FakeEngine:
    """Observable fake engine (reference pattern: _FakeStageLLM)."""

    def __init__(self, tag):
        self.tag = tag
        self.calls = []

    def generate(self, inputs, sampling_params):
        self.calls.append((list(inputs), sampling_params))
        return [
            type("O", (), {
                "request_id": f"{self.tag}-{i}",
                "outputs": [type("C", (), {"text": f"{self.tag}:{x}"})()],
            })()
            for i, x in enumerate(inputs)
        ]


def _fake_omni(stage_specs):
    cfgs = [
        StageConfig(stage_id=i, stage_type="llm", final_output=fo,
                    final_output_type=ft)
        for i, (fo, ft) in enumerate(stage_specs)
    ]
    llm = OmniLLM.__new__(OmniLLM)
    llm.model = "fake"
    llm.stage_list = []
    for cfg in cfgs:
        stage = OmniStage(cfg)
        shim = OmniStageLLM.__new__(OmniStageLLM)
        shim.stage_config = cfg
        shim.stage_type = "llm"
        shim._engine = _FakeEngine(f"s{cfg.stage_id}")
        shim._engine_args = {}
        stage.set_engine(shim)
        llm.stage_list.append(stage)
    return llm


def test_sampling_params_length_mismatch_raises():
    llm = _fake_omni([(False, None), (True, "text")])
    with pytest.raises(ValueError, match="2 stages"):
        llm.generate(["p"], sampling_params_list=[None])


def test_stage_chaining_and_final_output():
    llm = _fake_omni([(False, None), (True, "audio")])
    outs = llm.generate(["hello", "world"], [None, None])
    # stage 0 saw raw prompts
    eng0 = llm.stage_list[0].engine._engine
    assert eng0.calls[0][0] == ["hello", "world"]
    # stage 1 saw stage 0's generated text
    eng1 = llm.stage_list[1].engine._engine
    assert eng1.calls[0][0] == ["s0:hello", "s0:world"]
    # only final stage aggregated
    assert len(outs) == 2
    assert all(isinstance(o, OmniRequestOutput) for o in outs)
    assert all(o.stage_id == 1 and o.final_output_type == "audio" for o in outs)


def test_no_final_stage_returns_empty():
    llm = _fake_omni([(False, None), (False, None)])
    assert llm.generate(["x"], [None, None]) == []


def test_multiple_final_stages_aggregate_all():
    llm = _fake_omni([(True, "text"), (True, "image")])
    outs = llm.generate(["a"], [None, None])
    assert [o.final_output_type for o in outs] == ["text", "image"]


def test_load_stage_configs_from_model(tmp_path):
    spec = {
        "stages": [
            {"stage_type": "llm", "model": "m1"},
            {"stage_type": "diffusion", "model": "m2", "final_output": True,
             "final_output_type": "image",
             "engine_args": {"steps": 4}},
        ]
    }
    with open(os.path.join(tmp_path, "omni_stages.json"), "w") as f:
        json.dump(spec, f)
    cfgs = load_stage_configs_from_model(str(tmp_path))
    assert len(cfgs) == 2
    assert cfgs[0].stage_id == 0 and cfgs[0].stage_type == "llm"
    assert cfgs[1].final_output and cfgs[1].final_output_type == "image"
    assert cfgs[1].engine_args == {"steps": 4}


def test_default_stage_config_when_absent(tmp_path):
    cfgs = load_stage_configs_from_model(str(tmp_path))
    assert len(cfgs) == 1
    assert cfgs[0].final_output and cfgs[0].final_output_type == "text"


def test_end_to_end_real_llm_stage():
    """One real tiny llm stage through OmniLLM (no fakes)."""
    from vllm_omni_draft_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from vllm_omni_draft_tpu.core.request import SamplingParams

    cfg = EngineConfig(
        model=ModelConfig.tiny(vocab_size=258, max_model_len=128),
        cache=CacheConfig(block_size=8, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=64,
                                  prefill_buckets=(16, 64)),
    )
    stage_cfg = StageConfig(stage_id=0, stage_type="llm", final_output=True,
                            final_output_type="text",
                            engine_args={"config": cfg})
    llm = OmniLLM("synthetic", stage_configs=[stage_cfg])
    outs = llm.generate(
        ["omni end to end"],
        [SamplingParams(max_tokens=5, temperature=0.0)],
    )
    assert len(outs) == 1
    assert outs[0].final_output_type == "text"
    assert len(outs[0].outputs.outputs[0].token_ids) == 5


def test_talker_stage_synthesis_invariants():
    """Talker stage: waveform shape, bounds, padding-silence, determinism."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vllm_omni_draft_tpu.models.talker import (
        TalkerConfig,
        init_params,
        make_synthesizer,
    )

    cfg = TalkerConfig(vocab_size=64, hidden=32, num_blocks=1,
                       frames_per_token=2, upsample=(3, 4))
    params = init_params(cfg)
    fn = jax.jit(make_synthesizer(cfg))
    tokens = jnp.asarray([[5, 9, 3, 0, 0, 0, 0, 0]], jnp.int32)
    wave = np.asarray(fn(params, tokens, jnp.asarray([3], jnp.int32)))
    per_tok = cfg.frames_per_token * cfg.hop
    assert wave.shape == (1, 8 * per_tok)
    assert np.all(np.abs(wave) <= 1.0)
    # padded tokens synthesize exact silence
    assert np.all(wave[0, 3 * per_tok:] == 0.0)
    # real tokens produce signal, and the fn is deterministic
    assert np.any(wave[0, : 3 * per_tok] != 0.0)
    wave2 = np.asarray(fn(params, tokens, jnp.asarray([3], jnp.int32)))
    np.testing.assert_array_equal(wave, wave2)


def test_thinker_talker_pipeline_end_to_end():
    """Two real stages: tiny llm -> talker, audio final output at 24 kHz."""
    import numpy as np

    from vllm_omni_draft_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from vllm_omni_draft_tpu.core.request import SamplingParams
    from vllm_omni_draft_tpu.models.talker import TalkerConfig

    cfg = EngineConfig(
        model=ModelConfig.tiny(vocab_size=258, max_model_len=128),
        cache=CacheConfig(block_size=8, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=64,
                                  prefill_buckets=(16, 64)),
    )
    stages = [
        StageConfig(stage_id=0, stage_type="llm", final_output=False,
                    engine_args={"config": cfg}),
        StageConfig(stage_id=1, stage_type="talker", final_output=True,
                    final_output_type="audio",
                    engine_args={"talker_config": TalkerConfig(
                        vocab_size=258, hidden=32, num_blocks=1,
                        frames_per_token=2, upsample=(3, 4))}),
    ]
    llm = OmniLLM("synthetic", stage_configs=stages)
    outs = llm.generate(
        ["speak this"], [SamplingParams(max_tokens=4, temperature=0.0), None]
    )
    assert len(outs) == 1
    assert outs[0].final_output_type == "audio"
    audio = outs[0].outputs.multimodal_output["audio"]
    assert outs[0].outputs.sample_rate == 24000
    assert np.asarray(audio).ndim == 1 and np.asarray(audio).size > 0
