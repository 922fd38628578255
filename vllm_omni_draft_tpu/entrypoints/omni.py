"""Multi-stage Omni pipeline: OmniLLM / OmniStage / OmniStageLLM.

Contract fixed by the reference's spec-by-test
(`src/CI_test/tests/test_omni_llm.py`, `src/doc/UT_PLAN_omni_llm.md` §8.2.3;
call stack SURVEY.md §3.5):

- stage configs load from the model when not passed
  (`load_stage_configs_from_model`, test_omni_llm.py:286-297);
- `generate(prompts, sampling_params_list)` raises ValueError when
  len(sampling_params_list) != number of stages (test_omni_llm.py:299-341);
- stage 0 consumes raw prompts; stage i>0 consumes
  `stage.process_engine_inputs(stage_list, prompts)` (:344-433);
- each stage records outputs via `set_engine_outputs`; stages with
  final_output=True aggregate into the returned OmniRequestOutput list;
  all-False yields [] (:436-497).

TPU-native realization of the reference's dual-engine design
(`engine_core.md:837-943`): each stage owns its engine (its own mesh and
device state); cross-stage handoff is device arrays (embeddings/latents),
not retokenized text, when the stage types allow it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

from vllm_omni_draft_tpu.config import (
    EngineConfig,
    ModelConfig,
    StageConfig,
    load_stage_configs_from_model,
)
from vllm_omni_draft_tpu.core.request import SamplingParams


@dataclass
class OmniRequestOutput:
    """Aggregated output of one final stage for one request."""

    request_id: str
    stage_id: int
    final_output_type: str | None
    outputs: Any  # stage-dependent: RequestOutput list / arrays


class OmniStageLLM:
    """One stage's engine. stage_type 'llm' wraps the text engine;
    'diffusion' wraps the DiT denoise pipeline (models/dit.py); 'talker'
    wraps the token->waveform synthesizer (models/talker.py)."""

    def __init__(self, stage_config: StageConfig, **engine_args):
        self.stage_config = stage_config
        self.stage_type = stage_config.stage_type
        self._engine = None
        self._engine_args = {**stage_config.engine_args, **engine_args}

    def _get_engine(self):
        if self._engine is None:
            if self.stage_type == "llm":
                from vllm_omni_draft_tpu.engine.llm import LLM

                cfg = self._engine_args.get("config")
                if cfg is None:
                    model_path = self.stage_config.model
                    cfg = EngineConfig(
                        model=ModelConfig.from_hf_config(model_path)
                        if model_path and not self._engine_args.get("synthetic")
                        else ModelConfig.tiny(vocab_size=258),
                        tokenizer=self._engine_args.get("tokenizer"),
                    )
                self._engine = LLM(cfg)
            elif self.stage_type == "diffusion":
                from vllm_omni_draft_tpu.models.dit import DiffusionStageEngine

                self._engine = DiffusionStageEngine(
                    self.stage_config, **self._engine_args
                )
            elif self.stage_type == "talker":
                from vllm_omni_draft_tpu.models.talker import TalkerStageEngine

                self._engine = TalkerStageEngine(
                    self.stage_config, **self._engine_args
                )
            else:
                raise ValueError(f"unknown stage_type {self.stage_type!r}")
        return self._engine

    def generate(self, inputs, sampling_params):
        engine = self._get_engine()
        if self.stage_type == "llm":
            return engine.generate(inputs, sampling_params)
        return engine.generate(inputs, sampling_params)


class OmniStage:
    """Stage orchestration shim: input preprocessing between stages and
    output capture (the reference's OmniStage contract)."""

    def __init__(self, stage_config: StageConfig):
        self.config = stage_config
        self.stage_id = stage_config.stage_id
        self.final_output = stage_config.final_output
        self.final_output_type = stage_config.final_output_type
        self.engine: OmniStageLLM | None = None
        self.engine_outputs: Any = None

    def set_engine(self, engine: OmniStageLLM) -> None:
        self.engine = engine

    def process_engine_inputs(self, stage_list: Sequence["OmniStage"], prompts):
        """Build this stage's inputs from upstream outputs. Default: hand
        the previous stage's outputs through (text stages pass generated
        text; diffusion stages receive the text-stage outputs as
        conditioning)."""
        prev = stage_list[self.stage_id - 1]
        outs = prev.engine_outputs
        if outs is None:
            return prompts
        if self.config.stage_type in ("diffusion", "talker"):
            return outs  # conditioning payloads (text/embeddings/token ids)
        # llm stage after llm stage: continue from generated text
        return [
            o.outputs[0].text if getattr(o, "outputs", None) else ""
            for o in outs
        ]

    def set_engine_outputs(self, outputs) -> None:
        self.engine_outputs = outputs


class OmniLLM:
    """Multi-stage entrypoint (reference: `OmniLLM(model).generate(...)`,
    test_omni_llm.py:408-421)."""

    def __init__(
        self,
        model: str,
        stage_configs: list[StageConfig] | None = None,
        **engine_args,
    ):
        if stage_configs is None:
            stage_configs = load_stage_configs_from_model(model)
        self.model = model
        self.stage_list: list[OmniStage] = []
        for cfg in stage_configs:
            stage = OmniStage(cfg)
            stage.set_engine(OmniStageLLM(cfg, **engine_args))
            self.stage_list.append(stage)

    def generate(
        self,
        prompts,
        sampling_params_list: Sequence[SamplingParams | None] | None = None,
    ) -> list[OmniRequestOutput]:
        n_stages = len(self.stage_list)
        if sampling_params_list is None:
            sampling_params_list = [None] * n_stages
        if len(sampling_params_list) != n_stages:
            raise ValueError(
                f"sampling_params_list has {len(sampling_params_list)} entries "
                f"but the pipeline has {n_stages} stages"
            )
        results: list[OmniRequestOutput] = []
        for stage_id, stage in enumerate(self.stage_list):
            inputs = (
                prompts
                if stage_id == 0
                else stage.process_engine_inputs(self.stage_list, prompts)
            )
            outs = self._run_generation(
                stage, sampling_params_list[stage_id], inputs
            )
            stage.set_engine_outputs(outs)
            if stage.final_output:
                for i, o in enumerate(outs):
                    results.append(
                        OmniRequestOutput(
                            request_id=getattr(o, "request_id", f"omni-{i}"),
                            stage_id=stage_id,
                            final_output_type=stage.final_output_type,
                            outputs=o,
                        )
                    )
        return results

    @staticmethod
    def _run_generation(stage: OmniStage, sampling_params, inputs):
        out = stage.engine.generate(inputs, sampling_params)
        return list(out) if not isinstance(out, list) else out
