"""End-to-end Omni example: text (thinker) stage -> optional talker stage.

CLI contract mirrors the reference example exercised by
`src/CI_test/tests/test_end2end.py:98-157`:

  python examples/end2end.py --model <path> --prompts "hello" \
      [--do-wave --output-wav <dir>]

- text final stages print `Request ID:` / `Text Output:` lines;
- audio final stages (with --do-wave) write one 24 kHz wav per request
  into --output-wav via `soundfile.write` and print `Saved audio to ...`
  (falls back to the stdlib `wave` module when soundfile is unavailable).

`--synthetic` runs the whole pipeline on tiny random-weight models (no
checkpoint needed) — the CPU-testable path.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _write_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    audio = np.asarray(audio, np.float32)
    try:
        import soundfile  # noqa: PLC0415 — late import so tests can fake it

        soundfile.write(path, audio, sample_rate)
        return
    except ImportError:
        pass
    import wave

    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(
            (np.clip(audio, -1.0, 1.0) * 32767).astype("<i2").tobytes()
        )


def _build_omni(args):
    from vllm_omni_draft_tpu.config import ModelConfig, StageConfig
    from vllm_omni_draft_tpu.entrypoints.omni import OmniLLM

    if not args.synthetic:
        return OmniLLM(args.model)
    # synthetic pipeline: tiny thinker (+ talker when --do-wave)
    from vllm_omni_draft_tpu.config import EngineConfig
    from vllm_omni_draft_tpu.models.talker import TalkerConfig

    thinker = StageConfig(
        stage_id=0,
        stage_type="llm",
        model=args.model,
        engine_args={
            "config": EngineConfig(model=ModelConfig.tiny(vocab_size=258))
        },
        final_output=not args.do_wave,
        final_output_type="text",
    )
    stages = [thinker]
    if args.do_wave:
        stages.append(
            StageConfig(
                stage_id=1,
                stage_type="talker",
                model=args.model,
                engine_args={"talker_config": TalkerConfig(vocab_size=258)},
                final_output=True,
                final_output_type="audio",
            )
        )
    return OmniLLM(args.model, stage_configs=stages)


def main() -> None:
    parser = argparse.ArgumentParser(description="Omni end-to-end example")
    parser.add_argument("--model", required=True)
    parser.add_argument("--prompts", nargs="+", required=True)
    parser.add_argument("--do-wave", action="store_true",
                        help="run the talker stage and save wavs")
    parser.add_argument("--output-wav", default="output_wav",
                        help="directory for saved wav files")
    parser.add_argument("--max-tokens", type=int, default=16)
    parser.add_argument("--synthetic", action="store_true",
                        help="tiny random-weight pipeline (no checkpoint)")
    args = parser.parse_args()

    from vllm_omni_draft_tpu.core.request import SamplingParams

    omni = _build_omni(args)
    n_stages = len(omni.stage_list)
    sp = SamplingParams(max_tokens=args.max_tokens, temperature=0.0,
                        ignore_eos=True)
    outputs = omni.generate(args.prompts, [sp] * n_stages)

    for out in outputs:
        if out.final_output_type == "audio":
            audio = out.outputs.multimodal_output["audio"]
            sr = getattr(out.outputs, "sample_rate", 24_000)
            os.makedirs(args.output_wav, exist_ok=True)
            path = os.path.join(
                args.output_wav, f"output_{out.request_id}.wav"
            )
            _write_wav(path, np.asarray(audio), sr)
            print(f"Saved audio to {path}")
        else:
            text = (
                out.outputs.outputs[0].text
                if getattr(out.outputs, "outputs", None)
                else ""
            )
            print(f"Request ID: {out.request_id}")
            print(f"Text Output: {text}")


if __name__ == "__main__":
    main()
