"""Talker stage: token ids -> 24 kHz waveform (the Omni audio path).

The reference's Omni pipeline ends in an audio stage whose outputs are
waveform tensors written as 24 kHz wavs (`src/CI_test/tests/test_end2end.py:
119-157` — `soundfile.write(..., 24000)`, `multimodal_output={"audio": t}`).
The upstream talker model (Qwen2.5-Omni) is a token-conditioned acoustic
decoder + vocoder; this module rebuilds that capability TPU-natively:

- one jitted program per token-length bucket (static shapes);
- the acoustic decoder is a stack of causal depthwise-separable conv
  blocks (all `lax.conv_general_dilated` — MXU-friendly, no dynamic
  control flow);
- the vocoder is a chain of transposed convolutions upsampling frames to
  samples (total ratio = `hop` samples/frame), `tanh`-bounded output;
- padding tokens synthesize exact silence, so bucket padding never leaks
  audio.

Weights load from a checkpoint dir (safetensors via models/weights.py
conventions) or random-init for synthetic/serving tests.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class TalkerConfig:
    vocab_size: int = 152_064
    hidden: int = 256
    num_blocks: int = 2
    frames_per_token: int = 2
    # transposed-conv upsample ratios; product == samples per frame (hop)
    upsample: tuple[int, ...] = (5, 4, 6)
    sample_rate: int = 24_000
    seed: int = 0

    @property
    def hop(self) -> int:
        out = 1
        for r in self.upsample:
            out *= r
        return out


def init_params(cfg: TalkerConfig, key: jax.Array | None = None) -> dict:
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    D = cfg.hidden
    ks = iter(jax.random.split(key, 4 + 3 * cfg.num_blocks + 2 * len(cfg.upsample)))

    def w(shape, fan_in):
        return jax.random.normal(next(ks), shape, jnp.float32) / math.sqrt(fan_in)

    blocks = []
    for _ in range(cfg.num_blocks):
        blocks.append(
            {
                # causal depthwise conv over time (kernel 4) + pointwise mix
                "dw": w((4, 1, D), 4),  # [K, 1, D] feature_group_count=D
                "pw": w((1, D, D), D),
                "ln": jnp.ones((D,), jnp.float32),
            }
        )
    ups = []
    ch = D
    for r in cfg.upsample:
        out_ch = max(ch // 2, 8)
        # conv_transpose kernel [2r, ch, out_ch]; stride r stays static
        # in cfg.upsample (a traced stride would break jit)
        ups.append({"w": w((2 * r, ch, out_ch), 2 * r * ch)})
        ch = out_ch
    return {
        "embed": w((cfg.vocab_size, D), D),
        "expand": w((D, cfg.frames_per_token * D), D),
        "blocks": blocks,
        "ups": ups,
        "out": w((1, ch, 1), ch),
    }


def _causal_conv(x: jax.Array, kernel: jax.Array, groups: int) -> jax.Array:
    """x [B, T, C], kernel [K, Cin/groups, Cout] -> [B, T, Cout], causal."""
    K = kernel.shape[0]
    x = jnp.pad(x, ((0, 0), (K - 1, 0), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding="VALID",
        dimension_numbers=("NTC", "TIO", "NTC"), feature_group_count=groups,
    )


def make_synthesizer(cfg: TalkerConfig):
    """Build synthesize(params, tokens [B, T], num_real [B]) -> wave
    [B, T * frames_per_token * hop] f32 in [-1, 1]; padded-token frames
    are exactly zero."""
    D = cfg.hidden

    def synthesize(params, tokens, num_real):
        B, T = tokens.shape
        x = params["embed"][jnp.maximum(tokens, 0)]  # [B, T, D]
        real = (jnp.arange(T)[None, :] < num_real[:, None])[:, :, None]
        x = jnp.where(real, x, 0.0)
        for blk in params["blocks"]:
            h = _causal_conv(x, blk["dw"], groups=D)
            h = _causal_conv(jax.nn.gelu(h), blk["pw"], groups=1)
            # RMS-norm keeps the vocoder input scale bounded
            h = h * jax.lax.rsqrt(jnp.mean(h * h, -1, keepdims=True) + 1e-6)
            x = x + h * blk["ln"]
        # tokens -> frames
        f = (x @ params["expand"]).reshape(B, T * cfg.frames_per_token, D)
        frame_real = jnp.repeat(real[:, :, 0], cfg.frames_per_token, axis=1)
        f = jnp.where(frame_real[:, :, None], f, 0.0)
        # frames -> samples
        y = f
        for up, r in zip(params["ups"], cfg.upsample):
            y = jax.lax.conv_transpose(
                y, up["w"], strides=(r,), padding="SAME",
                dimension_numbers=("NTC", "TIO", "NTC"),
            )
            y = jax.nn.gelu(y)
        y = jax.lax.conv_general_dilated(
            y, params["out"], (1,), "SAME",
            dimension_numbers=("NTC", "TIO", "NTC"),
        )[..., 0]
        wave = jnp.tanh(y)
        # silence outside real frames
        sample_real = jnp.repeat(frame_real, cfg.hop, axis=1)
        return jnp.where(sample_real, wave, 0.0)

    return synthesize


@dataclass
class AudioGenOutput:
    """Per-request talker output (pooling-style tensor, no detokenization —
    reference: `engine_core.md:800-813`; audio contract:
    `test_end2end.py:119-157`)."""

    request_id: str
    multimodal_output: dict[str, Any] = field(default_factory=dict)
    sample_rate: int = 24_000
    finished: bool = True


_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)


class TalkerStageEngine:
    """Omni-stage engine (`stage_type="talker"`): consumes the text stage's
    outputs and emits waveforms. One compiled synthesizer per length
    bucket."""

    def __init__(self, stage_config=None, talker_config: TalkerConfig | None = None,
                 **_):
        self.cfg = talker_config or TalkerConfig()
        self.params = jax.jit(lambda: init_params(self.cfg))()
        self._fns: dict[int, Any] = {}

    def _fn(self, T: int):
        if T not in self._fns:
            self._fns[T] = jax.jit(make_synthesizer(self.cfg))
        return self._fns[T]

    @staticmethod
    def _token_ids(item) -> tuple[str, list[int]]:
        rid = getattr(item, "request_id", None) or "talker"
        outs = getattr(item, "outputs", None)
        if outs:  # RequestOutput from an upstream llm stage
            return rid, list(outs[0].token_ids)
        if isinstance(item, str):  # raw text: byte-level fallback
            return rid, list(item.encode("utf-8"))
        if isinstance(item, (list, tuple)):
            return rid, list(item)
        raise TypeError(f"talker stage cannot consume {type(item)!r}")

    def generate(self, inputs_list: Sequence, sampling_params=None
                 ) -> list[AudioGenOutput]:
        outs = []
        for item in inputs_list:
            rid, ids = self._token_ids(item)
            ids = [min(max(i, 0), self.cfg.vocab_size - 1) for i in ids] or [0]
            T = next((b for b in _BUCKETS if b >= len(ids)), None)
            if T is None:
                T = len(ids)
            tokens = np.zeros((1, T), np.int32)
            tokens[0, : len(ids)] = ids
            wave = self._fn(T)(
                self.params, jnp.asarray(tokens), jnp.asarray([len(ids)], jnp.int32)
            )
            n = len(ids) * self.cfg.frames_per_token * self.cfg.hop
            outs.append(
                AudioGenOutput(
                    request_id=rid,
                    multimodal_output={"audio": np.asarray(wave[0, :n])},
                    sample_rate=self.cfg.sample_rate,
                )
            )
        return outs
