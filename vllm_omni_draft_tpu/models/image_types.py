"""Image-generation request schema.

Capability parity with the reference's `QwenImageCustomInputs`
(`src/qwen_image/types.py:29-106`) and the simplified gen variant
(`src/qwen_image_gen/types.py:10-39`): prompt embeddings + mask, optional
image/control latents, image shapes, step count, guidance, seed, task
routing (T2I / I2I / TI2I) and output modes — validated up front, since
these cross an engine boundary in the dual-engine design.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any

import numpy as np

# routing constants (reference: types.py:22-26)
TASK_IMAGE_GENERATION = "image_generation"
CUSTOM_INPUTS_KEY = "image_custom_inputs"


class ImageTask(str, enum.Enum):
    TEXT_TO_IMAGE = "t2i"
    IMAGE_TO_IMAGE = "i2i"
    TEXT_IMAGE_TO_IMAGE = "ti2i"


class ImageOutputMode(str, enum.Enum):
    PIXELS = "pixels"
    LATENTS = "latents"
    PIXELS_AND_LATENTS = "pixels_and_latents"


@dataclass
class ImageGenInputs:
    """Inputs to the diffusion stage. Arrays may be numpy or jax."""

    prompt_embeds: Any = None          # [B, T_txt, D_txt]
    prompt_embeds_mask: Any = None     # [B, T_txt] 1/0
    image_latents: Any = None          # [B, C, H/8, W/8] (I2I init)
    control_latents: Any = None        # [B, C, H/8, W/8]
    height: int = 1024
    width: int = 1024
    num_inference_steps: int = 50
    guidance_scale: float = 4.0
    seed: int | None = None
    task: ImageTask = ImageTask.TEXT_TO_IMAGE
    output_mode: ImageOutputMode = ImageOutputMode.PIXELS
    extras: dict = field(default_factory=dict)


def validate_image_inputs(inputs: ImageGenInputs) -> None:
    """Schema validation (reference: `validate_custom_inputs`,
    types.py:29-106)."""
    if inputs.num_inference_steps < 1:
        raise ValueError("num_inference_steps must be >= 1")
    if inputs.guidance_scale < 0:
        raise ValueError("guidance_scale must be >= 0")
    if inputs.height % 8 or inputs.width % 8:
        raise ValueError("height/width must be multiples of 8 (VAE stride)")
    if inputs.prompt_embeds is not None:
        pe = np.asarray(inputs.prompt_embeds)
        if pe.ndim != 3:
            raise ValueError(f"prompt_embeds must be [B, T, D], got {pe.shape}")
        if inputs.prompt_embeds_mask is not None:
            m = np.asarray(inputs.prompt_embeds_mask)
            if m.shape != pe.shape[:2]:
                raise ValueError(
                    f"mask shape {m.shape} != prompt_embeds[:2] {pe.shape[:2]}"
                )
    if inputs.task in (ImageTask.IMAGE_TO_IMAGE, ImageTask.TEXT_IMAGE_TO_IMAGE):
        if inputs.image_latents is None:
            raise ValueError(f"task {inputs.task} requires image_latents")
    if inputs.image_latents is not None:
        il = np.asarray(inputs.image_latents)
        if il.ndim not in (4, 5):
            raise ValueError(
                f"image_latents must be 4-D or 5-D, got {il.ndim}-D"
            )


@dataclass
class ImageGenOutputs:
    latents: Any = None
    pixels: Any = None
