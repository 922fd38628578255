"""Image-generation input builder (the AR→DiT handoff).

Capability parity with the reference's preprocessor
(`src/qwen_image/processor.py`): build `ImageGenInputs` outside the
tokenizer flow — the prompt is run through the language model and its
final hidden states become the DiT's text conditioning
(`get_qwen_prompt_embeds`, processor.py:52-60, with chat-template
start-index slicing :32-38), and input images are VAE-encoded into
latents (:64-92).

This is the embedding handoff that motivates the disaggregated AR→DiT
architecture (`engine_core.md:837-943`): the handoff payload is device
arrays, not re-tokenized text.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_draft_tpu.config import ModelConfig
from vllm_omni_draft_tpu.models import get_model
from vllm_omni_draft_tpu.models.image_types import (
    ImageGenInputs,
    ImageTask,
    validate_image_inputs,
)
from vllm_omni_draft_tpu.ops.attention import AttentionMetadata


class ImageGenProcessor:
    """Builds DiT conditioning from a language model + VAE.

    `lm_params` may be shared with a running text engine (read-only)."""

    def __init__(self, lm_cfg: ModelConfig, lm_params: dict, tokenizer,
                 vae=None, prompt_template: str | None = None,
                 template_start_idx: int = 0):
        self.cfg = lm_cfg
        self.params = lm_params
        self.tokenizer = tokenizer
        self.vae = vae
        # chat-style wrapping with start-idx slicing (reference
        # processor.py:32-38): embeddings of the template prefix are
        # dropped from the conditioning
        self.prompt_template = prompt_template
        self.template_start_idx = template_start_idx
        self._mod = get_model(lm_cfg.model)
        self._fwd = jax.jit(self._hidden_states)

    def _hidden_states(self, params, tokens, positions, meta, kv):
        fwd = self._mod.make_forward(self.cfg)
        hidden, _ = fwd(params, tokens, positions, kv, meta)
        return hidden

    def get_prompt_embeds(self, prompt: str) -> tuple[np.ndarray, np.ndarray]:
        """prompt -> (embeds [1, T', D], mask [1, T']) where T' drops the
        template prefix."""
        text = (
            self.prompt_template.format(prompt)
            if self.prompt_template
            else prompt
        )
        ids = self.tokenizer.encode(text)
        T = len(ids)
        bs = 16
        nb = -(-T // bs)
        kv = self._mod.init_kv_cache(self.cfg, num_blocks=nb + 1, block_size=bs)
        table = np.arange(1, nb + 1, dtype=np.int32)[None, :]
        pos = np.arange(T, dtype=np.int32)[None, :]
        slots = table[0, pos // bs] * bs + pos % bs
        meta = AttentionMetadata(
            block_tables=jnp.asarray(table),
            kv_lens=jnp.asarray([T], jnp.int32),
            positions=jnp.asarray(pos),
            slot_mapping=jnp.asarray(slots.astype(np.int32)),
        )
        hidden = self._fwd(
            self.params, jnp.asarray([ids], jnp.int32), meta.positions, meta, kv
        )
        start = self.template_start_idx
        embeds = np.asarray(hidden)[:, start:, :]
        mask = np.ones(embeds.shape[:2], np.int32)
        return embeds, mask

    # ------------------------------------------------------------------

    def build_inputs_text_only(self, prompt: str, **gen_kwargs) -> ImageGenInputs:
        """T2I (reference: build_custom_inputs_text_only)."""
        embeds, mask = self.get_prompt_embeds(prompt)
        inputs = ImageGenInputs(
            prompt_embeds=embeds,
            prompt_embeds_mask=mask,
            task=ImageTask.TEXT_TO_IMAGE,
            extras={"cache_key": hash((prompt, "t2i"))},
            **gen_kwargs,
        )
        validate_image_inputs(inputs)
        return inputs

    def build_inputs_with_image(self, prompt: str, image, seed: int = 0,
                                **gen_kwargs) -> ImageGenInputs:
        """TI2I: prompt embeddings + VAE-encoded image latents
        (reference: the processor+image path, runner_adapter.py:71-108)."""
        if self.vae is None:
            raise ValueError("a VAE is required for image-conditioned tasks")
        embeds, mask = self.get_prompt_embeds(prompt)
        latents = np.asarray(self.vae.encode(image, seed=seed))
        inputs = ImageGenInputs(
            prompt_embeds=embeds,
            prompt_embeds_mask=mask,
            image_latents=latents,
            task=ImageTask.TEXT_IMAGE_TO_IMAGE,
            seed=seed,
            **gen_kwargs,
        )
        validate_image_inputs(inputs)
        return inputs
