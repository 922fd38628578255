"""Served image generation: queued admission + dynamic batching over the
diffusion stage.

The reference runs image generation THROUGH the serving engine (its
worker branches execute_model into a diffusion path,
`/root/reference/src/qwen_image_gen/worker.py:47-95`, and the dual-engine
design queues image jobs next to text jobs, `engine_core.md:837-943`).
The TPU-native form here: an asyncio admission queue in front of
`DiffusionStageEngine.generate` — jobs that arrive while a multi-second
denoise is on the device are grouped and submitted as ONE batched scan
(the round-4 batched diffusion path), which is exactly the dynamic
batching the reference's ParallelDecodeManager provides for VAE decode.

Text conditioning: a pluggable `text_encoder(prompt) -> [1, T, D]`
callable. The default is a deterministic byte-hash embedder (synthetic
stages / tests); production wires the AR stage's hidden states through
the Omni pipeline instead (entrypoints/omni.py).
"""

from __future__ import annotations

import asyncio
import base64
import hashlib
import struct
import zlib

import numpy as np

from vllm_omni_draft_tpu.models.image_types import (
    ImageGenInputs,
    ImageOutputMode,
)


def default_text_encoder(prompt: str, dim: int, max_tokens: int = 32):
    """Deterministic whitespace-token byte-hash embeddings [1, T, dim]:
    a stand-in conditioning encoder for synthetic stages (same prompt ->
    same embedding; different prompts -> nearly orthogonal rows)."""
    words = prompt.split()[:max_tokens] or [""]
    rows = []
    for i, w in enumerate(words):
        seed = int.from_bytes(
            hashlib.sha256(f"{i}:{w}".encode()).digest()[:8], "little"
        )
        rng = np.random.default_rng(seed)
        rows.append(rng.standard_normal(dim, dtype=np.float32))
    return np.stack(rows)[None]  # [1, T, dim]


def encode_png(img: np.ndarray) -> bytes:
    """Minimal RGB(A) PNG encoder (stdlib zlib; no PIL dependency).
    img: [H, W, 3] uint8."""
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(
        b"\x00" + img[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def pixels_to_png_b64(pixels: np.ndarray) -> str:
    """[1, 3, H, W] float in [-1, 1] (VAE decode output) -> base64 PNG."""
    px = np.asarray(pixels)[0]
    px = np.clip((px + 1.0) * 127.5, 0, 255).astype(np.uint8)
    return base64.b64encode(encode_png(px.transpose(1, 2, 0))).decode()


class ImageService:
    """Queued admission + dynamic batching in front of a diffusion stage.

    Jobs enqueue immediately; a single worker drains up to
    `max_batch_size` queued jobs at a time and submits them as one
    `generate()` call (same-shape jobs batch into one denoise program).
    The device work runs in a thread so the event loop keeps admitting
    while a batch is on the chip.
    """

    def __init__(self, engine, text_encoder=None, max_batch_size: int = 4):
        self.engine = engine
        self.max_batch_size = max_batch_size
        cfg = engine.cfg
        self.text_dim = getattr(cfg, "joint_attention_dim", None) or getattr(
            cfg, "text_dim"
        )
        self.text_encoder = text_encoder or (
            lambda prompt: default_text_encoder(prompt, self.text_dim)
        )
        self._queue: asyncio.Queue = asyncio.Queue()
        self._worker: asyncio.Task | None = None
        self.num_generated = 0

    def build_inputs(self, prompt: str, *, size: str = "256x256",
                     steps: int = 4, guidance: float = 2.0,
                     seed: int | None = None) -> ImageGenInputs:
        try:
            w, h = (int(v) for v in size.lower().split("x"))
        except Exception:
            raise ValueError(f"size must be 'WxH', got {size!r}")
        pe = self.text_encoder(prompt)
        return ImageGenInputs(
            prompt_embeds=pe,
            prompt_embeds_mask=np.ones(pe.shape[:2], np.int32),
            height=h, width=w,
            num_inference_steps=steps, guidance_scale=guidance, seed=seed,
            output_mode=ImageOutputMode.PIXELS_AND_LATENTS,
        )

    async def submit(self, inputs: ImageGenInputs):
        """Enqueue a job; resolves to its ImageGenOutputs."""
        if self._worker is None or self._worker.done():
            self._worker = asyncio.get_running_loop().create_task(
                self._run_worker()
            )
        fut = asyncio.get_running_loop().create_future()
        await self._queue.put((inputs, fut))
        return await fut

    async def _run_worker(self):
        while True:
            first = await self._queue.get()
            batch = [first]
            while (len(batch) < self.max_batch_size
                   and not self._queue.empty()):
                batch.append(self._queue.get_nowait())
            inps = [b[0] for b in batch]
            try:
                outs = await asyncio.get_running_loop().run_in_executor(
                    None, self.engine.generate, inps
                )
                self.num_generated += len(outs)
                for (_, fut), out in zip(batch, outs):
                    if not fut.done():
                        fut.set_result(out)
            except Exception as e:  # propagate per-job
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
