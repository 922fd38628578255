"""HTTP serving front end (OpenAI-compatible subset) on asyncio stdlib.

Capability parity with the reference's HTTP path (FastAPI -> AsyncLLM,
`src/doc/engine_core.md:521-539`), dependency-free: this image has no
fastapi/uvicorn, and a serving engine's HTTP layer is thin enough that
asyncio + http handcoding is a feature, not a compromise.

Endpoints:
  GET  /health
  GET  /stats
  GET  /v1/models
  POST /v1/completions        {prompt, max_tokens, temperature, top_p,
                               top_k, stop, stream, logprobs,
                               prompt_logprobs, response_format}
  POST /v1/chat/completions   {messages, ...same params}
`response_format`: {"type": "json_schema", "json_schema": {"schema":
{...}}} | {"type": "regex", "pattern": "..."} | {"type": "ebnf",
"grammar": "..."} — grammar-constrained decoding (core/grammar.py).
  POST /v1/embeddings         {input: str | [str], pooling}
SSE streaming (`data: {...}\n\n`, terminated by `data: [DONE]`).
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid

from vllm_omni_draft_tpu.core.request import OutputKind, SamplingParams
from vllm_omni_draft_tpu.engine.async_llm import AsyncLLM


def _grammar_from_body(body: dict, tokenizer):
    """OpenAI structured-output surface: response_format json_schema /
    regex / ebnf (grammar-constrained decoding, core/grammar.py)."""
    rf = body.get("response_format")
    if not rf:
        return None
    kind = rf.get("type")
    if kind in (None, "text"):
        return None
    from vllm_omni_draft_tpu.core.grammar import (
        EbnfGrammar,
        JsonSchemaGrammar,
        RegexGrammar,
    )

    if kind == "json_schema":
        schema = (rf.get("json_schema") or {}).get("schema") or rf.get("schema")
        if not schema:
            raise ValueError("response_format.json_schema.schema required")
        return JsonSchemaGrammar(schema, tokenizer)
    if kind == "regex":
        if not rf.get("pattern"):
            raise ValueError("response_format.pattern required")
        return RegexGrammar(rf["pattern"], tokenizer)
    if kind == "ebnf":
        if not rf.get("grammar"):
            raise ValueError("response_format.grammar required")
        return EbnfGrammar(rf["grammar"], tokenizer)
    raise ValueError(f"unsupported response_format type {kind!r}")


def _sampling_from_body(body: dict, tokenizer=None) -> SamplingParams:
    stop = body.get("stop") or ()
    if isinstance(stop, str):
        stop = (stop,)
    lp = body.get("logprobs")
    plp = body.get("prompt_logprobs")
    return SamplingParams(
        n=int(body.get("n", 1)),
        max_tokens=int(body.get("max_tokens", 128)),
        temperature=float(body.get("temperature", 1.0)),
        top_p=float(body.get("top_p", 1.0)),
        top_k=int(body.get("top_k", 0)),
        stop=tuple(stop),
        seed=body.get("seed"),
        logprobs=int(lp) if lp else None,
        prompt_logprobs=int(plp) if plp else None,
        grammar=_grammar_from_body(body, tokenizer),
        output_kind=OutputKind.DELTA if body.get("stream") else OutputKind.CUMULATIVE,
    )


class ApiServer:
    def __init__(self, async_llm: AsyncLLM, model_name: str = "model",
                 image_service=None):
        self.llm = async_llm
        self.model_name = model_name
        # optional diffusion stage behind queued admission + dynamic
        # batching (entrypoints/image_service.py; reference surface:
        # engine-integrated image generation,
        # `src/qwen_image_gen/worker.py:47-95`, `engine_core.md:837-943`)
        self.image_service = image_service

    # ------------------------------------------------------------------
    # HTTP plumbing
    # ------------------------------------------------------------------

    async def handle(self, reader: asyncio.StreamReader,
                     writer: asyncio.StreamWriter) -> None:
        try:
            request_line = await reader.readline()
            if not request_line:
                return
            method, path, _ = request_line.decode().split(" ", 2)
            headers = {}
            while True:
                line = await reader.readline()
                if line in (b"\r\n", b"\n", b""):
                    break
                k, _, v = line.decode().partition(":")
                headers[k.strip().lower()] = v.strip()
            body = b""
            if "content-length" in headers:
                body = await reader.readexactly(int(headers["content-length"]))
            await self._route(method, path, body, writer)
        except (ConnectionResetError, asyncio.IncompleteReadError):
            pass
        finally:
            try:
                writer.close()
                await writer.wait_closed()
            except Exception:
                pass

    async def _route(self, method: str, path: str, body: bytes,
                     writer: asyncio.StreamWriter) -> None:
        if method == "GET" and path == "/health":
            return await self._json(writer, 200, {"status": "ok"})
        if method == "GET" and path == "/stats":
            stats = self.llm.get_stats()
            return await self._json(writer, 200, {
                "running": stats["scheduler"].num_running,
                "waiting": stats["scheduler"].num_waiting,
                "kv_usage": stats["scheduler"].kv_usage,
                "spec_acceptance": stats["spec_decode"].acceptance_rate,
            })
        if method == "GET" and path == "/metrics":
            # Prometheus text exposition of the engine stats taxonomy
            # (reference surface: vLLM's /metrics endpoint; stats fields
            # per SURVEY.md §5 / engine_core.md:192-206)
            stats = self.llm.get_stats()
            sch, spec = stats["scheduler"], stats["spec_decode"]
            lines = []

            def gauge(name, value, help_text):
                lines.append(f"# HELP vot_{name} {help_text}")
                lines.append(f"# TYPE vot_{name} gauge")
                lines.append(f"vot_{name} {value}")

            gauge("num_requests_running", sch.num_running,
                  "Requests currently scheduled")
            gauge("num_requests_waiting", sch.num_waiting,
                  "Requests queued for admission")
            gauge("num_preemptions_total", sch.num_preempted_total,
                  "Cumulative scheduler preemptions")
            gauge("kv_cache_usage_perc", sch.kv_usage,
                  "Fraction of KV blocks in use")
            gauge("prefix_cache_hit_tokens", sch.prefix_cache_hit_tokens,
                  "Cumulative prompt tokens served from prefix cache")
            gauge("prefix_cache_query_tokens",
                  sch.prefix_cache_query_tokens,
                  "Cumulative prompt tokens looked up in prefix cache")
            gauge("spec_decode_draft_tokens", spec.num_draft_tokens,
                  "Cumulative draft tokens proposed")
            gauge("spec_decode_accepted_tokens", spec.num_accepted_tokens,
                  "Cumulative draft tokens accepted")
            gauge("spec_decode_acceptance_rate", spec.acceptance_rate,
                  "Accepted/drafted ratio")
            text = "\n".join(lines) + "\n"
            payload = text.encode()
            writer.write(
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/plain; version=0.0.4\r\n"
                b"Content-Length: " + str(len(payload)).encode()
                + b"\r\nConnection: close\r\n\r\n" + payload
            )
            await writer.drain()
            return
        if method == "GET" and path == "/v1/models":
            return await self._json(writer, 200, {
                "object": "list",
                "data": [{"id": self.model_name, "object": "model",
                          "owned_by": "vot"}],
            })
        if method == "POST" and path == "/v1/embeddings":
            try:
                payload = json.loads(body or b"{}")
            except json.JSONDecodeError:
                return await self._json(writer, 400, {"error": "invalid JSON"})
            inputs = payload.get("input")
            if inputs is None:
                return await self._json(writer, 400, {"error": "input required"})
            if isinstance(inputs, str):
                inputs = [inputs]
            pooling = payload.get("pooling", "mean")
            data = []
            for i, text in enumerate(inputs):
                out = await self.llm.encode(text, pooling=pooling)
                data.append({"object": "embedding", "index": i,
                             "embedding": [float(v) for v in out.data]})
            return await self._json(writer, 200, {
                "object": "list", "data": data, "model": self.model_name,
            })
        if method == "POST" and path == "/v1/images/generations":
            if self.image_service is None:
                return await self._json(
                    writer, 400,
                    {"error": "no image stage configured on this server"},
                )
            try:
                payload = json.loads(body or b"{}")
            except json.JSONDecodeError:
                return await self._json(writer, 400, {"error": "invalid JSON"})
            try:
                return await self._images(writer, payload)
            except ValueError as e:
                return await self._json(writer, 400, {"error": str(e)})
        if method == "POST" and path in ("/v1/completions", "/v1/chat/completions"):
            try:
                payload = json.loads(body or b"{}")
            except json.JSONDecodeError:
                return await self._json(writer, 400, {"error": "invalid JSON"})
            try:
                return await self._completion(
                    writer, payload, chat=path.endswith("chat/completions")
                )
            except ValueError as e:
                return await self._json(writer, 400, {"error": str(e)})
        await self._json(writer, 404, {"error": f"no route {method} {path}"})

    async def _json(self, writer, status: int, obj: dict) -> None:
        data = json.dumps(obj).encode()
        writer.write(
            f"HTTP/1.1 {status} X\r\nContent-Type: application/json\r\n"
            f"Content-Length: {len(data)}\r\nConnection: close\r\n\r\n".encode()
            + data
        )
        await writer.drain()

    # ------------------------------------------------------------------
    # completion endpoints
    # ------------------------------------------------------------------

    async def _completion(self, writer, body: dict, chat: bool) -> None:
        if chat:
            messages = body.get("messages")
            if not messages:
                raise ValueError("messages required")
            prompt = self.llm.tokenizer.apply_chat_template(
                messages, add_generation_prompt=True
            )
        else:
            prompt = body.get("prompt")
            if prompt is None:
                raise ValueError("prompt required")
        sp = _sampling_from_body(body, self.llm.tokenizer)
        rid = f"cmpl-{uuid.uuid4().hex[:16]}"
        created = int(time.time())
        stream = bool(body.get("stream"))

        if stream:
            writer.write(
                b"HTTP/1.1 200 OK\r\nContent-Type: text/event-stream\r\n"
                b"Cache-Control: no-cache\r\nConnection: close\r\n\r\n"
            )
            await writer.drain()
            async for out in self.llm.generate(prompt, sp, request_id=rid):
                # one SSE chunk per completion delta; with n>1 each chunk
                # carries the choice index it belongs to
                for comp in out.outputs or []:
                    chunk = {
                        "id": rid,
                        "object": "chat.completion.chunk" if chat else "text_completion",
                        "created": created,
                        "model": self.model_name,
                        "choices": [{
                            "index": comp.index,
                            **({"delta": {"content": comp.text}} if chat
                               else {"text": comp.text}),
                            "finish_reason": comp.finish_reason,
                        }],
                    }
                    writer.write(f"data: {json.dumps(chunk)}\n\n".encode())
                    await writer.drain()
            writer.write(b"data: [DONE]\n\n")
            await writer.drain()
            return

        final = None
        async for out in self.llm.generate(prompt, sp, request_id=rid):
            final = out
        # with n>1 the final RequestOutput aggregates all n child
        # completions (AsyncLLM parent/child fan-out); build one choice
        # per CompletionOutput, indexed 0..n-1
        choices = []
        n_out = 0
        for comp in (final.outputs if final else []) or []:
            lp_field = (
                {"token_logprobs": [
                    {str(k): v for k, v in step.items()}
                    for step in comp.logprobs
                ]}
                if comp.logprobs
                else {}
            )
            choices.append({
                "index": comp.index,
                **({"message": {"role": "assistant", "content": comp.text}}
                   if chat else {"text": comp.text}),
                "finish_reason": comp.finish_reason,
                **({"logprobs": lp_field} if lp_field else {}),
            })
            n_out += len(comp.token_ids)
        if not choices:
            choices = [{
                "index": 0,
                **({"message": {"role": "assistant", "content": ""}} if chat
                   else {"text": ""}),
                "finish_reason": None,
            }]
        resp = {
            "id": rid,
            "object": "chat.completion" if chat else "text_completion",
            "created": created,
            "model": self.model_name,
            "choices": choices,
            "usage": {
                "prompt_tokens": len(final.prompt_token_ids) if final else 0,
                "completion_tokens": n_out,
                "total_tokens": (len(final.prompt_token_ids) if final else 0) + n_out,
            },
        }
        await self._json(writer, 200, resp)


    # ------------------------------------------------------------------
    # image generation (OpenAI images surface over the diffusion stage)
    # ------------------------------------------------------------------

    async def _images(self, writer, body: dict) -> None:
        """POST /v1/images/generations: {prompt, n, size "WxH",
        num_inference_steps, guidance_scale, seed,
        response_format: "b64_json" | "latents"}. n>1 fans out to n
        seeds; all n jobs enqueue together, so they run as ONE batched
        denoise (dynamic batching also groups concurrent clients)."""
        prompt = body.get("prompt")
        if not prompt:
            raise ValueError("prompt required")
        n = int(body.get("n", 1))
        if not 1 <= n <= 8:
            raise ValueError("n must be in [1, 8]")
        rf = body.get("response_format", "b64_json")
        if rf not in ("b64_json", "latents"):
            raise ValueError(f"unsupported response_format {rf!r}")
        seed0 = body.get("seed")
        jobs = []
        for i in range(n):
            jobs.append(self.image_service.submit(self.image_service.build_inputs(
                prompt,
                size=body.get("size", "256x256"),
                steps=int(body.get("num_inference_steps", 4)),
                guidance=float(body.get("guidance_scale", 2.0)),
                seed=(int(seed0) + i) if seed0 is not None else i,
            )))
        outs = await asyncio.gather(*jobs)
        from vllm_omni_draft_tpu.entrypoints.image_service import (
            pixels_to_png_b64,
        )

        data = []
        for out in outs:
            if rf == "b64_json":
                data.append({"b64_json": pixels_to_png_b64(out.pixels)})
            else:
                import numpy as _np

                lat = _np.asarray(out.latents)
                data.append({"latents": lat.tolist(),
                             "shape": list(lat.shape)})
        await self._json(writer, 200, {
            "created": int(time.time()), "data": data,
        })


async def serve(async_llm: AsyncLLM, host: str = "127.0.0.1", port: int = 8000,
                model_name: str = "model", image_service=None):
    server = ApiServer(async_llm, model_name, image_service=image_service)
    srv = await asyncio.start_server(server.handle, host, port)
    return srv


def run_server(config, host="127.0.0.1", port=8000, model_name="model"):
    async def main():
        llm = AsyncLLM(config)
        srv = await serve(llm, host, port, model_name)
        print(f"vot serving on http://{host}:{port}")
        async with srv:
            await srv.serve_forever()

    asyncio.run(main())
