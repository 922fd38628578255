"""Async front end, HTTP API server, and ZMQ engine-proc split."""

import asyncio
import json
import threading

import pytest

from vllm_omni_draft_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllm_omni_draft_tpu.core.request import OutputKind, SamplingParams
from vllm_omni_draft_tpu.engine.async_llm import AsyncLLM


def _tiny_config():
    return EngineConfig(
        model=ModelConfig.tiny(vocab_size=258, max_model_len=128),
        cache=CacheConfig(block_size=8, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=64, prefill_buckets=(16, 64)
        ),
    )


@pytest.fixture()
def async_llm():
    llm = AsyncLLM(_tiny_config())
    yield llm
    llm.shutdown()


def test_async_generate_streams_and_finishes(async_llm):
    async def run():
        outs = []
        sp = SamplingParams(max_tokens=8, temperature=0.0,
                            output_kind=OutputKind.DELTA)
        async for out in async_llm.generate("hello async", sp):
            outs.append(out)
        return outs

    outs = asyncio.run(run())
    assert outs[-1].finished
    assert sum(len(o.outputs[0].token_ids) for o in outs) == 8


def test_async_concurrent_requests(async_llm):
    async def run():
        sp = SamplingParams(max_tokens=6, temperature=0.0)

        async def one(prompt):
            last = None
            async for out in async_llm.generate(prompt, sp):
                last = out
            return last

        return await asyncio.gather(*(one(f"prompt {i}") for i in range(5)))

    results = asyncio.run(run())
    assert all(r.finished for r in results)
    assert all(len(r.outputs[0].token_ids) == 6 for r in results)


def test_async_generate_n3_fanout(async_llm):
    """n>1 parent/child fan-out on the SERVING path (reference: async
    OutputProcessor fan-out, engine_core.md:815-822): the final output
    aggregates n distinct indexed completions."""
    async def run():
        sp = SamplingParams(n=3, max_tokens=8, temperature=1.0, seed=7,
                            ignore_eos=True)
        last = None
        async for out in async_llm.generate("fan me out", sp):
            last = out
        return last

    final = asyncio.run(run())
    assert final.finished
    assert [c.index for c in final.outputs] == [0, 1, 2]
    seqs = [tuple(c.token_ids) for c in final.outputs]
    assert all(len(s) == 8 for s in seqs)
    assert len(set(seqs)) == 3, "choices should be distinct under distinct seeds"
    assert all(c.finish_reason == "length" for c in final.outputs)


def test_async_generate_n2_delta_stream_indices(async_llm):
    """DELTA streaming with n=2: every chunk is labelled with its choice
    index and both children stream to completion."""
    async def run():
        sp = SamplingParams(n=2, max_tokens=6, temperature=1.0, seed=3,
                            ignore_eos=True, output_kind=OutputKind.DELTA)
        chunks = []
        async for out in async_llm.generate("stream two ways", sp):
            chunks.append(out)
        return chunks

    chunks = asyncio.run(run())
    assert chunks[-1].finished
    per_index: dict[int, list[int]] = {0: [], 1: []}
    for out in chunks:
        for comp in out.outputs:
            per_index[comp.index].extend(comp.token_ids)
    assert len(per_index[0]) == 6 and len(per_index[1]) == 6


def test_async_loop_purges_finished_requests(async_llm):
    """The serving loop must not leak finished requests in
    scheduler.requests (n-fold with fan-out; advisor round-5)."""
    async def run():
        sp = SamplingParams(n=3, max_tokens=4, temperature=1.0, seed=1,
                            ignore_eos=True)
        async for _ in async_llm.generate("leak check", sp):
            pass

    asyncio.run(run())
    import time

    for _ in range(100):
        if not async_llm.engine.scheduler.requests:
            break
        time.sleep(0.02)
    assert not async_llm.engine.scheduler.requests, (
        f"finished requests lingering: "
        f"{list(async_llm.engine.scheduler.requests)}"
    )


def test_async_cancellation_aborts(async_llm):
    async def run():
        sp = SamplingParams(max_tokens=1000, temperature=0.0, ignore_eos=True)
        agen = async_llm.generate("long running", sp)
        out = None
        async for out in agen:
            break
        await agen.aclose()
        await asyncio.sleep(0.1)
        return out

    asyncio.run(run())
    # after cancellation the engine should drain to idle
    import time

    for _ in range(100):
        if not async_llm.engine.has_unfinished():
            break
        time.sleep(0.05)
    assert not async_llm.engine.has_unfinished()


def test_api_server_completions(async_llm):
    async def run():
        from vllm_omni_draft_tpu.entrypoints.api_server import serve

        srv = await serve(async_llm, host="127.0.0.1", port=0)
        port = srv.sockets[0].getsockname()[1]

        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        body = json.dumps({"prompt": "hi there", "max_tokens": 5,
                           "temperature": 0.0}).encode()
        writer.write(
            b"POST /v1/completions HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode() + body
        )
        await writer.drain()
        raw = await reader.read()
        writer.close()
        head, _, payload = raw.partition(b"\r\n\r\n")
        assert b"200" in head.split(b"\r\n")[0]
        resp = json.loads(payload)
        srv.close()
        return resp

    resp = asyncio.run(run())
    assert resp["choices"][0]["finish_reason"] == "length"
    assert resp["usage"]["completion_tokens"] == 5


def test_api_server_completions_n2(async_llm):
    """`n` in the HTTP body produces n indexed choices (previously the
    server silently returned a single index-0 choice)."""
    async def run():
        from vllm_omni_draft_tpu.entrypoints.api_server import serve

        srv = await serve(async_llm, host="127.0.0.1", port=0)
        port = srv.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        body = json.dumps({"prompt": "hi there", "max_tokens": 5, "n": 2,
                           "temperature": 1.0, "seed": 11}).encode()
        writer.write(
            b"POST /v1/completions HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode() + body
        )
        await writer.drain()
        raw = await reader.read()
        writer.close()
        _, _, payload = raw.partition(b"\r\n\r\n")
        resp = json.loads(payload)
        srv.close()
        return resp

    resp = asyncio.run(run())
    assert [c["index"] for c in resp["choices"]] == [0, 1]
    assert all(c["finish_reason"] == "length" for c in resp["choices"])
    assert resp["usage"]["completion_tokens"] == 10


def test_api_server_streaming_sse(async_llm):
    async def run():
        from vllm_omni_draft_tpu.entrypoints.api_server import serve

        srv = await serve(async_llm, host="127.0.0.1", port=0)
        port = srv.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        body = json.dumps({
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4, "temperature": 0.0, "stream": True,
        }).encode()
        writer.write(
            b"POST /v1/chat/completions HTTP/1.1\r\nHost: x\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode() + body
        )
        await writer.drain()
        raw = await reader.read()
        writer.close()
        srv.close()
        return raw.decode()

    raw = asyncio.run(run())
    assert "text/event-stream" in raw
    assert raw.rstrip().endswith("data: [DONE]")
    chunks = [l for l in raw.splitlines() if l.startswith("data: {")]
    assert len(chunks) >= 1
    assert json.loads(chunks[0][6:])["object"] == "chat.completion.chunk"


def test_api_server_bad_request(async_llm):
    async def run():
        from vllm_omni_draft_tpu.entrypoints.api_server import serve

        srv = await serve(async_llm, host="127.0.0.1", port=0)
        port = srv.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(
            b"POST /v1/completions HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: 2\r\n\r\n{}"
        )
        await writer.drain()
        raw = await reader.read()
        writer.close()
        srv.close()
        return raw

    raw = asyncio.run(run())
    assert b"400" in raw.split(b"\r\n")[0]


@pytest.mark.integration
def test_engine_proc_split_over_zmq():
    zmq = pytest.importorskip("zmq")
    from vllm_omni_draft_tpu.engine.ipc import EngineCoreClient

    client = EngineCoreClient(_tiny_config())
    try:
        sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
        client.add_request("r1", [1, 2, 3], sp)
        client.add_request("r2", [7, 8, 9, 10], sp)
        got: dict[str, list[int]] = {"r1": [], "r2": []}
        finished = set()
        for _ in range(100):
            outs = client.get_output(timeout=10)
            assert outs is not None, "engine proc produced no output"
            for rid, toks, fin, _status in outs.outputs:
                got[rid].extend(toks)
                if fin:
                    finished.add(rid)
            if finished == {"r1", "r2"}:
                break
        assert finished == {"r1", "r2"}
        assert len(got["r1"]) == 6 and len(got["r2"]) == 6
        # utility op round-trip
        stats = client.call_utility("get_stats")
        assert "scheduler" in stats
    finally:
        client.shutdown()


@pytest.mark.integration
def test_engine_proc_death_raises_not_hangs():
    """Killing the engine proc mid-stream must surface EngineCoreError to
    the client (output readers AND utility callers), not hang
    (VERDICT r1 item 10's done-condition)."""
    pytest.importorskip("zmq")
    from vllm_omni_draft_tpu.engine.ipc import EngineCoreClient, EngineCoreError

    client = EngineCoreClient(_tiny_config())
    try:
        sp = SamplingParams(max_tokens=500, temperature=0.0, ignore_eos=True)
        client.add_request("r1", [1, 2, 3], sp)
        outs = client.get_output(timeout=30)
        assert outs is not None  # stream is live
        client.proc.kill()  # simulate OOM-kill / crash
        with pytest.raises(EngineCoreError):
            for _ in range(200):  # bounded: must raise, not loop forever
                client.get_output(timeout=5)
        # utility callers must also fail fast, not time out
        with pytest.raises((EngineCoreError, TimeoutError)):
            client.call_utility("get_stats", timeout=5)
    finally:
        client.shutdown()


@pytest.mark.integration
def test_engine_proc_utility_errors_and_correlation():
    """Utility exceptions come back as raising replies; concurrent
    utility calls each receive THEIR OWN reply (sequence correlation)."""
    pytest.importorskip("zmq")
    from vllm_omni_draft_tpu.engine.ipc import EngineCoreClient, EngineCoreError

    client = EngineCoreClient(_tiny_config())
    try:
        with pytest.raises(EngineCoreError, match="no_such_method"):
            client.call_utility("no_such_method")
        # the proc must still be healthy after a failed utility
        stats = client.call_utility("get_stats")
        assert "scheduler" in stats
        # interleaved utilities from two threads resolve correctly
        results = {}

        def call(name, key):
            results[key] = client.call_utility(name)

        ts = [threading.Thread(target=call, args=("get_stats", i))
              for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        assert len(results) == 4
        assert all("scheduler" in r for r in results.values())
    finally:
        client.shutdown()


def test_api_server_models_and_embeddings(async_llm):
    async def run():
        from vllm_omni_draft_tpu.entrypoints.api_server import serve

        srv = await serve(async_llm, host="127.0.0.1", port=0,
                          model_name="tiny-model")
        port = srv.sockets[0].getsockname()[1]

        async def req(method, path, obj=None):
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            body = json.dumps(obj).encode() if obj is not None else b""
            head = f"{method} {path} HTTP/1.1\r\nHost: x\r\n"
            if body:
                head += (
                    "Content-Type: application/json\r\n"
                    f"Content-Length: {len(body)}\r\n"
                )
            writer.write(head.encode() + b"\r\n" + body)
            await writer.drain()
            raw = await reader.read()
            writer.close()
            h, _, payload = raw.partition(b"\r\n\r\n")
            return int(h.split(b" ")[1]), json.loads(payload)

        status, models = await req("GET", "/v1/models")
        assert status == 200
        assert models["data"][0]["id"] == "tiny-model"

        status, emb = await req(
            "POST", "/v1/embeddings", {"input": ["hello", "world"]}
        )
        assert status == 200
        assert len(emb["data"]) == 2
        D = async_llm.config.model.hidden_size
        assert len(emb["data"][0]["embedding"]) == D
        assert emb["data"][0]["embedding"] != emb["data"][1]["embedding"]

        status, err = await req("POST", "/v1/embeddings", {})
        assert status == 400
        srv.close()

    asyncio.run(run())


def test_api_server_metrics_prometheus(async_llm):
    """GET /metrics serves Prometheus text exposition of engine stats."""
    async def run():
        from vllm_omni_draft_tpu.entrypoints.api_server import serve

        srv = await serve(async_llm, host="127.0.0.1", port=0)
        port = srv.sockets[0].getsockname()[1]
        # generate something so counters move
        sp = SamplingParams(max_tokens=4, temperature=0.0)
        async for _ in async_llm.generate("metrics probe", sp):
            pass
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(b"GET /metrics HTTP/1.1\r\nHost: x\r\n\r\n")
        await writer.drain()
        raw = await reader.read()
        writer.close()
        srv.close()
        head, _, payload = raw.partition(b"\r\n\r\n")
        assert b" 200 " in head.split(b"\r\n")[0]
        assert b"text/plain" in head
        text = payload.decode()
        for metric in ("vot_num_requests_running",
                       "vot_kv_cache_usage_perc",
                       "vot_spec_decode_acceptance_rate"):
            assert f"# TYPE {metric} gauge" in text
            assert any(
                ln.startswith(metric + " ") for ln in text.splitlines()
            ), metric

    asyncio.run(run())


def test_api_server_response_format_json_schema(async_llm):
    """OpenAI structured-output surface: response_format json_schema
    yields schema-valid JSON from the API."""
    async def run():
        from vllm_omni_draft_tpu.entrypoints.api_server import serve

        srv = await serve(async_llm, host="127.0.0.1", port=0)
        port = srv.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        body = json.dumps({
            "prompt": "emit json:",
            "max_tokens": 48,
            "temperature": 0.0,
            "response_format": {
                "type": "json_schema",
                "json_schema": {"schema": {
                    "type": "object",
                    "properties": {"ok": {"type": "boolean"},
                                   "n": {"enum": [1, 2]}},
                    "required": ["ok", "n"],
                }},
            },
        }).encode()
        writer.write(
            b"POST /v1/completions HTTP/1.1\r\nHost: x\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode() + body
        )
        await writer.drain()
        raw = await reader.read()
        writer.close()
        srv.close()
        _, _, payload = raw.partition(b"\r\n\r\n")
        return json.loads(payload)

    resp = asyncio.run(run())
    doc = json.loads(resp["choices"][0]["text"])
    assert isinstance(doc["ok"], bool) and doc["n"] in (1, 2)


def test_api_server_bad_response_format(async_llm):
    async def run():
        from vllm_omni_draft_tpu.entrypoints.api_server import serve

        srv = await serve(async_llm, host="127.0.0.1", port=0)
        port = srv.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        body = json.dumps({
            "prompt": "x", "response_format": {"type": "yaml"},
        }).encode()
        writer.write(
            b"POST /v1/completions HTTP/1.1\r\nHost: x\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode() + body
        )
        await writer.drain()
        raw = await reader.read()
        writer.close()
        srv.close()
        return raw

    raw = asyncio.run(run())
    assert b"400" in raw.split(b"\r\n")[0]


def test_api_server_image_generations(async_llm):
    """HTTP T2I end-to-end on the synthetic diffusion stage (round-4:
    served image route; reference runs image generation through the
    serving engine, `src/qwen_image_gen/worker.py:47-95`). n=2 jobs
    enqueue together and run as ONE batched denoise; the response
    carries decodable base64 PNGs."""
    import base64

    from vllm_omni_draft_tpu.entrypoints.image_service import ImageService
    from vllm_omni_draft_tpu.models.dit import (
        DiffusionStageEngine, DiTConfig,
    )
    from vllm_omni_draft_tpu.models.vae import VAE, VAEConfig

    eng = DiffusionStageEngine(dit_config=DiTConfig(
        latent_channels=4, patch_size=2, hidden_size=64, depth=2,
        num_heads=4, text_dim=32, dtype="float32",
    ))
    eng.vae = VAE(VAEConfig(latent_channels=4, base_channels=16))
    svc = ImageService(eng)

    async def run():
        from vllm_omni_draft_tpu.entrypoints.api_server import serve

        srv = await serve(async_llm, host="127.0.0.1", port=0,
                          image_service=svc)
        port = srv.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        body = json.dumps({"prompt": "a red fox", "n": 2,
                           "size": "32x32", "num_inference_steps": 2,
                           "seed": 5}).encode()
        writer.write(
            b"POST /v1/images/generations HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode() + body
        )
        await writer.drain()
        raw = await reader.read()
        writer.close()
        head, _, payload = raw.partition(b"\r\n\r\n")
        assert b"200" in head.split(b"\r\n")[0]
        resp = json.loads(payload)
        srv.close()
        return resp

    resp = asyncio.run(run())
    assert len(resp["data"]) == 2
    png0 = base64.b64decode(resp["data"][0]["b64_json"])
    assert png0.startswith(b"\x89PNG\r\n\x1a\n")
    # different seeds -> different images
    assert resp["data"][0]["b64_json"] != resp["data"][1]["b64_json"]
    # n=2 grouped into one batched generate call
    assert svc.num_generated == 2


def test_api_server_image_route_unconfigured(async_llm):
    async def run():
        from vllm_omni_draft_tpu.entrypoints.api_server import serve

        srv = await serve(async_llm, host="127.0.0.1", port=0)
        port = srv.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        body = json.dumps({"prompt": "x"}).encode()
        writer.write(
            b"POST /v1/images/generations HTTP/1.1\r\nHost: x\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode() + body
        )
        await writer.drain()
        raw = await reader.read()
        writer.close()
        srv.close()
        return raw

    raw = asyncio.run(run())
    assert b"400" in raw.split(b"\r\n")[0]
