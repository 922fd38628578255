"""KV connector: prefill/decode disaggregation across engine instances
(reference hooks: kv_connector_metadata / kv_transfer_params,
`engine_core.md:271, 312-313, 337`). The decode instance must continue
the prefill instance's request token-for-token without recomputing."""

import numpy as np
import pytest

from vllm_omni_draft_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllm_omni_draft_tpu.core.engine import EngineCore
from vllm_omni_draft_tpu.core.kv_connector import (
    FileConnector,
    InMemoryConnector,
    export_request_kv,
    import_request_kv,
)
from vllm_omni_draft_tpu.core.request import Request, SamplingParams


def _engine(kv_dtype="bfloat16"):
    return EngineCore(EngineConfig(
        model=ModelConfig.tiny(
            vocab_size=258, max_model_len=128, kv_cache_dtype=kv_dtype
        ),
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  prefill_buckets=(16, 64)),
        seed=0,
    ))


PROMPT = [5, 9, 14, 22, 37, 41, 58, 3, 99, 120, 7]


def _reference_tokens(n):
    eng = _engine()
    eng.add_request(Request(
        request_id="ref", prompt_token_ids=PROMPT,
        sampling_params=SamplingParams(max_tokens=n, temperature=0.0,
                                       ignore_eos=True),
    ))
    while eng.has_unfinished():
        eng.step()
    return eng.scheduler.requests["ref"].output_token_ids


@pytest.mark.parametrize("connector_kind", ["memory", "file"])
def test_prefill_decode_disaggregation(connector_kind, tmp_path):
    ref = _reference_tokens(8)

    connector = (
        InMemoryConnector() if connector_kind == "memory"
        else FileConnector(str(tmp_path))
    )

    # --- prefill instance: one step = prompt KV + first token; export
    # while the request is LIVE (its blocks are freed on finish), then
    # hand off by aborting locally — the disaggregation flow ---
    pre = _engine()
    pre.add_request(Request(
        request_id="r1", prompt_token_ids=PROMPT,
        sampling_params=SamplingParams(max_tokens=8, temperature=0.0,
                                       ignore_eos=True),
    ))
    pre.step()
    first = list(pre.scheduler.requests["r1"].output_token_ids)
    assert first == ref[:1]
    connector.publish("r1", export_request_kv(pre, "r1"))
    pre.abort_requests(["r1"])

    # --- decode instance (same weights via same config+seed) ---
    dec = _engine()
    payload = connector.fetch("r1")
    assert payload is not None
    assert connector.fetch("r1") is None  # consumed
    req = Request(
        request_id="r1", prompt_token_ids=PROMPT,
        sampling_params=SamplingParams(max_tokens=8, temperature=0.0,
                                       ignore_eos=True),
    )
    import_request_kv(dec, req, payload)
    assert req.output_token_ids == first  # adopted, not recomputed
    while dec.has_unfinished():
        dec.step()
    assert req.output_token_ids == ref, (req.output_token_ids, ref)


def test_disaggregation_quantized_kv(tmp_path):
    """1-byte KV payloads (fp8) survive the file connector round trip and
    keep decode-side parity with a single-instance run."""
    eng = _engine("fp8")
    eng.add_request(Request(
        request_id="ref", prompt_token_ids=PROMPT,
        sampling_params=SamplingParams(max_tokens=6, temperature=0.0,
                                       ignore_eos=True),
    ))
    while eng.has_unfinished():
        eng.step()
    ref = eng.scheduler.requests["ref"].output_token_ids

    pre = _engine("fp8")
    pre.add_request(Request(
        request_id="r1", prompt_token_ids=PROMPT,
        sampling_params=SamplingParams(max_tokens=6, temperature=0.0,
                                       ignore_eos=True),
    ))
    pre.step()
    connector = FileConnector(str(tmp_path))
    connector.publish("r1", export_request_kv(pre, "r1"))
    pre.abort_requests(["r1"])

    dec = _engine("fp8")
    req = Request(
        request_id="r1", prompt_token_ids=PROMPT,
        sampling_params=SamplingParams(max_tokens=6, temperature=0.0,
                                       ignore_eos=True),
    )
    payload = connector.fetch("r1")
    assert payload.host_kv["t"]["k"].dtype.itemsize == 1  # 1-byte wire KV
    import_request_kv(dec, req, payload)
    while dec.has_unfinished():
        dec.step()
    assert req.output_token_ids == ref


def test_export_requires_computed_kv():
    eng = _engine()
    eng.add_request(Request(
        request_id="r1", prompt_token_ids=PROMPT,
        sampling_params=SamplingParams(max_tokens=4, ignore_eos=True),
    ))
    with pytest.raises(ValueError, match="no computed KV"):
        export_request_kv(eng, "r1")


def test_import_rejects_prompt_mismatch():
    pre = _engine()
    pre.add_request(Request(
        request_id="r1", prompt_token_ids=PROMPT,
        sampling_params=SamplingParams(max_tokens=4, temperature=0.0,
                                       ignore_eos=True),
    ))
    pre.step()
    payload = export_request_kv(pre, "r1")
    dec = _engine()
    bad = Request(
        request_id="r1", prompt_token_ids=[1, 2, 3],
        sampling_params=SamplingParams(max_tokens=4),
    )
    with pytest.raises(ValueError, match="prompt mismatch"):
        import_request_kv(dec, bad, payload)
