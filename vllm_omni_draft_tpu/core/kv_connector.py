"""KV connector: cross-instance KV transfer (prefill/decode
disaggregation).

Capability parity with the reference's KV-connector hooks
(`/root/reference/src/doc/engine_core.md:271, 312-313, 337` —
kv_connector_metadata / kv_transfer_params / KVConnectorOutput; named in
its test plan as prefill/decode disaggregation with KV transfer,
`src/doc/test_report.md:20-22`): a PREFILL instance computes a prompt's
KV once and publishes it; a DECODE instance fetches it into freshly
allocated blocks and starts decoding immediately — no recompute.

TPU-native shape: the payload is the runner's host-gathered block KV
(the same gather/scatter programs the preemption swap path uses,
core/runner.py swap_out_blocks/swap_in_blocks), so a transfer is
two compiled device calls + one host hop. Connector backends:

  * InMemoryConnector — same-process handoff (tests, colocated stages);
  * FileConnector — filesystem handoff (cross-process / shared volume;
    numpy .npz payloads).

Protocol notes: KV is valid through `num_computed_tokens` =
len(prompt) + len(emitted) - 1 (the last emitted token's KV pends as
decode input — identical to the preemption-resume invariant), and the
payload carries the token ids so the decode side can verify/seed its
request state. Per-model quantized KV transfers as its storage dtype
(fp8/int8 payloads stay 1 byte/elem on the wire).
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass, field
from typing import Any

import numpy as np


@dataclass
class KVTransferPayload:
    """Everything a decode instance needs to adopt a prefilled request."""

    prompt_token_ids: list[int]
    output_token_ids: list[int]  # tokens emitted by the prefill instance
    num_computed_tokens: int     # KV valid through this many tokens
    host_kv: dict                # runner.swap_out_blocks payload
    meta: dict = field(default_factory=dict)  # free-form connector metadata


class KVConnector:
    """Interface (reference: kv_connector_metadata plumbing)."""

    def publish(self, request_id: str, payload: KVTransferPayload) -> None:
        raise NotImplementedError

    def fetch(self, request_id: str) -> KVTransferPayload | None:
        """Returns and CONSUMES the payload (one decode owner)."""
        raise NotImplementedError


class InMemoryConnector(KVConnector):
    def __init__(self):
        self._store: dict[str, KVTransferPayload] = {}

    def publish(self, request_id: str, payload: KVTransferPayload) -> None:
        self._store[request_id] = payload

    def fetch(self, request_id: str) -> KVTransferPayload | None:
        return self._store.pop(request_id, None)


class FileConnector(KVConnector):
    """Filesystem-backed handoff (shared volume between instances)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, request_id: str) -> str:
        safe = request_id.replace("/", "_")
        return os.path.join(self.root, f"{safe}.npz")

    def publish(self, request_id: str, payload: KVTransferPayload) -> None:
        flat: dict[str, Any] = {
            "prompt": np.asarray(payload.prompt_token_ids, np.int32),
            "output": np.asarray(payload.output_token_ids, np.int32),
            "num_computed": np.int64(payload.num_computed_tokens),
            "kv_n": np.int64(payload.host_kv["n"]),
        }
        for side in ("t", "d"):
            if side in payload.host_kv:
                for name, arr in payload.host_kv[side].items():
                    a = np.asarray(arr)
                    if a.dtype.name == "bfloat16":  # numpy can't save bf16
                        a = a.view(np.uint16)
                        flat[f"bf16:{side}:{name}"] = a
                    elif a.dtype.name == "float8_e4m3fn":
                        flat[f"fp8:{side}:{name}"] = a.view(np.uint8)
                    else:
                        flat[f"raw:{side}:{name}"] = a
        buf = io.BytesIO()
        np.savez(buf, **flat)
        tmp = self._path(request_id) + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, self._path(request_id))  # atomic publish

    def fetch(self, request_id: str) -> KVTransferPayload | None:
        path = self._path(request_id)
        if not os.path.exists(path):
            return None
        import ml_dtypes

        with np.load(path) as z:
            host_kv: dict = {"n": int(z["kv_n"])}
            for name in z.files:
                if ":" not in name:
                    continue
                tag, side, key = name.split(":", 2)
                arr = z[name]
                if tag == "bf16":
                    arr = arr.view(ml_dtypes.bfloat16)
                elif tag == "fp8":
                    arr = arr.view(ml_dtypes.float8_e4m3fn)
                host_kv.setdefault(side, {})[key] = arr
            payload = KVTransferPayload(
                prompt_token_ids=z["prompt"].tolist(),
                output_token_ids=z["output"].tolist(),
                num_computed_tokens=int(z["num_computed"]),
                host_kv=host_kv,
            )
        os.remove(path)
        return payload


# ---------------------------------------------------------------------------
# engine-side operations
# ---------------------------------------------------------------------------


def export_request_kv(engine, request_id: str) -> KVTransferPayload:
    """Gather a live request's computed KV off the device (prefill side).
    The request must be past its prefill (num_computed_tokens > 0)."""
    req = engine.scheduler.requests[request_id]
    if req.num_computed_tokens <= 0:
        raise ValueError(f"{request_id} has no computed KV to export")
    n_blocks = -(-req.num_computed_tokens // engine.scheduler.kv.block_size)
    host_kv = engine.runner.swap_out_blocks(list(req.block_ids[:n_blocks]))
    return KVTransferPayload(
        prompt_token_ids=list(req.prompt_token_ids),
        output_token_ids=list(req.output_token_ids),
        num_computed_tokens=req.num_computed_tokens,
        host_kv=host_kv,
    )


def import_request_kv(engine, request, payload: KVTransferPayload) -> None:
    """Adopt a prefilled request on the decode side: allocate blocks,
    restore KV, and enter the running set in decode phase. `request` must
    be a fresh Request whose prompt matches the payload."""
    from vllm_omni_draft_tpu.core.request import RequestStatus

    if list(request.prompt_token_ids) != list(payload.prompt_token_ids):
        raise ValueError("prompt mismatch between request and KV payload")
    sched = engine.scheduler
    if request.request_id not in sched.requests:
        sched.requests[request.request_id] = request
    request.output_token_ids = list(payload.output_token_ids)
    request.num_computed_tokens = payload.num_computed_tokens
    # allocate exactly the computed blocks (+ the pending-token slot is
    # claimed by the first decode step's allocate path)
    new_blocks = sched.kv.allocate_slots(
        request, 0, num_computed=payload.num_computed_tokens
    )
    if new_blocks is None:
        raise RuntimeError("decode instance has no free KV blocks")
    n = payload.host_kv["n"]
    engine.runner.swap_in_blocks(payload.host_kv, list(request.block_ids[:n]))
    request.status = RequestStatus.RUNNING
    request.record("kv_imported")
    sched.running.append(request)
