"""Engine-process split over ZMQ: EngineCoreProc + EngineCoreClient.

Capability parity with the reference's engine IPC plane
(`src/doc/engine_core.md:129-185`): the engine runs in its own process
with input/output sockets and a busy loop; the client sends
ADD / ABORT / UTILITY messages and receives per-step output batches.
Handshake: the proc binds, the client connects and waits for a READY
message (the reference's handshake protocol, `engine_core.md:133-138`).

Wire format: pickle protocol 5 (token-id lists and small dicts only on
this path — tensors stay on-device in the engine process; the reference
uses msgspec the same way).
"""

from __future__ import annotations

import multiprocessing as mp
import pickle
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any

# message types (reference taxonomy: ADD/ABORT/UTILITY,
# engine_core.md:139-152)
ADD = b"ADD"
ABORT = b"ABORT"
UTILITY = b"UTIL"
SHUTDOWN = b"DOWN"
READY = b"READY"


@dataclass
class EngineOutputs:
    """One step's client-bound outputs."""

    # (request_id, new_token_ids, finished, status_value)
    outputs: list[tuple[str, list[int], bool, int]] = field(default_factory=list)
    stats: dict[str, Any] | None = None


def _engine_proc_main(
    config_bytes: bytes, input_addr: str, output_addr: str, platform: str
):
    # inherit the parent's JAX platform: a spawned child re-runs site
    # customization and may otherwise pick a different backend than the
    # process that decided to split the engine out
    import jax

    jax.config.update("jax_platforms", platform)

    import zmq

    from vllm_omni_draft_tpu.core.engine import EngineCore
    from vllm_omni_draft_tpu.core.request import Request, SamplingParams

    config = pickle.loads(config_bytes)
    ctx = zmq.Context()
    in_sock = ctx.socket(zmq.PULL)
    in_sock.bind(input_addr)
    out_sock = ctx.socket(zmq.PUSH)
    out_sock.bind(output_addr)

    engine = EngineCore(config)
    out_sock.send_multipart([READY, b""])

    running = True
    while running:
        # drain control messages (non-blocking when busy, blocking when idle)
        timeout = 0 if engine.has_unfinished() else 50
        while in_sock.poll(timeout):
            kind, payload = in_sock.recv_multipart()
            if kind == ADD:
                req_data = pickle.loads(payload)
                engine.add_request(Request(**req_data))
            elif kind == ABORT:
                engine.abort_requests(pickle.loads(payload))
            elif kind == UTILITY:
                name, args = pickle.loads(payload)
                result = getattr(engine, name)(*args)
                out_sock.send_multipart([UTILITY, pickle.dumps((name, result))])
            elif kind == SHUTDOWN:
                running = False
                break
            timeout = 0
        if not running:
            break
        if engine.has_unfinished():
            updated = engine.step()
            if updated:
                outs = EngineOutputs(
                    outputs=[
                        (
                            r.request_id,
                            r.output_token_ids[r.num_streamed_tokens :],
                            r.is_finished,
                            int(r.status),
                        )
                        for r in updated
                    ]
                )
                for r in updated:
                    r.num_streamed_tokens = len(r.output_token_ids)
                out_sock.send_multipart([ADD, pickle.dumps(outs)])
    ctx.destroy(linger=0)


class EngineCoreClient:
    """Client half: spawns the engine process, ships requests, surfaces
    outputs through a thread-safe queue (reference:
    `EngineCoreClient.make_async_mp_client`, `engine_core.md:159-185`)."""

    def __init__(self, config, base_addr: str | None = None):
        import zmq

        uid = f"{time.monotonic_ns()}"
        base = base_addr or f"ipc:///tmp/vot-{uid}"
        self.input_addr = f"{base}-in"
        self.output_addr = f"{base}-out"
        import jax

        ctx = mp.get_context("spawn")
        self.proc = ctx.Process(
            target=_engine_proc_main,
            args=(
                pickle.dumps(config),
                self.input_addr,
                self.output_addr,
                jax.default_backend(),
            ),
            daemon=True,
        )
        self.proc.start()
        self.zmq = zmq.Context()
        self.in_sock = self.zmq.socket(zmq.PUSH)
        self.in_sock.connect(self.input_addr)
        self.out_sock = self.zmq.socket(zmq.PULL)
        self.out_sock.connect(self.output_addr)
        # handshake: wait for READY
        if not self.out_sock.poll(300_000):
            raise TimeoutError("engine proc did not come up")
        kind, _ = self.out_sock.recv_multipart()
        assert kind == READY, kind
        self.outputs: queue.Queue[EngineOutputs] = queue.Queue()
        self._util_results: queue.Queue = queue.Queue()
        self._io_thread = threading.Thread(
            target=self._output_loop, daemon=True, name="engine-output-io"
        )
        self._io_thread.start()

    def _output_loop(self):
        while True:
            try:
                kind, payload = self.out_sock.recv_multipart()
            except Exception:
                return
            if kind == UTILITY:
                self._util_results.put(pickle.loads(payload))
            else:
                self.outputs.put(pickle.loads(payload))

    def add_request(self, request_id: str, prompt_token_ids: list[int],
                    sampling_params) -> None:
        self.in_sock.send_multipart([
            ADD,
            pickle.dumps(
                dict(
                    request_id=request_id,
                    prompt_token_ids=prompt_token_ids,
                    sampling_params=sampling_params,
                )
            ),
        ])

    def abort_requests(self, request_ids: list[str]) -> None:
        self.in_sock.send_multipart([ABORT, pickle.dumps(list(request_ids))])

    def call_utility(self, name: str, *args, timeout: float = 60.0):
        self.in_sock.send_multipart([UTILITY, pickle.dumps((name, args))])
        got_name, result = self._util_results.get(timeout=timeout)
        assert got_name == name
        return result

    def get_output(self, timeout: float | None = None) -> EngineOutputs | None:
        try:
            return self.outputs.get(timeout=timeout)
        except queue.Empty:
            return None

    def shutdown(self) -> None:
        try:
            self.in_sock.send_multipart([SHUTDOWN, b""])
            self.proc.join(timeout=5)
        finally:
            if self.proc.is_alive():
                self.proc.terminate()
            self.zmq.destroy(linger=0)
