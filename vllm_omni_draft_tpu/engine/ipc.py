"""Engine-process split over ZMQ: EngineCoreProc + EngineCoreClient.

Capability parity with the reference's engine IPC plane
(`src/doc/engine_core.md:129-185`): the engine runs in its own process
with input/output sockets and a busy loop; the client sends
ADD / ABORT / UTILITY messages and receives per-step output batches.
Handshake: the proc binds, the client connects and waits for a READY
message (the reference's handshake protocol, `engine_core.md:133-138`).

Robustness (round-2 hardening):
  * engine-proc exceptions ship to the client as an ERROR frame
    (type + message + traceback) before the proc exits — clients raise
    `EngineCoreError` instead of hanging;
  * utility calls are sequence-correlated (concurrent callers each get
    THEIR reply) and utility-side exceptions come back as raising
    replies, not dead air;
  * the client's IO thread watches proc liveness, so an engine killed
    mid-stream (OOM, SIGKILL) also surfaces as `EngineCoreError`.

Wire format: pickle protocol 5 (token-id lists and small dicts only on
this path — tensors stay on-device in the engine process; the reference
uses msgspec the same way).
"""

from __future__ import annotations

import logging
import multiprocessing as mp
import pickle
import queue
import threading
import time
import traceback
from dataclasses import dataclass, field
from typing import Any

logger = logging.getLogger(__name__)

# message types (reference taxonomy: ADD/ABORT/UTILITY,
# engine_core.md:139-152; ERROR is the round-2 failure frame)
ADD = b"ADD"
ABORT = b"ABORT"
UTILITY = b"UTIL"
SHUTDOWN = b"DOWN"
READY = b"READY"
ERROR = b"ERR"


class EngineCoreError(RuntimeError):
    """The engine process failed (exception or death); the payload
    carries the remote type/message/traceback when one was received."""


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
    from vllm_omni_draft_tpu.core.request import Request

    config = pickle.loads(config_bytes)
    ctx = zmq.Context()
    in_sock = ctx.socket(zmq.PULL)
    in_sock.bind(input_addr)
    out_sock = ctx.socket(zmq.PUSH)
    out_sock.bind(output_addr)

    try:
        engine = EngineCore(config)
    except Exception as e:
        out_sock.send_multipart([
            ERROR,
            pickle.dumps((type(e).__name__, str(e), traceback.format_exc())),
        ])
        ctx.destroy(linger=1000)
        return
    out_sock.send_multipart([READY, b""])

    running = True
    try:
        while running:
            # drain control messages (non-blocking when busy, blocking
            # when idle)
            timeout = 0 if engine.has_unfinished() else 50
            while in_sock.poll(timeout):
                frames = in_sock.recv_multipart()
                if len(frames) != 2:  # malformed wire input is not fatal
                    # ... but it IS a lost ADD/ABORT/UTILITY whose caller
                    # will hang or time out — make protocol regressions
                    # observable instead of silent.
                    logger.warning(
                        "engine proc: dropping malformed multipart message "
                        "(%d frames, kinds=%s)",
                        len(frames),
                        [f[:16] for f in frames[:4]],
                    )
                    continue
                kind, payload = frames
                if kind == ADD:
                    req_data = pickle.loads(payload)
                    engine.add_request(Request(**req_data))
                elif kind == ABORT:
                    engine.abort_requests(pickle.loads(payload))
                elif kind == UTILITY:
                    seq, name, args = pickle.loads(payload)
                    # utility exceptions are replies, not proc-fatal
                    try:
                        result = getattr(engine, name)(*args)
                        reply = (seq, name, True, result)
                    except Exception as e:  # noqa: BLE001
                        reply = (seq, name, False,
                                 (type(e).__name__, str(e),
                                  traceback.format_exc()))
                    out_sock.send_multipart([UTILITY, pickle.dumps(reply)])
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
                    # finished state has been streamed: drop it so the
                    # request map stays bounded over a long serving run
                    engine.scheduler.purge_finished()
    except Exception as e:  # step-loop failure: tell the client, then die
        out_sock.send_multipart([
            ERROR,
            pickle.dumps((type(e).__name__, str(e), traceback.format_exc())),
        ])
        time.sleep(0.1)  # give the PUSH a beat to flush
    ctx.destroy(linger=1000)


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
        # handshake: wait for READY (an ERROR here means init failed)
        if not self.out_sock.poll(300_000):
            raise TimeoutError("engine proc did not come up")
        kind, payload = self.out_sock.recv_multipart()
        if kind == ERROR:
            raise EngineCoreError(self._format_remote(pickle.loads(payload)))
        assert kind == READY, kind
        self.outputs: queue.Queue = queue.Queue()
        self.error: EngineCoreError | None = None
        self._util_seq = 0
        self._util_lock = threading.Lock()
        self._util_pending: dict[int, queue.Queue] = {}
        # ZMQ sockets are not thread-safe: concurrent send_multipart from
        # two threads interleaves message PARTS, which the engine proc
        # then receives as one merged >2-frame multipart (observed as
        # "too many values to unpack" in _engine_proc_main). Every send
        # goes through this lock.
        self._send_lock = threading.Lock()
        self._io_thread = threading.Thread(
            target=self._output_loop, daemon=True, name="engine-output-io"
        )
        self._io_thread.start()

    @staticmethod
    def _format_remote(err) -> str:
        etype, msg, tb = err
        return f"engine process failed: {etype}: {msg}\n--- remote ---\n{tb}"

    def _fail(self, error: EngineCoreError) -> None:
        """Record the failure and wake every consumer (output readers and
        in-flight utility callers) with it."""
        self.error = error
        self.outputs.put(error)
        with self._util_lock:
            pending, self._util_pending = self._util_pending, {}
        for q in pending.values():
            q.put(error)

    def _output_loop(self):
        while True:
            try:
                # poll so proc death is noticed even with no traffic
                if not self.out_sock.poll(500):
                    if not self.proc.is_alive() and self.error is None:
                        self._fail(EngineCoreError(
                            f"engine process died (exit code "
                            f"{self.proc.exitcode}) without an error frame"
                        ))
                        return
                    continue
                kind, payload = self.out_sock.recv_multipart()
            except Exception:
                return  # client context destroyed (shutdown)
            if kind == UTILITY:
                seq, name, ok, result = pickle.loads(payload)
                with self._util_lock:
                    q = self._util_pending.pop(seq, None)
                if q is not None:
                    if ok:
                        q.put((name, result))
                    else:
                        q.put(EngineCoreError(self._format_remote(result)))
            elif kind == ERROR:
                self._fail(
                    EngineCoreError(self._format_remote(pickle.loads(payload)))
                )
                return
            else:
                self.outputs.put(pickle.loads(payload))

    def _check(self) -> None:
        if self.error is not None:
            raise self.error

    def _send(self, frames: list[bytes]) -> None:
        with self._send_lock:
            self.in_sock.send_multipart(frames)

    def add_request(self, request_id: str, prompt_token_ids: list[int],
                    sampling_params) -> None:
        self._check()
        self._send([
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
        self._check()
        self._send([ABORT, pickle.dumps(list(request_ids))])

    def call_utility(self, name: str, *args, timeout: float = 60.0):
        """Sequence-correlated utility RPC: concurrent callers each get
        their own reply; remote exceptions raise here."""
        self._check()
        q: queue.Queue = queue.Queue()
        with self._util_lock:
            seq = self._util_seq
            self._util_seq += 1
            self._util_pending[seq] = q
        self._send([UTILITY, pickle.dumps((seq, name, args))])
        try:
            got = q.get(timeout=timeout)
        except queue.Empty:
            with self._util_lock:
                self._util_pending.pop(seq, None)
            self._check()
            raise TimeoutError(f"utility {name!r} timed out") from None
        if isinstance(got, EngineCoreError):
            raise got
        got_name, result = got
        assert got_name == name, (got_name, name)
        return result

    def get_output(self, timeout: float | None = None) -> EngineOutputs | None:
        """Next output batch; raises EngineCoreError if the engine proc
        failed or died (never hangs past `timeout`)."""
        self._check()
        try:
            item = self.outputs.get(timeout=timeout)
        except queue.Empty:
            return None
        if isinstance(item, EngineCoreError):
            self.outputs.put(item)  # keep failing for later readers
            raise item
        return item

    def shutdown(self) -> None:
        try:
            self._send([SHUTDOWN, b""])
            self.proc.join(timeout=5)
        except Exception:
            pass
        finally:
            if self.proc.is_alive():
                self.proc.terminate()
            self.zmq.destroy(linger=0)
