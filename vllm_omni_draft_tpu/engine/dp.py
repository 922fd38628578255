"""Engine-level data parallelism: replicated engines + wave coordination.

Capability parity with the reference's DP plane (SURVEY.md §2.3 row 1:
`DPEngineCoreProc` — DP ranks, request-count publication to a coordinator,
wave counters in EngineCoreOutputs, `engine_core.md:243-248`,
`VLLM_V1_Interface.md:89-92`): N engine replicas (separate processes via
the ZMQ split, each owning its own device state), a coordinator that
load-balances by published queue depth, and wave bookkeeping — a wave ends
when every replica drains; the next request starts a new wave. On a
multi-host slice each replica maps to one host's chips (DCN carries only
this control plane; ICI stays inside each replica's mesh).
"""

from __future__ import annotations

import itertools
import threading
from dataclasses import dataclass, field

from vllm_omni_draft_tpu.config import EngineConfig
from vllm_omni_draft_tpu.engine.ipc import EngineCoreClient


@dataclass
class WaveState:
    """Wave counters (reference: wave_complete / start_wave,
    `engine_core.md:243-248`)."""

    current_wave: int = 0
    waves_completed: int = 0
    in_flight: dict[int, int] = field(default_factory=dict)  # rank -> count

    def total_in_flight(self) -> int:
        return sum(self.in_flight.values())


class DPEngineGroup:
    """Coordinator over N engine replicas.

    Scheduling: least-loaded replica by published in-flight count (the
    reference publishes request counts to its coordinator the same way).
    """

    def __init__(self, config: EngineConfig, dp_size: int):
        if dp_size < 1:
            raise ValueError("dp_size must be >= 1")
        self.dp_size = dp_size
        self.config = config
        self.clients = [EngineCoreClient(config) for _ in range(dp_size)]
        self.wave = WaveState(in_flight={r: 0 for r in range(dp_size)})
        self._req_rank: dict[str, int] = {}
        self._req_wave: dict[str, int] = {}
        self._lock = threading.Lock()
        self._counter = itertools.count()

    # ------------------------------------------------------------------

    def add_request(self, request_id: str, prompt_token_ids, sampling_params) -> int:
        """Route to the least-loaded replica; returns the DP rank chosen."""
        with self._lock:
            if self.wave.total_in_flight() == 0:
                self.wave.current_wave += 1  # start_wave
            rank = min(
                range(self.dp_size), key=lambda r: self.wave.in_flight[r]
            )
            self.wave.in_flight[rank] += 1
            self._req_rank[request_id] = rank
            self._req_wave[request_id] = self.wave.current_wave
        self.clients[rank].add_request(request_id, prompt_token_ids, sampling_params)
        return rank

    def abort_request(self, request_id: str) -> None:
        rank = self._req_rank.get(request_id)
        if rank is None:
            return
        self.clients[rank].abort_requests([request_id])
        # aborted requests emit no finished output: settle wave accounting
        # here or the wave never completes
        with self._lock:
            if self._req_rank.pop(request_id, None) is not None:
                self._req_wave.pop(request_id, None)
                self.wave.in_flight[rank] = max(0, self.wave.in_flight[rank] - 1)
                if self.wave.total_in_flight() == 0:
                    self.wave.waves_completed += 1

    def poll(self, timeout: float = 0.05):
        """Drain one output batch from each replica. Returns
        (outputs, wave_events) where wave_events lists completed waves
        (wave_complete bookkeeping)."""
        all_outputs = []
        wave_events = []
        for rank, client in enumerate(self.clients):
            outs = client.get_output(timeout=timeout)
            if outs is None:
                continue
            for rid, toks, finished, status in outs.outputs:
                all_outputs.append((rank, rid, toks, finished, status))
                if finished:
                    with self._lock:
                        self.wave.in_flight[rank] = max(
                            0, self.wave.in_flight[rank] - 1
                        )
                        self._req_rank.pop(rid, None)
                        self._req_wave.pop(rid, None)
                        if self.wave.total_in_flight() == 0:
                            self.wave.waves_completed += 1  # wave_complete
                            wave_events.append(self.wave.current_wave)
        return all_outputs, wave_events

    def stats(self) -> dict:
        with self._lock:
            return {
                "dp_size": self.dp_size,
                "current_wave": self.wave.current_wave,
                "waves_completed": self.wave.waves_completed,
                "in_flight": dict(self.wave.in_flight),
            }

    # elastic scaling (reference: "DP coordination, wave management, and
    # elastic scaling" as EngineCore duties, `engine_core.md:16`)

    def scale_up(self) -> int:
        """Add one engine replica; returns the new dp_size."""
        client = EngineCoreClient(self.config)
        with self._lock:
            rank = self.dp_size
            self.clients.append(client)
            self.wave.in_flight[rank] = 0
            self.dp_size += 1
        return self.dp_size

    def scale_down(self) -> int:
        """Remove the highest-rank replica once it is drained; returns the
        new dp_size. Refuses to drop below 1 or while the victim has
        in-flight requests (callers stop routing first, then retry)."""
        with self._lock:
            if self.dp_size <= 1:
                raise ValueError("cannot scale below 1 replica")
            victim = self.dp_size - 1
            if self.wave.in_flight.get(victim, 0) > 0:
                raise RuntimeError(
                    f"replica {victim} still has "
                    f"{self.wave.in_flight[victim]} in-flight requests"
                )
            client = self.clients.pop()
            del self.wave.in_flight[victim]
            self.dp_size -= 1
        client.shutdown()
        return self.dp_size

    def shutdown(self) -> None:
        for c in self.clients:
            c.shutdown()


# ---------------------------------------------------------------------------
# coordinator as its own process — the reference's DP control plane shape
# (`VLLM_V1_Interface.md:89-92`: a coordinator proc that replicas publish
# request counts to, with busy-loop wave sync across processes/hosts). The
# coordinator proc owns the replica procs; clients talk to it over ZMQ
# (DCN carries exactly this control plane on a multi-host deployment).
# ---------------------------------------------------------------------------

_DP_ADD = b"ADD"
_DP_ABORT = b"ABORT"
_DP_UTIL = b"UTIL"
_DP_DOWN = b"DOWN"
_DP_READY = b"READY"
_DP_OUT = b"OUT"
_DP_ERR = b"ERR"


def _dp_coordinator_main(config_bytes, dp_size, input_addr, output_addr,
                         platform):
    import pickle
    import traceback

    import jax
    import zmq

    jax.config.update("jax_platforms", platform)
    config = pickle.loads(config_bytes)
    ctx = zmq.Context()
    in_sock = ctx.socket(zmq.PULL)
    in_sock.bind(input_addr)
    out_sock = ctx.socket(zmq.PUSH)
    out_sock.bind(output_addr)
    try:
        group = DPEngineGroup(config, dp_size)
    except Exception as e:  # noqa: BLE001
        out_sock.send_multipart(
            [_DP_ERR, pickle.dumps((type(e).__name__, str(e),
                                    traceback.format_exc()))]
        )
        ctx.destroy(linger=1000)
        return
    out_sock.send_multipart([_DP_READY, b""])
    running = True
    try:
        while running:
            while in_sock.poll(5):
                kind, payload = in_sock.recv_multipart()
                if kind == _DP_ADD:
                    rid, ids, sp = pickle.loads(payload)
                    group.add_request(rid, ids, sp)
                elif kind == _DP_ABORT:
                    for rid in pickle.loads(payload):
                        group.abort_request(rid)
                elif kind == _DP_UTIL:
                    seq, name, args = pickle.loads(payload)
                    try:
                        reply = (seq, True, getattr(group, name)(*args))
                    except Exception as e:  # noqa: BLE001
                        reply = (seq, False,
                                 (type(e).__name__, str(e),
                                  traceback.format_exc()))
                    out_sock.send_multipart([_DP_UTIL, pickle.dumps(reply)])
                elif kind == _DP_DOWN:
                    running = False
                    break
            if not running:
                break
            outputs, wave_events = group.poll(timeout=0.02)
            if outputs or wave_events:
                out_sock.send_multipart(
                    [_DP_OUT, pickle.dumps((outputs, wave_events))]
                )
    except Exception as e:  # noqa: BLE001
        out_sock.send_multipart(
            [_DP_ERR, pickle.dumps((type(e).__name__, str(e),
                                    traceback.format_exc()))]
        )
    group.shutdown()
    ctx.destroy(linger=1000)


class DPCoordinatorClient:
    """Client to a coordinator PROCESS running N engine replicas — the
    cross-process DP control plane. API mirrors DPEngineGroup; every
    exchange crosses a process boundary like the reference's
    coordinator/DPEngineCoreProc split."""

    def __init__(self, config: EngineConfig, dp_size: int):
        import multiprocessing as mp
        import pickle
        import time as _time

        import jax
        import zmq

        from vllm_omni_draft_tpu.engine.ipc import EngineCoreError

        self._EngineCoreError = EngineCoreError
        base = f"ipc:///tmp/vot-dpc-{_time.monotonic_ns()}"
        self.input_addr = f"{base}-in"
        self.output_addr = f"{base}-out"
        ctx = mp.get_context("spawn")
        self.proc = ctx.Process(
            target=_dp_coordinator_main,
            args=(pickle.dumps(config), dp_size, self.input_addr,
                  self.output_addr, jax.default_backend()),
            # non-daemonic: the coordinator spawns the engine-replica
            # processes, and daemonic processes may not have children
            daemon=False,
        )
        self.proc.start()
        self.zmq = zmq.Context()
        self.in_sock = self.zmq.socket(zmq.PUSH)
        self.in_sock.connect(self.input_addr)
        self.out_sock = self.zmq.socket(zmq.PULL)
        self.out_sock.connect(self.output_addr)
        if not self.out_sock.poll(600_000):
            raise TimeoutError("DP coordinator did not come up")
        import pickle as _p

        kind, payload = self.out_sock.recv_multipart()
        if kind == _DP_ERR:
            etype, msg, tb = _p.loads(payload)
            raise EngineCoreError(f"coordinator failed: {etype}: {msg}\n{tb}")
        assert kind == _DP_READY, kind
        self._util_seq = 0

    def add_request(self, request_id, prompt_token_ids, sampling_params):
        import pickle

        self.in_sock.send_multipart(
            [_DP_ADD,
             pickle.dumps((request_id, list(prompt_token_ids), sampling_params))]
        )

    def abort_requests(self, request_ids):
        import pickle

        self.in_sock.send_multipart([_DP_ABORT, pickle.dumps(list(request_ids))])

    def poll(self, timeout: float = 1.0):
        """Returns (outputs, wave_events) or ([], []) on timeout; raises
        on coordinator failure. Utility replies arriving interleaved are
        stashed for call_utility."""
        import pickle

        deadline = None if timeout is None else timeout * 1000
        if not self.out_sock.poll(deadline):
            if not self.proc.is_alive():
                raise self._EngineCoreError("DP coordinator process died")
            return [], []
        kind, payload = self.out_sock.recv_multipart()
        if kind == _DP_ERR:
            etype, msg, tb = pickle.loads(payload)
            raise self._EngineCoreError(
                f"coordinator failed: {etype}: {msg}\n{tb}"
            )
        if kind == _DP_UTIL:
            got_seq, ok, result = pickle.loads(payload)
            self._pending_util = getattr(self, "_pending_util", {})
            self._pending_util[got_seq] = (ok, result)
            return [], []
        return pickle.loads(payload)

    def _finish_utility(self, ok, result):
        if not ok:
            etype, msg, tb = result
            raise self._EngineCoreError(f"{etype}: {msg}\n{tb}")
        return result

    def call_utility(self, name, *args, timeout: float = 120.0):
        seq = self._send_utility(name, *args)
        return self._wait_utility(seq, name, timeout)

    def _send_utility(self, name, *args):
        import pickle

        seq = self._util_seq
        self._util_seq += 1
        self.in_sock.send_multipart([_DP_UTIL, pickle.dumps((seq, name, args))])
        return seq

    def _wait_utility(self, seq, name, timeout: float = 120.0):
        import pickle
        import time as _time

        # drain until our reply shows up; a reply already consumed by an
        # interleaved poll() sits in _pending_util keyed by seq
        end = _time.monotonic() + timeout
        self._stash = getattr(self, "_stash", [])
        self._pending_util = getattr(self, "_pending_util", {})
        while _time.monotonic() < end:
            if seq in self._pending_util:
                ok, result = self._pending_util.pop(seq)
                return self._finish_utility(ok, result)
            if not self.out_sock.poll(200):
                if not self.proc.is_alive():
                    raise self._EngineCoreError("DP coordinator process died")
                continue
            kind, payload = self.out_sock.recv_multipart()
            if kind == _DP_UTIL:
                got_seq, ok, result = pickle.loads(payload)
                if got_seq != seq:
                    # a reply for some other (earlier timed-out or future
                    # interleaved) call — stash, don't drop
                    self._pending_util[got_seq] = (ok, result)
                    continue
                return self._finish_utility(ok, result)
            if kind == _DP_ERR:
                etype, msg, tb = pickle.loads(payload)
                raise self._EngineCoreError(f"{etype}: {msg}\n{tb}")
            self._stash.append(pickle.loads(payload))  # output batch
        raise TimeoutError(f"utility {name!r} timed out")

    def drain_stash(self):
        """Output batches that arrived while waiting on a utility."""
        out, self._stash = getattr(self, "_stash", []), []
        return out

    def shutdown(self):
        try:
            self.in_sock.send_multipart([_DP_DOWN, b""])
            self.proc.join(timeout=10)
        finally:
            if self.proc.is_alive():
                self.proc.terminate()
            self.zmq.destroy(linger=0)
