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

    def shutdown(self) -> None:
        for c in self.clients:
            c.shutdown()
