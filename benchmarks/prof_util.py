"""Device-time measurement via the JAX profiler trace.

Wall-clock timing over the axon tunnel is dominated by a ~30-40 ms host
sync cost per readback, which poisons microbenchmarks whose device time is
smaller. This helper runs a callable under jax.profiler.start_trace and
returns the summed duration of TPU-lane events, which the relay reports
faithfully.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import tempfile

import jax
import numpy as np


def device_events(fn, *args, warmup: int = 1):
    """Run fn(*args) under a profiler trace; return
    {event_name: (total_ms, count)} for TPU device lanes."""
    def run_sync():
        r = fn(*args)
        leaves = [l for l in jax.tree.leaves(r) if isinstance(l, jax.Array)]
        if leaves:
            np.asarray(leaves[0])

    for _ in range(warmup):
        run_sync()

    tmp = tempfile.mkdtemp(prefix="vot_prof_")
    try:
        jax.profiler.start_trace(tmp)
        run_sync()
        jax.profiler.stop_trace()
        files = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                          recursive=True)
        if not files:
            raise RuntimeError("no trace produced")
        with gzip.open(files[0]) as f:
            d = json.load(f)
        ev = d.get("traceEvents", [])
        pids = {
            e["pid"]: e["args"].get("name", "")
            for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        out = collections.defaultdict(lambda: [0.0, 0])
        for e in ev:
            if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
                o = out[e["name"]]
                o[0] += e.get("dur", 0) / 1e3
                o[1] += 1
        return {k: (v[0], v[1]) for k, v in out.items()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def device_time_ms(fn, *args, match: str | None = None, warmup: int = 1):
    """Total device ms (optionally only events whose name contains
    `match`)."""
    evs = device_events(fn, *args, warmup=warmup)
    return sum(ms for name, (ms, _) in evs.items()
               if match is None or match in name)


def print_top(fn, *args, n: int = 20, warmup: int = 1):
    evs = device_events(fn, *args, warmup=warmup)
    top = sorted(evs.items(), key=lambda kv: -kv[1][0])[:n]
    for name, (ms, cnt) in top:
        print(f"{ms:9.3f} ms  x{cnt:5d}  {name[:90]}", flush=True)
    return evs
