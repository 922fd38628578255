"""Microbench: experimental paired-nibble INT4 kernels (quant_matmul_v2)
vs the production split-half kernel vs the INT8 ceiling, at Qwen2.5-7B
verify shapes — chasing the >=85% roofline gate (round-2: 73%).

Run: timeout 3600 python benchmarks/micro_int4_v2.py [rows]
Env: GPD=1,4,8 (groups-per-dot variants), SHAPES=qkv_q,down (filter),
     SKIP_BASE=1
Prints per-shape roofline % against the 197 TFLOP/s bf16 MXU peak.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_draft_tpu.ops import quant as q
from vllm_omni_draft_tpu.ops.pallas import quant_matmul as qm
from vllm_omni_draft_tpu.ops.pallas import quant_matmul_v2 as v2

PEAK = 197e12  # bf16 MXU peak FLOP/s (v5e)


def timed(fn, *args, iters=1000):
    @jax.jit
    def run(*a):
        def body(c, _):
            x = a[0] + (c * 0.0).astype(a[0].dtype)
            return c + fn(x, *a[1:])[0, 0].astype(jnp.float32), None

        return jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]

    t0 = time.perf_counter()
    np.asarray(run(*args))  # compile + warm
    comp = time.perf_counter() - t0
    if comp > 30:
        print(f"  (compile {comp:.0f}s)", flush=True)
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    gpds = [int(g) for g in os.environ.get("GPD", "1,4,8").split(",")]
    shapes = [
        ("qkv_q", 3584, 3584),
        ("kv", 512, 3584),
        ("qkv_fused", 4608, 3584),      # q+k+v in one call
        ("gate_up", 18944, 3584),
        ("gateup_fused", 37888, 3584),  # gate+up in one call
        ("down", 3584, 18944),
        ("lm_head", 151936, 3584),
    ]
    flt = os.environ.get("SHAPES")
    if flt:
        keep = set(flt.split(","))
        shapes = [s for s in shapes if s[0] in keep]
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((8, 128), jnp.float32)
    base = timed(lambda a: a + 1.0, z)
    print(f"rows={B}; per-iter harness baseline {base*1e6:.1f}us (subtracted)")

    results: dict[str, dict[str, float]] = {}
    floors: dict[str, float] = {}
    for name, O, I in shapes:
        x = jax.random.normal(key, (B, I), jnp.bfloat16)
        w = jax.random.normal(key, (O, I), jnp.float32) / np.sqrt(I)
        q4 = q.quantize_int4(w, group_size=128)
        q8 = q.quantize_int8(w)
        del w
        floor = 2 * B * O * I / PEAK
        floors[name] = floor
        res = {}
        if os.environ.get("SKIP_BASE") != "1":
            res["int4_base"] = timed(qm.matmul_int4_pallas, x, q4["w"], q4["s"])
            res["int8"] = timed(qm.matmul_int8_pallas, x, q8["w"], q8["s"])
        blockos = [
            int(v) for v in os.environ.get("BLOCKO", "512").split(",")
        ]
        for g in gpds:
            for bo in blockos:
                tag = f"v2_g{g}" + (f"_bo{bo}" if len(blockos) > 1 else "")
                res[tag] = timed(
                    lambda xx, pw, ss, g=g, bo=bo: v2.matmul_int4_v2_pallas(
                        xx, pw, ss, gpd=g, block_o=bo
                    ),
                    x, q4["w"], q4["s"],
                )
        parts = [f"{name:8s} floor {floor*1e6:7.1f}us"]
        adj = {}
        for k, t in res.items():
            t = max(t - base, 1e-9)
            adj[k] = t
            parts.append(f"{k} {t*1e6:7.1f}us ({100*floor/t:4.0f}%)")
        results[name] = adj
        print("  ".join(parts), flush=True)

    # aggregate per verify layer: 2x qo + kv + 2x gate_up + down
    # (the BASELINE.md ">=85% per-chip roofline" gate's shape mix)
    w_by = {"qkv_q": 2, "kv": 1, "gate_up": 2, "down": 1}
    if all(n in results for n in w_by):
        agg_floor = sum(w_by[n] * floors[n] for n in w_by)
        print(f"\nper-verify-layer aggregate (2*qo + kv + 2*gateup + down), "
              f"floor {agg_floor*1e6:.1f}us:")
        for k in next(iter(results.values())):
            agg = sum(w_by[n] * results[n][k] for n in w_by)
            print(f"  {k:12s} {agg*1e6:7.1f}us "
                  f"({100*agg_floor/agg:4.0f}% of roofline)")


if __name__ == "__main__":
    main()
