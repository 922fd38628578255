"""The BASELINE ">=85% per-chip roofline on verify matmuls" gate,
measured the honest way: a full verify-layer matmul CHAIN (q -> o ->
kv + gate -> up -> down) through the layer-stacked int4 kernels —
exactly the program shape the engine's layer scan runs — scanned over
28 layers, against the aggregate MXU FLOP floor.

This avoids the isolated-kernel harness noise (the per-iter scan
baseline is ~28us, which swamps the small q/o/kv shapes individually)
and prices the real dependency chain.

Run (TPU): timeout 3000 python benchmarks/micro_verify_layer.py [rows]
Env: QUANT=int4|int8 (default int4), LAYERS=28
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

PEAK = 197e12  # bf16 MXU peak FLOP/s (v5e)
D, F, DKV = 3584, 18944, 512


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    L = int(os.environ.get("LAYERS", "28"))
    quant = os.environ.get("QUANT", "int4")
    key = jax.random.PRNGKey(0)

    def mk(O, I, seed):
        w = jax.random.normal(jax.random.PRNGKey(seed), (O, I), jnp.float32)
        w = w / np.sqrt(I)
        qd = q.quantize_int4(w) if quant == "int4" else q.quantize_int8(w)
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (L, *a.shape)), qd
        )

    wq = mk(D, D, 1)
    wo = mk(D, D, 2)
    wkv = mk(DKV, D, 3)
    wgate = mk(F, D, 4)
    wup = mk(F, D, 5)
    wdown = mk(D, F, 6)

    mm = (
        qm.matmul_int4_stacked_pallas
        if quant == "int4"
        else qm.matmul_int8_stacked_pallas
    )

    x = jax.random.normal(key, (rows, D), jnp.bfloat16)

    @jax.jit
    def run(x, wq, wo, wkv, wgate, wup, wdown):
        def layer(carry, l):
            h = carry
            qp = mm(h, wq["w"], wq["s"], l)
            kv = mm(h, wkv["w"], wkv["s"], l)
            o = mm(qp, wo["w"], wo["s"], l)
            # keep kv live in the chain (a *0 term would be DCE'd)
            h = h + o + (kv[:, :1] * jnp.bfloat16(1e-8))
            g = mm(h, wgate["w"], wgate["s"], l)
            u = mm(h, wup["w"], wup["s"], l)
            dn = mm((g * jax.nn.sigmoid(g.astype(jnp.float32)).astype(g.dtype)
                     * u), wdown["w"], wdown["s"], l)
            return (h + dn), None

        out, _ = jax.lax.scan(
            layer, x, jnp.arange(L, dtype=jnp.int32)
        )
        return out[0, 0].astype(jnp.float32)

    t0 = time.perf_counter()
    np.asarray(run(x, wq, wo, wkv, wgate, wup, wdown))
    print(f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        r = run(x, wq, wo, wkv, wgate, wup, wdown)
    np.asarray(r)
    per_layer = (time.perf_counter() - t0) / reps / L

    flops = 2 * rows * (2 * D * D + DKV * D + 2 * F * D + D * F)
    floor = flops / PEAK
    print(
        f"rows={rows} quant={quant} L={L}: {per_layer*1e6:.1f} us/layer "
        f"(chain floor {floor*1e6:.1f} us) = "
        f"{100*floor/per_layer:.0f}% of MXU roofline",
        flush=True,
    )


if __name__ == "__main__":
    main()
