"""Microbench: INT4 Pallas fused dequant+matmul vs XLA dequant fallback
vs INT8 Pallas kernel, at Qwen2.5-7B layer shapes, on the real TPU.

Run: timeout 900 python benchmarks/micro_int4.py
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


def timed(fn, *args, iters=1000):
    # scan the op to amortize dispatch; pass arrays as runtime args (a
    # closure would embed them as constants in the remote-compile request);
    # sync via np.asarray. The first operand is perturbed by the (always
    # zero) carry so XLA cannot hoist the loop-invariant op out of the
    # scan (it LICM'd the XLA-path matmuls to a single execution).
    @jax.jit
    def run(*a):
        def body(c, _):
            x = a[0] + (c * 0.0).astype(a[0].dtype)
            return c + fn(x, *a[1:])[0, 0].astype(jnp.float32), None

        return jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]

    np.asarray(run(*args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    shapes = [
        ("qkv_q", 3584, 3584),
        ("kv", 512, 3584),
        ("gate_up", 18944, 3584),
        ("down", 3584, 18944),
        ("lm_head", 151936, 3584),
    ]
    key = jax.random.PRNGKey(0)
    # null-op baseline: the one host sync costs a ~30 ms tunnel quantum
    # that spreads over the scan iterations — subtract it out
    z = jnp.zeros((8, 128), jnp.float32)
    base = timed(lambda a: a + 1.0, z)
    print(f"per-iter harness baseline {base*1e6:.1f}us (subtracted)")
    total = {"int4_pallas": 0.0, "int4_xla": 0.0, "int8_pallas": 0.0}
    for name, O, I in shapes:
        x = jax.random.normal(key, (B, I), jnp.bfloat16)
        w = jax.random.normal(key, (O, I), jnp.float32) / np.sqrt(I)
        q4 = q.quantize_int4(w, group_size=128)
        q8 = q.quantize_int8(w)
        w4, s4 = q4["w"], q4["s"]
        w8, s8 = q8["w"], q8["s"]
        del w

        t_p4 = max(timed(qm.matmul_int4_pallas, x, w4, s4) - base, 1e-9)
        t_x4 = max(
            timed(
                lambda x, w4, s4: x @ q.dequantize({"w": w4, "s": s4}, x.dtype).T,
                x, w4, s4,
            )
            - base,
            1e-9,
        )
        t_p8 = max(timed(qm.matmul_int8_pallas, x, w8, s8) - base, 1e-9)
        bw4 = O * I / 2 / t_p4 / 1e9
        print(
            f"{name:8s} O={O:6d} I={I:6d}  int4_pallas {t_p4*1e6:8.1f}us "
            f"({bw4:6.1f} GB/s eff)  int4_xla {t_x4*1e6:8.1f}us  "
            f"int8_pallas {t_p8*1e6:8.1f}us",
            flush=True,
        )
        total["int4_pallas"] += t_p4
        total["int4_xla"] += t_x4
        total["int8_pallas"] += t_p8
    print({k: f"{v*1e6:.0f}us" for k, v in total.items()})


if __name__ == "__main__":
    main()
