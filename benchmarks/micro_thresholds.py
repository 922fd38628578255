"""Microbench: top-k/top-p threshold search — Pallas VMEM-resident kernel
vs the XLA 32-pass bisection — at the sampled-verify shape
[B*(K+1)=160, V=151936]. Checks (a) the top-k superset invariant
(kept count >= k) on the Pallas path and (b), unless SKIP_XLA=1,
exact kept-set parity between the Pallas and XLA bisection paths.

Run (TPU): timeout 3000 python benchmarks/micro_thresholds.py
Env: RT=1,2 (row tiles to try), R=160, SKIP_XLA=1
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_draft_tpu.ops import sampling
from vllm_omni_draft_tpu.ops.pallas import rejection as rej


def timed(fn, *args, iters=50):
    @jax.jit
    def run(*a):
        def body(c, _):
            x = a[0] + (c * 0.0).astype(a[0].dtype)
            outs = fn(x, *a[1:])
            leaf = outs[0] if isinstance(outs, (tuple, list)) else outs
            return c + leaf.reshape(-1)[0].astype(jnp.float32), None

        return jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]

    t0 = time.perf_counter()
    np.asarray(run(*args))  # compile + warm
    print(f"  (compile {time.perf_counter()-t0:.0f}s)", flush=True)
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return (time.perf_counter() - t0) / iters


def main():
    R = int(os.environ.get("R", "160"))
    V = 151_936
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (R, V), jnp.float32) * 4.0
    lx = logits.astype(jnp.bfloat16)
    top_k = jnp.full((R,), 64, jnp.int32)
    top_p = jnp.full((R,), 0.95, jnp.float32)

    # parity first (single call, cheap)
    for rt in (8,):
        kth, tau, mx = jax.block_until_ready(
            rej.topk_topp_thresholds_pallas(lx, top_k, top_p, row_tile=rt)
        )
        keep = (lx >= kth[:, None])
        cnt = jnp.sum(keep.astype(jnp.int32), axis=-1)
        assert bool(jnp.all(cnt >= 64)), f"rt={rt}: top-k undercount"
        print(f"rt={rt} parity: count>=k ok "
              f"(max kept {int(jnp.max(cnt))})", flush=True)

    rts = [int(x) for x in os.environ.get("RT", "8").split(",")]
    for rt in rts:
        t = timed(
            lambda x, k, p: rej.topk_topp_thresholds_pallas(
                x, k, p, row_tile=rt
            ),
            lx, top_k, top_p,
        )
        print(f"pallas thresholds rt={rt}: {t*1e3:7.3f} ms", flush=True)

    if os.environ.get("SKIP_XLA") != "1":
        # kept-set parity: Pallas-threshold path vs the XLA bisection path
        # (identical bisection math — the kept sets must match exactly)
        sampling.use_pallas_thresholds(
            lambda x, k, p: rej.topk_topp_thresholds_pallas(x, k, p, row_tile=8)
        )
        masked_pl = jax.block_until_ready(
            jax.jit(sampling.apply_top_k_top_p)(logits, top_k, top_p)
        )
        sampling.use_pallas_thresholds(None)
        masked_xla = jax.block_until_ready(
            jax.jit(sampling.apply_top_k_top_p)(logits, top_k, top_p)
        )
        keep_pl = np.asarray(masked_pl) > sampling.NEG_INF / 2
        keep_xla = np.asarray(masked_xla) > sampling.NEG_INF / 2
        diff = int(np.sum(keep_pl != keep_xla))
        assert diff == 0, f"kept-set mismatch at {diff} positions"
        print("kept-set parity pallas==xla: ok", flush=True)

        t = timed(
            lambda x, k, p: sampling.apply_top_k_top_p(x, k, p),
            logits, top_k, top_p,
        )
        print(f"XLA apply_top_k_top_p (full): {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
