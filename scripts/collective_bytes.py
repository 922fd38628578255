"""Per-step collective traffic of the TP-sharded verify forward + ICI
roofline scaling model (VERDICT r4 item 8: make the >=80%-at-2-hosts
gate auditable without multi-chip hardware).

Method: compile (never execute) the TP-sharded 7B verify-step program
on a fake tp-device CPU mesh with abstract sharded inputs, then parse
the post-GSPMD HLO for collective ops and sum their payload bytes. The
layer scan means each collective appears once in HLO and runs L times —
trip counts are applied analytically.

Output: JSON with per-collective (op, shape, bytes, trips), totals, and
the roofline model: predicted TP scaling efficiency vs per-chip
interconnect bandwidth W, using the measured single-chip step time.

Run (CPU): env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/collective_bytes.py [--tp 4] [--layers 28]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s8": 1, "u8": 1, "pred": 1, "s16": 2, "u16": 2, "f64": 8}


def parse_collectives(hlo_text: str):
    """Yield (op, result_shape_str, bytes, computation) for every
    collective in the HLO, attributed to its enclosing computation so
    scan-body collectives (which trip L times) separate from top-level
    ones. Bytes = result payload (all-reduce moves ~2x this on a ring;
    the roofline applies the ring factor separately)."""
    pat = re.compile(
        r"%?([\w.-]+) = ([\w()\[\]{}, ]*?)"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
        r"all-to-all)\(",
    )
    comp_pat = re.compile(r"^(?:ENTRY\s+)?%([\w.-]+)\s*\(")
    out = []
    comp = "?"
    for line in hlo_text.splitlines():
        cm = comp_pat.match(line) if line.rstrip().endswith("{") else None
        if cm:
            comp = cm.group(1)
        m = pat.search(line)
        if not m:
            continue
        shapes = re.findall(r"(\w+)\[([\d,]*)\]", line.split("=", 1)[1])
        if not shapes:
            continue
        dt, dims = shapes[0]
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append({
            "op": m.group(3),
            "shape": f"{dt}[{dims}]",
            "bytes": n * DTYPE_BYTES[dt],
            "computation": comp,
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=4)
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--model", default="7b", help="7b | 72b (ladder-5 dims)")
    ap.add_argument("--k", type=int, default=4, help="spec K (T = K+1)")
    ap.add_argument("--quant", default="int4",
                    help="int4 | int8 | none (dense bf16). The XLA int4 "
                         "fallback's unpack chain makes GSPMD reshard "
                         "weights per layer (all-to-alls) — real-TPU "
                         "Pallas kernels don't run that code, so 'none' "
                         "shows the actual TP data-plane shape")
    ap.add_argument("--step-ms", type=float, default=None,
                    help="measured single-chip ms per verify forward "
                         "(for the efficiency model); default: the "
                         "round-4 engine profile's 173 ms / 8 iters")
    args = ap.parse_args()

    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={max(8, args.tp)}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vllm_omni_draft_tpu.config import ModelConfig, ParallelConfig
    from vllm_omni_draft_tpu.models import qwen2
    from vllm_omni_draft_tpu.ops.attention import AttentionMetadata
    from vllm_omni_draft_tpu.parallel import sharding as shd
    from vllm_omni_draft_tpu.parallel.mesh import make_mesh

    dims = {
        "7b": dict(hidden_size=3584, intermediate_size=18944, num_heads=28,
                   num_kv_heads=4),
        "72b": dict(hidden_size=8192, intermediate_size=29568, num_heads=64,
                    num_kv_heads=8),
    }[args.model]
    cfg = ModelConfig(
        vocab_size=151_936, num_layers=args.layers, head_dim=128,
        max_model_len=1024, dtype="bfloat16",
        quantization=None if args.quant in ("none", "") else args.quant,
        **dims,
    )
    mesh = make_mesh(ParallelConfig(tensor_parallel_size=args.tp),
                     devices=jax.devices()[: args.tp])

    # abstract sharded params/kv — compile without materializing 7B
    init = (qwen2.init_params_quantized if cfg.quantization
            else qwen2.init_params)
    params_shapes = jax.eval_shape(lambda: init(cfg))
    pshard = shd.param_shardings(mesh, params_shapes)
    params_abs = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        params_shapes, pshard,
    )
    NB, BS = 512, 128
    kv_shapes = jax.eval_shape(
        lambda: qwen2.init_kv_cache(cfg, num_blocks=NB, block_size=BS)
    )
    kv_spec = shd._divisible_spec(
        mesh, P(None, None, None, "tp", None),
        next(iter(kv_shapes.values())).shape,
    )
    kvshard = {k: NamedSharding(mesh, kv_spec) for k in kv_shapes}
    kv_abs = {
        k: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=kvshard[k])
        for k, v in kv_shapes.items()
    }

    B, T = args.batch, args.k + 1
    rep = NamedSharding(mesh, P())
    fwd = qwen2.make_forward(cfg)

    def verify_step(params, kv, tokens, positions, bt, kl, slots):
        meta = AttentionMetadata(
            block_tables=bt, kv_lens=kl, positions=positions,
            slot_mapping=slots,
        )
        hidden, kv = fwd(params, tokens, positions, kv, meta)
        logits = qwen2.compute_logits(cfg, params, hidden.reshape(B * T, -1))
        return jnp.argmax(logits, axis=-1), kv

    a = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt, sharding=rep)
    lowered = jax.jit(verify_step).lower(
        params_abs, kv_abs, a((B, T), jnp.int32), a((B, T), jnp.int32),
        a((B, 8), jnp.int32), a((B,), jnp.int32), a((B, T), jnp.int32),
    )
    print("compiling sharded program (CPU backend)...", file=sys.stderr)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    dump = os.environ.get("VOT_DUMP_HLO")
    if dump:
        with open(dump, "w") as f:
            f.write(hlo)

    colls = parse_collectives(hlo)
    # scan-body collectives execute L times. Mark every computation
    # transitively reachable from a while-op's body= computation.
    calls: dict[str, set] = {}
    bodies: set = set()
    comp = "?"
    comp_pat = re.compile(r"^(?:ENTRY\s+)?%([\w.-]+)\s*\(")
    for line in hlo.splitlines():
        if line.rstrip().endswith("{"):
            cm = comp_pat.match(line)
            if cm:
                comp = cm.group(1)
                calls.setdefault(comp, set())
        for m in re.finditer(
            r"(?:to_apply|calls|body|condition)=%([\w.-]+)", line
        ):
            calls.setdefault(comp, set()).add(m.group(1))
        for b in re.findall(r"branch_computations=\{([^}]*)\}", line):
            for name in b.replace("%", "").split(","):
                calls.setdefault(comp, set()).add(name.strip())
        bm = re.search(r"\bwhile\(.*?body=%([\w.-]+)", line)
        if bm:
            bodies.add(bm.group(1))
    in_loop_comps: set = set()
    frontier = list(bodies)
    while frontier:
        c0 = frontier.pop()
        if c0 in in_loop_comps:
            continue
        in_loop_comps.add(c0)
        frontier.extend(calls.get(c0, ()))

    rows = []
    total = 0
    for c in colls:
        trips = args.layers if c["computation"] in in_loop_comps else 1
        step_bytes = c["bytes"] * trips
        rows.append({**c, "trips": trips, "bytes_per_step": step_bytes})
        total += step_bytes

    # ---- ICI roofline model ----
    # ring all-reduce of S payload bytes over n chips moves 2S(n-1)/n
    # per chip; time = 2S(n-1)/(n*W) with W = per-chip interconnect
    # bandwidth (ICI intra-host; DCN across hosts).
    n = args.tp
    ar_bytes = sum(r["bytes_per_step"] for r in rows
                   if r["op"] == "all-reduce")
    other_bytes = total - ar_bytes
    wire = 2 * ar_bytes * (n - 1) / n + other_bytes * (n - 1) / n
    step_ms = args.step_ms if args.step_ms is not None else 173.0 / 8
    model = {}
    for name, W in (("ici_v5e_45GBps", 45e9), ("ici_v5e_90GBps", 90e9),
                    ("dcn_25GBps", 25e9), ("dcn_6.25GBps", 6.25e9)):
        t_coll_ms = wire / W * 1e3
        t_comp_ms = step_ms / n  # perfect compute split
        eff = t_comp_ms / (t_comp_ms + t_coll_ms)
        model[name] = {
            "collective_ms_per_step": round(t_coll_ms, 3),
            "compute_ms_per_step": round(t_comp_ms, 2),
            "predicted_scaling_efficiency": round(eff, 3),
        }

    result = {
        "tp": n, "layers": args.layers, "batch": B, "T": T,
        "quant": args.quant,
        "collectives": rows,
        "total_payload_bytes_per_step": total,
        "wire_bytes_per_chip_per_step": int(wire),
        "single_chip_step_ms_assumed": step_ms,
        "scaling_model": model,
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
