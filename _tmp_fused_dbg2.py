"""Which library entry diverges when fused? apply vs compute_probs."""
import jax, jax.numpy as jnp, numpy as np
from vllm_omni_draft_tpu.config import ModelConfig
from vllm_omni_draft_tpu.models import qwen2
from vllm_omni_draft_tpu.ops import quant as quant_ops
from vllm_omni_draft_tpu.ops import sampling as S

B = 8
rng = np.random.default_rng(0)
toks = rng.integers(1, 16384, B).astype(np.int32)

cfg = ModelConfig(
    vocab_size=151_936, hidden_size=3584, intermediate_size=18944,
    num_layers=2, num_heads=28, num_kv_heads=4, head_dim=128,
    max_model_len=1024, dtype="bfloat16", quantization="int4",
)
params = jax.jit(lambda: qwen2.init_params_quantized(cfg))()
params = {**params, "lm_head": jax.jit(
    lambda e: quant_ops.pad_out_rows(quant_ops.quantize_int4(e)))(params["embed"])}

temps = jnp.full((B,), 0.7, jnp.float32)
tks = jnp.full((B,), 64, jnp.int32)
tps = jnp.full((B,), 0.95, jnp.float32)
tp1 = jnp.ones((B,), jnp.float32)

def logits_of(params, tok_ids):
    h = qwen2.rms_norm(params["embed"][tok_ids].astype(jnp.bfloat16),
                       jnp.ones((cfg.hidden_size,), jnp.float32), 1e-6)
    return qwen2.compute_logits(cfg, params, h)

@jax.jit
def v_apply(params, tok_ids):
    f = S.apply_top_k_top_p(logits_of(params, tok_ids) / 0.7, tks, tps)
    return jnp.sum(f > -1e37, -1)

@jax.jit
def v_apply_nop(params, tok_ids):
    f = S.apply_top_k_top_p(logits_of(params, tok_ids) / 0.7, tks, tp1)
    return jnp.sum(f > -1e37, -1)

@jax.jit
def v_cp(params, tok_ids):
    p = S.compute_probs(logits_of(params, tok_ids), temps, tks, tps)
    return jnp.sum(p > 0, -1)

t = jnp.asarray(toks)
print("apply(tp=.95):", np.asarray(v_apply(params, t))[:4], flush=True)
print("apply(tp=1.0):", np.asarray(v_apply_nop(params, t))[:4], flush=True)
print("compute_probs:", np.asarray(v_cp(params, t))[:4], flush=True)
