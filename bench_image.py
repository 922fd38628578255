"""TPU image-stage benchmark: Qwen-Image-architecture DiT denoise + VAE
decode (VERDICT r3 item 3 — the image axis had zero TPU perf evidence).

Times the real `QwenImageTransformer2DModel` architecture
(models/qwen_image_dit.py — dual-stream MMDiT, 24 heads x 128, joint 3584)
with synthetic weights at 1024^2 / 50 steps / bs in {1,2,4}, matching the
reference's headline config (`/root/reference/src/doc/benchmark_results.md:17-19`:
DiT E2E 48.3 s at bs2x512, 50 steps, 1024^2, bf16, >=2x80GB GPUs).

Honest normalization: the full 60-layer / ~20B model is 40 GB bf16 and
cannot fit one 16 GB v5e chip, and 50 CFG steps of it are ~37 PFLOP —
>=187 s at this chip's 197 TFLOP/s peak regardless of software. So the
bench runs a depth-L slice (default 12 layers, ~8 GB), reports measured
s/image + model FLOPs utilization (MFU), and extrapolates the full-depth
time by layer ratio. MFU is the hardware-comparable number.

Env: VOT_IMG_SIZE (1024), VOT_IMG_STEPS (50), VOT_IMG_LAYERS (12),
VOT_IMG_BS ("1,2,4"), VOT_IMG_SEQ (512 text tokens), VOT_IMG_VAE (1).
Prints one JSON line per batch size plus a headline line.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


PEAK_TFLOPS = 197.0  # v5e bf16 MXU peak (see BASELINE/PERF_NOTES)


def main():
    import jax
    import jax.numpy as jnp

    from vllm_omni_draft_tpu.models import qwen_image_dit as qdit
    from vllm_omni_draft_tpu.models.qwen_image_vae import (
        QwenImageVAE,
        QwenImageVAEConfig,
    )

    size = int(os.environ.get("VOT_IMG_SIZE", "1024"))
    steps = int(os.environ.get("VOT_IMG_STEPS", "50"))
    L = int(os.environ.get("VOT_IMG_LAYERS", "12"))
    seq = int(os.environ.get("VOT_IMG_SEQ", "512"))
    bss = [int(b) for b in os.environ.get("VOT_IMG_BS", "1,2,4").split(",")]
    do_vae = os.environ.get("VOT_IMG_VAE", "1") == "1"
    full_depth = 60  # real Qwen-Image num_layers

    cfg = qdit.QwenImageDiTConfig(
        num_layers=L,
        num_attention_heads=24,
        attention_head_dim=128,
        joint_attention_dim=3584,
        in_channels=64,
        out_channels=16,
        patch_size=2,
        axes_dims_rope=(16, 56, 56),
        dtype="bfloat16",
    )
    t0 = time.time()
    params = jax.jit(lambda: qdit.init_params(cfg))()
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(params)
    )
    log(f"DiT init: {L} layers, {n_params/1e9:.2f}B params in "
        f"{time.time()-t0:.0f}s")

    # latent grid: size/8 (VAE) -> /2 (patch) tokens per side
    hp = wp = size // 8 // cfg.patch_size
    n_img = hp * wp
    D_txt = cfg.joint_attention_dim

    # per-denoise-step FLOPs (matmul-only, both CFG forwards):
    # dual-stream layer cost = 2 * tokens_of_stream * layer params
    lp = qdit.init_params(
        qdit.QwenImageDiTConfig(
            num_layers=1, num_attention_heads=24, attention_head_dim=128,
            joint_attention_dim=3584, in_channels=64, out_channels=16,
            patch_size=2, axes_dims_rope=(16, 56, 56), dtype="bfloat16",
        )
    )

    def stream_flops(prefix):
        """2 FLOP per weight element per token, for ONE stream's weights
        (dual-stream MMDiT applies img_* weights to image tokens only and
        txt_* to text tokens only — summing all weights over all tokens
        overcounts ~2x)."""
        per_layer = 0
        for name, sub in lp["blocks"].items():
            if not name.startswith(prefix):
                continue
            for x in jax.tree.leaves(sub):
                if x.ndim >= 2:
                    per_layer += int(np.prod(x.shape[-2:]))
        return 2 * per_layer

    results = []
    for bs in bss:
        denoise = jax.jit(qdit.make_denoiser(cfg, steps, (1, hp, wp)))
        key = jax.random.PRNGKey(0)
        tokens = jax.random.normal(
            key, (bs, n_img, cfg.in_channels), jnp.float32
        )
        te = jax.random.normal(
            jax.random.fold_in(key, 1), (bs, seq, D_txt), jnp.float32
        )
        tm = jnp.ones((bs, seq), jnp.int32)
        gvec = jnp.full((bs,), 4.0, jnp.float32)

        t0 = time.time()
        out = denoise(params, tokens, te, tm, gvec)
        np.asarray(out[0, 0, 0])
        compile_and_run = time.time() - t0
        log(f"bs{bs}: first call (compile+run) {compile_and_run:.1f}s")

        t0 = time.time()
        out = denoise(params, tokens, te, tm, gvec)
        np.asarray(out[0, 0, 0])
        dt = time.time() - t0

        # matmul FLOPs: per-stream weights x that stream's tokens, x2 CFG
        flops = (
            2 * bs * (n_img * stream_flops("img")
                      + seq * stream_flops("txt")) * L * steps
        )
        mfu = flops / dt / (PEAK_TFLOPS * 1e12)
        s_img = dt / bs
        extrap = dt * full_depth / L
        results.append({
            "bs": bs, "denoise_s": round(dt, 2),
            "s_per_image": round(s_img, 2),
            "step_ms": round(dt / steps * 1000, 1),
            "mfu": round(mfu, 3),
            "extrapolated_60L_s": round(extrap, 1),
        })
        log(f"bs{bs}: {dt:.1f}s denoise ({dt/steps*1000:.0f} ms/step, "
            f"MFU {mfu*100:.0f}%), extrapolated 60L: {extrap:.0f}s")

    vae_s = None
    if do_vae:
        vcfg = QwenImageVAEConfig()
        vae = QwenImageVAE(vcfg)
        lat = jax.random.normal(
            jax.random.PRNGKey(2), (1, 16, size // 8, size // 8), jnp.float32
        )
        t0 = time.time()
        px = vae.decode(lat)
        np.asarray(px).reshape(-1)[0]
        log(f"VAE decode (compile+run) {time.time()-t0:.1f}s")
        t0 = time.time()
        px = vae.decode(lat)
        np.asarray(px).reshape(-1)[0]
        vae_s = time.time() - t0
        log(f"VAE decode {size}^2: {vae_s:.2f}s, out {px.shape}")

    # reference headline: DiT E2E 48.3 s at bs2 => 24.15 s/image
    ref_s_per_image = 48.3 / 2
    for r in results:
        print(json.dumps({
            "metric": f"dit_denoise_s_per_image_qwen_image_{L}L_bs{r['bs']}",
            "value": r["s_per_image"],
            "unit": "s/image",
            "vs_baseline": round(
                ref_s_per_image
                / max(r["extrapolated_60L_s"] / r["bs"], 1e-9), 3),
            "detail": r,
        }))
    bs2 = next((r for r in results if r["bs"] == 2), results[0])
    print(json.dumps({
        "metric": "image_stage_bs2_mfu",
        "value": bs2["mfu"],
        "unit": "fraction_of_mxu_peak",
        "vs_baseline": round(
            ref_s_per_image
            / max(bs2["extrapolated_60L_s"] / bs2["bs"], 1e-9), 3),
        "vae_decode_s": vae_s,
    }))


if __name__ == "__main__":
    main()
