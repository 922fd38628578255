"""Pallas TPU kernels (Mosaic-compiled) — the performance layer.

The TPU-native replacement for the reference's CUDA kernel surface
(SURVEY.md §2.4): paged attention, fused dequant+matmul, rejection
sampling. Each kernel has an XLA reference implementation in ops/ used for
CPU tests and numerical parity.

`install()` registers the kernels as dispatch overrides when running on
TPU.
"""

from __future__ import annotations

import os

import jax


def install(enable_attention: bool = True, enable_quant: bool = True,
            enable_sampler: bool = True) -> None:
    """Register Pallas kernels as the hot-path implementations.
    Env overrides (A/B benchmarking): VOT_DISABLE_PALLAS_ATTN,
    VOT_DISABLE_PALLAS_QUANT, VOT_DISABLE_PALLAS_SAMPLER."""
    if jax.default_backend() != "tpu":
        return
    if os.environ.get("VOT_DISABLE_PALLAS_ATTN") == "1":
        enable_attention = False
    if os.environ.get("VOT_DISABLE_PALLAS_QUANT") == "1":
        enable_quant = False
    if os.environ.get("VOT_DISABLE_PALLAS_SAMPLER") == "1":
        enable_sampler = False
    if enable_sampler:
        from vllm_omni_draft_tpu.ops import sampling
        from vllm_omni_draft_tpu.ops.pallas.rejection import (
            topk_topp_thresholds_pallas,
        )

        sampling.use_pallas_thresholds(topk_topp_thresholds_pallas)
    if enable_attention:
        from vllm_omni_draft_tpu.ops import attention as att
        from vllm_omni_draft_tpu.ops.pallas.paged_attention import (
            paged_attention_dispatch,
        )

        att.use_pallas_kernel(paged_attention_dispatch)
    if enable_quant:
        from vllm_omni_draft_tpu.ops import quant
        from vllm_omni_draft_tpu.ops.pallas.quant_matmul import (
            matmul_int4_pallas,
            matmul_int8_pallas,
        )

        from vllm_omni_draft_tpu.ops.pallas.quant_matmul import (
            matmul_dense_stacked_pallas,
            matmul_int4_stacked_pallas,
            matmul_int8_stacked_pallas,
        )

        int4 = (
            None
            if os.environ.get("VOT_DISABLE_PALLAS_INT4") == "1"
            else matmul_int4_pallas
        )
        int4_l = (
            None
            if os.environ.get("VOT_DISABLE_PALLAS_INT4") == "1"
            else matmul_int4_stacked_pallas
        )
        quant.use_pallas_kernels(matmul_int8_pallas, int4)
        quant.use_pallas_stacked_kernels(
            matmul_int8_stacked_pallas, int4_l, matmul_dense_stacked_pallas
        )
        from vllm_omni_draft_tpu.ops.pallas.quant_matmul import (
            argmax_matmul_dense_pallas,
            argmax_matmul_int4_pallas,
            argmax_matmul_int8_pallas,
        )

        quant.use_pallas_argmax_kernels(
            argmax_matmul_int8_pallas,
            None if int4 is None else argmax_matmul_int4_pallas,
            argmax_matmul_dense_pallas,
        )
        if os.environ.get("VOT_DISABLE_LOGITS_STATS") != "1":
            from vllm_omni_draft_tpu.ops.pallas.quant_matmul import (
                logits_stats_matmul_int4_pallas,
                logits_stats_matmul_int8_pallas,
            )

            quant.use_pallas_logits_stats_kernels(
                logits_stats_matmul_int8_pallas,
                None if int4 is None else logits_stats_matmul_int4_pallas,
            )
