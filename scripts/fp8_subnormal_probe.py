"""On-TPU probe: do e4m3fn SUBNORMAL codes survive the bit-placement
dequant inside a Mosaic kernel?

The bit-placement trick (`ops/pallas/paged_attention._fp8_bits_to_f32`)
maps e4m3fn codes with exponent field 0 onto f32 DENORMALS
(~2^-129..2^-127) before the 2^120 bias fix multiplies them back up.
TPU VPUs may flush denormals to zero, in which case those 14 codes
dequantize to 0 instead of their exact value (max abs error
0.0137 * kv_scale). The CPU test mesh can't see this — only the real
chip can. This probe round-trips ALL 254 non-NaN codes through

  (a) a real Pallas kernel calling _fp8_bits_to_f32 (the kernel path),
  (b) the jitted XLA fallback (ops/quant.kv_from_fp8),

and reports, for each path, which codes mismatch their exact e4m3 value.

Result is recorded in PERF_NOTES.md / docs/kernels.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_omni_draft_tpu.ops.pallas.paged_attention import (
    FP8_BIAS_FIX,
    _fp8_bits_to_f32,
)
from vllm_omni_draft_tpu.ops import quant as quant_ops


def exact_e4m3fn_values() -> np.ndarray:
    """Exact f64 value of every e4m3fn bit pattern (NaN for 0x7f/0xff)."""
    out = np.zeros(256, np.float64)
    for code in range(256):
        s = -1.0 if code & 0x80 else 1.0
        e = (code >> 3) & 0xF
        m = code & 0x7
        if e == 0xF and m == 0x7:
            out[code] = np.nan  # e4m3fn NaN
        elif e == 0:
            out[code] = s * (m / 8.0) * 2.0 ** (-6)  # subnormal
        else:
            out[code] = s * (1.0 + m / 8.0) * 2.0 ** (e - 7)
    return out


def kernel_path(codes_u8: np.ndarray) -> np.ndarray:
    """Round-trip through a minimal Mosaic kernel using the exact same
    dequant sequence as the attention kernels (bit placement in-kernel,
    bias fix folded into a multiply)."""

    def kern(x_ref, o_ref):
        o_ref[...] = _fp8_bits_to_f32(x_ref[...]) * FP8_BIAS_FIX

    x = jnp.asarray(codes_u8).view(jnp.float8_e4m3fn).reshape(2, 128)
    f = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((2, 128), jnp.float32)
    )
    return np.asarray(jax.jit(f)(x)).reshape(-1)


def xla_path(codes_u8: np.ndarray) -> np.ndarray:
    x = jnp.asarray(codes_u8).view(jnp.float8_e4m3fn).reshape(2, 128)
    f = jax.jit(lambda a: quant_ops.kv_from_fp8(a, 1.0, jnp.float32))
    return np.asarray(f(x)).reshape(-1)


def report(name: str, got: np.ndarray, exact: np.ndarray, codes: np.ndarray):
    bad = []
    for i, code in enumerate(codes):
        e = exact[code]
        if np.isnan(e):
            continue  # NaN codes are documented as finite ±480
        if got[i] != np.float32(e):
            bad.append((int(code), float(e), float(got[i])))
    sub = [b for b in bad if ((b[0] >> 3) & 0xF) == 0]
    print(f"{name}: {len(bad)} mismatching non-NaN codes "
          f"({len(sub)} of them subnormal)")
    for code, want, have in bad[:20]:
        print(f"  code 0x{code:02x}: exact {want:.9g}  kernel {have:.9g}")
    return bad


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    exact = exact_e4m3fn_values()
    codes = np.arange(256, dtype=np.uint8)
    bad_k = report("pallas-kernel path", kernel_path(codes), exact, codes)
    bad_x = report("xla kv_from_fp8 path", xla_path(codes), exact, codes)
    if not bad_k and not bad_x:
        print("PROBE RESULT: exact for all 254 non-NaN codes on this chip "
              "(no denormal flush observed)")
    else:
        print("PROBE RESULT: denormal flush confirmed — document the "
              "subnormal caveat (max abs err 0.0137*kv_scale) or add an "
              "exp==0 fixup")


if __name__ == "__main__":
    main()
