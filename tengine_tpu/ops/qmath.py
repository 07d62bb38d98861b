"""Quantization math helpers.

Semantics follow the reference ref kernels exactly:
  * UINT8 asymmetric per-tensor: real = (q - zero_point) * scale
    (conv_kernel_ref_uint8.c:76-84), requant = round(x/scale) + zp clipped to
    [0, 255] (conv_kernel_ref_uint8.c:168-173).
  * INT8 symmetric, per-channel weights: real = q * scale[c]; requant =
    round(x/scale) clipped to [-127, 127] (conv_kernel_ref_int8.c:162-166).
  * round() is C round — half away from zero — NOT numpy/jax banker's
    rounding; we reproduce it as sign(x) * floor(|x| + 0.5).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..graph.ir import DType, QuantParam, Tensor

QRANGE = {
    DType.UINT8: (0, 255),
    DType.INT8: (-127, 127),
    DType.INT32: (-(2**31) + 1, 2**31 - 1),
}


def qrange(dtype: DType, quant: Optional[QuantParam] = None) -> Tuple[int, int]:
    """Clip range for a quantized tensor. INT8 tensors holding a shifted
    UINT8 grid (native-int8 storage, QuantParam.full_range) span the full
    [-128, 127]; the reference's symmetric int8 scheme clips to +-127."""
    if quant is not None and quant.full_range and dtype == DType.INT8:
        return (-128, 127)
    return QRANGE[dtype]


def round_away(x):
    """C round(): half away from zero (jnp.round is half-to-even).

    lax.round(AWAY_FROM_ZERO) is a single native VPU instruction on TPU
    (measured 0.67 us vs 9.8 us for a sign*floor(|x|+0.5) requant pass on
    [3584,512] f32) — requantization epilogues are VPU-bound, so this is a
    whole-net win on every quantized config."""
    from jax import lax

    return lax.round(x, lax.RoundingMethod.AWAY_FROM_ZERO)


def round_away_np(x):
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def _chan_shape(ndim: int, axis: int, n: int):
    s = [1] * ndim
    s[axis] = n
    return s


def dequantize(x, quant: QuantParam, channel_axis: Optional[int] = None):
    """Quantized array -> fp32. Per-channel scales broadcast on channel_axis."""
    xf = x.astype(jnp.float32)
    scales = jnp.asarray(quant.scales, jnp.float32)
    zps = jnp.asarray(quant.zero_points, jnp.float32)
    if quant.per_channel:
        assert channel_axis is not None, "per-channel dequant needs a channel axis"
        shape = _chan_shape(x.ndim, channel_axis, scales.shape[0])
        return (xf - zps.reshape(shape)) * scales.reshape(shape)
    return (xf - zps) * scales


def requantize(
    x,
    quant: QuantParam,
    dtype: DType,
    channel_axis: Optional[int] = None,
    store_bf16: bool = False,
):
    """fp32 -> quantized with reference rounding/clipping semantics.

    store_bf16 stores the (exact, |q| <= 255 < 2^8) integer result as
    bfloat16 so the consuming MXU op needs no int->float pass
    (Options.quant_bf16_storage); the values are bit-identical."""
    lo, hi = qrange(dtype, quant)
    scales = jnp.asarray(quant.scales, jnp.float32)
    zps = jnp.asarray(quant.zero_points, jnp.float32)
    if quant.per_channel:
        assert channel_axis is not None
        shape = _chan_shape(x.ndim, channel_axis, scales.shape[0])
        scales = scales.reshape(shape)
        zps = zps.reshape(shape)
    q = round_away(x / scales) + zps
    store = jnp.bfloat16 if store_bf16 else dtype.np
    return clip_cast(q, lo, hi, store)


def clip_cast(q, lo, hi, store):
    """clip + cast. NOTE (r5, measured): the TPU's float->int convert
    SATURATES (f32->s8 clamps to [-128,127], f32->u8 to [0,255], NaN->0),
    so the explicit clip looks redundant whenever (lo, hi) equals the
    saturation range — but ELIDING it measured a consistent -6..-7% on
    r50-int8 and mobilenet-uint8 b128 (7.17 -> 7.71 ms / 2.61 -> 2.76):
    XLA-TPU's "clamp_convert" fusion emitters pattern-match the
    clamp+convert+pack sequence, and the bare convert takes a slower
    generic path. Keep the canonical clip form."""
    return jnp.clip(q, lo, hi).astype(store)


def dequantize_np(x: np.ndarray, quant: QuantParam, channel_axis: Optional[int] = None):
    xf = x.astype(np.float32)
    if quant.per_channel:
        shape = _chan_shape(x.ndim, channel_axis, quant.scales.shape[0])
        return (xf - quant.zero_points.reshape(shape)) * quant.scales.reshape(shape)
    return (xf - float(quant.zero_points)) * float(quant.scales)


def quantize_np(x: np.ndarray, quant: QuantParam, dtype: DType, channel_axis: Optional[int] = None):
    lo, hi = qrange(dtype, quant)
    if quant.per_channel:
        shape = _chan_shape(x.ndim, channel_axis, quant.scales.shape[0])
        q = round_away_np(x / quant.scales.reshape(shape)) + quant.zero_points.reshape(shape)
    else:
        q = round_away_np(x / float(quant.scales)) + float(quant.zero_points)
    return np.clip(q, lo, hi).astype(dtype.np)


def is_quantized_tensor(t: Tensor) -> bool:
    return t.quant is not None and t.dtype in (DType.UINT8, DType.INT8)


def node_is_quant(ctx) -> bool:
    """Node executes in the quantized domain: first input and first output
    are quantized tensors and quantization isn't globally disabled."""
    if ctx.options.quant_mode == "float":
        return False
    if not ctx.node.inputs or not ctx.node.outputs:
        return False
    return is_quantized_tensor(ctx.in_tensor(0)) and is_quantized_tensor(ctx.out_tensor(0))


def node_is_float(ctx) -> bool:
    return not node_is_quant(ctx)
