"""Pallas TPU kernel: int8 GEMM with fused per-channel requantization.

Forward role (r5 adjudication): the int-storage tier's pointwise/FC engine
(Options.pallas_qgemm + quant_bf16_storage=False), paired with qconv.py as
the complete non-bf16 fallback; also the reference implementation of the
MXU ones-column zero-point expansion reused by stem_conv.py.

The MXU multiplies int8 at twice the bf16 rate with exact int32
accumulation; this kernel is the engine's replacement for the reference's
hand-written i8gemm assembly (device/cpu/op/conv/cortex-a/armv8.2 int8
kernels) and its requantize stage, fused into one pass:

    x'         = x - 128            (uint8 operands only; in-VMEM, free)
    acc[m,n]   = sum_k x'[m,k] * w[k,n]                      (MXU, int32)
    q[m,n]     = acc * M[n] + B[n] (+ cw*rowsum_x'[m]*M[n])  (zp correction)
    out[m,n]   = clip(round_away(q))                         (requant, VPU)

Asymmetric-uint8 operands use the standard shift trick: re-center by -128
into int8 and fold the constants through the 4-term expansion

    dot(x_u8 - zpx, w_u8 - zpw) = dot(x', w') + cw*rowsum(x')
                                + cx*colsum(w') + K*cx*cw
with cx = 128 - zpx, cw = 128 - zpw; the per-column constant terms are
precomputed into B (ops/quantized.py fast path), which also folds the conv
bias and the output zero point. Activation clamps run in the requant domain,
shifted by zp_out. The input shift happens inside the kernel so uint8
activations stream from HBM as-is (no extra elementwise pass).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_away(x):
    # native VPU round instruction, exact C round() semantics
    return jax.lax.round(x, jax.lax.RoundingMethod.AWAY_FROM_ZERO)


def _qgemm_kernel(
    x_ref, w_ref, m_ref, b_ref, o_ref, *, shift_in, cw, act, inv_s_out, zp_out, lo, hi, out_jnp
):
    x = x_ref[:]
    if shift_in:
        # uint8 -> re-centered int8, entirely in VMEM (int32 hop: this TPU
        # gen has no s16 vector subtract)
        x = (x.astype(jnp.int32) - 128).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    if cw != 0:
        rowsum = jnp.sum(x.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
        acc = acc + cw * rowsum
    # q = total/s_out + zp_out (b_ref folds corrections, bias, and zp_out);
    # activation bounds live in the total domain so they shift by zp_out here
    q = acc * m_ref[:] + b_ref[:]
    if act is not None and act >= 0:
        if act == 1:
            q = jnp.clip(q, zp_out - inv_s_out, zp_out + inv_s_out)
        else:
            q = jnp.maximum(q, float(zp_out))
            if act > 0:
                q = jnp.minimum(q, act * inv_s_out + zp_out)
    # Mosaic lacks a direct f32->u8 cast; hop through int32
    o_ref[:] = jnp.clip(_round_away(q), lo, hi).astype(jnp.int32).astype(out_jnp)


def _pad_to(x, m, axis):
    r = x.shape[axis] % m
    if r == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, m - r)
    return jnp.pad(x, pads)


def _pick_tiles(M, K, N):
    """Keep each grid step's MXU work well above the per-step overhead while
    fitting x/w/out blocks in VMEM. Small-K layers (early convs) need very
    tall M tiles or the grid-step overhead dominates (measured: 1.7 us/step
    vs 0.04 us of compute at K=32)."""
    tn = min(512, N)
    # budget ~6 MB for x + out blocks (w block is K*tn, small)
    budget = 6 * 1024 * 1024
    tm = 16384
    while tm > 256 and tm * (K + 4 * tn) > budget:
        tm //= 2
    if M < tm:
        tm = max(32, M)
    return tm, tn


@functools.partial(
    jax.jit,
    static_argnames=("cw", "act", "inv_s_out", "zp_out", "lo", "hi", "out_dtype"),
)
def qgemm_requant(
    x: jnp.ndarray,  # [M, K] int8, or uint8 (shifted in-kernel)
    w: jnp.ndarray,  # [K, N] int8 (pre-shifted at prepare if source was uint8)
    mult: jnp.ndarray,  # [N] fp32 requant multiplier s_in*s_w/s_out
    bias: jnp.ndarray,  # [N] fp32: (zp-corrections + bias_i32)*mult + zp_out
    cw: int = 0,
    act: Optional[int] = -1,
    inv_s_out: float = 1.0,
    zp_out: int = 0,
    lo: int = -127,
    hi: int = 127,
    out_dtype: str = "int8",
):
    M, K = x.shape
    N = w.shape[1]
    out_jnp = jnp.int8 if out_dtype == "int8" else jnp.uint8
    shift_in = x.dtype == jnp.uint8

    tm, tn = _pick_tiles(M, K, N)
    xp = _pad_to(x, tm, 0)
    wp = _pad_to(w, tn, 1)
    multp = _pad_to(mult.reshape(1, -1), tn, 1)
    biasp = _pad_to(bias.reshape(1, -1), tn, 1)
    Mp, Np = xp.shape[0], wp.shape[1]

    kern = functools.partial(
        _qgemm_kernel,
        shift_in=shift_in,
        cw=cw,
        act=act,
        inv_s_out=inv_s_out,
        zp_out=zp_out,
        lo=lo,
        hi=hi,
        out_jnp=out_jnp,
    )
    out = pl.pallas_call(
        kern,
        grid=(Mp // tm, Np // tn),
        in_specs=[
            pl.BlockSpec((tm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_jnp),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * K,
            bytes_accessed=Mp * K + K * Np + Mp * Np,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xp, wp, multp, biasp)
    return out[:M, :N]
