"""Fused depthwise-3x3 + pointwise-1x1 Pallas kernel, bf16-storage edition.

The engine's default quantized path stores activations as bf16-encoded
integers (utils/config.py quant_bf16_storage): every |q| <= 511 is exact in
bf16, so XLA convs consume them at MXU rate with no integer conversions.
This kernel fuses the mobilenet block (dw3x3 -> requant -> pw1x1 -> requant)
in that same domain, eliminating the depthwise intermediate's HBM round
trip (the dominant traffic of depthwise-separable nets at batch) while
keeping every surrounding op in XLA's preferred bf16 world — no layout or
storage boundaries.

Numerics match the unfused fast path's class exactly (fp32 accumulation of
exact integer-valued products; reference rounding):

    dw:  acc[c]  = sum_9 x̂·wd[c]      (f32 MAC, all products/sums exact ints)
         q_mid   = clip(round(acc·Md + Bd))       Bd folds zp_in correction,
                                                  dw bias, and zp_mid
    pw:  accp    = q̂_mid @ (wp - zp_wp)           (bf16 MXU, f32 accumulate)
         q_out   = clip(round(accp·Mp + Bp))      Bp folds zp_mid correction,
                                                  pw bias, and zp_out

zero-points never touch the data path: both are folded into the per-channel
requant constants via the colsum identity sum((x-z)w) = sum(x·w) - z·sum(w).

grid (batch-tiles, row-tiles); double-buffered manual halo DMA (BlockSpec
can't express overlapping row windows); stride 2 via the column phase-split
trick (Mosaic allows only unit-stride vector slices). Requires C % 128 == 0
(HBM lane slicing); the C<128 head blocks stay on the XLA path.
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


def _ru(v, m):
    return (v + m - 1) // m * m


def _requant(q, zp, act, inv_s, lo, hi):
    """activation clamp (q domain, around zp) -> round-half-away -> clip."""
    if act is not None and act >= 0:
        if act == 1:
            q = jnp.clip(q, zp - inv_s, zp + inv_s)
        else:
            q = jnp.maximum(q, float(zp))
            if act > 0:
                q = jnp.minimum(q, act * inv_s + zp)
    return jnp.clip(_round_away(q), lo, hi)


def _kernel(
    x_hbm,     # s1: [N, H+2, Wp, C] bf16;  s2: [N, Hp, 2, Wp2, C]
    wd_ref,    # [9, C] f32  zp-shifted dw taps
    md_ref,    # [1, C] f32
    bd_ref,    # [1, C] f32
    wp_ref,    # [C, C2] bf16  zp-shifted pw weights
    mp_ref,    # [1, C2] f32
    bp_ref,    # [1, C2] f32
    o_ref,     # [bn, th, OW, C2] bf16
    x_vmem,    # scratch [2, bn, in_rows, Wp(|2,Wp2), C]
    sem,
    *,
    stride, bn, th, ow,
    act_d, inv_s_mid, zp_mid, mid_lo, mid_hi,
    act_p, inv_s_out, zp_out, lo, hi,
):
    nb = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    in_rows = x_vmem.shape[2]

    def dma(slot, nb_, i_):
        row0 = i_ * (th * stride)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(nb_ * bn, bn), pl.ds(row0, in_rows)],
            x_vmem.at[slot],
            sem.at[slot],
        )

    step = nb * n_i + i
    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        dma(0, 0, 0).start()

    @pl.when(step + 1 < pl.num_programs(0) * n_i)
    def _():
        i1 = i + 1
        nb1 = jnp.where(i1 == n_i, nb + 1, nb)
        i1 = jnp.where(i1 == n_i, 0, i1)
        dma(nxt, nb1, i1).start()

    dma(slot, nb, i).wait()

    C = x_vmem.shape[-1]
    acc = None
    for ky in range(3):
        for kx in range(3):
            if stride == 1:
                xs = x_vmem[slot, :, pl.ds(ky, th), pl.ds(kx, ow), :]
            else:
                kxw = kx // 2 + ow
                a = x_vmem[slot, :, pl.ds(ky, 2 * th), :, pl.ds(0, kxw), :]
                a = a.reshape(bn, th, 2, 2, kxw, C)[:, :, 0]
                xs = a[:, :, kx % 2, kx // 2 : kx // 2 + ow, :]
            d = xs.astype(jnp.float32) * wd_ref[3 * ky + kx][None, None, None, :]
            acc = d if acc is None else acc + d

    q = acc * md_ref[0] + bd_ref[0]
    q_mid = _requant(q, zp_mid, act_d, inv_s_mid, mid_lo, mid_hi)
    pm = q_mid.astype(jnp.bfloat16).reshape(bn * th * ow, C)

    accp = jax.lax.dot_general(
        pm, wp_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    qp = accp * mp_ref[0][None, :] + bp_ref[0][None, :]
    qp = _requant(qp, zp_out, act_p, inv_s_out, lo, hi)
    val = qp.astype(jnp.bfloat16).reshape(bn, th, ow, -1)
    o_ref[:] = val[:, :, : o_ref.shape[2], :]


def _pick_tiles(N, OH, OWp, C, C2, in_per_row_bytes, stride):
    budget = 9 * 1024 * 1024
    th = OH
    bn = 1

    def vmem(bn, th):
        in_rows = th * stride + 2
        return (
            2 * bn * in_rows * in_per_row_bytes      # x scratch, 2 slots
            + 2 * bn * th * OWp * C2 * 2             # out block (bf16), 2 slots
            + bn * th * OWp * (4 * C + 2 * C + 4 * C2)  # dw acc + mid + pw acc
        )

    while vmem(bn, th) > budget and th > 4:
        th2 = th // 2
        while OH % th2:
            th2 -= 1
        th = th2
    while bn < N and N % (bn * 2) == 0 and vmem(bn * 2, th) <= budget and bn * 2 <= 16:
        bn *= 2
    return bn, th


@functools.partial(
    jax.jit,
    static_argnames=(
        "zp_in", "stride", "act_d", "act_p", "inv_s_mid", "zp_mid", "mid_lo",
        "mid_hi", "inv_s_out", "zp_out", "lo", "hi",
    ),
)
def fused_dwpw_bf16(
    x,       # [N, H, W, C] bf16 (quantized values incl. zero-point)
    wd,      # [9, C] f32 zp-shifted dw taps
    md,      # [C] f32: s_in*s_wd/s_mid
    bd,      # [C] f32: folds dw bias, zp_in colsum correction, and zp_mid
    wp,      # [C, C2] bf16 zp-shifted pw weights
    mp,      # [C2] f32: s_mid*s_wp/s_out
    bp,      # [C2] f32: folds pw bias, zp_mid colsum correction, and zp_out
    zp_in: int = 0,
    stride: int = 1,
    act_d: int = -1,
    act_p: int = -1,
    inv_s_mid: float = 1.0,
    zp_mid: int = 0,
    mid_lo: int = 0,
    mid_hi: int = 255,
    inv_s_out: float = 1.0,
    zp_out: int = 0,
    lo: int = 0,
    hi: int = 255,
):
    N, H, W, C = x.shape
    C2 = wp.shape[1]
    OH = (H + 2 - 3) // stride + 1
    OW = (W + 2 - 3) // stride + 1
    OWp = _ru(OW, 8)

    if stride == 1:
        wp_w = _ru(max(W + 2, OWp + 2), 8)
        xp = jnp.pad(
            x, ((0, 0), (1, 1), (1, wp_w - W - 1), (0, 0)),
            constant_values=jnp.bfloat16(zp_in),
        )
        in_per_row_bytes = wp_w * C * 2
        row_shape = (wp_w, C)
    else:
        hp = 2 * OH + 2
        wp2 = _ru(OWp + 2, 8)
        xp = jnp.pad(
            x, ((0, 0), (1, hp - H - 1), (1, 2 * wp2 - W - 1), (0, 0)),
            constant_values=jnp.bfloat16(zp_in),
        )
        xp = xp.reshape(N, hp, wp2, 2, C).transpose(0, 1, 3, 2, 4)
        in_per_row_bytes = 2 * wp2 * C * 2
        row_shape = (2, wp2, C)

    bn, th = _pick_tiles(N, OH, OWp, C, C2, in_per_row_bytes, stride)
    in_rows = th * stride + 2

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            stride=stride, bn=bn, th=th, ow=OWp,
            act_d=act_d, inv_s_mid=inv_s_mid, zp_mid=zp_mid,
            mid_lo=mid_lo, mid_hi=mid_hi,
            act_p=act_p, inv_s_out=inv_s_out, zp_out=zp_out, lo=lo, hi=hi,
        ),
        grid=(N // bn, OH // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((9, C), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C2), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, th, OW, C2), lambda n, i: (n, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, OH, OW, C2), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, bn, in_rows) + row_shape, x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * OH * OWp * C * (9 + C2),
            bytes_accessed=N * (H * W * C + OH * OW * C2) * 2,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xp, wd, md.reshape(1, -1), bd.reshape(1, -1), wp, mp.reshape(1, -1), bp.reshape(1, -1))
    return out
