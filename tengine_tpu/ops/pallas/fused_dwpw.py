"""Fused depthwise-3x3 + pointwise-1x1 quantized Pallas kernel.

The mobilenet block (dw3x3 -> requant -> pw1x1 -> requant) dominates the
depthwise-separable nets. Split across two XLA convs, the dw intermediate
makes a full HBM round trip per block; this kernel keeps it in VMEM:

    grid over (batch, output-row tiles):
      DMA  input rows [TH*s + 2, W + 2, C] incl. halo from HBM  (manual
           async copy — halo windows overlap, which BlockSpec can't express)
      dw:  9 shifted VPU multiply-accumulates (int32), per-channel requant
           -> re-centered int8 intermediate [TH*OW, C] in VMEM
      pw:  MXU int8 dot [TH*OW, C] x [C, C2] -> int32 -> per-channel requant
      out  tile [TH, OW, C2] (uint8/int8) via the out BlockSpec

Both requant stages use the reference numerics (round-half-away, clip), so
the fused kernel matches running the two stages separately (same <=1 LSB
accumulation-order caveat as the unfused fast path). Supported: 3x3, pad 1,
stride 1 or 2 — the mobilenet-family block; uint8 asymmetric or int8
symmetric tensors (input is padded with zp_in so padding is zero after the
shift).

Stride 2 note: Mosaic only supports unit-stride vector slices, so the
wrapper deinterleaves columns into even/odd phases ([N, Hp, 2, OW+1, C])
with one cheap XLA transpose, and the kernel handles row striding by
slicing 2*TH contiguous rows and splitting the untiled major axis in two
(reshape + phase-0 select) — every in-kernel slice is unit-stride.
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


def _requant(q, zp, act, inv_s, lo, hi):
    if act is not None and act >= 0:
        if act == 1:
            q = jnp.clip(q, zp - inv_s, zp + inv_s)
        else:
            q = jnp.maximum(q, float(zp))
            if act > 0:
                q = jnp.minimum(q, act * inv_s + zp)
    return jnp.clip(_round_away(q), lo, hi)


def _kernel(
    x_hbm,      # s1: [N, H+2, W+2, C]; s2: [N, Hp, 2, OW+1, C] col-phase-split
    wd_ref,     # [9, C] int32 shifted dw taps
    md_ref,     # [1, C]
    bd_ref,     # [1, C]
    wp_ref,     # [C, C2] int8
    mp_ref,     # [1, C2]
    bp_ref,     # [1, C2]
    o_ref,      # [1, TH, OW, C2]
    x_vmem,     # scratch: s1 [in_rows, W+2, C]; s2 [in_rows, 2, OW+1, C]
    mid_scratch,  # scratch [TH*OW, C] int8
    sem,
    *,
    stride, th, ow, zp_in, act_d, act_p,
    inv_s_mid, zp_mid, mid_lo, mid_hi, mid_shift,
    inv_s_out, zp_out, lo, hi, cw_p, out_jnp, c_real,
):
    n = pl.program_id(0)
    i = pl.program_id(1)
    in_rows = x_vmem.shape[0]
    row0 = i * (th * stride)
    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(row0, in_rows)], x_vmem, sem
    )
    dma.start()
    dma.wait()

    C = x_vmem.shape[-1]
    x = x_vmem[:].astype(jnp.int32) - zp_in
    a32 = jnp.zeros((th, ow, C), jnp.int32)
    for ky in range(3):
        for kx in range(3):
            if stride == 1:
                xs = jax.lax.slice(x, (ky, kx, 0), (ky + th, kx + ow, C))
            else:
                # Mosaic forbids strided vector slices; rows: contiguous
                # slice then split the (untiled) major axis and keep phase
                # 0; cols: pre-deinterleaved into x[:, kx%2] by the wrapper
                a = jax.lax.slice(x, (ky, 0, 0, 0), (ky + 2 * th, 2, ow + 1, C))
                a = a.reshape(th, 2, 2, ow + 1, C)[:, 0]  # rows ky+2i
                xs = a[:, kx % 2, kx // 2 : kx // 2 + ow, :]
            a32 = a32 + xs * wd_ref[3 * ky + kx][None, None, :]
    qd = a32.astype(jnp.float32) * md_ref[0][None, None, :] + bd_ref[0][None, None, :]
    qd = _requant(qd, zp_mid, act_d, inv_s_mid, mid_lo, mid_hi)
    mid32 = qd.astype(jnp.int32) - mid_shift
    if c_real != C:
        # channels padded to the 128-lane tile: force stored mid to 0 there
        # so the pw dot and the cw_p row-sum correction see exact zeros
        lane = jax.lax.broadcasted_iota(jnp.int32, (th, ow, C), 2)
        mid32 = jnp.where(lane < c_real, mid32, 0)
    mid_scratch[:] = mid32.astype(jnp.int8).reshape(th * ow, C)

    accp = jax.lax.dot_general(
        mid_scratch[:], wp_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    if cw_p != 0:
        rowsum = jnp.sum(mid_scratch[:].astype(jnp.int32), axis=1, keepdims=True).astype(
            jnp.float32
        )
        accp = accp + cw_p * rowsum
    qp = accp * mp_ref[0][None, :] + bp_ref[0][None, :]
    qp = _requant(qp, zp_out, act_p, inv_s_out, lo, hi)
    o_ref[0] = qp.astype(jnp.int32).astype(out_jnp).reshape(th, ow, -1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "zp_in", "stride", "act_d", "act_p", "inv_s_mid", "zp_mid", "mid_lo",
        "mid_hi", "mid_shift", "inv_s_out", "zp_out", "lo", "hi", "cw_p",
        "out_dtype", "th",
    ),
)
def fused_dwpw_requant(
    x,          # [N, H, W, C] uint8/int8 activations (raw)
    wd,         # [9, C] int32-shifted dw taps
    md,         # [C] fp32: s_in*s_wd/s_mid
    bd,         # [C] fp32: bias_d*md + zp_mid (+ dw zp corrections)
    wp,         # [C, C2] int8 shifted pw weights
    mp,         # [C2] fp32: s_mid*s_wp/s_out
    bp,         # [C2] fp32: (pw zp-corrections + bias_p)*mp + zp_out
    zp_in: int = 0,
    stride: int = 1,
    act_d: int = -1,
    act_p: int = -1,
    inv_s_mid: float = 1.0,
    zp_mid: int = 0,
    mid_lo: int = 0,
    mid_hi: int = 255,
    mid_shift: int = 128,
    inv_s_out: float = 1.0,
    zp_out: int = 0,
    lo: int = 0,
    hi: int = 255,
    cw_p: int = 0,
    out_dtype: str = "uint8",
    th: int = 8,
):
    N, H, W, C = x.shape
    C2 = wp.shape[1]
    OH = (H + 2 - 3) // stride + 1
    OW = (W + 2 - 3) // stride + 1
    out_jnp = jnp.uint8 if out_dtype == "uint8" else jnp.int8

    th = min(th, OH)
    while OH % th:
        th -= 1

    # The manually-DMA'd dims must be tile-aligned (second-minor % 8, minor
    # % 128), so width and channels are over-padded — physically ~free, the
    # tiled HBM layout pads them anyway. Input pads with zp_in (vanishes
    # after the in-kernel shift); padded channels are masked to exact zero
    # before the pointwise dot.
    def _ru(v, m):
        return (v + m - 1) // m * m

    ca = _ru(C, 128)
    if ca != C:
        wd = jnp.pad(wd, ((0, 0), (0, ca - C)))
        md = jnp.pad(md, (0, ca - C))
        bd = jnp.pad(bd, (0, ca - C))
        wp = jnp.pad(wp, ((0, ca - C), (0, 0)))

    if stride == 1:
        w2a = _ru(W + 2, 8)
        xp = jnp.pad(
            x, ((0, 0), (1, 1), (1, w2a - W - 1), (0, ca - C)),
            constant_values=zp_in,
        )
        in_rows = th + 2
        x_scratch = pltpu.VMEM((in_rows, w2a, ca), x.dtype)
    else:
        # stride 2: over-pad so every in-kernel row window is in bounds, and
        # deinterleave columns into even/odd phases (XLA-side) so the kernel
        # only ever takes unit-stride slices
        hp, owa = 2 * OH + 2, _ru(OW + 1, 8)
        xp = jnp.pad(
            x, ((0, 0), (1, hp - H - 1), (1, 2 * owa - W - 1), (0, ca - C)),
            constant_values=zp_in,
        )
        xp = xp.reshape(N, hp, owa, 2, ca).transpose(0, 1, 3, 2, 4)
        in_rows = 2 * th + 2
        x_scratch = pltpu.VMEM((in_rows, 2, owa, ca), x.dtype)

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            stride=stride, th=th, ow=OW, zp_in=zp_in, act_d=act_d, act_p=act_p,
            inv_s_mid=inv_s_mid, zp_mid=zp_mid, mid_lo=mid_lo, mid_hi=mid_hi,
            mid_shift=mid_shift, inv_s_out=inv_s_out, zp_out=zp_out, lo=lo,
            hi=hi, cw_p=cw_p, out_jnp=out_jnp, c_real=C,
        ),
        grid=(N, OH // th),
        in_specs=[
            # manual halo DMA; pin to HBM — under pl.ANY the compiler may
            # promote to VMEM, and either way the slices must be tile-aligned
            # (hence the ca/w2a/owa padding above)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((9, ca), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ca), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ca), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ca, C2), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, OW, C2), lambda n, i: (n, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, OH, OW, C2), out_jnp),
        scratch_shapes=[
            x_scratch,
            pltpu.VMEM((th * OW, ca), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.default_backend() == "cpu",
    )(xp, wd, md.reshape(1, -1), bd.reshape(1, -1), wp, mp.reshape(1, -1), bp.reshape(1, -1))
    return out
