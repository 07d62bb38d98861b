"""Pallas TPU kernel: fused quantized depthwise-separable block chains
(the mobilenet family's dw3x3 -> pw1x1 stacks) — the relaxed-numerics tier.

Why: the mobilenet-family nets are the reference's headline benchmark
(`benchmark/README.md`; its armv8 tier ships dedicated dw3x3/pw asm —
`source/device/cpu/op/conv/cortex-a/conv_dw_*`), and on v5e the XLA
bf16-storage path for them is HBM-bandwidth-bound at 2 B/elt: every
dw-mid and block-output tensor makes an HBM round trip. This kernel runs a
chain of stride-1 dw+pw blocks per grid step with every intermediate in
VMEM: HBM touches only the chain input + output. Chains break at stride-2
depthwise layers (spatial geometry changes), which stay on the XLA path
with its good bf16 window emitters.

Layout: identical to qblock.py's padded flat [M, C] activation scheme
(each spatial pixel is a matrix row; a 3x3 tap (dy, dx) is a flat shift of
(dy-1)*WROW + (dx-1); dy variants are aligned slices of a zero-bordered
staging buffer, dx = +-1 moves to the f32 tap accumulators via pltpu.roll).
See qblock.py's module docstring for the full derivation; geometry helpers
are imported from there.

Numerics (relaxed tier — `Options.quant_relaxed`, the armv8-asm accuracy
contract, top-1 delta not LSB):

  * the chain carries activations between layers as the UNROUNDED real
    value divided by the next tensor's scale, f = v/s (f32): the exact
    engine's per-layer round-to-grid is skipped (strictly closer to the
    fp32 oracle), but each layer's calibrated SATURATION is kept — f is
    clamped to [q_lo - zp, q_hi - zp] at every layer;
  * dw taps run in f32 with exact (w_q - zp_w) tap values — padding in the
    f = q - zp domain is exactly 0, so the flat layout's zero borders/gaps
    reproduce pad-with-zero-point with no correction terms at all;
  * the pw matmul runs on the bf16 MXU: f holds |f| <= 255-ish values
    whose bf16 rounding (2^-8 relative) is the same error class as the
    mid-grid rounding it replaces; pw weights (w_q - zp_w) are <= 9-bit
    integers, exact in bf16 (no weight requantization needed, unlike the
    int8-MXU variant);
  * one real rounding per chain: the final block output requantizes to the
    stored grid (round-half-away, clip, cast to the storage dtype).

Chain I/O is the engine's storage dtype (bf16 integer grid by default, raw
u8/s8 under integer storage) — the kernel converts at entry/exit.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qblock import (
    VMEM_LIMIT,
    _roll_rows,
    _round_away,
    pack_activations,
    pick_streams,
    seg_geometry,
    unpack_activations,
)


@dataclass(frozen=True)
class DwBlock:
    """Static config of one dw3x3(s1)+pw1x1 block in a chain. Channel
    counts are the LANE-PADDED sizes (multiples of 128); clip bounds are in
    the zp-free f = v/s domain of the respective tensor."""

    c: int            # dw channels == pw input channels (padded)
    c_out: int        # pw output channels (padded)
    act_d: int = -1   # dw activation (-1 none, 0 relu, >0 clamp at act/s)
    act_p: int = -1
    s_mid: float = 1.0   # mid scale (for act>0 clamp thresholds)
    s_out: float = 1.0
    mid_lo: float = -255.0
    mid_hi: float = 255.0
    out_lo: float = -255.0
    out_hi: float = 255.0


def _act_clamp(f, act, s):
    if act is not None and act >= 0:
        f = jnp.maximum(f, 0.0)
        if act > 0:
            f = jnp.minimum(f, float(act) / s)
    return f


def _dwchain_kernel(
    x_hbm,      # [P, M, C0] storage dtype
    *refs,      # per-block (wd, md, bd, wp, mp, bp) + o_ref + scratch + sem
    blocks: Tuple[DwBlock, ...],
    M: int, WROW: int, SEG: int, W: int, S: int,
    zp_in: float, zp_out: float, out_lo: float, out_hi: float,
    out_dtype,
):
    nargs = 6 * len(blocks)
    bargs = refs[:nargs]
    o_ref = refs[nargs]
    xin, stage, sem_in = refs[nargs + 1:]
    s = pl.program_id(0)
    n_s = pl.num_programs(0)
    slot = jax.lax.rem(s, 2)
    Mp = M + WROW
    MS = S * Mp

    def in_dma(sl, step, st):
        return pltpu.make_async_copy(
            x_hbm.at[step * S + st],
            xin.at[sl, pl.ds(st * Mp, M)],
            sem_in.at[sl, st],
        )

    @pl.when(s == 0)
    def _():
        stage[...] = jnp.zeros_like(stage)
        xin[...] = jnp.zeros_like(xin)
        for st in range(S):
            in_dma(0, 0, st).start()

    @pl.when(s + 1 < n_s)
    def _():
        for st in range(S):
            in_dma(slot ^ 1, s + 1, st).start()

    for st in range(S):
        in_dma(slot, s, st).wait()

    # mask: pad columns (>= W within a segment) and inter-pack gap rows must
    # hold exactly 0 in the f = q - zp domain (the conv's pad value)
    rows = jax.lax.broadcasted_iota(jnp.int32, (MS, 1), 0)
    within = jax.lax.rem(rows, Mp)
    fmask = (jax.lax.rem(within, SEG) < W) & (within < M)

    f = xin[slot].astype(jnp.float32) - zp_in
    for b, blk in enumerate(blocks):
        wd, md, bd, wp, mp, bp = bargs[6 * b : 6 * b + 6]
        C = blk.c
        stage[pl.ds(WROW, MS), pl.ds(0, C)] = jnp.where(fmask, f, 0.0)
        sl = [stage[pl.ds(dy * WROW, MS), pl.ds(0, C)] for dy in range(3)]
        T = []
        for dx in range(3):
            acc = None
            for dy in range(3):
                t = sl[dy] * wd[3 * dy + dx][None, :]
                acc = t if acc is None else acc + t
            T.append(acc)
        # dx = +-1 column taps: +-1 flat-row shifts of the f32 partials.
        # Gap/pad rows of T are exactly 0 (stage write is masked and bias
        # joins after the taps), so roll wrap-around lands zeros — the
        # conv's zero padding in the f domain. No extra masks needed.
        acc = _roll_rows(T[0], 1) + T[1] + _roll_rows(T[2], -1)
        e = acc * md[0][None, :] + bd[0][None, :]       # = v_mid / s_mid
        e = _act_clamp(e, blk.act_d, blk.s_mid)
        e = jnp.clip(e, blk.mid_lo, blk.mid_hi)         # calibrated saturation
        h = e.astype(jnp.bfloat16)
        acc2 = jax.lax.dot_general(
            h, wp[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        f = acc2 * mp[0][None, :] + bp[0][None, :]      # = v_out / s_out
        f = _act_clamp(f, blk.act_p, blk.s_out)
        f = jnp.clip(f, blk.out_lo, blk.out_hi)

    q = jnp.clip(_round_away(f) + zp_out, out_lo, out_hi)
    yq = q.astype(out_dtype)
    for st in range(S):
        o_ref[st] = yq[st * Mp : st * Mp + M]


def build_dw_args(blk_cfg, wd_oihw, bd_q, wp_oihw, bp_q,
                  s_in, sw_d, zp_wd, s_mid, sw_p, zp_wp, s_out):
    """Host-side packing of one block's kernel arguments (lane-padded).

    wd_oihw [C,1,3,3] raw quantized weights; bd_q raw bias (int32 at
    s_in*s_wd) or None; wp_oihw [C2,C,1,1]; bp_q at s_mid*s_wp. sw_* are
    per-channel (or scalar) weight scales. Returns [wd, md, bd, wp, mp, bp].
    """
    C, C2 = blk_cfg.c, blk_cfg.c_out
    c, c2 = wd_oihw.shape[0], wp_oihw.shape[0]

    def vec(v, n, np_pad):
        out = np.zeros(np_pad, np.float32)
        out[:n] = np.asarray(v, np.float32).reshape(-1)[:n] if np.ndim(v) else v
        return out

    sw_d = np.broadcast_to(np.asarray(sw_d, np.float64).reshape(-1), (c,))
    sw_p = np.broadcast_to(np.asarray(sw_p, np.float64).reshape(-1), (c2,))

    wd = np.zeros((9, C), np.float32)
    wd[:, :c] = (wd_oihw.reshape(c, 9).astype(np.float32) - zp_wd).T
    md = np.zeros((1, C), np.float32)
    md[0, :c] = (s_in * sw_d / s_mid).astype(np.float32)
    bd = np.zeros((1, C), np.float32)
    if bd_q is not None:
        bd[0, :c] = (bd_q.astype(np.float64) * (s_in * sw_d / s_mid)).astype(
            np.float32
        )
    wp = np.zeros((C, C2), np.float32)
    wp[:c, :c2] = (
        wp_oihw.reshape(c2, c).astype(np.float32) - zp_wp
    ).T
    mp = np.zeros((1, C2), np.float32)
    mp[0, :c2] = (s_mid * sw_p / s_out).astype(np.float32)
    bp = np.zeros((1, C2), np.float32)
    if bp_q is not None:
        bp[0, :c2] = (bp_q.astype(np.float64) * (s_mid * sw_p / s_out)).astype(
            np.float32
        )
    return [wd, md, bd, wp.astype(np.dtype("bfloat16")), mp, bp]


@functools.partial(
    jax.jit,
    static_argnames=("blocks", "H", "W", "zp_in", "zp_out", "out_lo",
                     "out_hi", "out_dtype", "interpret"),
)
def dwchain(
    x,                  # [P, M, C0] packed flat (pack_activations), storage dtype
    *block_args,        # flat per-block args from build_dw_args
    blocks: Tuple[DwBlock, ...],
    H: int, W: int,
    zp_in: float, zp_out: float, out_lo: float, out_hi: float,
    out_dtype: str = "bfloat16",
    interpret: Optional[bool] = None,
):
    SEG, g = seg_geometry(W)
    WROW = g * SEG
    M = H * WROW
    P = x.shape[0]
    assert x.shape[1] == M, (x.shape, M)
    c0 = blocks[0].c
    c_last = blocks[-1].c_out
    cmax = max(b.c for b in blocks)
    odt = jnp.dtype(out_dtype)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)]
    for a in block_args:
        in_specs.append(
            pl.BlockSpec(
                a.shape, lambda s, nd=a.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        )

    S = pick_streams(M, WROW)
    while P % S:
        S //= 2
    Mp = M + WROW
    MS = S * Mp

    flops = 0
    for blk in blocks:
        flops += 2 * P * M * (9 * blk.c + blk.c * blk.c_out)

    kernel = functools.partial(
        _dwchain_kernel,
        blocks=blocks, M=M, WROW=WROW, SEG=SEG, W=W, S=S,
        zp_in=float(zp_in), zp_out=float(zp_out),
        out_lo=float(out_lo), out_hi=float(out_hi), out_dtype=odt,
    )
    return pl.pallas_call(
        kernel,
        grid=(P // S,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (S, M, c_last), lambda s: (s, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((P, M, c_last), odt),
        scratch_shapes=[
            pltpu.VMEM((2, MS, c0), x.dtype),           # input DMA slots
            pltpu.VMEM((2 * WROW + MS, cmax), jnp.float32),  # dw tap staging
            pltpu.SemaphoreType.DMA((2, S)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=P * M * (c0 + c_last) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, *block_args)
