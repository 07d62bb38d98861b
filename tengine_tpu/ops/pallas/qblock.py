"""Pallas TPU kernel: fused quantized residual-block chains (ResNet bottlenecks).

The round-2 device traces (ARCHITECTURE.md "Round-2 perf findings") showed the
ResNet-50 int8 residual-block convs ~70% HBM-bandwidth-bound on the XLA
bf16-storage path: every 1x1 -> 3x3 -> 1x1 (+residual) block streams its
intermediates through HBM at 2 B/elt. This kernel executes a *chain* of whole
bottleneck blocks per grid step with every intermediate resident in VMEM:
HBM traffic collapses to the chain input + output (1 B/elt int8) + weights
(loaded once per kernel launch), and the MXU runs at its int8 rate with exact
int32 accumulation.

Reference analog: the optimized conv kernel tier
(device/cpu/op/conv/cortex-a/armv8.2/*.S i8gemm + requant) — but fused at the
block-chain granularity, which is the TPU-native fusion boundary (HBM traffic,
not register reuse, is the scarce resource).

Layout — making the 3x3 taps cheap
----------------------------------
Activations use a *padded flat* layout [M, C] with C in lanes:

    M = H * g * SEG   rows;  flat row index = h*(g*SEG) + j*SEG + w

where each image row is padded from W to SEG columns (SEG a divisor or
multiple of 32) and g = max(1, 32 // SEG) images are packed side-by-side so
the row stride WROW = g*SEG is a multiple of the int8 sublane tile (32).
Consequences:

  * a 3x3 tap (dy, dx) is a pure flat shift by (dy-1)*WROW + (dx-1);
  * the three dy variants of a given dx are *aligned* slices (offset
    dy*WROW, WROW % 32 == 0) of one (TOT = M+2*WROW)-row array — free;
  * only the dx = 0 / dx = 2 variants need a +-1 row shift, done as TWO
    `pltpu.roll`s per block on the conv1 output (vs. a Mosaic relayout per
    tap slice, the cost that sank the round-2 qconv int-storage path; a
    VMEM->VMEM DMA cannot do it at all — Mosaic requires DMA slices aligned
    to the sublane tiling). The conv1 output sits in a buffer whose first
    and last WROW rows are permanently zero, so the roll's wrap-around rows
    are exactly the conv's zero padding;
  * padding cols (>= W within each segment) are forced to zero by a column
    mask in every requant epilogue, so tap reads across segment/row
    boundaries see exact conv zero-padding (int8 symmetric: pad value 0).

Per grid step one image-pack runs the whole chain as straight-line SSA
values (conv outputs feed the next conv / the residual add directly; Mosaic
spills to VMEM as needed). The only stateful buffers are the double-buffered
input DMA landing slot and the zero-bordered conv1 staging buffer.

Numerics are bit-identical to the engine's unfused quantized chain
(ops/quantized.py::_requant_conv_out): round-half-away-from-zero, per-channel
multipliers, dequant-add-requant residual, separate-node trailing-ReLu
requant (tests/test_qblock_pallas.py). int8 symmetric (zp = 0) only — the
resnet-family tmfile int8 scheme.
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


# Scoped-VMEM ceiling handed to Mosaic (v5e: 128 MiB physical per core).
# ops/fused.py's chain splitter budgets against the same number.
VMEM_LIMIT = 96 * 1024 * 1024


def _round_away(x):
    # native VPU round instruction, exact C round() semantics
    return jax.lax.round(x, jax.lax.RoundingMethod.AWAY_FROM_ZERO)


def seg_geometry(W: int) -> Tuple[int, int]:
    """(SEG, g): per-image row segment length and images packed per row.
    SEG*g is a multiple of 32 (the int8 sublane tile) and SEG >= W+1 so a
    zero pad column separates adjacent images under +-1 column shifts."""
    for seg in (8, 16, 32):
        if W + 1 <= seg:
            return seg, 32 // seg
    return ((W + 1 + 31) // 32) * 32, 1


@dataclass(frozen=True)
class QBlock:
    """Static config of one bottleneck block in a chain (scales are compile-
    time constants; all activation tensors int8 symmetric, zp = 0)."""

    c_in: int
    c_mid: int
    c_out: int
    act1: int = 0       # conv1 fused activation (-1 none, 0 relu, >0 clamp)
    act2: int = 0       # conv2 fused activation
    s_mid: float = 1.0  # conv3 output (pre-add intermediate) scale
    s_r: float = 1.0    # residual tensor scale
    s_out: float = 1.0  # eltwise-sum output scale
    # trailing ReLu node's output scale, or None when the block ends at the
    # sum. The separate-node numerics (dequant, max 0, requant — a second
    # rounding) are reproduced exactly; s_relu == s_out degenerates to the
    # in-domain max without changing a bit (x*1.0 is exact).
    s_relu: Optional[float] = None
    proj: bool = False  # residual = requant(conv4(x)) instead of x
    s1: float = 1.0     # conv1 output scale (for act>0 clamp thresholds)
    s2: float = 1.0     # conv2 output scale


def _requant(acc, m, b, act, s_out, colmask, lo=-127.0, hi=127.0):
    """clip(round_away(acc*M[c] + B[c]), lo, hi) with fused activation and
    the pad-column mask — mirrors ops/quantized.py::_requant_conv_out."""
    q = acc.astype(jnp.float32) * m + b
    if act is not None and act >= 0:
        if act == 1:
            q = jnp.clip(q, -1.0 / s_out, 1.0 / s_out)
        else:
            q = jnp.maximum(q, 0.0)
            if act > 0:
                q = jnp.minimum(q, float(act) / s_out)
    q = jnp.clip(_round_away(q), lo, hi)
    return jnp.where(colmask, q, 0.0)


def _dot(a, w):
    return jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _i8(v):
    return v.astype(jnp.int32).astype(jnp.int8)


def _roll_rows(v, shift):
    """Row roll of a 32-bit array (Mosaic's rotate only supports 32-bit
    data; the caller stages int8 values as int32). pltpu.roll wants a
    non-negative shift."""
    if jax.default_backend() == "cpu":
        return jnp.roll(v, shift, axis=0)
    if shift < 0:
        shift += v.shape[0]
    return pltpu.roll(v, shift, 0)


def _qblock_kernel(
    x_hbm,       # [P, M, C0] int8 (packed flat layout)
    *refs,       # per-block weight/mult/bias refs, o_ref, scratch, sems
    blocks: Tuple[QBlock, ...],
    M: int, WROW: int, SEG: int, W: int, nargs: int,
):
    bargs = refs[:nargs]
    o_ref = refs[nargs]
    xin, mids1, sem_in = refs[nargs + 1:]
    s = pl.program_id(0)
    n_s = pl.num_programs(0)
    slot = jax.lax.rem(s, 2)

    def in_dma(sl, step):
        return pltpu.make_async_copy(x_hbm.at[step], xin.at[sl], sem_in.at[sl])

    @pl.when(s == 0)
    def _():
        # zero once: conv1 rewrites rows [WROW, WROW+M) every block, the
        # border rows stay zero for the whole launch — they are the conv's
        # top/bottom zero padding AND the rows the rolls wrap around
        mids1[...] = jnp.zeros_like(mids1)
        in_dma(0, 0).start()

    @pl.when(s + 1 < n_s)
    def _():
        in_dma(slot ^ 1, s + 1).start()

    in_dma(slot, s).wait()

    # pad-column mask: flat row i holds image column (i % SEG); cols >= W are
    # padding and must stay exactly zero (conv zero-padding, zp = 0)
    colmask = (
        jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0), SEG) < W
    )

    # per-block argument unpacking (order fixed by qblock_chain)
    off = 0
    packs = []
    for blk in blocks:
        n = 10 if blk.proj else 9
        packs.append(bargs[off : off + n])
        off += n

    nb = len(blocks)
    cur = xin[slot]  # [M, C0] int8 value
    for b, (blk, ba) in enumerate(zip(blocks, packs)):
        if blk.proj:
            w1, m1, b1, w2, m2, b2, w3, m3, b3, proj_pack = ba
            w4, m4, b4 = proj_pack
        else:
            w1, m1, b1, w2, m2, b2, w3, m3, b3 = ba

        q1 = _requant(
            _dot(cur, w1[...]), m1[0][None, :], b1[0][None, :],
            blk.act1, blk.s1, colmask,
        )
        # stage as int32: Mosaic's rotate is 32-bit-only, and an int8 roll
        # by +-1 sublane would be the per-tap relayout this design avoids
        mids1[pl.ds(WROW, M)] = q1.astype(jnp.int32)
        m1v = mids1[...]                       # [TOT, C1] i32, zero borders
        taps = {
            0: _roll_rows(m1v, 1).astype(jnp.int8),
            1: m1v.astype(jnp.int8),
            2: _roll_rows(m1v, -1).astype(jnp.int8),
        }

        acc2 = None
        for dy in range(3):
            for dx in range(3):
                d = _dot(
                    jax.lax.slice_in_dim(taps[dx], dy * WROW, dy * WROW + M),
                    w2[dy * 3 + dx],
                )
                acc2 = d if acc2 is None else acc2 + d
        q2 = _requant(acc2, m2[0][None, :], b2[0][None, :],
                      blk.act2, blk.s2, colmask)
        t = _requant(
            _dot(_i8(q2), w3[...]),
            m3[0][None, :], b3[0][None, :], -1, 1.0, colmask,
        )
        # fused residual: dequant both quantized operands, add, requant —
        # exactly the unfused Eltwise-SUM numerics (zp = 0 everywhere)
        if blk.proj:
            r = _requant(
                _dot(cur, w4[...]), m4[0][None, :], b4[0][None, :],
                -1, 1.0, colmask,
            )
        else:
            r = cur.astype(jnp.float32)
        y = _round_away((t * blk.s_mid + r * blk.s_r) / blk.s_out)
        y = jnp.clip(y, -127.0, 127.0)
        if blk.s_relu is not None:
            # separate ReLu node semantics: requant(max(dequant(q), 0))
            y = _round_away(jnp.maximum(y, 0.0) * blk.s_out / blk.s_relu)
            y = jnp.clip(y, -127.0, 127.0)
        y = jnp.where(colmask, y, 0.0)
        yq = _i8(y)
        if b == nb - 1:
            o_ref[0] = yq
        else:
            cur = yq


def build_block_args(blk: QBlock, w1, b1_q, w2, b2_q, w3, b3_q,
                     s_in, sw1, sw2, sw3, w4=None, b4_q=None, sw4=None,
                     s4_in=None):
    """Host-side packing of one block's kernel arguments.

    w* are OIHW int8 weights; b*_q int32 biases (or None); sw* per-channel
    weight scales; s_in the block input scale. Requant vectors follow the
    engine's fold (ops/quantized.py): M = s_in*s_w/s_out, B = bias*M.
    Returns the flat list of arrays in kernel order.
    """

    def mk(w_oihw, s_prev, sw, s_out, b_q):
        o = w_oihw.shape[0]
        k = w_oihw.shape[2]
        t = w_oihw.transpose(2, 3, 1, 0).reshape(k * k, w_oihw.shape[1], o)
        wk = np.ascontiguousarray(t.astype(np.int8))
        m = (s_prev * np.asarray(sw, np.float32).reshape(-1) / s_out).astype(
            np.float32
        )
        b0 = np.zeros(o, np.int64) if b_q is None else b_q.astype(np.int64)
        bv = (b0.astype(np.float64) * m).astype(np.float32)
        return wk, m.reshape(1, -1), bv.reshape(1, -1)

    w1k, m1, b1 = mk(w1, s_in, sw1, blk.s1, b1_q)
    w2k, m2, b2 = mk(w2, blk.s1, sw2, blk.s2, b2_q)
    w3k, m3, b3 = mk(w3, blk.s2, sw3, blk.s_mid, b3_q)
    args = [w1k[0], m1, b1, w2k, m2, b2, w3k[0], m3, b3]
    if blk.proj:
        w4k, m4, b4 = mk(w4, s4_in if s4_in is not None else s_in, sw4,
                         blk.s_r, b4_q)
        args += [w4k[0], m4, b4]
    return args


@functools.partial(jax.jit, static_argnames=("blocks", "H", "W", "interpret"))
def qblock_chain(
    x,                     # [P, M, C0] int8, packed flat layout (pack_activations)
    *block_args,           # flat per-block args from build_block_args
    blocks: Tuple[QBlock, ...],
    H: int,
    W: int,
    interpret: Optional[bool] = None,
):
    SEG, g = seg_geometry(W)
    WROW = g * SEG
    M = H * WROW
    P = x.shape[0]
    assert x.shape[1] == M
    c0 = blocks[0].c_in
    c1 = blocks[0].c_mid
    c2 = blocks[-1].c_out
    TOT = M + 2 * WROW

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    nargs = len(block_args)
    in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)]
    for a in block_args:
        in_specs.append(
            pl.BlockSpec(
                a.shape, lambda s, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM
            )
        )

    flops = 0
    for blk in blocks:
        flops += 2 * P * M * (
            blk.c_in * blk.c_mid + 9 * blk.c_mid * blk.c_mid
            + blk.c_mid * blk.c_out
            + (blk.c_in * blk.c_out if blk.proj else 0)
        )

    # regroup proj blocks' args into the nested tuple the kernel expects
    def kernel(*refs):
        x_ref = refs[0]
        flat = list(refs[1 : 1 + nargs])
        rest = refs[1 + nargs:]
        out = []
        i = 0
        for blk in blocks:
            if blk.proj:
                out += flat[i : i + 9] + [tuple(flat[i + 9 : i + 12])]
                i += 12
            else:
                out += flat[i : i + 9]
                i += 9
        _qblock_kernel(
            x_ref, *(tuple(out) + tuple(rest)),
            blocks=blocks, M=M, WROW=WROW, SEG=SEG, W=W,
            nargs=_packed_len(blocks),
        )

    out = pl.pallas_call(
        kernel,
        grid=(P,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, M, c2), lambda s: (s, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((P, M, c2), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, M, c0), jnp.int8),   # xin (2 pipeline slots)
            pltpu.VMEM((TOT, c1), jnp.int32),    # conv1 staging, zero borders
            pltpu.SemaphoreType.DMA((2,)),        # input slots
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # v5e has 128 MiB VMEM/core; the default 16 MiB scoped limit
            # rejects whole-stage chains whose SSA live set exceeds it.
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=P * M * (c0 + c2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, *block_args)
    return out


def _packed_len(blocks) -> int:
    return sum(10 if b.proj else 9 for b in blocks)


def pack_activations(x_nhwc, H: int, W: int):
    """[N, H, W, C] int8 -> [N/g, M, C] packed flat layout (XLA ops; runs
    inside the surrounding jit). Pads W -> SEG with zeros and interleaves g
    images per row block."""
    SEG, g = seg_geometry(W)
    N, _, _, C = x_nhwc.shape
    xp = jnp.pad(x_nhwc, ((0, 0), (0, 0), (0, SEG - W), (0, 0)))
    xp = xp.reshape(N // g, g, H, SEG, C).transpose(0, 2, 1, 3, 4)
    return xp.reshape(N // g, H * g * SEG, C)


def unpack_activations(y, N: int, H: int, W: int):
    """Inverse of pack_activations: [N/g, M, C] -> [N, H, W, C]."""
    SEG, g = seg_geometry(W)
    C = y.shape[-1]
    y = y.reshape(N // g, H, g, SEG, C).transpose(0, 2, 1, 3, 4)
    return y.reshape(N, H, SEG, C)[:, :, :W, :]
