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


def _requant(acc, m, b, act, s_out, colmask=None, lo=-127.0, hi=127.0):
    """clip(round_away(acc*M[c] + B[c]), lo, hi) with fused activation and
    an optional pad-column mask — mirrors ops/quantized.py::_requant_conv_out.

    The mask is only semantically required where the result feeds 3x3 tap
    reads (the q1 staging write): every other op in the chain is per-row, so
    pad-column garbage stays in pad columns and is either re-masked at the
    next staging write or dropped by unpack_activations."""
    q = acc.astype(jnp.float32) * m + b
    if act is not None and act >= 0:
        if act == 1:
            q = jnp.clip(q, -1.0 / s_out, 1.0 / s_out)
        else:
            q = jnp.maximum(q, 0.0)
            if act > 0:
                q = jnp.minimum(q, float(act) / s_out)
    q = jnp.clip(_round_away(q), lo, hi)
    if colmask is None:
        return q
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


NSTREAM = 2  # image-packs processed per grid step (interleaved SSA streams)


def _qblock_kernel(
    x_hbm,       # [P, M, C0] int8 (packed flat layout)
    *refs,       # per-block weight/mult/bias refs, o_ref, scratch, sems
    blocks: Tuple[QBlock, ...],
    M: int, WROW: int, SEG: int, W: int, nargs: int,
):
    """Chain body. Each grid step runs NSTREAM independent image-packs as
    interleaved straight-line SSA chains: the serial dependency inside one
    pack (dot -> requant -> staging -> tap dots -> ...) alternates MXU and
    VPU work, so a second independent pack gives the scheduler instructions
    to overlap one unit's work with the other's stalls."""
    bargs = refs[:nargs]
    o_ref = refs[nargs]
    xin, stage, sem_in = refs[nargs + 1:]
    s = pl.program_id(0)
    n_s = pl.num_programs(0)
    slot = jax.lax.rem(s, 2)
    S = NSTREAM

    def in_dma(sl, step):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(step * S, S)], xin.at[sl], sem_in.at[sl]
        )

    @pl.when(s == 0)
    def _():
        # zero once: conv1 rewrites rows [WROW, WROW+M) every block, the
        # border rows stay zero for the whole launch — they are the conv's
        # top/bottom zero padding
        stage[...] = jnp.zeros_like(stage)
        in_dma(0, 0).start()

    @pl.when(s + 1 < n_s)
    def _():
        in_dma(slot ^ 1, s + 1).start()

    in_dma(slot, s).wait()

    # pad-column mask: flat row i holds image column (i % SEG); cols >= W are
    # padding and must stay exactly zero where 3x3 taps read (conv
    # zero-padding, zp = 0) — i.e. on the q1 staging write only
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    colmask = jax.lax.rem(rows, SEG) < W
    not_first = rows > 0        # pre-zero for the dx=2 output roll wrap
    not_last = rows < M - 1     # pre-zero for the dx=0 output roll wrap

    # per-block argument unpacking (order fixed by qblock_chain)
    off = 0
    packs = []
    for blk in blocks:
        n = 10 if blk.proj else 9
        packs.append(bargs[off : off + n])
        off += n

    nb = len(blocks)
    cur_q = [xin[slot, st] for st in range(S)]   # [M, C0] int8 values
    cur_f = [v.astype(jnp.float32) for v in cur_q]  # residual domain
    for b, (blk, ba) in enumerate(zip(blocks, packs)):
        if blk.proj:
            w1, m1, b1, w2, m2, b2, w3, m3, b3, proj_pack = ba
            w4, m4, b4 = proj_pack
        else:
            w1, m1, b1, w2, m2, b2, w3, m3, b3 = ba

        q1 = [
            _requant(
                _dot(cur_q[st], w1[...]), m1[0][None, :], b1[0][None, :],
                blk.act1, blk.s1, colmask,
            )
            for st in range(S)
        ]
        for st in range(S):
            stage[st, pl.ds(WROW, M)] = _i8(q1[st])
        # conv2 with OUTPUT-stationary column taps: the three dy variants of
        # each dx are aligned sublane slices of the zero-bordered staging
        # buffer (free); the +-1-column shifts move to the int32 partial
        # accumulators T_dx via pltpu.roll (32-bit native). The roll's
        # wrap-around row would import T from the far end of the pack, so
        # that single row is pre-zeroed — its true tap contribution is the
        # conv's zero padding. Earlier designs shifted the *inputs*, paying
        # an i32 staging write + 2 big rolls + 3 [TOT,C] narrowing casts per
        # block; this formulation does one i8 staging write and 2 [M,C]
        # rolls, nothing else.
        acc2 = []
        for st in range(S):
            sl = [stage[st, pl.ds(dy * WROW, M)] for dy in range(3)]
            T = []
            for dx in range(3):
                acc = None
                for dy in range(3):
                    d = _dot(sl[dy], w2[dy * 3 + dx])
                    acc = d if acc is None else acc + d
                T.append(acc)
            acc2.append(
                _roll_rows(jnp.where(not_last, T[0], 0), 1)
                + T[1]
                + _roll_rows(jnp.where(not_first, T[2], 0), -1)
            )
        q2 = [
            _requant(acc2[st], m2[0][None, :], b2[0][None, :],
                     blk.act2, blk.s2)
            for st in range(S)
        ]
        t = [
            _requant(
                _dot(_i8(q2[st]), w3[...]),
                m3[0][None, :], b3[0][None, :], -1, 1.0,
            )
            for st in range(S)
        ]
        # fused residual: dequant both quantized operands, add, requant —
        # exactly the unfused Eltwise-SUM numerics (zp = 0 everywhere). The
        # residual operand rides along as the f32 value from the previous
        # block (bit-identical to re-dequantizing the i8 copy, cast-free).
        if blk.proj:
            r = [
                _requant(
                    _dot(cur_q[st], w4[...]), m4[0][None, :], b4[0][None, :],
                    -1, 1.0,
                )
                for st in range(S)
            ]
        else:
            # a lane-padded chain entry (c_in < 128, ops/fused.py) carries
            # zero pad lanes in cur_f; the residual is the unpadded prefix
            r = [
                v if v.shape[1] == t[0].shape[1] else v[:, : t[0].shape[1]]
                for v in cur_f
            ]
        for st in range(S):
            y = _round_away(
                (t[st] * blk.s_mid + r[st] * blk.s_r) / blk.s_out
            )
            y = jnp.clip(y, -127.0, 127.0)
            if blk.s_relu is not None:
                if blk.s_relu == blk.s_out:
                    # degenerate separate-ReLu: requant(max(y*s,0)/s) == max
                    # over the already-rounded integers — exact, round-free
                    y = jnp.maximum(y, 0.0)
                else:
                    # separate ReLu node semantics: requant(max(dequant(q), 0))
                    y = _round_away(
                        jnp.maximum(y, 0.0) * blk.s_out / blk.s_relu
                    )
                    y = jnp.clip(y, -127.0, 127.0)
            yq = _i8(y)
            if b == nb - 1:
                o_ref[st] = yq
            else:
                cur_q[st], cur_f[st] = yq, y


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

    S = NSTREAM
    assert P % S == 0, "batch pack count must be a multiple of NSTREAM"
    out = pl.pallas_call(
        kernel,
        grid=(P // S,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (S, M, c2), lambda s: (s, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((P, M, c2), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, S, M, c0), jnp.int8),  # xin (2 pipeline slots)
            pltpu.VMEM((S, TOT, c1), jnp.int8),   # conv1 staging, zero borders
            pltpu.SemaphoreType.DMA((2,)),          # input slots
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
