"""Pallas TPU kernel: fused quantized STEM convolution (C_in tiny, stride 2).

Every conv net starts with a small-channel stride-2 stem (3x3 mobilenet,
6x6 yolov5-after-focus-fold, 7x7 resnet). XLA's spatial conv emitters for
C_in < 8 cannot host the requant epilogue and wrap the conv in layout
copies — the yolov5s 640 stem measured 33% of whole-net device time
(xprof), ~70x off the bandwidth roofline. This kernel does the whole stem
in one pass:

    s8/u8 NCHW rows -> (int16 lane pair-packs, byte-split deinterleave)
    -> int8 patch matrix [C*k*k, ROWS, OW] from static lane slices
    -> per-row int8 MXU dots (lhsT form, exact int32 accumulation)
    -> fused dequant-scale + bias + activation + round/clip requant
    -> bf16/f32 NHWC out

Measured variants (yolov5s 640 stem, batch 8, device trace): XLA 3.4 ms;
bf16 patches 2.65 ms; int8 patches 1.79 ms (+ epilogue). Design notes:
  * stride-2 column access never gathers: the wrapper bitcasts padded int8
    rows to int16 (same HBM bytes) and even/odd columns come out with
    int32 byte arithmetic — VPU only, no relayout;
  * patches are stored RE-CENTERED (u8: x-128, s8: as-is) so they always
    fit int8; the constant (c0 - zp_in)·rowsum(W) correction folds into
    the requant bias on the host — exact, padding included;
  * uint8 WEIGHTS (zp_w != 0) get an appended all-ones output column: the
    MXU computes each pixel's patch rowsum and the VPU applies
    (128 - zp_w)·rowsum, the same expansion as ops/pallas/qgemm.py;
  * the patch matrix is [K, ROWS, OW] so each tap writes one contiguous
    [ROWS, OW] block (row parity via a free sublane reshape); the MXU
    contracts K on sublanes (dot_general ((0,),(0,))), one dot per row —
    ROWS=32 matches the int8 sublane tile so nothing pads;
  * int32 accumulators stay < 2^24 (<= k*k*C*127*255), so the f32 epilogue
    is exact.

Reference analog: the dedicated first-layer conv paths of the NEON kernels
(device/cpu/op/conv/cortex-a 3x3s2 variants) — the reference also
special-cases the stem.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_away(x):
    # native VPU round instruction, exact C round() semantics
    return jax.lax.round(x, jax.lax.RoundingMethod.AWAY_FROM_ZERO)


def _stem_kernel(
    x_ref,   # [1, C, Hp, Wp/2] int16 lane pair-packs of the padded input
    w_ref,   # [Kp, Ce] int8 (re-centered weights; ones column if u8 weights)
    m_ref,   # [1, Ce] f32 requant multipliers
    b_ref,   # [1, Ce] f32 requant bias (all constant corrections folded)
    o_ref,   # [1, ROWS, OW, Ce] bf16/f32
    p_ref,   # scratch [Kp, ROWS, OW] int8
    *,
    k, c_in, ow, rows_in, rows, act, s_out, zp_out, lo, hi,
    c0, w_corr, n_cout, out_f32,
):
    j = pl.program_id(1)
    pairs = x_ref[0, :, pl.ds(j * 2 * rows, rows_in), :].astype(jnp.int32)
    lo_u = pairs & 0xFF
    hi_u = (pairs >> 8) & 0xFF
    if c0 == 0:  # signed input: sign-extend the bytes
        lo_v = lo_u - ((lo_u & 0x80) << 1)
        hi_v = hi_u - ((hi_u & 0x80) << 1)
    else:  # unsigned input re-centered by c0=128 (always fits int8)
        lo_v = lo_u - c0
        hi_v = hi_u - c0
    E = lo_v.astype(jnp.int8)  # [C, rows_in, Wp/2] even columns
    O = hi_v.astype(jnp.int8)  # odd columns

    # patch matrix: one contiguous [rows, OW] store per tap
    for c in range(c_in):
        for u in range(k):
            # output row t reads input row 2t+u: free sublane reshape
            eu = E[c, u : u + 2 * rows].reshape(rows, 2, E.shape[-1])[:, 0, :]
            ou = O[c, u : u + 2 * rows].reshape(rows, 2, O.shape[-1])[:, 0, :]
            for vv in range(k):
                src = eu if vv % 2 == 0 else ou
                p_ref[(c * k + u) * k + vv] = src[:, vv // 2 : vv // 2 + ow]

    kk = c_in * k * k
    if p_ref.shape[0] > kk:
        p_ref[kk:] = jnp.zeros((p_ref.shape[0] - kk, rows, ow), jnp.int8)

    w = w_ref[:]
    m = m_ref[0]
    bb = b_ref[0]
    # NOTE (r5): the per-row [Kp, OW] dots underfill the MXU (~25% at
    # Ce=32; the yolov5s-640 trace shows this custom-call at 1.9 ms of a
    # 5.9 ms net). Batching the band into ONE [Kp, rows*OW] dot was tried
    # two ways and Mosaic rejects both: the [Kp, rows, OW] -> [Kp, rows*OW]
    # value reshape merges a sublane into lanes ("tpu.reshape" error) and
    # the 3-D dot_general lowers through an unsupported shape cast. The
    # per-row loop stands.
    for t in range(rows):
        acc = jax.lax.dot_general(
            p_ref[:, t, :],                           # [Kp, OW] int8
            w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)                         # exact: |acc| < 2^24
        if w_corr != 0:
            # uint8 weights: ones column holds each pixel's patch rowsum
            acc = acc + w_corr * acc[:, n_cout][:, None]
        q = acc * m + bb
        if act is not None and act >= 0:
            if act == 100:  # fused SiLU (ours, beyond the reference 0/1/6 set)
                q = q * jax.nn.sigmoid(q * s_out)
            elif act == 1:
                q = jnp.clip(q, -1.0 / s_out, 1.0 / s_out)
            else:
                q = jnp.maximum(q, 0.0)
                if act > 0:
                    q = jnp.minimum(q, float(act) / s_out)
        q = jnp.clip(_round_away(q) + zp_out, lo, hi)
        o_ref[0, t] = q if out_f32 else q.astype(jnp.bfloat16)


def pack_stem_weights(w_q, mult, bias, *, k, zp_in, zp_w, signed_in):
    """Host-side packing: [Cout,C,k,k] int weights -> int8 K-matrix (+ones
    column for u8 weights) and fully-folded requant multiplier/bias rows.

    All constant corrections fold into the bias (exact):
      acc_true = acc_stored + (c0 - zp_in) * rowsum(W_true)
    (c0 = 128 for unsigned input re-centering, 0 for signed)."""
    Cout, C = int(w_q.shape[0]), int(w_q.shape[1])
    c0 = 0 if signed_in else 128
    kk = C * k * k
    kp = (kk + 7) // 8 * 8
    w_np = np.asarray(w_q, np.float32) - float(zp_w)   # true weight values
    w_corr = 0.0
    n_slots = Cout + (1 if zp_w else 0)                # +ones column if u8 w
    ce = n_slots if n_slots >= 128 else ((n_slots + 7) // 8 * 8)
    wmat = np.zeros((kp, ce), np.float32)
    src = w_np
    if zp_w:
        # stored weights re-centered by 128 fit int8; the MXU rowsum column
        # restores the (128 - zp_w) * sum(patch) cross term per pixel
        src = np.asarray(w_q, np.float32) - 128.0
        wmat[:kk, Cout] = 1.0
        w_corr = 128.0 - float(zp_w)
    for c in range(C):
        for u in range(k):
            for vv in range(k):
                wmat[(c * k + u) * k + vv, :Cout] = src[:, c, u, vv]
    assert wmat.min() >= -128 and wmat.max() <= 127, "weights must fit int8"

    mult = np.asarray(mult, np.float32)
    rowsum = w_np.reshape(Cout, -1).sum(axis=1)
    b_fold = np.asarray(bias, np.float32) + (c0 - zp_in) * rowsum * mult
    m_e = np.zeros((1, ce), np.float32)
    m_e[0, :Cout] = mult
    b_e = np.zeros((1, ce), np.float32)
    b_e[0, :Cout] = b_fold
    return wmat.astype(np.int8), m_e, b_e, w_corr


def stem_qconv_packed(
    x,            # [B, C, H, W] int8/uint8 (raw quantized values)
    wmat_i8,      # [Kp, Ce] int8 from pack_stem_weights
    m_e,          # [1, Ce] f32
    b_e,          # [1, Ce] f32
    *,
    n_cout: int,
    w_corr: float,
    k: int,
    pad: int,
    act: int = -1,
    s_out: float = 1.0,
    zp_in: int = 0,
    zp_out: int = 0,
    lo: float = -128.0,
    hi: float = 127.0,
    out_f32: bool = False,
):
    """Whole quantized stem: conv(kxk, stride 2, pad) + requant epilogue.

    Returns NHWC [B, OH, OW, Cout] bf16 (integer-valued, bf16 storage) or
    f32. Exact int32 accumulation — verified bit-equal to the engine's XLA
    fast path for s8/u8 inputs, u8 weights, all activation codes,
    k in {3,6,7}.
    """
    B, C, H, W = map(int, x.shape)
    Cout = n_cout
    assert H % 2 == 0 and W % 2 == 0
    OH, OW = H // 2, W // 2
    rows = 32 if OH % 32 == 0 else (16 if OH % 16 == 0 else 8)
    assert OH % rows == 0, "output rows must tile by 8"
    assert k <= 2 * pad + 2, "taps must stay inside the padded rows"

    signed_in = x.dtype == jnp.int8
    c0 = 0 if signed_in else 128
    rows_in = (2 * rows + k - 1 + 7) // 8 * 8
    hp = max(H + 2 * pad, 2 * (OH - rows) + rows_in + (k - 1))
    # lane-align the packed width (Mosaic memref slicing wants full tiles)
    wp = ((W + 2 * pad) // 2 + 127) // 128 * 128 * 2
    xp = jnp.pad(
        x,
        ((0, 0), (0, 0), (pad, hp - H - pad), (pad, wp - W - pad)),
        constant_values=np.asarray(zp_in, x.dtype),
    )
    # free byte-reinterpret: [.., wp] bytes -> [.., wp/2] int16 lane pairs
    x16 = jax.lax.bitcast_convert_type(
        xp.reshape(B, C, hp, wp // 2, 2), jnp.int16
    )

    kp, ce = int(wmat_i8.shape[0]), int(wmat_i8.shape[1])
    kern = functools.partial(
        _stem_kernel,
        k=k, c_in=C, ow=OW, rows_in=rows_in, rows=rows, act=act, s_out=s_out,
        zp_out=zp_out, lo=lo, hi=hi, c0=c0, w_corr=w_corr, n_cout=Cout,
        out_f32=out_f32,
    )
    out = pl.pallas_call(
        kern,
        grid=(B, OH // rows),
        in_specs=[
            pl.BlockSpec((1, C, hp, wp // 2), lambda b, j: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, ce), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ce), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ce), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, OW, ce), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, OH, OW, ce), jnp.float32 if out_f32 else jnp.bfloat16
        ),
        scratch_shapes=[pltpu.VMEM((kp, rows, OW), jnp.int8)],
        interpret=jax.default_backend() == "cpu",
    )(x16, wmat_i8, m_e, b_e)
    return out[..., :Cout] if ce != Cout else out


def stem_qconv(
    x, w_q, mult, bias, *, k, pad, act=-1, s_out=1.0, zp_in=0, zp_w=0,
    zp_out=0, lo=-128.0, hi=127.0, out_f32=False,
):
    """Convenience all-in-one wrapper (tests / standalone use)."""
    wmat, m_e, b_e, w_corr = pack_stem_weights(
        w_q, mult, bias, k=k, zp_in=zp_in, zp_w=zp_w,
        signed_in=x.dtype == jnp.int8,
    )
    return stem_qconv_packed(
        x, jnp.asarray(wmat), jnp.asarray(m_e), jnp.asarray(b_e),
        n_cout=int(w_q.shape[0]), w_corr=w_corr, k=k, pad=pad, act=act,
        s_out=s_out, zp_in=zp_in, zp_out=zp_out, lo=lo, hi=hi,
        out_f32=out_f32,
    )
