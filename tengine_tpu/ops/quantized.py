"""Quantized execution kernels (UINT8 asymmetric / INT8 per-channel).

Two tiers, mirroring the reference's ref-vs-optimized kernel split:

  * SCORE_CANDO "ref" kernels — reproduce the reference C semantics
    literally: dequantize -> fp32 compute (HIGHEST precision) -> requantize
    with round-half-away and clip (conv_kernel_ref_uint8.c:67-177,
    conv_kernel_ref_int8.c). These are the accuracy oracle
    (TG_DEBUG_REF analog) and what quant_mode="ref" selects.

  * SCORE_BEST "fast" kernels — MXU-friendly integer math with the
    requantization folded into a single per-channel multiplier:
      int8:  acc_i32 = conv(x_i8, w_i8)          (exact int32 accumulate)
      uint8: acc_f32 = conv(x-zp, w-zpw in bf16)  (products exact; fp32
             accumulate — the same numeric class as the reference's own
             fp32-accumulating uint8 ref kernel)
    then q = clip(round(acc * M[c] + B[c]) + zp_out).

Any op without a quant-aware kernel runs under the engine's generic
dequant -> fp32 kernel -> requant wrapper, which reproduces the reference's
store-every-activation-quantized behavior (executor/engine.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..graph.ir import DType, QuantParam
from . import qmath
from .layout import TArr, as_nchw, as_nhwc, as_semantic, nchw, nhwc
from .lowering import ACT_SILU, _conv_pads, apply_activation
from .registry import SCORE_BEST, SCORE_CANDO, SCORE_STATIC, LowerCtx, register_op


node_is_quant = qmath.node_is_quant


def _fast_enabled(ctx: LowerCtx) -> bool:
    return (
        node_is_quant(ctx)
        and ctx.options.quant_mode in ("auto", "fast")
        and not ctx.options.force_ref_kernels
    )


def _no_fused_add(ctx: LowerCtx) -> bool:
    # nodes carrying a fused residual add (fuse_conv_add pass) are only
    # lowerable by the pallas qconv kernel
    return "fused_add_pos" not in ctx.params


def _store_for(ctx: LowerCtx, t_out) -> "np.dtype":
    """Storage dtype for a quantized activation under the selective-storage
    plan (engine._plan_quant_storage): bf16 only when some consumer reads
    through a window; raw 1-byte integer otherwise (exact either way)."""
    if not ctx.options.quant_bf16_storage:
        return t_out.dtype.np
    plan = getattr(ctx.graph, "_bf16_tids", None)
    if plan is None or t_out.idx in plan:
        return jnp.bfloat16
    return t_out.dtype.np


def _wscales(quant: QuantParam, out_c: int) -> np.ndarray:
    s = np.asarray(quant.scales, np.float32).reshape(-1)
    if s.size == 1:
        s = np.full((out_c,), s[0], np.float32)
    return s


# ---------------------------------------------------------------------------
# Convolution
# ---------------------------------------------------------------------------


def _ones_conv_np(w_raw, p, in_h, in_w, pads, dil):
    """conv(ones, w) window sums, computed on the host at fold time: the
    per-output-position sum of the weights whose tap lands inside the input
    (zero padding masks the rest). Returns [O] when the value is uniform
    (no padding / interior-only) else [oh, ow, O]. Exact: integer sums."""
    colsum = w_raw.sum(axis=1).astype(np.float64)  # [O, kh, kw]
    (pt, pb), (pl, pr) = pads
    sh, sw = p["stride_h"], p["stride_w"]
    dh, dw_ = dil
    kh, kw = p["kernel_h"], p["kernel_w"]
    if pt == pb == pl == pr == 0:
        return colsum.sum(axis=(1, 2))  # [O]
    kh_eff = (kh - 1) * dh + 1
    kw_eff = (kw - 1) * dw_ + 1
    oh = (in_h + pt + pb - kh_eff) // sh + 1
    ow = (in_w + pl + pr - kw_eff) // sw + 1
    oi = np.arange(oh) * sh - pt
    oj = np.arange(ow) * sw - pl
    out = np.zeros((oh, ow, colsum.shape[0]), np.float64)
    for a in range(kh):
        vi = (oi + a * dh >= 0) & (oi + a * dh < in_h)
        for b in range(kw):
            vj = (oj + b * dw_ >= 0) & (oj + b * dw_ < in_w)
            out += (vi[:, None] & vj[None, :])[:, :, None] * colsum[:, a, b]
    if np.all(out == out[0, 0]):
        return out[0, 0]
    return out


def _relaxed_fused_add(ctx: LowerCtx) -> bool:
    """Relaxed single-rounding fused-residual epilogue applies: no conv-own
    activation (its clamp thresholds live in the mid-scale domain)."""
    return (
        ctx.options.quant_relaxed
        and ctx.params.get("fused_add_pos") is not None
        and ctx.params.get("activation", -1) < 0
    )


def _conv_quant_common(ctx: LowerCtx, x: TArr, integer_lhs: bool):
    """Shared quantized conv: returns (acc_f32_or_i32, params pack)."""
    p = ctx.params
    group = p["group"]
    dil_h, dil_w = p["dilation_h"], p["dilation_w"]
    kh_eff = (p["kernel_h"] - 1) * dil_h + 1
    kw_eff = (p["kernel_w"] - 1) * dil_w + 1

    t_in = ctx.in_tensor(0)
    t_w = ctx.in_tensor(1)
    # with a fused residual add (fuse_conv_add pass) the conv's own requant
    # targets the pre-add intermediate tensor; the add + second requant run
    # in the epilogue (_requant_conv_out). Under the relaxed tier the mid
    # grid is never materialized: multipliers fold straight to the final
    # output scale and the residual joins pre-round (single rounding).
    if p.get("fused_add_pos") is not None:
        if _relaxed_fused_add(ctx):
            t_out = ctx.out_tensor(0)
        else:
            t_out = ctx.graph.tensors[p["fused_add_mid"]]
    else:
        t_out = ctx.out_tensor(0)
    in_q, w_q, out_q = t_in.quant, t_w.quant, t_out.quant

    xn = as_nhwc(x)
    n, in_h, in_w, _ = xn.shape
    pads = _conv_pads(in_h, in_w, p, kh_eff, kw_eff)
    out_c = t_w.shape[0]

    zp_in = int(np.asarray(in_q.zero_points).reshape(-1)[0])
    s_in = float(np.asarray(in_q.scales).reshape(-1)[0])
    w_scales = _wscales(w_q, out_c)
    zp_w = int(np.asarray(w_q.zero_points).reshape(-1)[0]) if not w_q.per_channel else 0

    # the integer path takes raw int8 into the MXU with exact int32
    # accumulation. zp_in == 0 (tmfile int8 symmetric) needs nothing else;
    # a nonzero activation zero-point (native-int8-shifted uint8 graphs,
    # TFLite int8 imports) folds into a compile-time constant:
    #   conv(x - zp, w) = conv(x, w) - zp * conv(ones, w)
    # where conv(ones, w)[h,w,c] is data-independent (window sums of the
    # weights, with XLA's zero padding masking the border taps — exactly the
    # semantics of padding x with zp). The constant joins the requant bias.
    _dw = group == out_c and int(t_w.shape[1]) == 1 and group > 1
    import os as _os
    _dw_native = _os.environ.get("TT_DW_NATIVE", "1") not in ("0", "off")
    if (
        integer_lhs
        and not jnp.issubdtype(xn.dtype, jnp.floating)
        and (_dw_native or not _dw)
        # the s8 dot consumes raw weight bytes: only symmetric INT8 weights
        # are valid here (to_native_int8 may skip a weight — shared with a
        # non-conv consumer, non-const — leaving it UINT8-asymmetric; that
        # case must fall through to the zp-shifted bf16 branch, ADVICE r4)
        and t_w.dtype == DType.INT8
        and zp_w == 0
    ):
        strides = (p["stride_h"], p["stride_w"])
        (pt_, pb_), (pl2, pr2) = pads
        kw_ = p["kernel_w"]
        in_c = int(t_w.shape[1])
        # width-fold for small-channel stride-2 stems (exact, bit-equal):
        # pad W left by an EVEN amount L >= pl, merge W-pairs into channels
        # (a pure minor-dim reshape — no relayout), and run the conv at
        # stride (sh, 1) with the taps scattered to (folded col, phase)
        # slots. Doubles the contraction depth the emitter sees (2*C_in)
        # and removes the W-stride; measured standalone on the resnet 7x7
        # stem: 2.56 -> 1.58 ms b128 (bit-equal output).
        wfold = (
            _os.environ.get("TT_WFOLD", "1") not in ("0", "off")
            and strides[1] == 2
            and kw_ >= 3
            and in_c <= 4
            and group == 1
            and dil_w == 1
            and zp_in == 0
            # measured envelope: every 224-family stem wins (mobilenet-v1
            # whole-net +4.6%, resnet stem fusion 0.71 -> 0.64 ms), the
            # 300-px mssd stem LOSES 11% at b8 — the folded emitter's
            # tiling dislikes non-8-aligned widths. 299 (inception) is
            # already excluded by evenness.
            and in_w % 8 == 0
            and pl2 >= 0
            and pr2 >= 0
        )
        if wfold:
            L = pl2 + (pl2 % 2)
            kwf = (kw_ - 1 + L - pl2) // 2 + 1
            ow = (in_w + pl2 + pr2 - kw_) // 2 + 1
            wf_cols = (in_w + L) // 2
            r_fold = ow + kwf - 1 - wf_cols  # folded-domain right pad/trim

            def _fold(a):  # [O, I, kh, kw] raw -> folded HWIO
                hwio = np.transpose(a, (2, 3, 1, 0))
                kh_, _, ci, co = hwio.shape
                out = np.zeros((kh_, kwf, 2 * ci, co), a.dtype)
                for k in range(kw_):
                    s = k + L - pl2
                    out[:, s // 2, (s % 2) * ci : (s % 2 + 1) * ci, :] += hwio[
                        :, k
                    ]
                return out

            w = ctx.weight(1, _fold, tag=f"hwio_i8_wfold{L}")
            xn = jnp.pad(xn, ((0, 0), (0, 0), (L, 0), (0, 0)))
            xn = xn.reshape(xn.shape[0], xn.shape[1], wf_cols, 2 * in_c)
            pads = ((pt_, pb_), (0, r_fold))
            strides = (strides[0], 1)
        else:
            w = ctx.weight(
                1, lambda a: np.transpose(a, (2, 3, 1, 0)), tag="hwio_i8"
            )
        if (
            p["kernel_h"] == 1
            and p["kernel_w"] == 1
            and max(strides) > 1
            and pads == ((0, 0), (0, 0))
        ):
            # strided 1x1: only the even-subsampled input is read — feed
            # x[::s, ::s] and run stride-1 (exact; XLA's s2 1x1 emitter
            # measured 36 TOP/s vs 66 for the same conv at s1)
            xn = xn[:, :: strides[0], :: strides[1], :]
            strides = (1, 1)
        acc = lax.conv_general_dilated(
            xn,
            w,
            window_strides=strides,
            padding=pads,
            rhs_dilation=(dil_h, dil_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=group,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        if zp_in != 0:
            s_out_f = float(np.asarray(out_q.scales).reshape(-1)[0])

            def _zp_corr():
                w_raw = ctx.const_data(1).astype(np.int64)  # [O, I/g, kh, kw]
                m = (s_in * w_scales.astype(np.float64) / s_out_f)
                corr = _ones_conv_np(
                    w_raw, p, in_h, in_w, pads, (dil_h, dil_w)
                )  # [oh, ow, O] or [O]
                return (-zp_in * corr * m).astype(np.float32)[None]

            zcorr = ctx.get_param("zp_corr", _zp_corr)
            return acc, (s_in, w_scales, out_q, t_out.dtype, p, zcorr)
    else:
        # uint8 asymmetric: zero-point-shifted values are <=9-bit integers,
        # exactly representable in bf16; MXU multiplies exactly and
        # accumulates fp32 — the reference's own accumulation class.
        # bf16-stored activations (quant_bf16_storage) enter here directly;
        # the shift stays exact (|q - zp| <= 255 < 2^9).
        # weights live in HBM as bf16 directly: the zero-point-shifted
        # values are integers |q| <= 255 < 2^8, exactly representable in
        # bf16. Storing f32 and converting in-graph would double the weight
        # HBM traffic and add a convert pass per conv (measured in the
        # r50-int8 device trace: f32 weight tap slices + converts).
        is_dw = group == out_c and int(t_w.shape[1]) == 1 and group > 1
        (pt0, pb0), (pl0, pr0) = pads
        stride_wv = (p["stride_h"], p["stride_w"])
        # width-fold for small-channel stride-2 stems (see the integer
        # branch): exact in the (x - zp) shifted domain — zero-filled tap
        # slots and implicit zero padding are both the conv's pad value
        bf_wfold = (
            _os.environ.get("TT_WFOLD", "1") not in ("0", "off")
            and p["stride_w"] == 2
            and p["kernel_w"] >= 3
            and int(t_w.shape[1]) <= 4
            and group == 1
            and dil_w == 1
            and in_w % 8 == 0  # measured envelope — see the integer branch
            and pl0 >= 0
            and pr0 >= 0
        )
        if bf_wfold:
            Lb = pl0 + (pl0 % 2)
            kwfb = (p["kernel_w"] - 1 + Lb - pl0) // 2 + 1
            owb = (in_w + pl0 + pr0 - p["kernel_w"]) // 2 + 1
            wfb_cols = (in_w + Lb) // 2
            rb_fold = owb + kwfb - 1 - wfb_cols

            def _fold_bf16(a):
                hwio = (a.astype(np.float32) - zp_w).transpose(2, 3, 1, 0)
                kh_, kw_, ci, co = hwio.shape
                out = np.zeros((kh_, kwfb, 2 * ci, co), np.float32)
                for k in range(kw_):
                    s = k + Lb - pl0
                    out[:, s // 2, (s % 2) * ci : (s % 2 + 1) * ci, :] += (
                        hwio[:, k]
                    )
                return out.astype(jnp.bfloat16)

            w = ctx.weight(1, _fold_bf16, tag=f"hwio_zshift_bf16_wf{Lb}")
        else:
            w = ctx.weight(
                1,
                lambda a: (a.astype(np.float32) - zp_w)
                .transpose(2, 3, 1, 0)
                .astype(jnp.bfloat16),
                tag="hwio_zshift_bf16",
            )
        dw_zp_fold = is_dw and zp_in != 0
        if dw_zp_fold:
            # Depthwise uint8: do NOT subtract the input zero-point — the
            # subtract fuses into the dw conv's WINDOW read and is
            # recomputed k^2 times (the v3 uint8-vs-int8 residue, VERDICT
            # r4 item 4; int8 has zp=0 and pays nothing). Instead feed the
            # RAW values, pad explicitly with zp (the conv's zero in the
            # shifted domain), and fold the exact constant correction
            #   acc_true = acc_raw - zp_in * colsum(w - zp_w)[c]
            # into the requant bias (_requant_conv_out). All quantities
            # are integers < 2^24: exact.
            xs = xn if xn.dtype == jnp.bfloat16 else xn.astype(jnp.bfloat16)
            (pt, pb), (pl_, pr) = pads
            if pt or pb or pl_ or pr:
                xs = jnp.pad(
                    xs, ((0, 0), (pt, pb), (pl_, pr), (0, 0)),
                    constant_values=float(zp_in),
                )
            pads = ((0, 0), (0, 0))
        elif zp_in == 0 and xn.dtype == jnp.bfloat16:
            xs = xn  # already exact bf16 integers
        else:
            # NOTE (r4): folding this subtract into a ones-conv correction
            # constant (like the integer branch does) was A/B'd and is
            # perf-neutral — XLA hoists the loop-invariant subtract out of
            # the window read; the uint8-vs-int8 residue lives elsewhere
            # (asymmetric epilogue adds, measured smeared ~2% per fusion).
            xs = (xn.astype(jnp.float32) - zp_in).astype(jnp.bfloat16)
        if is_dw:
            # depthwise + elementwise-producer input: block input-prologue
            # fusion — ops fused into the conv's input are recomputed once
            # per overlapping window read (k^2 amplification under the
            # depthwise window emitters). Only when the producer is an
            # elementwise chain (h-swish / SE broadcast-mul and friends):
            # mobilenet-v3 uint8 b128 23.4k -> 27.6k img/s. When the
            # producer is itself a conv its output is materialized anyway
            # and the barrier just inserts a copy (mobilenet-v1 -12%).
            prod = ctx.graph.tensors[ctx.node.inputs[0]].producer
            prod_op = ctx.graph.nodes[prod].op if prod is not None else ""
            if prod_op not in (
                "Convolution", "Pooling", "InputOp",
                "FusedResBlockChain",
            ):
                xs = jax.lax.optimization_barrier(xs)
        if bf_wfold:
            # xs holds (x - zp): zero pad IS the conv's pad value, so the
            # fold is exact for asymmetric uint8 too
            xs = jnp.pad(xs, ((0, 0), (0, 0), (Lb, 0), (0, 0)))
            xs = xs.reshape(
                xs.shape[0], xs.shape[1], wfb_cols, 2 * int(t_w.shape[1])
            )
            pads = (pads[0], (0, rb_fold))
            stride_wv = (p["stride_h"], 1)
        acc = lax.conv_general_dilated(
            xs,
            w,
            window_strides=stride_wv,
            padding=pads,
            rhs_dilation=(dil_h, dil_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=group,
            preferred_element_type=jnp.float32,
        )

        if dw_zp_fold:
            # host-folded constant: -zp_in * colsum(w - zp_w) per channel,
            # pre-multiplied by the requant multiplier so the epilogue adds
            # one vector (see dw_zp_fold comment above)
            s_out_f = float(np.asarray(out_q.scales).reshape(-1)[0])

            def _corr():
                w_raw = ctx.const_data(1).astype(np.int64)  # [C, 1, k, k]
                colsum = (w_raw - zp_w).sum(axis=(1, 2, 3))
                m = s_in * w_scales.astype(np.float64) / s_out_f
                return (-zp_in * colsum * m).astype(np.float32)

            dw_corr = ctx.get_param("dwzp_bm", _corr)
            return acc, (s_in, w_scales, out_q, t_out.dtype, p, dw_corr)

    return acc, (s_in, w_scales, out_q, t_out.dtype, p, None)


def _requant_conv_out(ctx: LowerCtx, acc, pack, residual=None):
    """Fold dequant-scale, bias, activation, and requant into one vector op:
    q = clip(round(acc*M[c] + B[c]) + zp_out). With a fused residual add
    (fuse_conv_add pass) the full unfused chain — requant to the mid tensor,
    dequant both operands, add, requant to the out tensor, optional trailing
    relu — runs here bit-exactly, all inside the conv's XLA output fusion."""
    s_in, w_scales, out_q, out_dtype, p, dw_corr = pack
    s_out = float(np.asarray(out_q.scales).reshape(-1)[0])
    zp_out = int(np.asarray(out_q.zero_points).reshape(-1)[0])

    def multipliers():
        return (s_in * w_scales / s_out).astype(np.float32)

    M = ctx.get_param("requant_m", multipliers)

    fused_pos = p.get("fused_add_pos")
    has_bias = (fused_pos == 3) if fused_pos is not None else ctx.num_inputs > 2
    # relaxed fused-residual: the residual zero-point term -zp_r*beta is a
    # CONSTANT — fold it into the bias vector so the epilogue adds nothing
    # extra (the r5 r50 trace shows these epilogues VPU-bound at ~2x the
    # byte roofline on the widest tensors)
    relaxed_res = residual is not None and _relaxed_fused_add(ctx)
    beta = zp_shift = 0.0
    if relaxed_res:
        t_r = ctx.in_tensor(p["fused_add_pos"])
        s_r = float(np.asarray(t_r.quant.scales).reshape(-1)[0])
        zp_r = int(np.asarray(t_r.quant.zero_points).reshape(-1)[0])
        beta = s_r / s_out
        zp_shift = zp_r * beta
    # (r5 note: folding zp_out into the bias — exact by the round/translate
    # identity — was A/B'd together with the clip elision and measured
    # negative in the same -6% package; the canonical XLA clamp_convert
    # pattern wants the literal round→+zp→clamp→convert shape, so only the
    # zp_r residual fold above stays.)
    act = p.get("activation", -1)
    if has_bias:
        def bias_q():
            b = ctx.const_data(2).astype(np.float32)
            return (b * s_in * w_scales / s_out - zp_shift).astype(np.float32)

        B = ctx.get_param("requant_b", bias_q)
        q = acc * M + B
    else:
        q = acc * M
        if zp_shift:
            q = q - np.float32(zp_shift)
    if dw_corr is not None:
        # depthwise zero-point fold (see _conv_quant_common): one vector add
        # replaces the k^2-recomputed input-side subtract
        q = q + dw_corr

    if act is not None and act >= 0:
        # clamp thresholds move into the pre-round domain (x/s_out)
        if act == ACT_SILU:
            # silu(v)/s_out = (v/s_out) * sigmoid(v), v = q*s_out
            q = q * jax.nn.sigmoid(q * s_out)
        elif act == 1:
            q = jnp.clip(q, -1.0 / s_out, 1.0 / s_out)
        else:
            q = jnp.maximum(q, 0.0)
            if act > 0:
                q = jnp.minimum(q, float(act) / s_out)
    lo, hi = qmath.qrange(out_dtype, out_q)
    store = _store_for(ctx, ctx.out_tensor(0))
    if relaxed_res:
        # relaxed tier (XLA path): q is already folded to the FINAL output
        # scale (see _conv_quant_common) and carries the folded -zp_r*beta
        # constant; add the scaled residual and round ONCE.
        y = q + residual.astype(jnp.float32) * np.float32(beta)
        if p.get("fused_add_relu"):
            y = jnp.maximum(y, 0.0)
        return nhwc(
            qmath.clip_cast(qmath.round_away(y) + zp_out, lo, hi, store)
        )
    t_pre = qmath.round_away(q) + zp_out
    if residual is None:
        return nhwc(qmath.clip_cast(t_pre, lo, hi, store))
    t = jnp.clip(t_pre, lo, hi)
    # fused residual: t is the quantized mid tensor; reproduce the unfused
    # eltwise-sum numerics exactly (dequant both, add, requant), matching
    # the pallas qconv requant_block and the reference eltwise uint8 path
    t_outf = ctx.out_tensor(0)
    s_mid, zp_mid = s_out, zp_out
    t_r = ctx.in_tensor(fused_pos)
    s_r = float(np.asarray(t_r.quant.scales).reshape(-1)[0])
    zp_r = int(np.asarray(t_r.quant.zero_points).reshape(-1)[0])
    s_out2 = float(np.asarray(t_outf.quant.scales).reshape(-1)[0])
    zp_out2 = int(np.asarray(t_outf.quant.zero_points).reshape(-1)[0])
    tf = (t - zp_mid) * s_mid
    rf = (residual.astype(jnp.float32) - zp_r) * s_r
    y = qmath.round_away((tf + rf) / s_out2) + zp_out2
    if p.get("fused_add_relu"):
        y = jnp.maximum(y, float(zp_out2))
    lo2, hi2 = qmath.qrange(t_outf.dtype, t_outf.quant)
    return nhwc(qmath.clip_cast(y, lo2, hi2, store))


def _pallas_qconv_ok(ctx: LowerCtx) -> bool:
    """qconv_direct (ops/pallas/qconv.py) — k×k int8 MXU direct conv with
    fused requant, raw 1-byte activation streaming. Needs: integer storage
    mode, group 1, dilation 1, stride 1/2, C % 128 == 0 (the manual halo DMA
    slices HBM lanes, which Mosaic requires 128-aligned)."""
    if (
        not _fast_enabled(ctx)
        or not ctx.options.pallas_qconv
        or ctx.options.quant_bf16_storage  # kernel wants int operands
        or _shifted_s8(ctx)  # kernel's int8 path assumes zp = 0
    ):
        return False
    p = ctx.params
    t_w = ctx.in_tensor(1)
    in_c = int(t_w.shape[1])
    k1 = p["kernel_h"] == 1 and p["kernel_w"] == 1
    return (
        p.get("activation", -1) != ACT_SILU  # pallas epilogue lacks silu
        and p["group"] == 1
        and p["dilation_h"] == 1
        and p["dilation_w"] == 1
        and p["stride_h"] == p["stride_w"]
        and p["stride_h"] in (1, 2)
        and p["kernel_h"] * p["kernel_w"] <= 49
        # 1x1 convs run as a flat GEMM (BlockSpec-tiled, any channel count);
        # k>1 uses the manual halo DMA, which needs 128-aligned lanes
        and (k1 or in_c % 128 == 0)
    )


def _shifted_s8(ctx: LowerCtx) -> bool:
    """INT8 input with a nonzero zero-point (a native-int8-shifted uint8
    grid): the Pallas qconv/qgemm int8 paths assume symmetric zp=0 and must
    not be selected (the XLA native branch carries the zp correction)."""
    t_in = ctx.in_tensor(0)
    return (
        t_in.dtype == DType.INT8
        and t_in.quant is not None
        and not t_in.quant.per_channel
        and int(np.asarray(t_in.quant.zero_points).reshape(-1)[0]) != 0
    )


def _env_stem_all() -> bool:
    import os

    return os.environ.get("TT_STEM_ALL", "") not in ("", "0")


def _int_stored(ctx: LowerCtx, t) -> bool:
    """Tensor stores its raw 1-byte integer dtype under the active storage
    plan (native-int8 plan or quant_bf16_storage=False)."""
    if not ctx.options.quant_bf16_storage:
        return True
    plan = getattr(ctx.graph, "_bf16_tids", None)
    return plan is not None and t.idx not in plan


def _pallas_dw_ok(ctx: LowerCtx) -> bool:
    """ops/pallas/dw_conv.py — batch-in-lanes s8 depthwise kernel
    (TT_DW_PALLAS gate). Needs: 1-byte-stored input/output, k in {3,5},
    stride 1/2, dilation 1, batch >= 32 (batch rides the 128-lane axis)."""
    import os

    if os.environ.get("TT_DW_PALLAS", "0") in ("0", "off", ""):
        return False
    if not _fast_enabled(ctx) or not _no_fused_add(ctx):
        return False
    p = ctx.params
    t_in, t_w, t_out = ctx.in_tensor(0), ctx.in_tensor(1), ctx.out_tensor(0)
    group = p.get("group", 1)
    out_c = int(t_w.shape[0]) if t_w.shape else 0
    if not (group > 1 and group == out_c and int(t_w.shape[1]) == 1):
        return False
    if out_c % 32 != 0:
        return False  # s8 sublane tile (32,128): C=16 layers (mbv3) misfit
    if t_in.quant is None or t_w.quant is None or t_out.quant is None:
        return False
    if t_in.quant.per_channel or t_out.quant.per_channel:
        return False
    # IR shapes may be unfilled (quant_native='on' skips the auto-gate's
    # infer_shapes) — only reject a POSITIVELY wrong rank
    if t_in.shape and len(t_in.shape) != 4:
        return False
    # runtime batch: Options.batch_size overrides the IR's stored batch
    # (tmfile graphs carry batch 1)
    batch = ctx.options.batch_size or (
        int(t_in.shape[0]) if t_in.shape else 1
    )
    if batch < 32:
        return False
    k, s_ = p["kernel_h"], p["stride_h"]
    pads = [p.get(f"pad_{a}", -1) for a in ("h0", "h1", "w0", "w1")]
    pad_ok = (
        all(v >= 0 for v in pads)
        # kernel envelope (dw_qconv_hwcn): bottom/right pads realize as
        # delta halo rows, bounded by k - stride - pad_top (+ stride-1)
        and pads[1] <= max(0, k - s_ - pads[0]) + (s_ - 1)
        and pads[3] <= max(0, k - s_ - pads[2]) + (s_ - 1)
        and pads[0] <= k - 1
        and pads[2] <= k - 1
    )
    return (
        pad_ok
        and p.get("activation", -1) != ACT_SILU
        and p["kernel_h"] == p["kernel_w"]
        and k in (3, 5)
        and p["dilation_h"] == 1
        and p["dilation_w"] == 1
        and p["stride_h"] == p["stride_w"]
        and s_ in (1, 2)
        and _int_stored(ctx, t_in)
        and _int_stored(ctx, t_out)
        and ctx.const_data(1) is not None
    )


@register_op("Convolution", score=SCORE_STATIC + 3, predicate=_pallas_dw_ok, quant=True)
def lower_conv_quant_pallas_dw(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Depthwise conv + requant via the batch-in-lanes Pallas kernel
    (ops/pallas/dw_conv.py) — bit-equal to the integer XLA branch (exact
    int accumulation, identical dw_zp_fold epilogue)."""
    from .pallas.dw_conv import dw_qconv_hwcn

    p = ctx.params
    t_in, t_w, t_out = ctx.in_tensor(0), ctx.in_tensor(1), ctx.out_tensor(0)
    out_c = int(t_w.shape[0])
    k = p["kernel_h"]
    s_in = float(np.asarray(t_in.quant.scales).reshape(-1)[0])
    zp_in = int(np.asarray(t_in.quant.zero_points).reshape(-1)[0])
    w_scales = _wscales(t_w.quant, out_c)
    s_out = float(np.asarray(t_out.quant.scales).reshape(-1)[0])
    zp_out = int(np.asarray(t_out.quant.zero_points).reshape(-1)[0])
    zp_w = (
        0
        if t_w.quant.per_channel
        else int(np.asarray(t_w.quant.zero_points).reshape(-1)[0])
    )

    def w_taps():
        raw = ctx.const_data(1).astype(np.float32) - zp_w  # [C,1,k,k] true
        return np.ascontiguousarray(
            raw[:, 0].transpose(1, 2, 0).reshape(k * k, out_c)
        )

    def mvec():
        return (s_in * w_scales / s_out).astype(np.float32)

    def bvec():
        w_raw = ctx.const_data(1).astype(np.float64)
        colsum = (w_raw - zp_w).reshape(out_c, -1).sum(axis=1)
        b = (
            ctx.const_data(2).astype(np.float64)
            if ctx.num_inputs > 2
            else 0.0
        )
        m = s_in * w_scales.astype(np.float64) / s_out
        return ((b - zp_in * colsum) * m).astype(np.float32)

    wf = ctx.get_param("dwp_w", w_taps)
    M = ctx.get_param("dwp_m", mvec)
    B = ctx.get_param("dwp_b", bvec)

    xn = as_nhwc(x)
    n, in_h, in_w, _ = xn.shape
    (pt, pb), (pl_, pr) = _conv_pads(in_h, in_w, p, k, k)
    lo, hi = qmath.qrange(t_out.dtype, t_out.quant)
    xt = jnp.transpose(xn, (1, 2, 3, 0))
    out = dw_qconv_hwcn(
        xt, wf, M, B,
        k=k, stride=p["stride_h"], pad_t=int(pt), pad_l=int(pl_),
        pad_b=int(pb), pad_r=int(pr),
        zp_in=zp_in, zp_out=zp_out, act=p.get("activation", -1),
        s_out=s_out, lo=float(lo), hi=float(hi),
        out_u8=t_out.dtype == DType.UINT8,
    )
    return nhwc(jnp.transpose(out, (3, 0, 1, 2)))


def _pallas_stem_ok(ctx: LowerCtx) -> bool:
    """Fused stem kernel (ops/pallas/stem_conv.py): small-channel stride-2
    quantized conv on raw integer input — the first layer of every conv
    net, where XLA's emitters are ~70x off roofline (33% of yolov5s int8
    device time measured)."""
    if not _fast_enabled(ctx) or not ctx.options.pallas_stem:
        return False
    p = ctx.params
    t_in = ctx.in_tensor(0)
    t_w = ctx.in_tensor(1)
    if t_in.dtype not in (DType.INT8, DType.UINT8):
        return False
    if t_in.quant is None or t_w.quant is None or ctx.out_tensor(0).quant is None:
        return False
    if not t_in.shape or len(t_in.shape) != 4:
        return False
    H, W = int(t_in.shape[2]), int(t_in.shape[3])
    kh, kw = p["kernel_h"], p["kernel_w"]
    pad = p.get("pad_h0", 0)
    return (
        "fused_add_pos" not in p
        and p.get("group", 1) == 1
        and p.get("dilation_h", 1) == 1
        and p.get("dilation_w", 1) == 1
        and p["stride_h"] == 2
        and p["stride_w"] == 2
        and kh == kw
        and kh <= 7
        and int(t_w.shape[1]) <= 4
        and all(p.get(f"pad_{a}", -1) == pad for a in ("h0", "h1", "w0", "w1"))
        and kh <= 2 * pad + 2
        and H % 2 == 0
        and W % 2 == 0
        and (H // 2) % 8 == 0
        # envelope: W >= 512 measured decisive (yolov5s 640: 7.91 -> 6.72
        # ms/batch8 whole-net); at 224 the kernel loses (r3: whole-image
        # refetch; r4 re-test with a one-fetch inner-row-band variant was
        # WORSE still — mobilenet 2.78 -> 5.24 ms b128: per-output-row dots
        # are overhead-bound at OW=112 and the whole-image out block blows
        # scoped VMEM at 640, so the banded grid stays). TT_STEM_ALL=1
        # lifts the floor for A/B scans only.
        and (W >= 512 or _env_stem_all())
        and ctx.const_data(1) is not None
    )


@register_op("Convolution", score=SCORE_STATIC + 2, predicate=_pallas_stem_ok, quant=True)
def lower_conv_quant_pallas_stem(ctx: LowerCtx, x: TArr, *rest: TArr):
    """First-layer conv + requant in one Pallas pass (exact int32 MAC)."""
    from .pallas.stem_conv import pack_stem_weights, stem_qconv_packed

    p = ctx.params
    t_in, t_w, t_out = ctx.in_tensor(0), ctx.in_tensor(1), ctx.out_tensor(0)
    out_c = int(t_w.shape[0])
    s_in = float(np.asarray(t_in.quant.scales).reshape(-1)[0])
    zp_in = int(np.asarray(t_in.quant.zero_points).reshape(-1)[0])
    w_scales = _wscales(t_w.quant, out_c)
    s_out = float(np.asarray(t_out.quant.scales).reshape(-1)[0])
    zp_out = int(np.asarray(t_out.quant.zero_points).reshape(-1)[0])
    zp_w = (
        0
        if t_w.quant.per_channel
        else int(np.asarray(t_w.quant.zero_points).reshape(-1)[0])
    )
    signed_in = t_in.dtype == DType.INT8

    def packed():
        mult = (s_in * w_scales / s_out).astype(np.float32)
        b_q = (
            ctx.const_data(2).astype(np.float64)
            if ctx.num_inputs > 2
            else np.zeros(out_c, np.float64)
        )
        bias = (b_q * mult).astype(np.float32)
        wmat, m_e, b_e, w_corr = pack_stem_weights(
            ctx.const_data(1), mult, bias,
            k=p["kernel_h"], zp_in=zp_in, zp_w=zp_w, signed_in=signed_in,
        )
        return {"w": wmat, "m": m_e, "b": b_e}, w_corr

    w_corr = 128.0 - zp_w if zp_w else 0.0
    wmat = ctx.get_param("stem_w", lambda: packed()[0]["w"])
    m_e = ctx.get_param("stem_m", lambda: packed()[0]["m"])
    b_e = ctx.get_param("stem_b", lambda: packed()[0]["b"])

    lo, hi = qmath.qrange(t_out.dtype, t_out.quant)
    out = stem_qconv_packed(
        as_nchw(x),
        wmat, m_e, b_e,
        n_cout=out_c, w_corr=w_corr,
        k=p["kernel_h"], pad=p.get("pad_h0", 0),
        act=p.get("activation", -1), s_out=s_out,
        zp_in=zp_in, zp_out=zp_out, lo=float(lo), hi=float(hi),
    )
    store = _store_for(ctx, t_out)
    if not jnp.issubdtype(jnp.dtype(store), jnp.floating):
        out = out.astype(jnp.int32).astype(store)
    return nhwc(out)


@register_op("Convolution", score=SCORE_STATIC + 1, predicate=_pallas_qconv_ok, quant=True)
def lower_conv_quant_pallas_direct(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Direct k×k conv on the int8 MXU (k² shifted dots, fused requant);
    optionally with a fused residual eltwise-sum (fuse_conv_add pass)."""
    from .pallas.qconv import pack_qconv_weights, qconv1x1, qconv_direct

    p = ctx.params
    fused_pos = p.get("fused_add_pos")
    t_in, t_w = ctx.in_tensor(0), ctx.in_tensor(1)
    t_out = ctx.out_tensor(0)
    # the conv's own requant targets the pre-add intermediate tensor when the
    # residual add is fused
    t_mid = ctx.graph.tensors[p["fused_add_mid"]] if fused_pos is not None else t_out
    has_bias = (fused_pos == 3) if fused_pos is not None else (ctx.num_inputs > 2)
    kh, kw, s = p["kernel_h"], p["kernel_w"], p["stride_h"]
    out_c, in_c = int(t_w.shape[0]), int(t_w.shape[1])

    s_in = float(np.asarray(t_in.quant.scales).reshape(-1)[0])
    zp_in = int(np.asarray(t_in.quant.zero_points).reshape(-1)[0])
    w_scales = _wscales(t_w.quant, out_c)
    s_mid = float(np.asarray(t_mid.quant.scales).reshape(-1)[0])
    zp_mid = int(np.asarray(t_mid.quant.zero_points).reshape(-1)[0])

    is_u8 = t_in.dtype == DType.UINT8
    if is_u8:
        zp_w = int(np.asarray(t_w.quant.zero_points).reshape(-1)[0])
        cx, cw = 128 - zp_in, 128 - zp_w
    else:
        cx = cw = 0
    # MXU ones-column rowsum pays ~128/C2 extra lanes; below 256 out-channels
    # the VPU rowsum is cheaper
    ones_col = bool(cw) and out_c >= 256

    w = ctx.get_param(
        "qconv_w", lambda: pack_qconv_weights(ctx.const_data(1), is_u8, ones_col)
    )
    M = ctx.get_param("qconv_m", lambda: (s_in * w_scales / s_mid).astype(np.float32))

    def bvec():
        if is_u8:
            wsh = ctx.const_data(1).astype(np.int32) - 128
            colsum = wsh.sum(axis=(1, 2, 3))
            K = in_c * kh * kw
            b0 = cx * colsum + K * cx * cw
        else:
            b0 = np.zeros(out_c, np.int64)
        if has_bias:
            b0 = b0 + ctx.const_data(2).astype(np.int64)
        m = s_in * w_scales / s_mid
        return (b0.astype(np.float64) * m + zp_mid).astype(np.float32)

    B = ctx.get_param("qconv_b", bvec)

    res = None
    residual = None
    if fused_pos is not None:
        t_r = ctx.in_tensor(fused_pos)
        s_r = float(np.asarray(t_r.quant.scales).reshape(-1)[0])
        zp_r = int(np.asarray(t_r.quant.zero_points).reshape(-1)[0])
        s_out2 = float(np.asarray(t_out.quant.scales).reshape(-1)[0])
        zp_out2 = int(np.asarray(t_out.quant.zero_points).reshape(-1)[0])
        res = (s_mid, zp_mid, s_r, zp_r, s_out2, zp_out2,
               bool(p.get("fused_add_relu")))
        residual = as_nhwc(rest[fused_pos - 1])

    xn = as_nhwc(x)
    if kh == 1 and kw == 1 and s == 2:
        # pointwise stride-2 (resnet downsample): pre-subsample is cheaper
        # than the kernel's column phase-split
        xn = xn[:, ::2, ::2, :]
        s = 1
    n, in_h, in_w, _ = xn.shape
    pads = _conv_pads(in_h, in_w, p, kh, kw)
    (pt, pb), (pl_, pr) = pads[0], pads[1]
    common = dict(
        res=res,
        cw=cw,
        act=p.get("activation", -1),
        inv_s_out=1.0 / s_mid, zp_out=zp_mid,
        lo=qmath.qrange(t_out.dtype, t_out.quant)[0],
        hi=qmath.qrange(t_out.dtype, t_out.quant)[1],
        out_dtype="uint8" if t_out.dtype == DType.UINT8 else "int8",
    )
    if kh == 1 and kw == 1 and s == 1 and not (pt or pb or pl_ or pr):
        out = qconv1x1(
            xn.reshape(n * in_h * in_w, in_c), w, M, B,
            residual=None if residual is None
            else residual.reshape(n * in_h * in_w, out_c),
            **common,
        )
        return nhwc(out.reshape(n, in_h, in_w, out_c))
    out = qconv_direct(
        xn, w, M, B,
        residual=residual,
        kh=kh, kw=kw, stride=s,
        pad_t=int(pt), pad_b=int(pb), pad_l=int(pl_), pad_r=int(pr),
        zp_in=zp_in,
        **common,
    )
    return nhwc(out)


def _pallas_conv1x1_ok(ctx: LowerCtx) -> bool:
    """Pallas qgemm covers 1x1 convs (pointwise — the FLOPs majority of the
    mobilenet/resnet-family nets): group 1, no padding, any stride (handled
    by pre-subsampling)."""
    if (
        not _fast_enabled(ctx)
        or not _no_fused_add(ctx)
        or not ctx.options.pallas_qgemm
        or ctx.options.quant_bf16_storage  # qgemm kernel wants int operands
        or _shifted_s8(ctx)  # int8 path assumes zp = 0
    ):
        return False
    p = ctx.params
    t_w = ctx.in_tensor(1)
    out_c, in_c = t_w.shape[0], int(np.prod(t_w.shape[1:]))
    # below 128 channels the [M, K<128] operand under-fills the 128-lane
    # registers and the MXU contraction (measured 2.4 ms vs XLA 0.36 ms on
    # mobilenet conv2_1); leave those to the XLA path
    return (
        p.get("activation", -1) != ACT_SILU  # pallas epilogue lacks silu
        and p["kernel_h"] == 1
        and p["kernel_w"] == 1
        and p["group"] == 1
        and p["pad_h0"] == 0
        and p["pad_w0"] == 0
        and p["pad_h1"] == 0
        and p["pad_w1"] == 0
        and in_c >= 128
        and out_c >= 128
    )


def _qgemm_inputs(ctx: LowerCtx, w_idx: int = 1, b_idx: int = 2):
    """Shared folding for the pallas qgemm path: shifted weights, requant
    multipliers, and the combined per-channel offset (zero-point correction
    terms + bias), all precomputed on the host."""
    t_in, t_w, t_out = ctx.in_tensor(0), ctx.in_tensor(w_idx), ctx.out_tensor(0)
    s_in = float(np.asarray(t_in.quant.scales).reshape(-1)[0])
    zp_in = int(np.asarray(t_in.quant.zero_points).reshape(-1)[0])
    out_c = t_w.shape[0]
    w_scales = _wscales(t_w.quant, out_c)
    s_out = float(np.asarray(t_out.quant.scales).reshape(-1)[0])
    zp_out = int(np.asarray(t_out.quant.zero_points).reshape(-1)[0])

    is_u8 = t_in.dtype == DType.UINT8
    if is_u8:
        zp_w = int(np.asarray(t_w.quant.zero_points).reshape(-1)[0])
        cx = 128 - zp_in
        cw = 128 - zp_w
    else:
        cx = cw = 0

    def w_kn():
        # [O, K...] -> shifted int8 [K, O]
        a = ctx.const_data(w_idx)
        flat = a.reshape(a.shape[0], -1)
        if is_u8:
            flat = (flat.astype(np.int16) - 128).astype(np.int8)
        return np.ascontiguousarray(flat.T.astype(np.int8))

    w = ctx.get_param("qgemm_w", w_kn)

    def mult():
        return (s_in * w_scales / s_out).astype(np.float32)

    M = ctx.get_param("qgemm_m", mult)

    def bvec():
        a = ctx.const_data(w_idx)
        flat = a.reshape(a.shape[0], -1)
        K = flat.shape[1]
        if is_u8:
            wsh = (flat.astype(np.int32) - 128)
            colsum = wsh.sum(axis=1)
            b0 = cx * colsum + K * cx * cw
        else:
            b0 = np.zeros(out_c, np.int64)
        if len(ctx.node.inputs) > b_idx:
            b0 = b0 + ctx.const_data(b_idx).astype(np.int64)
        m = s_in * w_scales / s_out
        return (b0.astype(np.float64) * m + zp_out).astype(np.float32)

    B = ctx.get_param("qgemm_b", bvec)
    return w, M, B, cw, s_out, zp_out, is_u8


def _native_int_ok() -> bool:
    """XLA integer dot/conv support. An earlier (r2) toolchain hung compiling
    int8 convolutions on the axon TPU backend (>15 min on a 3x3x16x32 conv),
    which forced the bf16-shift trick; re-probed r4 after the platform
    upgrade, every geometry (stem C_in=3, dw, small-channel, strided)
    compiles in seconds and s8*s8->s32 convs run the int8 MXU at 1.4-1.7x
    the bf16 rate (290 vs 167 TOP/s on a 3x3x256 conv). TT_NATIVE_INT=0
    reverts to the bf16 path."""
    import os

    return os.environ.get("TT_NATIVE_INT", "1") not in ("0", "off")


@register_op("Convolution", score=SCORE_STATIC, predicate=_pallas_conv1x1_ok, quant=True)
def lower_conv1x1_quant_pallas(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Pointwise conv on the int8 MXU via the fused qgemm Pallas kernel."""
    from .pallas.qgemm import qgemm_requant

    p = ctx.params
    t_in, t_out = ctx.in_tensor(0), ctx.out_tensor(0)
    w, M, B, cw, s_out, zp_out, is_u8 = _qgemm_inputs(ctx)

    xn = as_nhwc(x)
    if p["stride_h"] > 1 or p["stride_w"] > 1:
        xn = xn[:, :: p["stride_h"], :: p["stride_w"], :]
    n, oh, ow, c = xn.shape
    out = qgemm_requant(
        xn.reshape(n * oh * ow, c),  # uint8 is shifted inside the kernel
        w,
        M,
        B,
        cw=cw,
        act=p.get("activation", -1),
        inv_s_out=1.0 / s_out,
        zp_out=zp_out,
        lo=qmath.qrange(t_out.dtype, t_out.quant)[0],
        hi=qmath.qrange(t_out.dtype, t_out.quant)[1],
        out_dtype="uint8" if t_out.dtype == DType.UINT8 else "int8",
    )
    return nhwc(out.reshape(n, oh, ow, -1))


def _pallas_fc_ok(ctx: LowerCtx) -> bool:
    return (
        _fast_enabled(ctx)
        and ctx.options.pallas_qgemm
        and not ctx.options.quant_bf16_storage
        and not _shifted_s8(ctx)  # int8 path assumes zp = 0
    )


@register_op("FullyConnected", score=SCORE_STATIC, predicate=_pallas_fc_ok, quant=True)
def lower_fc_quant_pallas(ctx: LowerCtx, x: TArr, *rest: TArr):
    """FC on the int8 MXU via the fused qgemm Pallas kernel."""
    from .pallas.qgemm import qgemm_requant

    t_in, t_out = ctx.in_tensor(0), ctx.out_tensor(0)
    w, M, B, cw, s_out, zp_out, is_u8 = _qgemm_inputs(ctx)

    xs = as_semantic(x)
    m = xs.shape[0]
    rank = xs.ndim
    xf = xs.reshape(m, -1)
    out = qgemm_requant(
        xf,
        w,
        M,
        B,
        cw=cw,
        act=-1,
        inv_s_out=1.0 / s_out,
        zp_out=zp_out,
        lo=qmath.qrange(t_out.dtype, t_out.quant)[0],
        hi=qmath.qrange(t_out.dtype, t_out.quant)[1],
        out_dtype="uint8" if t_out.dtype == DType.UINT8 else "int8",
    )
    if rank == 3:
        out = out.reshape(m, -1, 1)
    elif rank == 4:
        out = out.reshape(m, -1, 1, 1)
    return nchw(out)


@register_op(
    "Convolution",
    score=SCORE_BEST,
    predicate=_fast_enabled,
    quant=True,
)
def lower_conv_quant_fast(ctx: LowerCtx, x: TArr, *rest: TArr):
    t_in = ctx.in_tensor(0)
    integer_lhs = t_in.dtype == DType.INT8 and _native_int_ok()
    acc, pack = _conv_quant_common(ctx, x, integer_lhs=integer_lhs)
    fused_pos = ctx.params.get("fused_add_pos")
    residual = as_nhwc(rest[fused_pos - 1]) if fused_pos is not None else None
    out = _requant_conv_out(ctx, acc, pack, residual=residual)
    import os as _os

    if _os.environ.get("TT_SPLIT_KCONV") and ctx.params.get("kernel_h", 1) > 1:
        # A/B probe: stop k>1 conv fusions from nesting inside the next
        # conv's output fusion (suspected slow window configs)
        return TArr(jax.lax.optimization_barrier(out.x), out.layout)
    return out


@register_op(
    "Convolution",
    score=SCORE_CANDO,
    predicate=lambda c: node_is_quant(c) and _no_fused_add(c),
    quant=True,
)
def lower_conv_quant_ref(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Reference semantics: dequant -> fp32 conv -> activation -> requant
    (conv_kernel_ref_uint8.c:67-177 / conv_kernel_ref_int8.c)."""
    p = ctx.params
    group = p["group"]
    dil_h, dil_w = p["dilation_h"], p["dilation_w"]
    kh_eff = (p["kernel_h"] - 1) * dil_h + 1
    kw_eff = (p["kernel_w"] - 1) * dil_w + 1

    t_in, t_w, t_out = ctx.in_tensor(0), ctx.in_tensor(1), ctx.out_tensor(0)
    s_in = float(np.asarray(t_in.quant.scales).reshape(-1)[0])
    w_scales = _wscales(t_w.quant, t_w.shape[0])

    xn = as_nhwc(x)
    n, in_h, in_w, _ = xn.shape
    pads = _conv_pads(in_h, in_w, p, kh_eff, kw_eff)

    xf = qmath.dequantize(xn, t_in.quant)
    w = ctx.weight(
        1,
        lambda a: qmath.dequantize_np(a, t_w.quant, channel_axis=0).transpose(2, 3, 1, 0),
        tag="hwio_deq",
    )
    out = lax.conv_general_dilated(
        xf,
        w,
        window_strides=(p["stride_h"], p["stride_w"]),
        padding=pads,
        rhs_dilation=(dil_h, dil_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=group,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    if ctx.num_inputs > 2:
        def bias_f():
            b = ctx.const_data(2).astype(np.float32)
            return b * s_in * w_scales

        out = out + ctx.get_param("bias_deq", bias_f)
    out = apply_activation(out, p.get("activation", -1))
    return nhwc(qmath.requantize(out, t_out.quant, t_out.dtype))


# ---------------------------------------------------------------------------
# FullyConnected
# ---------------------------------------------------------------------------


@register_op("FullyConnected", score=SCORE_BEST, predicate=_fast_enabled, quant=True)
def lower_fc_quant_fast(ctx: LowerCtx, x: TArr, *rest: TArr):
    t_in, t_w, t_out = ctx.in_tensor(0), ctx.in_tensor(1), ctx.out_tensor(0)
    s_in = float(np.asarray(t_in.quant.scales).reshape(-1)[0])
    zp_in = int(np.asarray(t_in.quant.zero_points).reshape(-1)[0])
    out_c = t_w.shape[0]
    w_scales = _wscales(t_w.quant, out_c)
    s_out = float(np.asarray(t_out.quant.scales).reshape(-1)[0])
    zp_out = int(np.asarray(t_out.quant.zero_points).reshape(-1)[0])

    xs = as_semantic(x)
    m = xs.shape[0]
    rank = xs.ndim
    xf = xs.reshape(m, -1)

    if (
        t_in.dtype == DType.INT8
        and _native_int_ok()
        and not jnp.issubdtype(xf.dtype, jnp.floating)
        # s8 dot needs symmetric INT8 weights (see _conv_quant_common)
        and t_w.dtype == DType.INT8
        and (
            t_w.quant.per_channel
            or int(np.asarray(t_w.quant.zero_points).reshape(-1)[0]) == 0
        )
    ):
        w = ctx.weight(1, lambda a: np.ascontiguousarray(a.T), tag="kt_i8")
        acc = lax.dot_general(
            xf, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        if zp_in != 0:
            # dot(x - zp, w) = dot(x, w) - zp * colsum(w): fold the constant
            # (native-int8-shifted uint8 activations; exact integer sums)
            zc = ctx.get_param(
                "fc_zp_corr",
                lambda: (
                    -float(zp_in)
                    * ctx.const_data(1).astype(np.int64).reshape(out_c, -1).sum(axis=1)
                ).astype(np.float32),
            )
            acc = acc + zc
    else:
        zp_w = int(np.asarray(t_w.quant.zero_points).reshape(-1)[0])
        # bf16 HBM storage: zero-point-shifted weights are exact in bf16
        # (|q| <= 255 < 2^8) — halves weight traffic vs f32, no convert op
        w = ctx.weight(
            1,
            lambda a: (a.astype(np.float32) - zp_w).T.astype(jnp.bfloat16),
            tag="kt_zshift_bf16",
        )
        if zp_in == 0 and xf.dtype == jnp.bfloat16:
            xs_f = xf
        else:
            xs_f = (xf.astype(jnp.float32) - zp_in).astype(jnp.bfloat16)
        acc = lax.dot_general(
            xs_f,
            w,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    M = ctx.get_param("requant_m", lambda: (s_in * w_scales / s_out).astype(np.float32))
    q = acc * M
    if ctx.num_inputs > 2:
        B = ctx.get_param(
            "requant_b",
            lambda: (ctx.const_data(2).astype(np.float32) * s_in * w_scales / s_out).astype(
                np.float32
            ),
        )
        q = q + B
    lo, hi = qmath.qrange(t_out.dtype, t_out.quant)
    store = _store_for(ctx, t_out)
    out = qmath.clip_cast(qmath.round_away(q) + zp_out, lo, hi, store)
    if rank == 3:
        out = out.reshape(m, -1, 1)
    elif rank == 4:
        out = out.reshape(m, -1, 1, 1)
    return nchw(out)


@register_op("FullyConnected", score=SCORE_CANDO, predicate=node_is_quant, quant=True)
def lower_fc_quant_ref(ctx: LowerCtx, x: TArr, *rest: TArr):
    """fc_kernel_ref_uint8/int8 semantics."""
    t_in, t_w, t_out = ctx.in_tensor(0), ctx.in_tensor(1), ctx.out_tensor(0)
    s_in = float(np.asarray(t_in.quant.scales).reshape(-1)[0])
    w_scales = _wscales(t_w.quant, t_w.shape[0])

    xs = as_semantic(x)
    m = xs.shape[0]
    rank = xs.ndim
    xf = qmath.dequantize(xs.reshape(m, -1), t_in.quant)
    w = ctx.weight(
        1,
        lambda a: np.ascontiguousarray(qmath.dequantize_np(a, t_w.quant, channel_axis=0).T),
        tag="kt_deq",
    )
    out = jnp.dot(xf, w, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    if ctx.num_inputs > 2:
        out = out + ctx.get_param(
            "bias_deq", lambda: ctx.const_data(2).astype(np.float32) * s_in * w_scales
        )
    out = qmath.requantize(out, t_out.quant, t_out.dtype)
    if rank == 3:
        out = out.reshape(m, -1, 1)
    elif rank == 4:
        out = out.reshape(m, -1, 1, 1)
    return nchw(out)


# ---------------------------------------------------------------------------
# Data-movement ops that can stay in the quantized domain when scales match
# (the reference recomputes them through int math too): max-pool, relu-family
# clamps commute with the (monotonic) quantization map.
# ---------------------------------------------------------------------------


def _same_quant(ctx: LowerCtx) -> bool:
    if not node_is_quant(ctx):
        return False
    qi, qo = ctx.in_tensor(0).quant, ctx.out_tensor(0).quant
    return (
        not qi.per_channel
        and not qo.per_channel
        and float(qi.scales) == float(qo.scales)
        and int(qi.zero_points) == int(qo.zero_points)
    )


@register_op("Pooling", score=SCORE_BEST, predicate=lambda c: _same_quant(c) and c.params.get("alg") == 0, quant=True)
def lower_maxpool_quant(ctx: LowerCtx, x: TArr):
    """Max-pool commutes with the quantization map when in/out quant params
    match (pooling_kernel_ref_uint8.c takes the same shortcut)."""
    from .lowering import lower_pooling

    out = lower_pooling(ctx, x)
    want = _store_for(ctx, ctx.out_tensor(0))
    if out.x.dtype != want:
        # storage-plan boundary (input arrived in the other exact storage):
        # integer values are exact in both, one fused cast
        if jnp.issubdtype(out.x.dtype, jnp.floating) and not jnp.issubdtype(
            jnp.dtype(want), jnp.floating
        ):
            out = TArr(out.x.astype(jnp.int32).astype(want), out.layout)
        else:
            out = TArr(out.x.astype(want), out.layout)
    return out


@register_op(
    "Pooling",
    score=SCORE_BEST,
    predicate=lambda c: node_is_quant(c)
    and c.params.get("alg") == 1
    and c.params.get("global_pool"),
    quant=True,
)
def lower_global_avgpool_quant(ctx: LowerCtx, x: TArr):
    """Global average pool on the RAW quantized values: the mean commutes
    with the affine dequant map ((mean(q) - zp)*s == mean((q - zp)*s) up to
    fp association), so the big reduce runs at storage dtype with no
    per-element dequant pass and only the pooled [N,1,1,C] result pays the
    dequant -> requant affine. The generic wrapper's per-element (q-zp)*s
    forced an f32-operand reduce fusion that ran ~3x slower on uint8 SE
    pools (mobilenet-v3 b128 device trace: 0.67 vs 0.23 ms for the 672-ch
    14x14 SE stage). Reference numerics: pooling_kernel_ref_uint8.c
    dequant-sum-divide-requant; the factored form differs only in fp
    association (<=1 LSB on round ties)."""
    t_in, t_out = ctx.in_tensor(0), ctx.out_tensor(0)
    s_in = float(np.asarray(t_in.quant.scales).reshape(-1)[0])
    zp_in = int(np.asarray(t_in.quant.zero_points).reshape(-1)[0])
    xn = as_nhwc(x)
    # keep the reduce OUT of the producer's fusion: XLA fuses the pooled
    # sum into the preceding depthwise conv as a kOutput epilogue, which
    # forces that conv onto a ~3-5x slower window-emitter config
    # (mobilenet-v3 SE stages, estimated_cycles ~1M vs ~0.2M standalone)
    xn = jax.lax.optimization_barrier(xn)
    # raw q values are exact small integers in any float storage dtype; the
    # f32-ACCUMULATING sum reads the bf16 operand directly (sum < 2^24 so
    # the accumulation is exact) — an .astype(f32) before the reduce would
    # materialize the f32 operand and double the reduce's HBM traffic,
    # which is precisely the cost this kernel removes
    hw = int(xn.shape[1]) * int(xn.shape[2])
    qmax = max(qmath.QRANGE[t_in.dtype][1], -qmath.QRANGE[t_in.dtype][0])
    if jnp.issubdtype(xn.dtype, jnp.integer) or hw * qmax >= 2**24:
        # f32 accumulation is only exact while every partial sum stays below
        # 2^24; a global pool over >= ~257x257 uint8 spatial can exceed it
        # (ADVICE r3 item 2). Integer-sum exactly in i32 instead (the cast
        # pays one extra pass on the rare huge-spatial case only).
        xn = xn.astype(jnp.int32)
        m = jnp.sum(xn, axis=(1, 2), keepdims=True).astype(jnp.float32)
    else:
        m = jnp.sum(xn, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    m = m / float(xn.shape[1] * xn.shape[2])
    v = (m - zp_in) * s_in
    out = qmath.requantize(v, t_out.quant, t_out.dtype)
    return nhwc(out.astype(_store_for(ctx, t_out)))


@register_op("ReLu", score=SCORE_BEST, predicate=lambda c: _same_quant(c) and not c.params.get("negative_slope"), quant=True)
def lower_relu_quant(ctx: LowerCtx, x: TArr):
    """relu in the quantized domain: max(q, zp) (relu_ref uint8 path)."""
    zp = int(np.asarray(ctx.in_tensor(0).quant.zero_points).reshape(-1)[0])
    t = jnp.maximum(x.x, jnp.asarray(zp, x.x.dtype))
    want = _store_for(ctx, ctx.out_tensor(0))
    if t.dtype != want:  # storage-plan boundary, exact either way
        if jnp.issubdtype(t.dtype, jnp.floating) and not jnp.issubdtype(
            jnp.dtype(want), jnp.floating
        ):
            t = t.astype(jnp.int32)
        t = t.astype(want)
    return TArr(t, x.layout)


# ---------------------------------------------------------------------------
# Quantized-domain passthrough for value-preserving data-movement ops
# (r5, from the shufflenet trace): ShuffleChannel / Reshape / Slice /
# Concat / ... are pure permutations-or-selections, so when every
# activation in/out shares one (scale, zp) grid they commute with the
# quantization map and can run on the RAW stored values — 1-2 B/elt moves
# with no dequant/requant epilogues. Without this they fall to the generic
# wrapper, which dequantizes to f32 (4 B/elt relayout copies) and
# re-rounds: the shufflenet-v2 trace showed 27% of device time in exactly
# those f32 shuffle copies. The quantizer pins shuffle/reshape-family
# output grids to their input's (same value multiset -> same optimal
# grid), so the predicate holds on real nets. Exact: bit-equal (the
# permutation is dtype-agnostic; requant at equal grids is the identity
# on in-range values, and stored values are in range by construction).
# Reference analog: shufflechannel_ref.c / reshape_ref.c are memcpys.
# ---------------------------------------------------------------------------


def _passthrough_same_quant(ctx: LowerCtx) -> bool:
    if not node_is_quant(ctx):
        return False
    t0 = ctx.out_tensor(0)
    q0 = t0.quant
    if q0 is None or q0.per_channel:
        return False
    s0, z0 = float(np.asarray(q0.scales)), int(np.asarray(q0.zero_points))

    def same(t):
        q = t.quant
        return (
            q is not None
            and not q.per_channel
            and t.dtype == t0.dtype
            and float(np.asarray(q.scales)) == s0
            and int(np.asarray(q.zero_points)) == z0
        )

    for pos, tid in enumerate(ctx.node.inputs):
        t = ctx.graph.tensors[tid]
        if t.is_const:
            # a DATA const (e.g. a Concat operand holding float anchors)
            # must share the grid too — raw float values next to raw codes
            # would be garbage. Integer shape/param consts (Reshape's shape
            # vector) carry no quant and are never concatenated: allow
            # them only for single-data-input ops where position > 0.
            if same(t):
                continue
            if ctx.node.op != "Concat" and pos > 0 and t.quant is None:
                continue
            return False
        if not same(t):
            return False
    return all(same(ctx.graph.tensors[t]) for t in ctx.node.outputs)


def _register_passthrough(op: str, base_fn):
    @register_op(op, score=SCORE_BEST, predicate=_passthrough_same_quant,
                 quant=True)
    def _lower(ctx: LowerCtx, *args, __base=base_fn, **kw):
        out = __base(ctx, *args)
        outs = out if isinstance(out, tuple) else (out,)
        fixed = []
        for tid, o in zip(ctx.node.outputs, outs):
            want = _store_for(ctx, ctx.graph.tensors[tid])
            if o.x.dtype != want:
                v = o.x
                if jnp.issubdtype(v.dtype, jnp.floating) and not jnp.issubdtype(
                    jnp.dtype(want), jnp.floating
                ):
                    v = v.astype(jnp.int32)  # exact integers either storage
                fixed.append(TArr(v.astype(want), o.layout))
            else:
                fixed.append(o)
        return tuple(fixed) if isinstance(out, tuple) else fixed[0]

    _lower.__name__ = f"lower_{op.lower()}_quant_passthrough"
    return _lower


def _install_passthroughs():
    from . import lowering as L

    for op, fn in (
        ("ShuffleChannel", L.lower_shufflechannel),
        ("Reshape", L.lower_reshape),
        ("Flatten", L.lower_flatten),
        ("Squeeze", L.lower_squeeze),
        ("Permute", L.lower_permute),
        ("Transpose", L.lower_transpose),
        ("Slice", L.lower_slice),
        ("Concat", L.lower_concat),
        ("Split", L.lower_split),
        # nearest-neighbor upsample duplicates values; crop selects them —
        # both value-preserving (bilinear Interp is NOT and stays wrapped)
        ("Upsample", L.lower_upsample),
        ("Crop", L.lower_crop),
        ("ChannelGather", L.lower_channel_gather),
    ):
        _register_passthrough(op, fn)


_install_passthroughs()
