"""Lowerings for the FusedDwPwConv node (graph/passes.py:fuse_dwpw).

Three tiers, like every conv op (registry scoring, cpu_module.c:135-170
analog in the reference):

  * SCORE_BEST  — single fused Pallas kernel (ops/pallas/fused_dwpw.py):
    depthwise int32 accumulate + requant + pointwise int8 MXU dot + requant,
    with the depthwise intermediate never leaving VMEM. Numerically within
    1 LSB of the unfused fast path (same fp32-multiplier requant).
  * SCORE_CANDO — reference semantics: dequant -> fp32 dw conv -> requant to
    the recorded mid tensor -> dequant -> fp32 pw conv -> requant
    (conv_kernel_ref_uint8.c:67-177 applied twice), bit-identical to running
    the two original nodes under quant_mode="ref".
  * SCORE_REF   — plain float path for quant_mode="float" / forced-ref runs,
    mirroring lowering.py:lower_conv applied twice.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..graph.ir import DType
from . import qmath
from .layout import TArr, as_nhwc, nhwc
from .lowering import apply_activation, compute_dtype
from .registry import SCORE_BEST, SCORE_CANDO, SCORE_REF, LowerCtx, register_op


def _bf16_fused_ok(ctx: LowerCtx) -> bool:
    """fused_dwpw_bf16 (ops/pallas/fused_dwpw2.py): the default-storage fused
    block kernel. Needs bf16 storage mode and 128-aligned channels (manual
    halo DMA lane slicing)."""
    if not (
        qmath.node_is_quant(ctx)
        and ctx.options.quant_mode in ("auto", "fast")
        and not ctx.options.force_ref_kernels
        and ctx.options.quant_bf16_storage
    ):
        return False
    return int(ctx.in_tensor(1).shape[0]) % 128 == 0


@register_op("FusedDwPwConv", score=SCORE_BEST + 1, predicate=_bf16_fused_ok, quant=True)
def lower_fused_dwpw_bf16(ctx: LowerCtx, x: TArr, *rest):
    """dw3x3+pw1x1 block as one Pallas kernel in the bf16-storage domain:
    the depthwise intermediate never touches HBM, zero-points fold into the
    requant constants via the colsum identity."""
    from .pallas.fused_dwpw2 import fused_dwpw_bf16

    p = ctx.params
    t_in = ctx.in_tensor(0)
    t_wd = ctx.in_tensor(1)
    t_wp = ctx.in_tensor(p["wp_pos"])
    t_mid = ctx.graph.tensors[p["mid_tid"]]
    t_out = ctx.out_tensor(0)

    C = t_wd.shape[0]
    C2 = t_wp.shape[0]

    s_in, zp_in = _scalar_q(t_in.quant)
    s_mid, zp_mid = _scalar_q(t_mid.quant)
    s_out, zp_out = _scalar_q(t_out.quant)
    wd_scales = _wscales(t_wd.quant, C)
    wp_scales = _wscales(t_wp.quant, C2)
    zp_wd = 0 if t_wd.quant.per_channel else _scalar_q(t_wd.quant)[1]
    zp_wp = 0 if t_wp.quant.per_channel else _scalar_q(t_wp.quant)[1]

    def wd_taps():
        w = ctx.const_data(1).reshape(C, 9).astype(np.float32) - zp_wd
        return np.ascontiguousarray(w.T)

    wd = ctx.get_param("fdw2_wd", wd_taps)
    md_np = (s_in * wd_scales / s_mid).astype(np.float32)
    md = ctx.get_param("fdw2_md", lambda: md_np)

    def bd_fold():
        b = (
            ctx.const_data(p["bd_pos"]).astype(np.float64)
            if p["bd_pos"] >= 0
            else np.zeros(C)
        )
        colsum = wd_taps().sum(axis=0).astype(np.float64)  # per-channel sum of taps
        return ((b - zp_in * colsum) * md_np.astype(np.float64) + zp_mid).astype(np.float32)

    bd = ctx.get_param("fdw2_bd", bd_fold)

    def wp_kn():
        w = ctx.const_data(p["wp_pos"]).reshape(C2, C).astype(np.float32) - zp_wp
        return np.ascontiguousarray(w.T).astype(np.float32)  # exact in bf16 later

    mp_np = (s_mid * wp_scales / s_out).astype(np.float32)
    wp = ctx.get_param("fdw2_wp", lambda: wp_kn().astype(np.dtype("bfloat16")))
    mp = ctx.get_param("fdw2_mp", lambda: mp_np)

    def bp_fold():
        b = (
            ctx.const_data(p["bp_pos"]).astype(np.float64)
            if p["bp_pos"] >= 0
            else np.zeros(C2)
        )
        colsum = wp_kn().sum(axis=0).astype(np.float64)  # per-out-channel
        return ((b - zp_mid * colsum) * mp_np.astype(np.float64) + zp_out).astype(np.float32)

    bp = ctx.get_param("fdw2_bp", bp_fold)

    mid_lo, mid_hi = qmath.QRANGE[t_mid.dtype]
    lo, hi = qmath.QRANGE[t_out.dtype]
    xn = as_nhwc(x)
    if not jnp.issubdtype(xn.dtype, jnp.floating):
        xn = xn.astype(jnp.bfloat16)  # graph-input edge case (exact <=9-bit)
    out = fused_dwpw_bf16(
        xn,
        wd, md, bd, wp, mp, bp,
        zp_in=zp_in,
        stride=p["stride"],
        act_d=p.get("act_d", -1),
        act_p=p.get("act_p", -1),
        inv_s_mid=1.0 / s_mid,
        zp_mid=zp_mid,
        mid_lo=mid_lo,
        mid_hi=mid_hi,
        inv_s_out=1.0 / s_out,
        zp_out=zp_out,
        lo=lo,
        hi=hi,
    )
    return nhwc(out)


def _fast_ok(ctx: LowerCtx) -> bool:
    return (
        qmath.node_is_quant(ctx)
        and ctx.options.quant_mode in ("auto", "fast")
        and not ctx.options.force_ref_kernels
        and not ctx.options.quant_bf16_storage  # kernel wants int operands
    )


def _scalar_q(q):
    return float(np.asarray(q.scales).reshape(-1)[0]), int(
        np.asarray(q.zero_points).reshape(-1)[0]
    )


def _wscales(quant, out_c: int) -> np.ndarray:
    s = np.asarray(quant.scales, np.float32).reshape(-1)
    if s.size == 1:
        s = np.full((out_c,), s[0], np.float32)
    return s


@register_op("FusedDwPwConv", score=SCORE_BEST, predicate=_fast_ok, quant=True)
def lower_fused_dwpw_fast(ctx: LowerCtx, x: TArr, *rest):
    """dw3x3+pw1x1 block as one Pallas kernel; params folded on the host."""
    from .pallas.fused_dwpw import fused_dwpw_requant

    p = ctx.params
    t_in = ctx.in_tensor(0)
    t_wd = ctx.in_tensor(1)
    t_wp = ctx.in_tensor(p["wp_pos"])
    t_mid = ctx.graph.tensors[p["mid_tid"]]
    t_out = ctx.out_tensor(0)

    C = t_wd.shape[0]
    C2 = t_wp.shape[0]
    is_u8 = t_in.dtype == DType.UINT8

    s_in, zp_in = _scalar_q(t_in.quant)
    s_mid, zp_mid = _scalar_q(t_mid.quant)
    s_out, zp_out = _scalar_q(t_out.quant)
    wd_scales = _wscales(t_wd.quant, C)
    wp_scales = _wscales(t_wp.quant, C2)
    zp_wd = 0 if t_wd.quant.per_channel else _scalar_q(t_wd.quant)[1]
    zp_wp = 0 if t_wp.quant.per_channel else _scalar_q(t_wp.quant)[1]

    # depthwise taps, zero-point-shifted, laid out [9, C]
    def wd_taps():
        w = ctx.const_data(1).reshape(C, 9).astype(np.int32) - zp_wd
        return np.ascontiguousarray(w.T)

    wd = ctx.get_param("fdw_wd", wd_taps)
    md = ctx.get_param("fdw_md", lambda: (s_in * wd_scales / s_mid).astype(np.float32))

    def bd_fold():
        b = (
            ctx.const_data(p["bd_pos"]).astype(np.float64)
            if p["bd_pos"] >= 0
            else np.zeros(C)
        )
        return (b * (s_in * wd_scales / s_mid).astype(np.float64) + zp_mid).astype(
            np.float32
        )

    bd = ctx.get_param("fdw_bd", bd_fold)

    # pointwise: re-centered int8 weights [C, C2] + zero-point corrections
    if is_u8:
        cx_p, cw_p, mid_shift = 128 - zp_mid, 128 - zp_wp, 128
    else:
        cx_p = cw_p = mid_shift = 0

    def wp_kn():
        w = ctx.const_data(p["wp_pos"]).reshape(C2, C)
        if is_u8:
            w = (w.astype(np.int16) - 128).astype(np.int8)
        return np.ascontiguousarray(w.T.astype(np.int8))

    wp = ctx.get_param("fdw_wp", wp_kn)
    mp = ctx.get_param("fdw_mp", lambda: (s_mid * wp_scales / s_out).astype(np.float32))

    def bp_fold():
        w = ctx.const_data(p["wp_pos"]).reshape(C2, C)
        if is_u8:
            wsh = w.astype(np.int32) - 128
            b0 = cx_p * wsh.sum(axis=1).astype(np.int64) + C * cx_p * cw_p
        else:
            b0 = np.zeros(C2, np.int64)
        if p["bp_pos"] >= 0:
            b0 = b0 + ctx.const_data(p["bp_pos"]).astype(np.int64)
        m = (s_mid * wp_scales / s_out).astype(np.float64)
        return (b0.astype(np.float64) * m + zp_out).astype(np.float32)

    bp = ctx.get_param("fdw_bp", bp_fold)

    mid_lo, mid_hi = qmath.QRANGE[t_mid.dtype]
    lo, hi = qmath.QRANGE[t_out.dtype]
    out = fused_dwpw_requant(
        as_nhwc(x),
        wd,
        md,
        bd,
        wp,
        mp,
        bp,
        zp_in=zp_in,
        stride=p["stride"],
        act_d=p.get("act_d", -1),
        act_p=p.get("act_p", -1),
        inv_s_mid=1.0 / s_mid,
        zp_mid=zp_mid,
        mid_lo=mid_lo,
        mid_hi=mid_hi,
        mid_shift=mid_shift,
        inv_s_out=1.0 / s_out,
        zp_out=zp_out,
        lo=lo,
        hi=hi,
        cw_p=cw_p,
        out_dtype="uint8" if t_out.dtype == DType.UINT8 else "int8",
    )
    return nhwc(out)


def _dw_pads(stride: int):
    return ((1, 1), (1, 1))


@register_op("FusedDwPwConv", score=SCORE_CANDO, predicate=qmath.node_is_quant, quant=True)
def lower_fused_dwpw_ref(ctx: LowerCtx, x: TArr, *rest):
    """Bit-faithful to the two original nodes under quant_mode='ref'."""
    p = ctx.params
    t_in = ctx.in_tensor(0)
    t_wd = ctx.in_tensor(1)
    t_wp = ctx.in_tensor(p["wp_pos"])
    t_mid = ctx.graph.tensors[p["mid_tid"]]
    t_out = ctx.out_tensor(0)
    C = t_wd.shape[0]
    C2 = t_wp.shape[0]
    s_in, _ = _scalar_q(t_in.quant)
    s_mid, _ = _scalar_q(t_mid.quant)
    wd_scales = _wscales(t_wd.quant, C)
    wp_scales = _wscales(t_wp.quant, C2)

    xn = qmath.dequantize(as_nhwc(x), t_in.quant)
    wd = ctx.weight(
        1,
        lambda a: qmath.dequantize_np(a, t_wd.quant, channel_axis=0).transpose(2, 3, 1, 0),
        tag="fdw_hwio_deq",
    )
    mid = lax.conv_general_dilated(
        xn,
        wd,
        window_strides=(p["stride"], p["stride"]),
        padding=_dw_pads(p["stride"]),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    if p["bd_pos"] >= 0:
        mid = mid + ctx.get_param(
            "fdw_bd_deq",
            lambda: ctx.const_data(p["bd_pos"]).astype(np.float32) * s_in * wd_scales,
        )
    mid = apply_activation(mid, p.get("act_d", -1))
    mid_q = qmath.requantize(mid, t_mid.quant, t_mid.dtype)

    midf = qmath.dequantize(mid_q, t_mid.quant)
    wp = ctx.weight(
        p["wp_pos"],
        lambda a: qmath.dequantize_np(a, t_wp.quant, channel_axis=0).transpose(2, 3, 1, 0),
        tag="fdw_pw_hwio_deq",
    )
    out = lax.conv_general_dilated(
        midf,
        wp,
        window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    if p["bp_pos"] >= 0:
        out = out + ctx.get_param(
            "fdw_bp_deq",
            lambda: ctx.const_data(p["bp_pos"]).astype(np.float32) * s_mid * wp_scales,
        )
    out = apply_activation(out, p.get("act_p", -1))
    return nhwc(qmath.requantize(out, t_out.quant, t_out.dtype))


@register_op("FusedDwPwConv", score=SCORE_REF)
def lower_fused_dwpw_float(ctx: LowerCtx, x: TArr, *rest):
    """Float path (quant_mode='float' / generic-wrapper): two fp32 convs,
    mirroring lowering.py:lower_conv."""
    p = ctx.params
    C = ctx.in_tensor(1).shape[0]
    dt = compute_dtype(ctx)
    xn = as_nhwc(x)
    wd = ctx.weight(1, lambda a: np.transpose(a, (2, 3, 1, 0)), tag="fdw_hwio")
    mid = lax.conv_general_dilated(
        xn.astype(dt),
        wd.astype(dt),
        window_strides=(p["stride"], p["stride"]),
        padding=_dw_pads(p["stride"]),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        preferred_element_type=jnp.float32,
    )
    if p["bd_pos"] >= 0:
        mid = mid + ctx.weight(p["bd_pos"], tag="fdw_bd_raw").astype(jnp.float32)
    mid = apply_activation(mid, p.get("act_d", -1))
    wp = ctx.weight(p["wp_pos"], lambda a: np.transpose(a, (2, 3, 1, 0)), tag="fdw_pw_hwio")
    out = lax.conv_general_dilated(
        mid.astype(dt),
        wp.astype(dt),
        window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if p["bp_pos"] >= 0:
        out = out + ctx.weight(p["bp_pos"], tag="fdw_bp_raw").astype(jnp.float32)
    out = apply_activation(out, p.get("act_p", -1))
    return nhwc(out.astype(dt) if dt != jnp.float32 else out)


# ---------------------------------------------------------------------------
# FusedResBlockChain (graph/passes.py:fuse_resnet_blocks): a run of whole
# quantized bottleneck residual blocks executed by one Pallas kernel per
# VMEM-sized sub-chain, activations resident in VMEM between convs AND
# between blocks (ops/pallas/qblock.py). Reference analog: the armv8.2
# i8gemm asm conv tier — fused at the TPU-native granularity (HBM traffic).
# ---------------------------------------------------------------------------


def _scale_of(t) -> float:
    return float(np.asarray(t.quant.scales).reshape(-1)[0])


def _resblock_vmem(blocks, M, WROW) -> int:
    c0, c1 = blocks[0].c_in, blocks[0].c_mid
    c2 = blocks[-1].c_out
    w = sum(
        b.c_in * b.c_mid + 9 * b.c_mid * b.c_mid + b.c_mid * b.c_out
        + (b.c_in * b.c_out if b.proj else 0)
        for b in blocks
    )
    # xin (2 slots) + conv1 staging + live SSA activations / int32
    # accumulators (Mosaic temporaries, estimated) — all scale with the
    # concatenated-pack working set MS = S*(M+WROW) (pick_streams)
    from .pallas.qblock import pick_streams

    MS = pick_streams(M, WROW) * (M + WROW)
    acts = 4 * MS * c0 + 2 * (MS + 2 * WROW) * c1 + 4 * MS * c2
    acc = 2 * 3 * MS * max(c1, c2) * 4
    return w + acts + acc


@register_op("FusedResBlockChain", score=SCORE_BEST, quant=True)
def lower_resblock_chain(ctx: LowerCtx, x: TArr, *rest):
    """Whole residual-block chains on the int8 MXU with VMEM-resident
    intermediates; bit-faithful to the unfused quantized node chain
    (tests/test_qblock_pallas.py, test_resblock_fusion.py)."""
    from .pallas.qblock import (
        QBlock, build_block_args, pack_activations, qblock_chain,
        seg_geometry, unpack_activations,
    )

    g = ctx.graph
    infos = ctx.params["blocks"]
    t_x = ctx.in_tensor(0)
    s_prev = _scale_of(t_x)

    cfgs = []
    for i, info in enumerate(infos):
        t_add = g.tensors[info["add_out"]]
        t_out = g.tensors[info["out_tid"]]
        cfg = QBlock(
            c_in=info["c_in"], c_mid=info["c_mid"], c_out=info["c_out"],
            act1=info["act1"] if info["act1"] is not None else -1,
            act2=info["act2"] if info["act2"] is not None else -1,
            s1=_scale_of(g.tensors[info["mid1"]]),
            s2=_scale_of(g.tensors[info["mid2"]]),
            s_mid=_scale_of(g.tensors[info["mid3"]]),
            s_r=_scale_of(g.tensors[info["r_tid"]]),
            s_out=_scale_of(t_add),
            s_relu=_scale_of(t_out) if info["has_relu"] else None,
            proj=info["proj"],
        )
        cfgs.append(cfg)

    def wscales(pos):
        t = g.tensors[ctx.node.inputs[pos]]
        s = np.asarray(t.quant.scales, np.float32).reshape(-1)
        if s.size == 1:
            s = np.full((int(t.shape[0]),), s[0], np.float32)
        return s

    # Mosaic requires DMA-sliced arrays lane-aligned to the int8 tile (128);
    # chains entered at c_in < 128 (resnet50 stage-1: 64) pad the input lane
    # dim with zeros and the first block's 1x1 weights (w1, proj w4) with
    # zero rows — exact.
    c0 = cfgs[0].c_in
    c0p = -(-c0 // 128) * 128
    if c0p != c0:
        from dataclasses import replace as _rep

        cfgs[0] = _rep(cfgs[0], c_in=c0p)

    def _pad_rows(a):
        return np.pad(a, ((0, c0p - c0), (0, 0)))

    # host-side packing, memoized so the 9-12 param-store entries per block
    # share one build_block_args call at prepare time
    memo = {}
    all_args = []
    sp = s_prev
    for i, (info, cfg) in enumerate(zip(infos, cfgs)):
        def compute_args(i=i, info=info, cfg=cfg, sp=sp):
            if i not in memo:
                def cd(key):
                    pos = info.get(key)
                    return None if pos is None else ctx.const_data(pos)

                memo[i] = build_block_args(
                    cfg,
                    ctx.const_data(info["w1_pos"]), cd("b1_pos"),
                    ctx.const_data(info["w2_pos"]), cd("b2_pos"),
                    ctx.const_data(info["w3_pos"]), cd("b3_pos"),
                    sp,
                    wscales(info["w1_pos"]), wscales(info["w2_pos"]),
                    wscales(info["w3_pos"]),
                    w4=cd("w4_pos"), b4_q=cd("b4_pos"),
                    sw4=wscales(info["w4_pos"]) if info["proj"] else None,
                    relaxed=ctx.options.quant_relaxed,
                )
            return memo[i]

        n = 12 if cfg.proj else 9
        for j in range(n):
            pad = c0p != c0 and i == 0 and j in (0, 9)
            all_args.append(
                ctx.get_param(
                    f"qblk{i}a{j}",
                    lambda j=j, f=compute_args, pad=pad: (
                        _pad_rows(f()[j]) if pad else f()[j]
                    ),
                )
            )
        sp = cfg.s_relu if cfg.s_relu is not None else cfg.s_out

    xn = as_nhwc(x)
    if jnp.issubdtype(xn.dtype, jnp.floating):
        # bf16-storage mode: values are exact quantized integers
        xn = xn.astype(jnp.int32).astype(jnp.int8)
    if infos[0]["stride"] == 2:
        # Caffe-resnet downsample: stride-2 1x1 convs (conv1 + projection)
        # consume only the even-subsampled input
        xn = xn[:, ::2, ::2, :]
    N, H, W, _ = xn.shape
    SEG, gpack = seg_geometry(W)
    from .pallas.qblock import pick_streams

    S = pick_streams(H * gpack * SEG, gpack * SEG)
    need = gpack * S  # whole packs, and a pack count divisible by S per step
    Np = ((N + need - 1) // need) * need
    if Np != N:
        xn = jnp.pad(xn, ((0, Np - N), (0, 0), (0, 0), (0, 0)))
    xp = pack_activations(xn, H, W)
    if c0p != c0:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, c0p - c0)))

    # split the chain so each kernel fits VMEM (weights resident)
    M = xp.shape[1]
    WROW = gpack * SEG
    from .pallas.qblock import VMEM_LIMIT

    budget = (VMEM_LIMIT * 3) // 5  # headroom for Mosaic temporaries
    sub = []
    start = 0
    args_per = [12 if c.proj else 9 for c in cfgs]
    for end in range(1, len(cfgs) + 1):
        if end - start > 1 and _resblock_vmem(cfgs[start:end], M, WROW) > budget:
            sub.append((start, end - 1))
            start = end - 1
    sub.append((start, len(cfgs)))

    for lo, hi in sub:
        a0 = sum(args_per[:lo])
        a1 = sum(args_per[:hi])
        xp = qblock_chain(
            xp, *all_args[a0:a1], blocks=tuple(cfgs[lo:hi]), H=H, W=W,
            relaxed=ctx.options.quant_relaxed,
        )
    y = unpack_activations(xp, Np, H, W)
    if Np != N:
        y = y[:N]
    from .quantized import _store_for

    want = _store_for(ctx, ctx.out_tensor(0))
    if y.dtype != want:
        y = y.astype(want)
    return nhwc(y)


# ---------------------------------------------------------------------------
# FusedDwPwChain (graph/passes.py:fuse_dwpw_chains): runs of stride-1
# dw3x3+pw1x1 blocks — the mobilenet family's separable stacks — executed by
# one Pallas kernel per chain with every intermediate resident in VMEM
# (ops/pallas/dwchain.py). Relaxed tier only: the chain carries unrounded
# f32 between layers (clamped to each layer's calibrated saturation range)
# and rounds once at the chain output. Reference analog: the dedicated
# dw3x3/pw asm pair of the armv8 tier (conv_dw_*), fused at the TPU-native
# granularity (HBM traffic).
# ---------------------------------------------------------------------------


def _ceil128(c: int) -> int:
    return max(128, ((int(c) + 127) // 128) * 128)


@register_op("FusedDwPwChain", score=SCORE_BEST, quant=True)
def lower_dwpw_chain(ctx: LowerCtx, x: TArr, *rest):
    import jax

    from .pallas.dwchain import (
        DwBlock, build_dw_args, dwchain, pack_activations, seg_geometry,
        unpack_activations,
    )
    from .quantized import _store_for

    g = ctx.graph
    p = ctx.params
    t_in = ctx.in_tensor(0)
    t_out = ctx.out_tensor(0)
    s_in = _scale_of(t_in)
    zp_in = int(np.asarray(t_in.quant.zero_points).reshape(-1)[0])

    blocks = []
    args = []
    s_prev = s_in
    for bi, bp_ in enumerate(p["blocks"]):
        mid = g.tensors[bp_["mid_tid"]]
        out = g.tensors[bp_["out_tid"]]
        t_wd = ctx.in_tensor(bp_["wd_pos"])
        t_wp = ctx.in_tensor(bp_["wp_pos"])
        c = int(t_wd.shape[0])
        c2 = int(t_wp.shape[0])
        s_mid, s_out = _scale_of(mid), _scale_of(out)
        zp_mid = int(np.asarray(mid.quant.zero_points).reshape(-1)[0])
        zp_o = int(np.asarray(out.quant.zero_points).reshape(-1)[0])
        mlo, mhi = qmath.qrange(mid.dtype, mid.quant)
        olo, ohi = qmath.qrange(out.dtype, out.quant)
        blk = DwBlock(
            c=_ceil128(c), c_out=_ceil128(c2),
            act_d=bp_["act_d"], act_p=bp_["act_p"],
            s_mid=s_mid, s_out=s_out,
            mid_lo=float(mlo - zp_mid), mid_hi=float(mhi - zp_mid),
            out_lo=float(olo - zp_o), out_hi=float(ohi - zp_o),
        )
        blocks.append(blk)

        def mk(bi=bi, bp_=bp_, blk=blk, s_prev=s_prev, s_mid=s_mid,
               s_out=s_out, c=c, c2=c2, t_wd=t_wd, t_wp=t_wp):
            zp_wd = (
                0 if t_wd.quant.per_channel
                else int(np.asarray(t_wd.quant.zero_points).reshape(-1)[0])
            )
            zp_wp = (
                0 if t_wp.quant.per_channel
                else int(np.asarray(t_wp.quant.zero_points).reshape(-1)[0])
            )
            bd = (
                ctx.const_data(bp_["bd_pos"]) if bp_["bd_pos"] >= 0 else None
            )
            bpq = (
                ctx.const_data(bp_["bp_pos"]) if bp_["bp_pos"] >= 0 else None
            )
            return build_dw_args(
                blk, ctx.const_data(bp_["wd_pos"]), bd,
                ctx.const_data(bp_["wp_pos"]), bpq,
                s_prev, t_wd.quant.scales, zp_wd,
                s_mid, t_wp.quant.scales, zp_wp, s_out,
            )

        for j, key in enumerate(("wd", "md", "bd", "wp", "mp", "bp")):
            args.append(ctx.get_param(f"dwc{bi}_{key}", lambda j=j, mk=mk: mk()[j]))
        s_prev = s_out

    xn = as_nhwc(x)
    N, H, Wd, C = (int(d) for d in xn.shape)
    SEG, gp = seg_geometry(Wd)
    Np = ((N + gp - 1) // gp) * gp
    if Np != N:
        xn = jnp.pad(xn, ((0, Np - N), (0, 0), (0, 0), (0, 0)))
    xp = pack_activations(xn, H, Wd)
    if blocks[0].c != C:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, blocks[0].c - C)))

    zp_out = int(np.asarray(t_out.quant.zero_points).reshape(-1)[0])
    flo, fhi = qmath.qrange(t_out.dtype, t_out.quant)
    store = _store_for(ctx, t_out)
    out_dtype = (
        "bfloat16" if jnp.issubdtype(jnp.dtype(store), jnp.floating)
        else jnp.dtype(store).name
    )
    y = dwchain(
        xp, *args, blocks=tuple(blocks), H=H, W=Wd,
        zp_in=float(zp_in), zp_out=float(zp_out),
        out_lo=float(flo), out_hi=float(fhi), out_dtype=out_dtype,
    )
    c_last = int(ctx.in_tensor(p["blocks"][-1]["wp_pos"]).shape[0])
    if y.shape[-1] != c_last:
        y = y[:, :, :c_last]
    y = unpack_activations(y, Np, H, Wd)
    if Np != N:
        y = y[:N]
    return nhwc(y)
