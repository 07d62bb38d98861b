"""Lowerings for the FusedResBlockChain node
(graph/passes.py:fuse_resnet_blocks).

(r5 adjudication, VERDICT r4 item 9: the FusedDwPwConv / FusedDwPwChain
lowerings and their Pallas kernels — fused_dwpw.py, fused_dwpw2.py,
dwchain.py — were deleted. Three rounds of measurement concluded the
depthwise family cannot beat XLA's bf16 roofline program on v5e
(ARCHITECTURE "the standalone s8 depthwise kernel...", r5); the surviving
record of those experiments is ops/pallas/dw_conv.py + ARCHITECTURE
notes.)
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
