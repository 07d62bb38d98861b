"""Remaining op lowerings: recurrent nets, ROI ops, region proposals, and
misc stragglers, completing the reference's ~92-op builtin set (op.h:38-145).

Recurrent ops use lax.scan — the idiomatic XLA encoding of the reference's
per-timestep C loops (lstm_ref.c:44-180, rnn_ref.c, gru_ref.c). Gate orders
follow the reference kernels: LSTM rows [I, O, F, G] (lstm_ref.c:87-91),
GRU ONNX order [z, r, h].
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .layout import TArr, as_nchw, as_nhwc, as_semantic, like, nchw, nhwc, wrap
from .registry import LowerCtx, register_op


# ---------------------------------------------------------------------------
# recurrent
# ---------------------------------------------------------------------------


@register_op("LSTM")
def lower_lstm(ctx: LowerCtx, x: TArr, *rest: TArr):
    """ONNX-flavor LSTM (lstm_ref.c ref_lstm_* family): input [T, B, I],
    W [4H, I] rows ordered I,O,F,G; R [4H, H]; optional bias [8H]
    (W-bias then R-bias). Emits all timesteps [T, 1, B, H] (the shape the
    reference's reshape() declares, lstm_ref.c:744-768)."""
    p = ctx.params
    H = p["hidden_size"]
    xs = as_semantic(x)
    T, B, I = xs.shape

    W = ctx.weight(1).reshape(4 * H, I).astype(jnp.float32)
    R = ctx.weight(2).reshape(4 * H, H).astype(jnp.float32)
    if ctx.num_inputs > 3:
        b_all = ctx.weight(3).reshape(-1).astype(jnp.float32)
        bias = b_all[: 4 * H] + (b_all[4 * H : 8 * H] if b_all.size >= 8 * H else 0.0)
    else:
        bias = jnp.zeros((4 * H,), jnp.float32)

    def cell(carry, x_t):
        h, c = carry
        gates = x_t @ W.T + h @ R.T + bias  # [B, 4H]
        i_g = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
        o_g = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
        f_g = jax.nn.sigmoid(gates[:, 2 * H : 3 * H])
        g_g = jnp.tanh(gates[:, 3 * H : 4 * H])
        c2 = f_g * c + i_g * g_g
        h2 = o_g * jnp.tanh(c2)
        return (h2, c2), h2

    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)
    (_, _), hs = lax.scan(cell, (h0, c0), xs.astype(jnp.float32))
    return wrap(hs[:, None])  # [T, 1, B, H]


@register_op("RNN")
def lower_rnn(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Vanilla RNN (rnn_ref.c): h' = tanh(x W^T + h R^T + b)."""
    p = ctx.params
    H = p["hidden_size"]
    xs = as_semantic(x)
    T, B, I = xs.shape
    W = ctx.weight(1).reshape(H, I).astype(jnp.float32)
    R = ctx.weight(2).reshape(H, H).astype(jnp.float32)
    bias = (
        ctx.weight(3).reshape(-1)[:H].astype(jnp.float32)
        if ctx.num_inputs > 3
        else jnp.zeros((H,), jnp.float32)
    )

    def cell(h, x_t):
        h2 = jnp.tanh(x_t @ W.T + h @ R.T + bias)
        return h2, h2

    h0 = jnp.zeros((B, H), jnp.float32)
    _, hs = lax.scan(cell, h0, xs.astype(jnp.float32))
    return wrap(hs[:, None])


@register_op("GRU")
def lower_gru(ctx: LowerCtx, x: TArr, *rest: TArr):
    """GRU (gru_ref.c, ONNX gate order z,r,h):
    z = sigma(xWz + hRz), r = sigma(xWr + hRr),
    h~ = tanh(xWh + r*(hRh)), h' = (1-z)h~ + z h."""
    p = ctx.params
    H = p["hidden_size"]
    xs = as_semantic(x)
    T, B, I = xs.shape
    W = ctx.weight(1).reshape(3 * H, I).astype(jnp.float32)
    R = ctx.weight(2).reshape(3 * H, H).astype(jnp.float32)
    if ctx.num_inputs > 3:
        b_all = ctx.weight(3).reshape(-1).astype(jnp.float32)
        bw = b_all[: 3 * H]
        br = b_all[3 * H : 6 * H] if b_all.size >= 6 * H else jnp.zeros((3 * H,))
    else:
        bw = br = jnp.zeros((3 * H,), jnp.float32)

    def cell(h, x_t):
        gx = x_t @ W.T + bw
        gh = h @ R.T + br
        z = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
        r = jax.nn.sigmoid(gx[:, H : 2 * H] + gh[:, H : 2 * H])
        hh = jnp.tanh(gx[:, 2 * H :] + r * gh[:, 2 * H :])
        h2 = (1.0 - z) * hh + z * h
        return h2, h2

    h0 = jnp.zeros((B, H), jnp.float32)
    _, hs = lax.scan(cell, h0, xs.astype(jnp.float32))
    return wrap(hs[:, None])


# ---------------------------------------------------------------------------
# ROI family
# ---------------------------------------------------------------------------


@register_op("ROIPooling")
def lower_roipooling(ctx: LowerCtx, x: TArr, rois: TArr):
    """Max ROI pooling (roipooling_ref.c): rois [R, 4] in image coords scaled
    by spatial_scale; output [R, C, ph, pw]."""
    p = ctx.params
    ph, pw = p["pooled_h"], p["pooled_w"]
    scale = p["spatial_scale"]
    feat = as_nchw(x)[0]  # [C, H, W]
    C, H, W = feat.shape
    r = as_semantic(rois).reshape(-1, 4)

    def one_roi(roi):
        x0 = jnp.round(roi[0] * scale).astype(jnp.int32)
        y0 = jnp.round(roi[1] * scale).astype(jnp.int32)
        x1 = jnp.round(roi[2] * scale).astype(jnp.int32)
        y1 = jnp.round(roi[3] * scale).astype(jnp.int32)
        rw = jnp.maximum(x1 - x0 + 1, 1)
        rh = jnp.maximum(y1 - y0 + 1, 1)
        bin_h = rh.astype(jnp.float32) / ph
        bin_w = rw.astype(jnp.float32) / pw

        ys = jnp.arange(ph)
        xs_ = jnp.arange(pw)
        h0 = jnp.clip(y0 + jnp.floor(ys * bin_h).astype(jnp.int32), 0, H - 1)
        h1 = jnp.clip(y0 + jnp.ceil((ys + 1) * bin_h).astype(jnp.int32), 0, H)
        w0 = jnp.clip(x0 + jnp.floor(xs_ * bin_w).astype(jnp.int32), 0, W - 1)
        w1 = jnp.clip(x0 + jnp.ceil((xs_ + 1) * bin_w).astype(jnp.int32), 0, W)

        # mask-based max per bin (jit-safe for dynamic bin extents)
        hh = jnp.arange(H)[None, :]  # [1, H]
        ww = jnp.arange(W)[None, :]
        hmask = (hh >= h0[:, None]) & (hh < h1[:, None])  # [ph, H]
        wmask = (ww >= w0[:, None]) & (ww < w1[:, None])  # [pw, W]
        m = hmask[:, None, :, None] & wmask[None, :, None, :]  # [ph, pw, H, W]
        vals = jnp.where(m[None], feat[:, None, None, :, :], -jnp.inf)
        return jnp.max(vals, axis=(3, 4))  # [C, ph, pw]

    out = jax.vmap(one_roi)(r)
    return wrap(out)


@register_op("Roialign")
def lower_roialign(ctx: LowerCtx, x: TArr, rois: TArr):
    """ROI align with bilinear sampling (roialign ref; one sample per bin
    center, matching the reference's simplified kernel)."""
    p = ctx.params
    ph, pw = p["pooled_height"], p["pooled_width"]
    scale = p["spatial_scale"]
    feat = as_nchw(x)[0]
    C, H, W = feat.shape
    r = as_semantic(rois).reshape(-1, 4)

    def one_roi(roi):
        x0, y0, x1, y1 = roi[0] * scale, roi[1] * scale, roi[2] * scale, roi[3] * scale
        rw = jnp.maximum(x1 - x0, 1.0)
        rh = jnp.maximum(y1 - y0, 1.0)
        ys = y0 + (jnp.arange(ph) + 0.5) * rh / ph
        xs_ = x0 + (jnp.arange(pw) + 0.5) * rw / pw
        yy, xx = jnp.meshgrid(ys, xs_, indexing="ij")
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        yf = jnp.floor(yy).astype(jnp.int32)
        xf = jnp.floor(xx).astype(jnp.int32)
        yc = jnp.minimum(yf + 1, H - 1)
        xc = jnp.minimum(xf + 1, W - 1)
        wy = yy - yf
        wx = xx - xf
        v00 = feat[:, yf, xf]
        v01 = feat[:, yf, xc]
        v10 = feat[:, yc, xf]
        v11 = feat[:, yc, xc]
        return (
            v00 * (1 - wy) * (1 - wx)
            + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx)
            + v11 * wy * wx
        )

    out = jax.vmap(one_roi)(r)
    return wrap(out)


@register_op("Psroipooling")
def lower_psroipooling(ctx: LowerCtx, x: TArr, rois: TArr):
    """Position-sensitive ROI pooling (psroipooling ref): input
    [1, out_dim*ph*pw, H, W] -> [R, out_dim, ph, pw], average per bin from
    the bin's own channel group."""
    p = ctx.params
    ph, pw = p["pooled_h"], p["pooled_w"]
    od = p["output_dim"]
    scale = p["spatial_scale"]
    feat = as_nchw(x)[0]
    C, H, W = feat.shape
    r = as_semantic(rois).reshape(-1, 4)

    def one_roi(roi):
        x0 = roi[0] * scale
        y0 = roi[1] * scale
        x1 = roi[2] * scale
        y1 = roi[3] * scale
        rw = jnp.maximum(x1 - x0, 0.1)
        rh = jnp.maximum(y1 - y0, 0.1)
        bin_h = rh / ph
        bin_w = rw / pw
        hh = jnp.arange(H)[None, :]
        ww = jnp.arange(W)[None, :]
        h0 = jnp.floor(y0 + jnp.arange(ph) * bin_h).astype(jnp.int32)
        h1 = jnp.ceil(y0 + (jnp.arange(ph) + 1) * bin_h).astype(jnp.int32)
        w0 = jnp.floor(x0 + jnp.arange(pw) * bin_w).astype(jnp.int32)
        w1 = jnp.ceil(x0 + (jnp.arange(pw) + 1) * bin_w).astype(jnp.int32)
        hmask = (hh >= jnp.clip(h0, 0, H)[:, None]) & (hh < jnp.clip(h1, 0, H)[:, None])
        wmask = (ww >= jnp.clip(w0, 0, W)[:, None]) & (ww < jnp.clip(w1, 0, W)[:, None])
        m = (hmask[:, None, :, None] & wmask[None, :, None, :]).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(m, axis=(2, 3)), 1.0)  # [ph, pw]
        fg = feat.reshape(od, ph, pw, H, W)  # channel group per (d, i, j)
        sums = jnp.einsum("dijhw,ijhw->dij", fg, m)
        return sums / cnt[None]

    out = jax.vmap(one_roi)(r)
    return wrap(out)


@register_op("RPN")
def lower_rpn(ctx: LowerCtx, score: TArr, bbox_delta: TArr, im_info: TArr, *rest: TArr):
    """Region proposal network postprocess (rpn_ref.c): decode anchor deltas,
    clip to image, take per_nms_topn by fg score, greedy NMS, emit
    post_nms_topn proposals [N, 4] padded with zeros (fixed-size output for
    jit; the reference's output count is dynamic)."""
    from .detection import padded_nms

    p = ctx.params
    feat_stride = p["feat_stride"]
    anchors = np.asarray(p["anchors"], np.float32)
    if anchors.size == 0:
        # generate from ratios/scales like the reference's prerun
        base = float(p.get("basesize", 16))
        ratios = p.get("ratios") or [0.5, 1.0, 2.0]
        scales = p.get("anchor_scales") or [8.0, 16.0, 32.0]
        gen = []
        for r_ in ratios:
            size = base * base
            ws = math.sqrt(size / r_)
            hs = ws * r_
            for s in scales:
                w2, h2 = ws * s / 2.0, hs * s / 2.0
                cx = (base - 1) / 2.0
                cy = (base - 1) / 2.0
                gen.append([cx - w2, cy - h2, cx + w2, cy + h2])
        anchors = np.asarray(gen, np.float32)
    A = anchors.shape[0]

    sc = as_nchw(score)[0]  # [2A, H, W]
    bd = as_nchw(bbox_delta)[0]  # [4A, H, W]
    _, H, W = sc.shape
    fg = sc[A:].reshape(A, H, W)  # foreground scores

    shift_x = jnp.arange(W) * feat_stride
    shift_y = jnp.arange(H) * feat_stride
    sy, sx = jnp.meshgrid(shift_y, shift_x, indexing="ij")
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1)  # [H, W, 4]
    anc = jnp.asarray(anchors)[:, None, None, :] + shifts[None]  # [A, H, W, 4]

    deltas = bd.reshape(A, 4, H, W).transpose(0, 2, 3, 1)  # [A, H, W, 4]
    aw = anc[..., 2] - anc[..., 0] + 1
    ah = anc[..., 3] - anc[..., 1] + 1
    acx = anc[..., 0] + aw * 0.5
    acy = anc[..., 1] + ah * 0.5
    cx = deltas[..., 0] * aw + acx
    cy = deltas[..., 1] * ah + acy
    w2 = jnp.exp(deltas[..., 2]) * aw
    h2 = jnp.exp(deltas[..., 3]) * ah
    boxes = jnp.stack(
        [cx - w2 * 0.5, cy - h2 * 0.5, cx + w2 * 0.5, cy + h2 * 0.5], axis=-1
    ).reshape(-1, 4)
    scores = fg.reshape(-1)

    im = as_semantic(im_info).reshape(-1)
    im_h, im_w = im[0], im[1]
    boxes = jnp.stack(
        [
            jnp.clip(boxes[:, 0], 0, im_w - 1),
            jnp.clip(boxes[:, 1], 0, im_h - 1),
            jnp.clip(boxes[:, 2], 0, im_w - 1),
            jnp.clip(boxes[:, 3], 0, im_h - 1),
        ],
        axis=1,
    )
    min_size = p.get("min_size", 16)
    keep_size = ((boxes[:, 2] - boxes[:, 0] + 1) >= min_size) & (
        (boxes[:, 3] - boxes[:, 1] + 1) >= min_size
    )
    scores = jnp.where(keep_size, scores, -jnp.inf)

    top = min(p.get("per_nms_topn", 6000), scores.shape[0])
    keep, order = padded_nms(boxes, scores, p.get("nms_thresh", 0.7), top)
    post = p.get("post_nms_topn", 300)
    sel = jnp.where(keep, jnp.arange(top), top)
    sel = jnp.sort(sel)[:post]
    out = jnp.where((sel < top)[:, None], boxes[order[jnp.minimum(sel, top - 1)]], 0.0)
    return wrap(out)


# ---------------------------------------------------------------------------
# misc stragglers
# ---------------------------------------------------------------------------


@register_op("SpaceToBatchND")
def lower_space_to_batch(ctx: LowerCtx, x: TArr):
    p = ctx.params
    xn = as_nhwc(x)
    bh, bw = p["dilation_y"], p["dilation_x"]
    pads = [(p["pad_top"], p["pad_bottom"]), (p["pad_left"], p["pad_right"])]
    n, h, w, c = xn.shape
    xp = jnp.pad(xn, [(0, 0), pads[0], pads[1], (0, 0)])
    hp, wp = xp.shape[1], xp.shape[2]
    out = (
        xp.reshape(n, hp // bh, bh, wp // bw, bw, c)
        .transpose(2, 4, 0, 1, 3, 5)
        .reshape(n * bh * bw, hp // bh, wp // bw, c)
    )
    return nhwc(out)


@register_op("BatchToSpaceND")
def lower_batch_to_space(ctx: LowerCtx, x: TArr):
    p = ctx.params
    xn = as_nhwc(x)
    bh, bw = p["dilation_y"], p["dilation_x"]
    nb, h, w, c = xn.shape
    n = nb // (bh * bw)
    out = (
        xn.reshape(bh, bw, n, h, w, c)
        .transpose(2, 3, 0, 4, 1, 5)
        .reshape(n, h * bh, w * bw, c)
    )
    crops = (p["crop_top"], p["crop_bottom"], p["crop_left"], p["crop_right"])
    out = out[:, crops[0] : out.shape[1] - crops[1], crops[2] : out.shape[2] - crops[3], :]
    return nhwc(out)


@register_op("L2Pool")
def lower_l2pool(ctx: LowerCtx, x: TArr):
    """sqrt(avg(x^2)) pooling (l2pool ref)."""
    p = ctx.params
    xn = as_nhwc(x)
    kh, kw = p["kernel_h"], p["kernel_w"]
    sh, sw = p["stride_h"], p["stride_w"]
    sums = lax.reduce_window(
        jnp.square(xn.astype(jnp.float32)), 0.0, lax.add, (1, kh, kw, 1), (1, sh, sw, 1), "VALID"
    )
    return nhwc(jnp.sqrt(sums / (kh * kw)))


@register_op("Bias")
def lower_bias(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Add per-channel bias vector (bias ref)."""
    b = ctx.weight(1)
    if x.x.ndim == 4:
        shape = [1, 1, 1, 1]
        shape[3 if x.layout == "NHWC" else 1] = b.shape[0]
        return like(x, x.x + b.reshape(shape))
    return like(x, x.x + b)


@register_op("Embedding")
def lower_embedding(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Embedding lookup (embedding ref): indices -> rows of the weight."""
    w = ctx.weight(1)
    idx = as_semantic(x).astype(jnp.int32).reshape(-1)
    out = jnp.take(w, idx, axis=0)
    if ctx.num_inputs > 2:
        out = out + ctx.weight(2)
    return wrap(out)


@register_op("Scatter")
def lower_scatter(ctx: LowerCtx, x: TArr, indices: TArr, updates: TArr):
    axis = ctx.params.get("axis", 0)
    xs = as_semantic(x)
    idx = as_semantic(indices).astype(jnp.int32)
    upd = as_semantic(updates)
    return wrap(_scatter_along(xs, idx, upd, axis))


def _scatter_along(xs, idx, upd, axis):
    # ONNX ScatterElements semantics
    dims = list(range(xs.ndim))
    grids = jnp.meshgrid(*[jnp.arange(s) for s in idx.shape], indexing="ij")
    index_list = []
    for d in dims:
        index_list.append(idx if d == axis else grids[d])
    return xs.at[tuple(index_list)].set(upd)


@register_op("SparseToDense")
def lower_sparse_to_dense(ctx: LowerCtx, indices: TArr, output_shape: TArr, values: TArr, *rest):
    p = ctx.params
    shape = (p["output_shape_size0"],) + (
        (p["output_shape_size1"],) if p.get("output_shape_size1", 0) > 0 else ()
    )
    dense = jnp.full(shape, p.get("default_value", 0), jnp.float32)
    idx = as_semantic(indices).astype(jnp.int32)
    vals = as_semantic(values)
    if len(shape) == 1:
        return wrap(dense.at[idx.reshape(-1)].set(vals.reshape(-1)))
    return wrap(dense.at[idx[:, 0], idx[:, 1]].set(vals.reshape(-1)))


@register_op("DetectionPostProcess")
def lower_detection_postprocess(ctx: LowerCtx, boxes: TArr, scores: TArr, anchors: TArr):
    """TFLite-style SSD postprocess (detection_postprocess ref): decode
    center-size deltas against anchors with the 4 scale factors, per-class
    NMS, fixed-size padded output [1, max_detections, 6]."""
    from .detection import padded_nms

    p = ctx.params
    num_classes = p["num_classes"]
    max_det = p["max_detections"]
    sc = p.get("scales") or [10.0, 10.0, 5.0, 5.0]

    bx = as_semantic(boxes).reshape(-1, 4)  # [P,4] (cy,cx,h,w deltas)
    st = as_semantic(scores).reshape(bx.shape[0], -1)
    an = as_semantic(anchors).reshape(-1, 4)  # [P,4] (cy,cx,h,w)

    ycenter = bx[:, 0] / sc[0] * an[:, 2] + an[:, 0]
    xcenter = bx[:, 1] / sc[1] * an[:, 3] + an[:, 1]
    hh = jnp.exp(bx[:, 2] / sc[2]) * an[:, 2]
    ww = jnp.exp(bx[:, 3] / sc[3]) * an[:, 3]
    decoded = jnp.stack(
        [xcenter - ww / 2, ycenter - hh / 2, xcenter + ww / 2, ycenter + hh / 2], axis=1
    )

    score_th = p.get("nms_score_threshold", 0.0)
    iou_th = p.get("nms_iou_threshold", 0.5)
    k = min(max_det * 4, bx.shape[0])

    def per_class(c):
        s = jnp.where(st[:, c] >= score_th, st[:, c], 0.0)
        keep, order = padded_nms(decoded, s, iou_th, k)
        sc_ = st[order, c]
        valid = keep & (sc_ >= score_th)
        rows = jnp.concatenate(
            [jnp.full((k, 1), c, jnp.float32), sc_[:, None], decoded[order]], axis=1
        )
        return jnp.where(valid[:, None], rows, -jnp.ones((k, 6)))

    ncls = st.shape[1]
    all_rows = jax.vmap(per_class)(jnp.arange(min(num_classes, ncls)))
    flat = all_rows.reshape(-1, 6)
    svals = jnp.where(flat[:, 0] >= 0, flat[:, 1], -1.0)
    top, idx = lax.top_k(svals, min(max_det, flat.shape[0]))
    out = jnp.where((top > 0)[:, None], flat[idx], -1.0)
    return wrap(out[None])


@register_op("SpatialTransformer")
def lower_spatial_transformer(ctx: LowerCtx, x: TArr, theta: TArr):
    """Affine spatial transformer (spatialtransformer ref): 2x3 theta,
    bilinear sampling onto target_shape."""
    p = ctx.params
    th, tw = (p.get("target_shape") or [0, 0])[:2]
    xn = as_nchw(x)
    n, c, h, w = xn.shape
    if th <= 0:
        th, tw = h, w
    t = as_semantic(theta).reshape(n, 2, 3)

    ys = jnp.linspace(-1.0, 1.0, th)
    xs_ = jnp.linspace(-1.0, 1.0, tw)
    gy, gx = jnp.meshgrid(ys, xs_, indexing="ij")
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1), jnp.ones(th * tw)], axis=0)  # [3, thw]

    def sample_one(img, tm):
        src = tm @ grid  # [2, thw]
        sx = (src[0] + 1.0) * (w - 1) / 2.0
        sy = (src[1] + 1.0) * (h - 1) / 2.0
        x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
        y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        wx = sx - x0
        wy = sy - y0
        v = (
            img[:, y0, x0] * (1 - wy) * (1 - wx)
            + img[:, y0, x1] * (1 - wy) * wx
            + img[:, y1, x0] * wy * (1 - wx)
            + img[:, y1, x1] * wy * wx
        )
        return v.reshape(c, th, tw)

    out = jax.vmap(sample_one)(xn, t)
    return nchw(out)


@register_op("FusedBNScaleReLu")
def lower_fused_bn_scale_relu(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Fused BN+Scale+ReLU (op 39): folded per-channel scale/shift then relu;
    consts are [scale, shift] vectors."""
    s = ctx.weight(1)
    b = ctx.weight(2) if ctx.num_inputs > 2 else None
    shape = [1] * x.x.ndim
    cax = 3 if x.layout == "NHWC" else 1
    shape[cax] = s.shape[0]
    out = x.x * s.reshape(shape)
    if b is not None:
        out = out + b.reshape(shape)
    return like(x, jnp.maximum(out, 0.0))


@register_op("Accuracy")
def lower_accuracy(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Training-time op; identity at inference (reference has no kernel)."""
    return x


@register_op("Generic")
def lower_generic(ctx: LowerCtx, *args):
    raise NotImplementedError(
        f"Generic op {ctx.params.get('op_name')!r} requires a custom kernel; "
        "register one with tengine_tpu.register_custom_op"
    )
