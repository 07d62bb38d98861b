"""Pure-JAX op lowerings (the "reference kernel" tier).

Each function lowers one IR node to jax ops during the engine's single trace;
XLA then fuses/schedules the whole graph (there is no per-node dispatch at
runtime, unlike the reference's exec_node loop, cpu_device.c:109-218).

Semantics follow the reference C kernels and shape-inference rules, cited
per-op. These lowerings are registered at SCORE_REF; optimized candidates
(Pallas kernels, quantized MXU paths) register above them in their own
modules and win selection unless Options.force_ref_kernels is set.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .layout import (
    TArr,
    as_nchw,
    as_nhwc,
    as_semantic,
    channel_axis,
    like,
    nchw,
    nhwc,
    semantic_axis,
    semantic_shape,
    wrap,
)
from .registry import SCORE_REF, LowerCtx, register_op
from .qmath import node_is_float
from ..serializer.tm2 import format as tmfmt


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


# fused-SiLU activation code — ours, beyond the reference's 0/1/6 clamp set
# (the reference approximates yolov5 SiLU with OP_HARDSWISH after ONNX
# surgery, yolov5s-opt.py; we fuse the exact x*sigmoid(x))
ACT_SILU = 100


def apply_activation(x: jnp.ndarray, act: int) -> jnp.ndarray:
    """Fused conv/eltwise activation clamp.

    Reference: conv_kernel_ref_fp32.c:112-127 — act 0 => relu, 1 => clamp to
    [-1, 1], 6 => relu6; negative => none. act 100 => SiLU (ours).
    """
    if act is None or act < 0:
        return x
    if act == ACT_SILU:
        return x * jax.nn.sigmoid(x)
    if act == 1:
        return jnp.clip(x, -1.0, 1.0)
    hi = float(act) if act > 0 else None
    x = jnp.maximum(x, 0.0)
    if act > 0:
        x = jnp.minimum(x, hi)
    return x


def compute_dtype(ctx: LowerCtx):
    """Compute dtype for float graphs: "fp32"/"fp32_fast" -> f32 storage
    (they differ in MXU pass count, see mxu_precision), "bf16" -> bfloat16,
    "fp16" -> float16 (reference analog: TENGINE_MODE_FP16 kernels, e.g.
    conv_kernel_ref_fp16.c — on TPU fp16 is storage-only; the MXU still
    accumulates fp32)."""
    if ctx.options.precision == "bf16":
        return jnp.bfloat16
    if ctx.options.precision == "fp16":
        return jnp.float16
    return jnp.float32


def mxu_precision(ctx: LowerCtx):
    """MXU pass configuration for fp32 graphs. The TPU MXU natively multiplies
    bf16; "fp32" semantics need the 3/6-pass decomposition
    (precision=HIGHEST). "fp32_fast" accepts one-pass bf16 inputs with fp32
    accumulation — usually within ~1e-2 of true fp32 and ~3x faster."""
    if ctx.options.precision == "fp32":
        return lax.Precision.HIGHEST
    return lax.Precision.DEFAULT


def _conv_pads(
    in_h: int, in_w: int, p: dict, kh_eff: int, kw_eff: int
) -> List[Tuple[int, int]]:
    """Explicit (lo, hi) padding; negative pads mean TF-SAME
    (convolution.c infer_shape: pad<0 => out=(in-1)/stride+1)."""
    pads = []
    for (p0, p1, k_eff, stride, size) in (
        (p["pad_h0"], p["pad_h1"], kh_eff, p["stride_h"], in_h),
        (p["pad_w0"], p["pad_w1"], kw_eff, p["stride_w"], in_w),
    ):
        if p0 < 0:
            out = (size - 1) // stride + 1
            total = max(0, (out - 1) * stride + k_eff - size)
            pads.append((total // 2, total - total // 2))
        else:
            pads.append((p0, p1))
    return pads


# ---------------------------------------------------------------------------
# convolution family
# ---------------------------------------------------------------------------


@register_op("Convolution", predicate=node_is_float)
def lower_conv(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Conv2D with optional bias and fused activation.

    Reference: param convolution.c:35-196 (shape), conv_kernel_ref_fp32.c
    (numerics incl. activation clamp). Weight is OIHW in the tmfile; we
    pre-transpose to HWIO on the host and run an NHWC conv on the MXU.
    """
    p = ctx.params
    group = p["group"]
    dil_h, dil_w = p["dilation_h"], p["dilation_w"]
    kh_eff = (p["kernel_h"] - 1) * dil_h + 1
    kw_eff = (p["kernel_w"] - 1) * dil_w + 1

    xn = as_nhwc(x)
    n, in_h, in_w, in_c = xn.shape
    pads = _conv_pads(in_h, in_w, p, kh_eff, kw_eff)

    dt = compute_dtype(ctx)
    w = ctx.weight(1, lambda a: np.transpose(a, (2, 3, 1, 0)), tag="hwio")  # OIHW->HWIO
    out = lax.conv_general_dilated(
        xn.astype(dt),
        w.astype(dt),
        window_strides=(p["stride_h"], p["stride_w"]),
        padding=pads,
        rhs_dilation=(dil_h, dil_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=group,
        preferred_element_type=jnp.float32,
        precision=mxu_precision(ctx),
    )
    if ctx.num_inputs > 2:
        out = out + ctx.weight(2).astype(jnp.float32)
    out = apply_activation(out, p.get("activation", -1))
    return nhwc(out.astype(dt) if dt != jnp.float32 else out)


@register_op("Deconvolution")
def lower_deconv(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Transposed conv (deconvolution.c infer_shape):
    out = (in - 1) * stride + out_pad + k_eff - pad0 - pad1.

    Also serves quantized graphs (deconv_ref uint8 semantics): the engine's
    generic wrapper dequantizes the activation and requantizes the output;
    quantized weights/bias are dequantized host-side here."""
    p = ctx.params
    dil_h, dil_w = p["dilation_h"], p["dilation_w"]
    group = p["group"]
    xn = as_nhwc(x)

    # tmfile deconv weight is [in_c, out_c/group, kh, kw] (IOHW). As a
    # forward conv with feature_group_count=g, HWOI needs O=out_c (group-
    # major) and I=in_c/g: reshape the group axis out of I and into O.
    def repack_deconv(a: np.ndarray) -> np.ndarray:
        t_w = ctx.in_tensor(1)
        if t_w.quant is not None and not np.issubdtype(a.dtype, np.floating):
            from . import qmath

            a = qmath.dequantize_np(a, t_w.quant, channel_axis=0)
        in_c, ocg, akh, akw = a.shape
        a = a.reshape(group, in_c // group, ocg, akh, akw)
        a = np.transpose(a, (3, 4, 0, 2, 1))  # kh,kw,g,O/g,I/g
        return a.reshape(akh, akw, group * ocg, in_c // group)

    w = ctx.weight(1, repack_deconv, tag="hwoi")
    kh, kw = w.shape[0], w.shape[1]
    kh_eff = (kh - 1) * dil_h + 1
    kw_eff = (kw - 1) * dil_w + 1
    pad_h = (kh_eff - 1 - p["pad_h0"], kh_eff - 1 - p["pad_h1"] + p.get("output_pad_h0", 0))
    pad_w = (kw_eff - 1 - p["pad_w0"], kw_eff - 1 - p["pad_w1"] + p.get("output_pad_w0", 0))

    dt = compute_dtype(ctx)
    out = lax.conv_general_dilated(
        xn.astype(dt),
        jnp.flip(w, (0, 1)).astype(dt),
        window_strides=(1, 1),
        padding=[pad_h, pad_w],
        lhs_dilation=(p["stride_h"], p["stride_w"]),
        rhs_dilation=(dil_h, dil_w),
        dimension_numbers=("NHWC", "HWOI", "NHWC"),
        feature_group_count=group,
        preferred_element_type=jnp.float32,
        precision=mxu_precision(ctx),
    )
    if ctx.num_inputs > 2:

        def bias_f():
            t_b = ctx.in_tensor(2)
            b = t_b.data
            if t_b.quant is not None and not np.issubdtype(b.dtype, np.floating):
                from . import qmath

                return qmath.dequantize_np(b, t_b.quant, channel_axis=0)
            return b.astype(np.float32)

        out = out + ctx.get_param("bias_deq", bias_f)
    out = apply_activation(out, p.get("activation", -1))
    return nhwc(out)


# ---------------------------------------------------------------------------
# pooling
# ---------------------------------------------------------------------------


def _pool_output_size(size: int, kernel: int, stride: int, pad: int, caffe: int) -> int:
    """pooling_param.h:59-81 calc_output_size."""
    if pad >= 0:
        if caffe == 1:
            out = 2 + (size - kernel + 2 * pad - 1) // stride
            if pad > 0 and (out - 1) * stride >= size + pad:
                out -= 1
            return out
        if caffe == 2:
            return 1 + (size - kernel + pad) // stride
        return 1 + (size - kernel + 2 * pad) // stride
    return 1 + (size - 1) // stride


def _pool_real_pads(out: int, size: int, kernel: int, stride: int, pad_org: int):
    """pooling_param.h:84-104 calc_real_pads."""
    pad_num = max((out - 1) * stride + kernel - size, 0)
    if pad_org < 0:
        return pad_num // 2, pad_num - pad_org
    return pad_org, pad_num - pad_org


@register_op("Pooling")
def lower_pooling(ctx: LowerCtx, x: TArr):
    """Max/avg pool (pooling.c infer_shape + pooling_kernel_ref_fp32.c:95-160).

    Avg divisor: caffe flavors count the window clipped to in+pad (pads
    included); otherwise only valid elements count.
    """
    p = dict(ctx.params)
    xn = as_nhwc(x)
    n, in_h, in_w, c = xn.shape
    caffe_all = p["caffe_flavor"]
    caffe = caffe_all & ~0x10

    glob = p["global_pool"]
    if (
        p["kernel_h"] == in_h
        and p["kernel_w"] == in_w
        and p["pad_h0"] == 0
        and p["pad_h1"] == 0
        and p["pad_w0"] == 0
        and p["pad_w1"] == 0
    ):
        glob = 1
    if glob:
        if p["alg"] == tmfmt.POOL_MAX:
            out = jnp.max(xn, axis=(1, 2), keepdims=True)
        else:
            out = jnp.mean(xn, axis=(1, 2), keepdims=True)
        return nhwc(out)

    kh, kw = p["kernel_h"], p["kernel_w"]
    sh, sw = p["stride_h"], p["stride_w"]
    out_h = _pool_output_size(in_h, kh, sh, p["pad_h0"], caffe_all)
    out_w = _pool_output_size(in_w, kw, sw, p["pad_w0"], caffe_all)
    if caffe != 2:
        ph0, ph1 = _pool_real_pads(out_h, in_h, kh, sh, p["pad_h0"])
        pw0, pw1 = _pool_real_pads(out_w, in_w, kw, sw, p["pad_w0"])
    else:
        ph0 = p["pad_h0"] // 2
        ph1 = p["pad_h0"] - ph0
        pw0 = p["pad_w0"] // 2
        pw1 = p["pad_w0"] - pw0

    pad_cfg = [(0, 0), (ph0, ph1), (pw0, pw1), (0, 0)]
    if p["alg"] == tmfmt.POOL_MAX:
        # init value must match the operand dtype exactly (int8 quantized
        # max-pool runs through here via the quantized-domain shortcut)
        init = (
            -jnp.inf
            if jnp.issubdtype(xn.dtype, jnp.floating)
            else int(jnp.iinfo(xn.dtype).min)
        )
        out = lax.reduce_window(
            xn, jnp.asarray(init, xn.dtype),
            lax.max, (1, kh, kw, 1), (1, sh, sw, 1), pad_cfg,
        )
        return nhwc(out[:, :out_h, :out_w, :])

    sums = lax.reduce_window(
        xn.astype(jnp.float32), 0.0, lax.add, (1, kh, kw, 1), (1, sh, sw, 1), pad_cfg
    )[:, :out_h, :out_w, :]

    # divisor per output position (pooling_kernel_ref_fp32.c:119-141)
    oh = lax.broadcasted_iota(jnp.int32, (out_h, out_w), 0)
    ow = lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1)
    h_start = oh * sh - ph0
    w_start = ow * sw - pw0
    h_end = jnp.minimum(h_start + kh, in_h + ph0)
    w_end = jnp.minimum(w_start + kw, in_w + pw0)
    if caffe_all:
        count = (h_end - h_start) * (w_end - w_start)
    else:
        hs = jnp.maximum(h_start, 0)
        ws = jnp.maximum(w_start, 0)
        he = jnp.minimum(h_end, in_h)
        we = jnp.minimum(w_end, in_w)
        count = (he - hs) * (we - ws)
    out = sums / count.astype(jnp.float32)[None, :, :, None]
    return nhwc(out.astype(xn.dtype))


# ---------------------------------------------------------------------------
# dense / matmul family
# ---------------------------------------------------------------------------


@register_op("FullyConnected", predicate=node_is_float)
def lower_fc(ctx: LowerCtx, x: TArr, *rest: TArr):
    """FC: flatten input to [M, K], weight [N, K] (fc.c infer_shape).
    Output keeps the input rank with trailing 1s in NCHW ([M,N], [M,N,1],
    [M,N,1,1])."""
    xs = as_semantic(x)  # NCHW order so flatten matches reference C-order
    m = xs.shape[0]
    rank = xs.ndim
    xf = xs.reshape(m, -1)
    dt = compute_dtype(ctx)
    w = ctx.weight(1)  # [N, K]
    out = jnp.dot(xf.astype(dt), w.astype(dt).T, preferred_element_type=jnp.float32, precision=mxu_precision(ctx))
    if ctx.num_inputs > 2:
        out = out + ctx.weight(2).astype(jnp.float32)
    n_out = out.shape[1]
    if rank == 3:
        out = out.reshape(m, n_out, 1)
    elif rank == 4:
        out = out.reshape(m, n_out, 1, 1)
    return nchw(out)


@register_op("Gemm")
def lower_gemm(ctx: LowerCtx, a: TArr, b: TArr, *rest: TArr):
    """GEMM: alpha*op(A)op(B) + beta*C (gemm.c)."""
    p = ctx.params
    A = as_semantic(a)
    B = as_semantic(b)
    if p.get("transA"):
        A = A.T
    if p.get("transB"):
        B = B.T
    out = p.get("alpha", 1.0) * jnp.dot(A, B, preferred_element_type=jnp.float32)
    if ctx.num_inputs > 2:
        c = rest[0]
        C = as_semantic(c) if isinstance(c, TArr) else jnp.asarray(c.x)
        out = out + p.get("beta", 1.0) * C
    return wrap(out)


@register_op("MatMul")
def lower_matmul(ctx: LowerCtx, a: TArr, b: TArr):
    """Batched matmul on the MXU; honors Options.precision like conv/FC
    (attention q@k/attn@v paths go through here)."""
    return wrap(
        jnp.matmul(
            as_semantic(a), as_semantic(b),
            preferred_element_type=jnp.float32,
            precision=mxu_precision(ctx),
        )
    )


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


@register_op("BatchNormalization")
def lower_batchnorm(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Inference BN (batchnorm_ref.c:56-105): inputs
    [x, gamma, beta, mean, var]; rf = 1/rescale_factor (0 if unset);
    y = x * s + b with s = 1/sqrt(var*rf + eps), b = -mean*rf*s, then
    gamma/beta unless caffe_flavor."""
    p = ctx.params

    def folded():
        mean = ctx.const_data(3).astype(np.float64)
        var = ctx.const_data(4).astype(np.float64)
        rf = p["rescale_factor"]
        rf = 1.0 / rf if rf else 0.0
        s = 1.0 / np.sqrt(var * rf + p["eps"])
        b = -mean * rf * s
        if not p["caffe_flavor"]:
            gamma = ctx.const_data(1).astype(np.float64)
            beta = ctx.const_data(2).astype(np.float64)
            s, b = gamma * s, gamma * b + beta
        return np.stack([s, b]).astype(np.float32)

    sb = ctx.get_param("bn_sb", folded)
    s, b = sb[0], sb[1]
    cax = channel_axis(x) if x.x.ndim == 4 else (x.x.ndim - 1 if x.x.ndim > 1 else 0)
    shape = [1] * x.x.ndim
    shape[cax if x.x.ndim == 4 else 1 if x.x.ndim > 1 else 0] = s.shape[0]
    if x.x.ndim == 4:
        shape = [1, 1, 1, 1]
        shape[cax] = s.shape[0]
    return like(x, x.x * s.reshape(shape) + b.reshape(shape))


@register_op("Scale")
def lower_scale(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Caffe Scale: per-channel gamma (+ beta) (scale_ref.c)."""
    cax = channel_axis(x) if x.x.ndim == 4 else 1
    shape = [1] * x.x.ndim
    gamma = ctx.weight(1)
    shape[cax] = gamma.shape[0] if gamma.ndim else 1
    out = x.x * gamma.reshape(shape)
    if ctx.num_inputs > 2:
        out = out + ctx.weight(2).reshape(shape)
    return like(x, out)


@register_op("LRN")
def lower_lrn(ctx: LowerCtx, x: TArr):
    """Across-channel LRN (lrn_ref.c:72-96):
    y = x * (1 + alpha/size * sum_{window} x^2)^(-beta)."""
    p = ctx.params
    size = p["local_size"]
    xn = as_nchw(x)
    sq = xn * xn
    half0 = (size - 1) // 2  # window [c-half0, c+half1] like caffe
    half1 = size // 2
    # explicit pad + static shifted slices rather than a channel-axis
    # reduce_window: XLA's TPU space_to_batch_converter mis-rewrites the
    # window-over-features form and aborts the compile (googlenet's 5-wide
    # LRN: "f32[1,56,56,192] is not compatible with f32[1,56,56,188]");
    # the unrolled sum is the same arithmetic and fuses fine.
    C = sq.shape[1]
    sqp = jnp.pad(sq, ((0, 0), (half0, half1), (0, 0), (0, 0)))
    summed = sqp[:, 0:C]
    for d in range(1, size):
        summed = summed + sqp[:, d : d + C]
    out = xn * jnp.power(1.0 + (p["alpha"] / size) * summed, -p["beta"])
    return nchw(out)


@register_op("Normalize")
def lower_normalize(ctx: LowerCtx, x: TArr, *rest: TArr):
    """SSD Normalize: L2 across channels, per-channel scale
    (normalize_ref.c; across_spatial unsupported there too)."""
    xn = as_nhwc(x)
    norm = jax.lax.rsqrt(jnp.sum(xn * xn, axis=3, keepdims=True) + 1e-10)
    out = xn * norm
    if ctx.num_inputs > 1:
        out = out * ctx.weight(1).reshape(1, 1, 1, -1)
    return nhwc(out)


@register_op("L2Normalization")
def lower_l2norm(ctx: LowerCtx, x: TArr):
    """L2-normalize over the channel axis: the reference kernel normalizes
    dims[1] elements (l2normalization_ref.c:115 channel_size = dims[1]),
    i.e. the embedding axis of (N, C) / (N, C, 1, 1) heads."""
    xs = as_semantic(x)
    axis = 1 if xs.ndim > 1 else 0
    norm = jax.lax.rsqrt(jnp.sum(xs * xs, axis=axis, keepdims=True))
    return wrap(xs * norm)


@register_op("InstanceNorm")
def lower_instancenorm(ctx: LowerCtx, x: TArr, *rest: TArr):
    """InstanceNorm over spatial dims (instancenorm_ref.c)."""
    eps = ctx.params.get("eps", 1e-5)
    xn = as_nhwc(x) if x.x.ndim == 4 else x.x
    axes = (1, 2) if x.x.ndim == 4 else tuple(range(2, x.x.ndim))
    mean = jnp.mean(xn, axis=axes, keepdims=True)
    var = jnp.mean((xn - mean) ** 2, axis=axes, keepdims=True)
    out = (xn - mean) * jax.lax.rsqrt(var + eps)
    if ctx.num_inputs > 2:
        gamma = ctx.weight(1).reshape(1, 1, 1, -1)
        beta = ctx.weight(2).reshape(1, 1, 1, -1)
        out = out * gamma + beta
    return nhwc(out) if x.x.ndim == 4 else wrap(out)


@register_op("LayerNorm")
def lower_layernorm(ctx: LowerCtx, x: TArr, *rest: TArr):
    eps = ctx.params.get("eps", 1e-5)
    xs = as_semantic(x)
    mean = jnp.mean(xs, axis=-1, keepdims=True)
    var = jnp.mean((xs - mean) ** 2, axis=-1, keepdims=True)
    out = (xs - mean) * jax.lax.rsqrt(var + eps)
    if ctx.num_inputs > 2:
        out = out * ctx.weight(1) + ctx.weight(2)
    return wrap(out)


@register_op("MVN")
def lower_mvn(ctx: LowerCtx, x: TArr):
    """MVN with the reference's exact normalizer (mvn_ref.c:130-190): the
    denominator is sqrt(E[x^2]) of the RAW input — the second moment, not
    the centered variance — plus eps."""
    p = ctx.params
    xn = as_nchw(x)
    axes = (1, 2, 3) if p["across_channels"] else (2, 3)
    mean = jnp.mean(xn, axis=axes, keepdims=True)
    out = xn - mean
    if p["normalize_variance"]:
        sqmean = jnp.mean(xn * xn, axis=axes, keepdims=True)
        out = out / (jnp.sqrt(sqmean) + p["eps"])
    return nchw(out)


# ---------------------------------------------------------------------------
# activations / elementwise unary
# ---------------------------------------------------------------------------


def _unary_op(fn):
    def lower(ctx: LowerCtx, x: TArr):
        return like(x, fn(x.x))

    return lower


register_op("ReLu6")(_unary_op(lambda x: jnp.clip(x, 0.0, 6.0)))
register_op("ReLU1")(_unary_op(lambda x: jnp.clip(x, -1.0, 1.0)))
register_op("Logistic")(_unary_op(jax.nn.sigmoid))
register_op("Sigmoid")(_unary_op(jax.nn.sigmoid))
register_op("Tanh")(_unary_op(jnp.tanh))
register_op("Absval")(_unary_op(jnp.abs))
register_op("Mish")(_unary_op(lambda x: x * jnp.tanh(jax.nn.softplus(x))))
register_op("Softplus")(_unary_op(jax.nn.softplus))
register_op("Reciprocal")(_unary_op(lambda x: 1.0 / x))
register_op("Ceil")(_unary_op(jnp.ceil))
register_op("Round")(_unary_op(jnp.round))
register_op("ZerosLike")(_unary_op(jnp.zeros_like))
register_op("Gelu")(_unary_op(lambda x: jax.nn.gelu(x, approximate=False)))
register_op("Noop")(_unary_op(lambda x: x))
register_op("Dropout")(_unary_op(lambda x: x))


@register_op("ReLu")
def lower_relu(ctx: LowerCtx, x: TArr):
    """ReLU / LeakyReLU (relu_ref.c): slope 0 => max(0,x)."""
    slope = ctx.params.get("negative_slope", 0.0)
    if slope == 0.0:
        return like(x, jnp.maximum(x.x, 0))
    return like(x, jnp.where(x.x > 0, x.x, x.x * slope))


@register_op("PReLU")
def lower_prelu(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Per-channel PReLU (prelu_ref.c)."""
    slope = ctx.weight(1)
    if x.x.ndim == 4:
        shape = [1, 1, 1, 1]
        shape[channel_axis(x)] = slope.shape[0]
        slope = slope.reshape(shape)
    return like(x, jnp.where(x.x > 0, x.x, x.x * slope))


@register_op("Elu")
def lower_elu(ctx: LowerCtx, x: TArr):
    alpha = ctx.params.get("alpha", 1.0)
    return like(x, jnp.where(x.x > 0, x.x, alpha * (jnp.exp(x.x) - 1.0)))


@register_op("Selu")
def lower_selu(ctx: LowerCtx, x: TArr):
    alpha = ctx.params.get("alpha", 1.6732632)
    lam = ctx.params.get("lambda_", 1.0507010)
    return like(x, lam * jnp.where(x.x > 0, x.x, alpha * (jnp.exp(x.x) - 1.0)))


@register_op("HardSwish")
def lower_hardswish(ctx: LowerCtx, x: TArr):
    """x * clip(alpha*x + beta, 0, 1) (hardswish_ref.c; default alpha=1/6,
    beta=0.5)."""
    alpha = ctx.params.get("alpha", 1.0 / 6.0)
    beta = ctx.params.get("beta", 0.5)
    return like(x, x.x * jnp.clip(alpha * x.x + beta, 0.0, 1.0))


@register_op("Hardsigmoid")
def lower_hardsigmoid(ctx: LowerCtx, x: TArr):
    alpha = ctx.params.get("alpha", 0.2)
    beta = ctx.params.get("beta", 0.5)
    return like(x, jnp.clip(alpha * x.x + beta, 0.0, 1.0))


@register_op("Clip")
def lower_clip(ctx: LowerCtx, x: TArr):
    return like(x, jnp.clip(x.x, ctx.params["min"], ctx.params["max"]))


@register_op("Threshold")
def lower_threshold(ctx: LowerCtx, x: TArr):
    return like(x, (x.x > ctx.params["threshold"]).astype(x.x.dtype))


@register_op("Unary")
def lower_unary(ctx: LowerCtx, x: TArr):
    """Unary op dispatch (unary_param.h type table)."""
    t = ctx.params["type"]
    fns = {
        0: jnp.abs, 1: jnp.negative, 2: jnp.floor, 3: jnp.ceil,
        4: jnp.square, 5: jnp.sqrt, 6: jax.lax.rsqrt, 7: jnp.exp,
        8: jnp.log, 9: jnp.sin, 10: jnp.cos, 11: jnp.tan,
        12: jnp.arcsin, 13: jnp.arccos, 14: jnp.arctan,
        15: lambda v: 1.0 / v, 16: jnp.tanh,
    }
    return like(x, fns[t](x.x))


# ---------------------------------------------------------------------------
# binary / eltwise
# ---------------------------------------------------------------------------


def _bcast_eltwise(x0: jnp.ndarray, x1: jnp.ndarray, layout: Optional[str]):
    """Reference eltwise broadcast rules (eltwise_ref.c:48-120): scalar,
    same-size, per-channel (size == C), or per-plane (size == H*W)."""
    if x0.size == x1.size or x1.size == 1:
        if x0.shape != x1.shape and x0.size == x1.size:
            x1 = x1.reshape(x0.shape)
        return x0, x1
    if x0.ndim == 4:
        n, a, b, c = x0.shape
        C = c if layout == "NHWC" else a
        H, W = (a, b) if layout == "NHWC" else (b, c)
        if x1.size == C:
            shape = [1, 1, 1, C] if layout == "NHWC" else [1, C, 1, 1]
            return x0, x1.reshape(shape)
        if x1.size == H * W:
            shape = [1, H, W, 1] if layout == "NHWC" else [1, 1, H, W]
            return x0, x1.reshape(shape)
    return x0, x1  # fall back to numpy broadcasting


@register_op("Eltwise")
def lower_eltwise(ctx: LowerCtx, x0: TArr, *rest: TArr):
    """Eltwise binary/unary (eltwise_ref.c + eltwise_param.h types)."""
    t = ctx.params["type"]
    f = tmfmt
    unary = {
        f.ELT_RSQRT: jax.lax.rsqrt, f.ELT_LOG: jnp.log, f.ELT_EXP: jnp.exp,
        f.ELT_SQRT: jnp.sqrt, f.ELT_FLOOR: jnp.floor, f.ELT_SQUARE: jnp.square,
    }
    if t in unary:
        return like(x0, unary[t](x0.x))
    if t == f.ELT_POWER:
        # caffe Power layer: (shift + scale*x)^power (eltwise_ref.c:268-272)
        p = ctx.params
        return like(
            x0,
            jnp.power(
                p.get("shift", 0.0) + p.get("scale", 1.0) * x0.x,
                p.get("power", 1.0),
            ),
        )

    if not rest:
        # scalar variants applied with params
        sc = ctx.params.get("scale", 0.0)
        if t == f.ELT_SUM_SCALAR:
            return like(x0, x0.x + sc)
        if t == f.ELT_PROD_SCALAR:
            return like(x0, x0.x * sc)
        if t == f.ELT_SUB_SCALAR:
            return like(x0, x0.x - sc)
        raise NotImplementedError(f"eltwise type {t} with one input")

    x1t = rest[0]
    # align layouts: prefer x0's
    if x0.x.ndim == 4 and x1t.x.ndim == 4 and x1t.layout != x0.layout:
        x1 = as_nhwc(x1t) if x0.layout == "NHWC" else as_nchw(x1t)
    else:
        x1 = x1t.x
    a, b = _bcast_eltwise(x0.x, x1, x0.layout)
    binary = {
        f.ELT_PROD: jnp.multiply, f.ELT_PROD_SCALAR: jnp.multiply,
        f.ELT_SUM: jnp.add, f.ELT_SUM_SCALAR: jnp.add,
        f.ELT_SUB: jnp.subtract, f.ELT_SUB_SCALAR: jnp.subtract,
        f.ELT_MAX: jnp.maximum, f.ELT_MIN_SCALAR: jnp.minimum,
        f.ELT_DIV: jnp.divide, f.ELT_POW: jnp.power,
    }
    if t not in binary:
        raise NotImplementedError(f"eltwise type {t}")
    out = binary[t](a, b)
    # our graph-pass extension (split_concat_conv1x1 moves a conv's fused
    # activation onto the sum node); the reference eltwise has no epilogue
    out = apply_activation(out, ctx.params.get("activation", -1))
    return like(x0, out)


@register_op("BroadMul")
def lower_broadmul(ctx: LowerCtx, x0: TArr, x1: TArr):
    """Broadcast multiply (broadmul_ref.c) — used by SE blocks
    (mobilenet_v3): x0 [N,C,H,W] * x1 [N,C,1,1]."""
    if x0.x.ndim == 4 and x1.x.ndim == 4:
        a = x0.x
        b = as_nhwc(x1) if x0.layout == "NHWC" else as_nchw(x1)
        return like(x0, a * b)
    a, b = _bcast_eltwise(x0.x, x1.x, x0.layout)
    return like(x0, a * b)


register_op("Maximum")(lambda ctx, a, b: like(a, jnp.maximum(a.x, _align(a, b))))
register_op("Minimum")(lambda ctx, a, b: like(a, jnp.minimum(a.x, _align(a, b))))
register_op("SquaredDifference")(
    lambda ctx, a, b: like(a, jnp.square(a.x - _align(a, b)))
)


def _align(a: TArr, b: TArr) -> jnp.ndarray:
    if a.x.ndim == 4 and b.x.ndim == 4 and b.layout != a.layout:
        return as_nhwc(b) if a.layout == "NHWC" else as_nchw(b)
    return b.x


@register_op("Addn")
def lower_addn(ctx: LowerCtx, *xs: TArr):
    out = xs[0].x
    for t in xs[1:]:
        out = out + _align(xs[0], t)
    return like(xs[0], out)


# ---------------------------------------------------------------------------
# softmax / reductions / argmax
# ---------------------------------------------------------------------------


@register_op("Softmax")
def lower_softmax(ctx: LowerCtx, x: TArr):
    axis = semantic_axis(x, ctx.params.get("axis", 1))
    return like(x, jax.nn.softmax(x.x, axis=axis))


@register_op("LogSoftmax")
def lower_logsoftmax(ctx: LowerCtx, x: TArr):
    axis = semantic_axis(x, ctx.params.get("axis", 1))
    return like(x, jax.nn.log_softmax(x.x, axis=axis))


@register_op("ArgMax")
def lower_argmax(ctx: LowerCtx, x: TArr):
    xs = as_semantic(x)
    axis = ctx.params.get("axis", 0)
    out = jnp.argmax(xs, axis=axis).astype(jnp.int32)
    if ctx.params.get("keepdims", 1):
        out = jnp.expand_dims(out, axis)
    return wrap(out)


@register_op("ArgMin")
def lower_argmin(ctx: LowerCtx, x: TArr):
    xs = as_semantic(x)
    axis = ctx.params.get("axis", 0)
    out = jnp.argmin(xs, axis=axis).astype(jnp.int32)
    if ctx.params.get("keepdims", 1):
        out = jnp.expand_dims(out, axis)
    return wrap(out)


@register_op("TopKV2")
def lower_topk(ctx: LowerCtx, x: TArr):
    xs = as_semantic(x)
    values, indices = lax.top_k(xs, ctx.params["k"])
    return wrap(values), wrap(indices.astype(jnp.int32))


@register_op("Reduction")
def lower_reduction(ctx: LowerCtx, x: TArr):
    """Reduction over dims recorded as dim_0..dim_3 (reduction_param.h);
    -2 means unset."""
    p = ctx.params
    xs = as_semantic(x)
    dims = [d for d in (p["dim_0"], p["dim_1"], p["dim_2"], p["dim_3"]) if d not in (-2,)]
    axes = tuple(d % xs.ndim for d in dims) if dims else tuple(range(xs.ndim))
    keep = bool(p.get("keepdim", 0))
    t = p.get("type", 0)
    # Type table matches the reference RUNTIME (reduction_kernel_ref.h type
    # dispatch), which differs from its param-header naming: type 7 is a
    # second asum, type 8 ("l2") computes sum(sqrt(x*x)) == sum(|x|)
    # element-wise — NOT a true L2 norm (l2_4d_ax*, reduction_kernel_ref.h:
    # 3005-3030) — type 9 is log(sum), type 10 logsumexp. Verified against
    # the C engine in tests/test_reference_parity_ops.py.
    _asum = lambda a, axis, keepdims: jnp.sum(jnp.abs(a), axis=axis, keepdims=keepdims)
    fns = {
        0: jnp.sum,
        1: jnp.mean,
        2: _asum,
        3: lambda a, axis, keepdims: jnp.sum(jnp.square(a), axis=axis, keepdims=keepdims),
        4: jnp.max,
        5: jnp.min,
        6: jnp.prod,
        7: _asum,
        8: _asum,  # the reference's "l2" is elementwise sqrt(x^2) summed
        9: lambda a, axis, keepdims: jnp.log(jnp.sum(a, axis=axis, keepdims=keepdims)),
        10: lambda a, axis, keepdims: jnp.log(jnp.sum(jnp.exp(a), axis=axis, keepdims=keepdims)),
    }
    return wrap(fns[t](xs, axis=axes, keepdims=keep))


@register_op("Mean")
def lower_mean(ctx: LowerCtx, *xs: TArr):
    """ONNX Mean: elementwise mean of n inputs (mean_ref.c)."""
    acc = xs[0].x
    for t in xs[1:]:
        acc = acc + _align(xs[0], t)
    return like(xs[0], acc / float(len(xs)))


@register_op("ReduceL2")
def lower_reducel2(ctx: LowerCtx, x: TArr):
    xs = as_semantic(x)
    axis = ctx.params["axis"] % xs.ndim
    out = jnp.sqrt(jnp.sum(jnp.square(xs), axis=axis, keepdims=bool(ctx.params.get("keepdim"))))
    return wrap(out)


# ---------------------------------------------------------------------------
# shape / data-movement ops (layout-sensitive: normalize to NCHW semantics)
# ---------------------------------------------------------------------------


@register_op("Concat")
def lower_concat(ctx: LowerCtx, *xs: TArr):
    axis = ctx.params.get("axis", 1)
    if all(t.x.ndim == 4 for t in xs) and any(t.layout == "NHWC" for t in xs):
        # stay in NHWC, remap the axis
        arrs = [as_nhwc(t) for t in xs]
        return nhwc(jnp.concatenate(arrs, axis={0: 0, 1: 3, 2: 1, 3: 2}[axis % 4]))
    arrs = [as_semantic(t) for t in xs]
    return wrap(jnp.concatenate(arrs, axis=axis))


@register_op("Flatten")
def lower_flatten(ctx: LowerCtx, x: TArr):
    """Flatten dims[axis..end_axis] into one (flatten.c infer_shape:
    output is [n, prod(dims[axis..end_axis])]); end_axis < 0 counts from the
    end (converters write 3 for NCHW; -1 is the caffe default)."""
    xs = as_semantic(x)
    axis = ctx.params.get("axis", 1)
    end_axis = ctx.params.get("end_axis", -1)
    if end_axis < 0:
        end_axis = xs.ndim + end_axis
    mid = 1
    for d in xs.shape[axis : end_axis + 1]:
        mid *= d
    tail = xs.shape[end_axis + 1 :]
    return wrap(xs.reshape(*xs.shape[:axis], mid, *tail))


@register_op("Reshape")
def lower_reshape(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Reshape with caffe/onnx 0/-1 dim semantics (reshape.c infer_shape)."""
    xs = as_semantic(x)
    shape = list(ctx.params.get("shape") or [])
    if not shape and rest:
        sh = ctx.const_data(1)
        if sh is None:
            raise NotImplementedError("dynamic reshape shape input")
        shape = [int(v) for v in np.asarray(sh).reshape(-1)]
    new = []
    for i, d in enumerate(shape):
        if d == 0:
            new.append(xs.shape[i])  # 0 => copy input dim (caffe semantics)
        else:
            new.append(d)
    return wrap(xs.reshape(new))


@register_op("Permute")
def lower_permute(ctx: LowerCtx, x: TArr):
    """Permute with order0..3 (permute.c)."""
    p = ctx.params
    xs = as_semantic(x)
    order = [p["order0"], p["order1"], p["order2"], p["order3"]][: xs.ndim]
    return wrap(jnp.transpose(xs, order))


@register_op("Transpose")
def lower_transpose(ctx: LowerCtx, x: TArr):
    xs = as_semantic(x)
    return wrap(jnp.transpose(xs, ctx.params["perm"]))


@register_op("SwapAxis")
def lower_swapaxis(ctx: LowerCtx, x: TArr):
    xs = as_semantic(x)
    return wrap(jnp.swapaxes(xs, ctx.params["dim_0"], ctx.params["dim_1"]))


@register_op("Squeeze")
def lower_squeeze(ctx: LowerCtx, x: TArr):
    """Squeeze flagged dims (squeeze.c): dim_k == 1 marks axis k for removal;
    all-zero means squeeze all size-1 dims."""
    p = ctx.params
    xs = as_semantic(x)
    flags = [p.get("dim_0", 0), p.get("dim_1", 0), p.get("dim_2", 0), p.get("dim_3", 0)]
    axes = [i for i, f in enumerate(flags[: xs.ndim]) if f == 1 and xs.shape[i] == 1]
    if not axes:
        axes = [i for i, d in enumerate(xs.shape) if d == 1]
    return wrap(jnp.squeeze(xs, axis=tuple(axes)))


@register_op("Unsqueeze")
def lower_unsqueeze(ctx: LowerCtx, x: TArr):
    xs = as_semantic(x)
    for ax in sorted(ctx.params.get("axes") or [0]):
        xs = jnp.expand_dims(xs, ax)
    return wrap(xs)


@register_op("Expanddims")
def lower_expanddims(ctx: LowerCtx, x: TArr):
    return wrap(jnp.expand_dims(as_semantic(x), ctx.params["axis"]))


@register_op("Shape")
def lower_shape(ctx: LowerCtx, x: TArr):
    return wrap(jnp.asarray(semantic_shape(x), jnp.int32))


@register_op("Slice")
def lower_slice(ctx: LowerCtx, x: TArr):
    """Slice: caffe multi-output split along axis via slice_points, or
    onnx/mxnet single range slice (slice.c infer_shape, slice_ref.c)."""
    p = ctx.params
    xs = as_semantic(x)
    axis = p.get("axis", 0) % xs.ndim
    if p.get("iscaffe"):
        points = list(p.get("slice_points") or [])
        size = xs.shape[axis]
        n_out = len(ctx.node.outputs)
        if not points:
            step = size // n_out
            points = [step * (i + 1) for i in range(n_out - 1)]
        starts = [0] + points
        ends = points + [size]
        outs = []
        for s, e in zip(starts, ends):
            idx = [slice(None)] * xs.ndim
            idx[axis] = slice(s, e)
            outs.append(wrap(xs[tuple(idx)]))
        return tuple(outs)
    if p.get("isonnx") or p.get("ismxnet"):
        begins = p.get("begins") or []
        sizes = p.get("sizes") or []
        if begins:
            idx = [slice(None)] * xs.ndim
            for ax, (b, sz) in enumerate(zip(begins, sizes)):
                if sz >= 0:
                    idx[ax] = slice(b, b + sz)
            return wrap(xs[tuple(idx)])
        # scalar begin/end/step on one axis; end <= 0 means size + end
        # (slice_ref.c onnx_run:stop_k = end > 0 ? end : dims[k] + end)
        b, e, st = p.get("begin", 0), p.get("end", 0), p.get("step", 1) or 1
        size = xs.shape[axis]
        e = e if e > 0 else size + e
        idx = [slice(None)] * xs.ndim
        idx[axis] = slice(b, min(e, size), st)
        return wrap(xs[tuple(idx)])
    # tflite-style: begins/sizes vectors
    begins = p.get("begins") or [0] * xs.ndim
    sizes = p.get("sizes") or list(xs.shape)
    idx = tuple(
        slice(b, (b + sz) if sz >= 0 else None) for b, sz in zip(begins, sizes)
    )
    return wrap(xs[idx])


@register_op("Split")
def lower_split(ctx: LowerCtx, x: TArr):
    p = ctx.params
    xs = as_semantic(x)
    axis = p.get("axis", 0) % xs.ndim
    n_out = len(ctx.node.outputs)
    sizes = list(p.get("split_sizes") or [])
    if sizes:
        points = np.cumsum(sizes)[:-1].tolist()
        parts = jnp.split(xs, points, axis=axis)
    else:
        parts = jnp.split(xs, n_out, axis=axis)
    return tuple(wrap(a) for a in parts)


@register_op("StridedSlice")
def lower_strided_slice(ctx: LowerCtx, x: TArr):
    """NCHW strided slice with the reference's crop semantics
    (strided_slice.c infer_shape + strided_slice_ref.c:67): per dim,
    out = ceil((in - |end - begin|) / stride) elements taken at
    begin + k*stride — `end - begin` is a total crop amount, NOT an
    exclusive end index (this is how the TFLite converter encodes it;
    begin=end=0 stride=2 is the yolov5 focus slice)."""
    p = ctx.params
    xs = as_semantic(x)
    idx = []
    for dim, (b, e, s) in enumerate(
        [
            (p["begin_n"], p["end_n"], p["stride_n"]),
            (p["begin_c"], p["end_c"], p["stride_c"]),
            (p["begin_h"], p["end_h"], p["stride_h"]),
            (p["begin_w"], p["end_w"], p["stride_w"]),
        ][: xs.ndim]
    ):
        size = xs.shape[dim]
        s = s or 1
        out = max(1, -(-(size - abs(e - b)) // s))
        idx.append(slice(b, b + (out - 1) * s + 1, s))
    return wrap(xs[tuple(idx)])


@register_op("Crop")
def lower_crop(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Caffe Crop (crop_ref.c / crop.c infer_shape): crop x to the spatial
    size of the reference input (or crop_h/crop_w), starting at offsets."""
    p = ctx.params
    xs = as_nchw(x)
    n, c, h, w = xs.shape
    if p.get("crop_h") and p.get("crop_w"):
        th, tw = p["crop_h"], p["crop_w"]
    elif rest:
        ref_shape = semantic_shape(rest[0])
        th, tw = ref_shape[2], ref_shape[3]
    else:
        th, tw = h, w
    if p.get("center_crop"):
        oh, ow = (h - th) // 2, (w - tw) // 2
    else:
        oh = p.get("offset_h", 0)
        ow = p.get("offset_w", 0)
    return nchw(xs[:, :, oh : oh + th, ow : ow + tw])


@register_op("Pad")
def lower_pad(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Pad NCHW (pad.c): mode 0=constant 1=edge 2=reflect."""
    p = ctx.params
    xs = as_nchw(x) if x.x.ndim == 4 else as_semantic(x)
    pads = [
        (p["pad_n_0"], p["pad_n_1"]),
        (p["pad_c_0"], p["pad_c_1"]),
        (p["pad_h_0"], p["pad_h_1"]),
        (p["pad_w_0"], p["pad_w_1"]),
    ][: xs.ndim]
    pads = [(max(a, 0), max(b, 0)) for a, b in pads]
    mode = {0: "constant", 1: "edge", 2: "reflect"}[p.get("mode", 0)]
    if mode == "constant":
        out = jnp.pad(xs, pads, mode="constant", constant_values=p.get("value", 0.0))
    else:
        out = jnp.pad(xs, pads, mode=mode)
    return nchw(out) if x.x.ndim == 4 else wrap(out)


@register_op("ShuffleChannel")
def lower_shufflechannel(ctx: LowerCtx, x: TArr):
    """Channel shuffle (shufflechannel_ref.c): [N,g,C/g,...] transpose."""
    g = ctx.params["group"]
    if x.layout == "NHWC":
        n, h, w, c = x.x.shape
        out = x.x.reshape(n, h, w, g, c // g).swapaxes(3, 4).reshape(n, h, w, c)
        return nhwc(out)
    n, c, h, w = x.x.shape
    out = x.x.reshape(n, g, c // g, h, w).swapaxes(1, 2).reshape(n, c, h, w)
    return nchw(out)


@register_op("ChannelGather")
def lower_channel_gather(ctx: LowerCtx, x: TArr):
    """Static channel gather (graph/passes.py:fold_shuffle_gathers) — the
    materialized residue of a folded shuffle+slice chain."""
    import numpy as _np

    idx = _np.asarray(ctx.params["indices"], _np.int32)
    if x.layout == "NHWC":
        return nhwc(x.x[..., idx])
    xs = as_semantic(x)
    return wrap(xs[:, idx])


@register_op("SpaceToDepth")
def lower_space_to_depth(ctx: LowerCtx, x: TArr):
    """mode DCR (ONNX): channel order (dy, dx, c); mode CRD (default,
    torch pixel_unshuffle — matches the DepthToSpace default so the pair
    round-trips; the reference's own kernel is a memcpy stub,
    spacetodepth_ref.c, so there is no C-runtime constraint here).
    The NCHW branch matters:
    transposing to NHWC first makes XLA materialize the 6-D shuffle as
    three relayout copies (~14% of yolov5s stem time); in the source layout
    it folds into the consuming conv."""
    bs = ctx.params["block_size"]
    crd = ctx.params.get("mode", "CRD") == "CRD"
    if x.layout != "NHWC":
        xs = x.x
        n, c, h, w = xs.shape
        v = xs.reshape(n, c, h // bs, bs, w // bs, bs)
        v = v.transpose(0, 1, 3, 5, 2, 4) if crd else v.transpose(0, 3, 5, 1, 2, 4)
        return nchw(v.reshape(n, c * bs * bs, h // bs, w // bs))
    xn = x.x
    n, h, w, c = xn.shape
    v = xn.reshape(n, h // bs, bs, w // bs, bs, c)
    v = v.transpose(0, 5, 2, 4, 1, 3) if crd else v.transpose(0, 2, 4, 5, 1, 3)
    return nchw(v.reshape(n, bs * bs * c, h // bs, w // bs))


@register_op("DepthToSpace")
def lower_depth_to_space(ctx: LowerCtx, x: TArr):
    """Inverse of SpaceToDepth; mode CRD = torch pixel_shuffle. Default is
    CRD because that is what the reference runtime computes for tmfile
    graphs (depthtospace_ref.c hardcodes the CRD index map; the DCR branch
    is commented out there). ONNX-imported graphs carry an explicit mode."""
    bs = ctx.params["block_size"]
    crd = ctx.params.get("mode", "CRD") == "CRD"
    xn = as_nhwc(x)
    n, h, w, c = xn.shape
    c2 = c // (bs * bs)
    if crd:
        out = xn.reshape(n, h, w, c2, bs, bs).transpose(0, 1, 4, 2, 5, 3)
    else:
        out = xn.reshape(n, h, w, bs, bs, c2).transpose(0, 1, 3, 2, 4, 5)
    return nhwc(out.reshape(n, h * bs, w * bs, c2))


@register_op("Reorg")
def lower_reorg(ctx: LowerCtx, x: TArr):
    """YOLO reorg with darknet's inverse ("backward") index map, which the
    reference replicates exactly (reorg_ref.c:out_data[in_index] =
    in_data[out_index]): for each INPUT element at (b, k, j, i) of the
    (n, c_out*s*s, h_out, w_out)-shaped output, the value comes from input
    position (b, k % c_out, j*s + (k//c_out) % s ... ) — equivalently, the
    output is the gather below. Verified vs the C engine (parity suite)."""
    s = ctx.params["stride"]
    xs = as_nchw(x)
    n, c, h, w = xs.shape
    oc = c // (s * s)
    # reorg_ref.c:44-60 — a flat-buffer reinterpretation dance:
    #   out_flat[(k*h + j)*w + i] = in_flat[(c2*(h*s) + h2)*(w*s) + w2]
    # with k<c, j<h, i<w, c2 = k % oc, off = k // oc,
    # h2 = j*s + off//s, w2 = i*s + off%s; the result buffer is then READ
    # as (n, c*s*s, h//s, w//s). Equivalent gather below.
    xv = xs.reshape(n, oc, h * s, w * s)
    k = jnp.arange(c)
    c2 = k % oc
    off = k // oc
    j = jnp.arange(h)
    i = jnp.arange(w)
    h2 = j[None, :] * s + (off // s)[:, None]  # [c, h]
    w2 = i[None, :] * s + (off % s)[:, None]  # [c, w]
    tmp = xv[:, c2[:, None, None], h2[:, :, None], w2[:, None, :]]  # (n,c,h,w)
    return nchw(tmp.reshape(n, c * s * s, h // s, w // s))


@register_op("Tile")
def lower_tile(ctx: LowerCtx, x: TArr):
    """Tile with the reference's conventions (tile_ref.c): `reps` is stored
    reversed (reps[0] repeats W, reps[-1] repeats N); frame_flag 0 (caffe)
    repeats each ELEMENT along the axis (np.repeat), frame_flag 1 (onnx)
    tiles whole blocks (np.tile)."""
    reps = list(ctx.params.get("reps") or [])
    xs = as_semantic(x)
    if not reps:
        return wrap(xs)
    reps = reps[::-1]
    reps = [1] * (xs.ndim - len(reps)) + reps if len(reps) < xs.ndim else reps[-xs.ndim:]
    if ctx.params.get("frame_flag", 0) == 0:  # caffe: per-element repeat
        for ax, r in enumerate(reps):
            if r != 1:
                xs = jnp.repeat(xs, r, axis=ax)
        return wrap(xs)
    return wrap(jnp.tile(xs, reps))


@register_op("Expand")
def lower_expand(ctx: LowerCtx, x: TArr, *rest: TArr):
    shape = list(ctx.params.get("shape") or [])
    if not shape and rest and ctx.const_data(1) is not None:
        shape = [int(v) for v in np.asarray(ctx.const_data(1)).reshape(-1)]
    xs = as_semantic(x)
    return wrap(jnp.broadcast_to(xs, np.broadcast_shapes(tuple(shape), xs.shape)))


@register_op("Gather")
def lower_gather(ctx: LowerCtx, x: TArr, *rest: TArr):
    p = ctx.params
    xs = as_semantic(x)
    axis = p.get("axis", 0)
    if rest and rest[0] is not None:
        idx = as_semantic(rest[0]).astype(jnp.int32)
    else:
        idx = jnp.asarray(ctx.const_data(1), jnp.int32)
    return wrap(jnp.take(xs, idx, axis=axis))


@register_op("Cast")
def lower_cast(ctx: LowerCtx, x: TArr):
    from ..graph.ir import DType

    to = DType(ctx.params["type_to"])
    return like(x, x.x.astype(to.np))


@register_op("Comparison")
def lower_comparison(ctx: LowerCtx, a: TArr, b: TArr):
    t = ctx.params["type"]
    fns = {0: jnp.equal, 1: jnp.not_equal, 2: jnp.greater,
           3: jnp.greater_equal, 4: jnp.less, 5: jnp.less_equal}
    return like(a, fns[t](a.x, _align(a, b)).astype(jnp.float32))


@register_op("Logical")
def lower_logical(ctx: LowerCtx, a: TArr, *rest: TArr):
    t = ctx.params["type"]
    if t == 2:  # NOT
        return like(a, (a.x == 0).astype(jnp.float32))
    b = _align(a, rest[0])
    fns = {0: jnp.logical_and, 1: jnp.logical_or}
    return like(a, fns[t](a.x != 0, b != 0).astype(jnp.float32))


@register_op("Reverse")
def lower_reverse(ctx: LowerCtx, x: TArr, *rest: TArr):
    xs = as_semantic(x)
    axis = 0
    if rest and ctx.const_data(1) is not None:
        axis = int(np.asarray(ctx.const_data(1)).reshape(-1)[0])
    return wrap(jnp.flip(xs, axis=axis))


@register_op("Where")
def lower_where(ctx: LowerCtx, cond: TArr, a: TArr, b: TArr):
    return like(a, jnp.where(cond.x != 0, a.x, _align(a, b)))


# ---------------------------------------------------------------------------
# resize / upsample
# ---------------------------------------------------------------------------


def _resize_nhwc(xn: jnp.ndarray, out_h: int, out_w: int, method: str) -> jnp.ndarray:
    n, h, w, c = xn.shape
    if method == "nearest":
        # match the reference's scale-floor indexing (upsample_ref.c:
        # in_idx = floor(out_idx / scale))
        scale_h, scale_w = out_h / h, out_w / w
        rows = jnp.floor(jnp.arange(out_h) / scale_h).astype(jnp.int32)
        cols = jnp.floor(jnp.arange(out_w) / scale_w).astype(jnp.int32)
        return xn[:, rows][:, :, cols]
    # bilinear, half-pixel centers align with the reference interp
    # (interp_ref.c uses align_corners=false caffe style)
    return jax.image.resize(xn, (n, out_h, out_w, c), method="bilinear")


@register_op("Upsample")
def lower_upsample(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Nearest upsample by integer scale (upsample_ref.c)."""
    scale = ctx.params.get("scale", 2.0)
    xn = as_nhwc(x)
    n, h, w, c = xn.shape
    return nhwc(_resize_nhwc(xn, int(h * scale), int(w * scale), "nearest"))


@register_op("Interp")
def lower_interp(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Interp resize (interp_ref.c): resize_type 1=nearest 2=bilinear."""
    p = ctx.params
    xn = as_nhwc(x)
    n, h, w, c = xn.shape
    out_h, out_w = p.get("output_height", 0), p.get("output_width", 0)
    if out_h <= 0 or out_w <= 0:
        out_h = int(h * p.get("height_scale", 1.0))
        out_w = int(w * p.get("width_scale", 1.0))
    method = "nearest" if p.get("resize_type", 2) == 1 else "bilinear"
    return nhwc(_resize_nhwc(xn, out_h, out_w, method))


@register_op("Resize")
@register_op("BilinearResize")
def lower_resize(ctx: LowerCtx, x: TArr, *rest: TArr):
    """Resize (resize.c): type 0=nearest, else bilinear; scales from param."""
    p = ctx.params
    xn = as_nhwc(x)
    n, h, w, c = xn.shape
    out_h = int(h * p.get("scale_y", p.get("scale_x", 1.0)))
    out_w = int(w * p.get("scale_x", 1.0))
    method = "nearest" if p.get("type", 0) == 0 else "bilinear"
    return nhwc(_resize_nhwc(xn, out_h, out_w, method))
