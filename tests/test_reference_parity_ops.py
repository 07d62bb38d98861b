"""Broad per-op parity vs the REAL reference C engine.

The reference validates every operator against ONNX golden fixtures
(142 cases under /root/reference/tests/op/, SURVEY §4). We go one better:
each case here builds a single-op graph, serializes it with our TM2 writer,
executes it in the reference's own C kernels (libtengine-lite.so via
pytengine), and requires our XLA lowering to agree. One table row ≈ one
reference tests/op case; sub-typed ops (Unary×17, Eltwise×16, Reduction×10,
Comparison×6, …) enumerate every type the C kernel implements.

The C library builds on demand (conftest.ensure_reference_lib), so this
runs in a stock pytest invocation.
"""

import numpy as np
import pytest

from test_reference_parity import (  # noqa: F401 — shared oracle helpers
    _op_graph,
    _ours_multi,
    _save,
    run_reference_multi,
)

from tengine_tpu.serializer.tm2 import format as fmt


@pytest.fixture(scope="module", autouse=True)
def _need_ref(ref_lib):
    """Every test in this module drives the real C engine."""


def _pos(a):  # strictly positive inputs (sqrt/log/rsqrt/reciprocal/pow)
    return np.abs(a) + 0.5


def _unit(a):  # inputs in (-1, 1) for asin/acos
    return np.tanh(a) * 0.99


def _binmask(a):  # {0,1} inputs for logical ops
    return (a > 0).astype(np.float32)


# (op, params, in_shapes, consts, input_transform, tolerance)
CASES = {}


def case(name, op, params, in_shapes, consts=None, xform=None, tol=1e-5):
    assert name not in CASES, name
    CASES[name] = (op, params, in_shapes, consts, xform, tol)


# --- Unary: every type the C kernel implements (unary_kernel_ref_fp32.c
# cases 0-16) -----------------------------------------------------------
_UNARY_XF = {5: _pos, 6: _pos, 8: _pos, 11: _unit, 12: _unit, 13: _unit, 15: _pos}
for t, uname in fmt.UNARY_NAMES.items():
    case(
        f"unary_{uname}", "Unary", dict(type=t), [(1, 4, 5, 6)],
        xform=_UNARY_XF.get(t), tol=1e-4 if uname in ("tan", "exp") else 1e-5,
    )

# --- Eltwise: binary, unary and scalar variants (eltwise_ref.c) ---------
for t, ename in [
    (fmt.ELT_SUM, "sum"), (fmt.ELT_SUB, "sub"), (fmt.ELT_PROD, "prod"),
    (fmt.ELT_MAX, "max"), (fmt.ELT_DIV, "div"),
]:
    case(f"eltwise_{ename}", "Eltwise",
         dict(type=t, caffe_flavor=0, shift=0.0, power=1.0, scale=1.0),
         [(1, 4, 5, 5), (1, 4, 5, 5)], xform=_pos if ename == "div" else None)
case("eltwise_pow", "Eltwise",
     dict(type=fmt.ELT_POW, caffe_flavor=0, shift=0.0, power=1.0, scale=1.0),
     [(1, 4, 5, 5), (1, 4, 5, 5)], xform=_pos, tol=1e-4)
for t, ename in [
    (fmt.ELT_RSQRT, "rsqrt"), (fmt.ELT_LOG, "log"), (fmt.ELT_SQRT, "sqrt"),
]:
    case(f"eltwise_{ename}", "Eltwise",
         dict(type=t, caffe_flavor=0, shift=0.0, power=1.0, scale=1.0),
         [(1, 4, 5, 5)], xform=_pos)
for t, ename in [
    (fmt.ELT_EXP, "exp"), (fmt.ELT_FLOOR, "floor"), (fmt.ELT_SQUARE, "square"),
]:
    case(f"eltwise_{ename}", "Eltwise",
         dict(type=t, caffe_flavor=0, shift=0.0, power=1.0, scale=1.0),
         [(1, 4, 5, 5)])
# per-channel broadcast (size == C) — the caffe eltwise broadcast tier
case("eltwise_sum_bcast_c", "Eltwise",
     dict(type=fmt.ELT_SUM, caffe_flavor=0, shift=0.0, power=1.0, scale=1.0),
     [(1, 6, 4, 4), (6,)])

# --- Reduction: all 11 runtime types (reduction_kernel_ref.h dispatch;
# note 7 duplicates asum and 8 "l2" is sum(sqrt(x^2)) there) --------------
for t, rname in fmt.REDUCE_NAMES.items():
    case(f"reduce_{rname}", "Reduction",
         dict(dim_0=1, dim_1=-2, dim_2=-2, dim_3=-2, type=t, keepdim=1),
         [(1, 4, 3, 3)], xform=_pos if rname in ("logsum", "prod") else None,
         tol=1e-4)
case("reduce_all_dims", "Reduction",
     dict(dim_0=-2, dim_1=-2, dim_2=-2, dim_3=-2, type=0, keepdim=0),
     [(1, 4, 3, 3)], tol=1e-4)

# --- Comparison (comparison.c types 0-5) --------------------------------
for t, cname in enumerate(["eq", "ne", "gt", "ge", "lt", "le"]):
    case(f"comparison_{cname}", "Comparison", dict(type=t),
         [(1, 3, 4, 4), (1, 3, 4, 4)], xform=_binmask)

# --- simple activations / unaries (one C kernel dir each) ---------------
case("ceil", "Ceil", {}, [(1, 4, 5, 5)])
case("round", "Round", {}, [(1, 4, 5, 5)])
case("elu", "Elu", dict(alpha=0.7), [(1, 4, 5, 5)])
case("selu", "Selu", dict(alpha=1.67326, lambda_=1.0507), [(1, 4, 5, 5)])
case("hardsigmoid", "Hardsigmoid", dict(alpha=0.2, beta=0.5), [(1, 4, 5, 5)])
case("threshold", "Threshold", dict(threshold=0.1), [(1, 4, 5, 5)])
case("softplus", "Softplus", {}, [(1, 4, 5, 5)])
case("reciprocal", "Reciprocal", {}, [(1, 4, 5, 5)], xform=_pos)
case("gelu", "Gelu", {}, [(1, 4, 5, 5)])
case("logsoftmax", "LogSoftmax", dict(axis=1), [(1, 10, 2, 2)])
case("relu_slope0", "ReLu", dict(negative_slope=0.0), [(1, 4, 5, 5)])
case("dropout_noop", "Dropout", {}, [(1, 4, 5, 5)])

# --- binary / n-ary elementwise ops --------------------------------------
case("maximum", "Maximum", {}, [(1, 4, 5, 5), (1, 4, 5, 5)])
case("mean2", "Mean", {}, [(1, 4, 5, 5), (1, 4, 5, 5)])
case("squareddifference", "SquaredDifference", {}, [(1, 4, 5, 5), (1, 4, 5, 5)])
case("zeroslike", "ZerosLike", {}, [(1, 4, 5, 5)])
case("broadmul", "BroadMul", {}, [(1, 4, 5, 5), (1, 4, 1, 1)])
case("matmul_2d", "MatMul", {}, [(8, 12), (12, 6)])
case("matmul_batched", "MatMul", {}, [(2, 8, 12), (2, 12, 6)], tol=1e-4)

# --- shape / data movement ------------------------------------------------
case("squeeze_hw", "Squeeze", dict(dim_0=0, dim_1=0, dim_2=1, dim_3=1),
     [(2, 4, 1, 1)])
case("unsqueeze", "Unsqueeze", dict(axes=[0]), [(4, 5, 5)])
case("transpose", "Transpose", dict(perm=[0, 3, 1, 2]), [(1, 3, 4, 5)])
case("depthtospace", "DepthToSpace", dict(block_size=2), [(1, 8, 3, 3)])
case("reorg_s2", "Reorg", dict(stride=2), [(1, 4, 6, 6)])
# symmetric pads only: the reference kernel reuses `left`/`top` for both
# sides of the center fill (pad_ref.c), corrupting asymmetric pads
case("pad_const", "Pad",
     dict(pad_n_0=0, pad_n_1=0, pad_c_0=0, pad_c_1=0, pad_h_0=1, pad_h_1=1,
          pad_w_0=2, pad_w_1=2, mode=0, value=0.5), [(1, 3, 4, 4)])
# TM2 strided-slice crop encoding: |end-begin| = total cropped, elements
# taken at begin + k*stride (strided_slice.c infer_shape)
case("strided_slice", "StridedSlice",
     dict(begin_n=0, end_n=0, stride_n=1, begin_c=0, end_c=0, stride_c=2,
          begin_h=1, end_h=1, stride_h=2, begin_w=0, end_w=0, stride_w=3),
     [(1, 4, 6, 6)])
case("strided_slice_crop", "StridedSlice",
     dict(begin_n=0, end_n=0, stride_n=1, begin_c=1, end_c=3, stride_c=1,
          begin_h=0, end_h=0, stride_h=1, begin_w=2, end_w=4, stride_w=1),
     [(1, 4, 6, 6)])
# caffe crop takes a reference blob as second input
case("crop_2in", "Crop",
     dict(num_args=2, offset_c=0, offset_h=1, offset_w=2, crop_h=0, crop_w=0,
          center_crop=0, axis=2, flag=0), [(1, 3, 6, 7), (1, 3, 3, 3)])
case("slice_onnx", "Slice",
     dict(axis=1, slice_points=[], begins=[], sizes=[],
          iscaffe=0, ismxnet=0, isonnx=1, begin=1, end=3, step=1),
     [(1, 4, 4, 4)])
case("resize_nearest", "Resize", dict(scale_x=2.0, scale_y=2.0, type=0),
     [(1, 3, 4, 4)])
case("upsample_x3", "Upsample", dict(scale=3.0), [(1, 2, 3, 3)])

# --- normalization family -------------------------------------------------
case("lrn_across", "LRN",
     dict(local_size=5, alpha=1e-4, beta=0.75, norm_region=0, k=2.0, bias=1.0),
     [(1, 8, 4, 4)], tol=1e-4)
# mvn: the C kernel accumulates mean/var serially in fp32 — looser tol
case("mvn_spatial", "MVN",
     dict(across_channels=0, normalize_variance=1, eps=1e-9), [(1, 3, 6, 6)],
     tol=1e-3)
case("mvn_channels", "MVN",
     dict(across_channels=1, normalize_variance=1, eps=1e-9), [(1, 3, 6, 6)],
     tol=1e-3)
case("l2normalization", "L2Normalization", {}, [(1, 8, 1, 1)], tol=1e-4)

# --- consts-bearing ops -----------------------------------------------------
case("scale_gamma", "Scale", dict(axis=1, num_axes=1, bias_term=0),
     [(1, 4, 5, 5)], consts=[lambda r: r.standard_normal(4).astype(np.float32)])
case("scale_gamma_beta", "Scale", dict(axis=1, num_axes=1, bias_term=1),
     [(1, 4, 5, 5)],
     consts=[lambda r: r.standard_normal(4).astype(np.float32),
             lambda r: r.standard_normal(4).astype(np.float32)])
case("instancenorm", "InstanceNorm", dict(eps=1e-5), [(1, 4, 6, 6)],
     consts=[lambda r: r.standard_normal(4).astype(np.float32),
             lambda r: r.standard_normal(4).astype(np.float32)], tol=1e-4)
case("normalize_ssd", "Normalize", dict(across_spatial=0, channel_shared=0),
     [(1, 4, 3, 3)],
     consts=[lambda r: (np.abs(r.standard_normal(4)) + 0.5).astype(np.float32)],
     tol=1e-4)
case("fc_bias", "FullyConnected", dict(num_output=7),
     [(2, 3, 4, 4)],
     consts=[lambda r: r.standard_normal((7, 48)).astype(np.float32),
             lambda r: r.standard_normal((7,)).astype(np.float32)], tol=1e-4)
case("deconv_s2", "Deconvolution",
     dict(num_output=4, kernel_h=3, kernel_w=3, stride_h=2, stride_w=2,
          pad_h0=1, pad_w0=1, pad_h1=1, pad_w1=1, dilation_h=1, dilation_w=1,
          group=1, activation=-1, output_pad_h0=0, output_pad_w0=0),
     [(1, 3, 5, 5)],
     consts=[lambda r: r.standard_normal((3, 4, 3, 3)).astype(np.float32)],
     tol=1e-4)
case("deconv_group", "Deconvolution",
     dict(num_output=4, kernel_h=2, kernel_w=2, stride_h=2, stride_w=2,
          pad_h0=0, pad_w0=0, pad_h1=0, pad_w1=0, dilation_h=1, dilation_w=1,
          group=2, activation=-1, output_pad_h0=0, output_pad_w0=0),
     [(1, 4, 5, 5)],
     consts=[lambda r: r.standard_normal((4, 2, 2, 2)).astype(np.float32)],
     tol=1e-4)

# --- convolution / pooling variants beyond the smoke cases -----------------
case("conv_dilated", "Convolution",
     dict(kernel_h=3, kernel_w=3, stride_h=1, stride_w=1, dilation_h=2,
          dilation_w=2, input_channel=3, output_channel=5, group=1,
          activation=-1, pad_h0=2, pad_w0=2, pad_h1=2, pad_w1=2),
     [(1, 3, 9, 9)],
     consts=[lambda r: r.standard_normal((5, 3, 3, 3)).astype(np.float32)],
     tol=1e-4)
case("conv_1x1", "Convolution",
     dict(kernel_h=1, kernel_w=1, stride_h=1, stride_w=1, dilation_h=1,
          dilation_w=1, input_channel=6, output_channel=8, group=1,
          activation=0, pad_h0=0, pad_w0=0, pad_h1=0, pad_w1=0),
     [(1, 6, 5, 5)],
     consts=[lambda r: r.standard_normal((8, 6, 1, 1)).astype(np.float32)],
     tol=1e-4)
case("conv_rect_kernel", "Convolution",
     dict(kernel_h=1, kernel_w=5, stride_h=1, stride_w=1, dilation_h=1,
          dilation_w=1, input_channel=3, output_channel=4, group=1,
          activation=-1, pad_h0=0, pad_w0=2, pad_h1=0, pad_w1=2),
     [(1, 3, 6, 8)],
     consts=[lambda r: r.standard_normal((4, 3, 1, 5)).astype(np.float32)],
     tol=1e-4)
case("pool_global_avg", "Pooling",
     dict(alg=1, kernel_h=0, kernel_w=0, stride_h=1, stride_w=1,
          global_pool=1, caffe_flavor=0, pad_h0=0, pad_w0=0, pad_h1=0, pad_w1=0),
     [(1, 6, 7, 7)])
case("pool_global_max", "Pooling",
     dict(alg=0, kernel_h=0, kernel_w=0, stride_h=1, stride_w=1,
          global_pool=1, caffe_flavor=0, pad_h0=0, pad_w0=0, pad_h1=0, pad_w1=0),
     [(1, 6, 7, 7)])
case("pool_max_pad", "Pooling",
     dict(alg=0, kernel_h=3, kernel_w=3, stride_h=2, stride_w=2,
          global_pool=0, caffe_flavor=0, pad_h0=1, pad_w0=1, pad_h1=1, pad_w1=1),
     [(1, 3, 7, 7)])
case("pool_avg_nopad", "Pooling",
     dict(alg=1, kernel_h=2, kernel_w=2, stride_h=2, stride_w=2,
          global_pool=0, caffe_flavor=0, pad_h0=0, pad_w0=0, pad_h1=0, pad_w1=0),
     [(1, 3, 8, 8)])

# --- misc -------------------------------------------------------------------
case("addn", "Addn", dict(axis=0), [(1, 3, 4, 4), (1, 3, 4, 4), (1, 3, 4, 4)])
case("clip_asym", "Clip", dict(min=-0.2, max=0.7), [(1, 4, 5, 5)])
case("softmax_axis2", "Softmax", dict(axis=2), [(1, 3, 6, 2)])
# flatten: the reference infer_shape hardcodes dims[0]=N and flattens
# axis..end_axis into dims[1] (flatten.c), so only axis=1 is well-formed
case("flatten_full", "Flatten", dict(axis=1, end_axis=3), [(2, 3, 4, 5)])
case("reshape_neg1_mid", "Reshape",
     dict(shape=[0, -1, 4], is_onnx=1, is_mxnet=0, reverse=0), [(2, 3, 4, 4)])

# Ops intentionally NOT C-parity-tested, with the investigated reason —
# each is covered by torch/numpy golden tests instead
# (tests/test_op_golden_torch.py):
DROPPED = {
    "Logistic": "no operator prototype in the reference (no logistic.c in "
                "operator/prototype/) — create_graph segfaults",
    "Minimum": "no TM2 loader registered (TM2_OPTYPE_MIN has no "
               "tm2_minimum.c) — serializer error",
    "Absval": "no TM2 loader registered (op 68)",
    "Gemm": "no CPU kernel in the reference (device/cpu/op has no gemm/; "
            "its converter rewrites Gemm to FC) — prerun fails",
    "SwapAxis": "reference infer_shape requires total element count == 1 "
                "(swap_axis.c) — unusable at runtime",
    "Expanddims": "reference kernel demands in-place input==output memory, "
                  "which the pool never gives a graph input",
    "SpaceToDepth": "reference kernel is a flat memcpy stub "
                    "(spacetodepth_ref.c) — data is NOT rearranged there",
    "Shape": "reference writes int32 dims into a fp32 buffer sized like the "
             "input (shape.c) — not a comparable output",
    "Logical": "reference runtime produces non-pointwise results on dense "
               "random inputs (memory-pool interaction; kernel source is "
               "plain &&/||) — verified correct on ones/zeros probes",
    "Resize(bilinear)": "tm2_resize.c drops the `type` field, so tmfile "
                        "Resize always runs nearest in the reference",
    "Tile": "tile.c infer_shape sets the OUTPUT SHAPE to the reps vector "
            "itself (and half-reverses it) — runtime output is garbage; our "
            "lowering implements the kernel's documented semantics "
            "(reversed reps, caffe=element-repeat / onnx=block-tile)",
}


@pytest.mark.parametrize("name", sorted(CASES), ids=sorted(CASES))
def test_op_parity(name, tmp_path, rng):
    op, params, in_shapes, consts, xform, tol = CASES[name]
    const_arrays = [c(rng) if callable(c) else c for c in (consts or [])]
    g = _op_graph(op, params, in_shapes, const_arrays or None)
    xs = [rng.standard_normal(s).astype(np.float32) for s in in_shapes]
    if xform is not None:
        xs = [xform(x) for x in xs]
    ours = np.asarray(_ours_multi(g, xs))
    ref = run_reference_multi(_save(g, tmp_path), xs, tmp_path)
    assert ref.size == ours.size, f"size mismatch: ours {ours.shape} ref {ref.shape}"
    ref = ref.reshape(ours.shape).astype(ours.dtype)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(ours, ref, rtol=tol * 10, atol=tol * scale,
                               err_msg=f"case {name}")
