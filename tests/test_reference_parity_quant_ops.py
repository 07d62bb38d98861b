"""Per-op QUANTIZED parity vs the real reference C engine (VERDICT r2 item 6).

Each case: build a single-op fp32 graph, quantize it with the real PTQ
pipeline (asymmetric per-tensor uint8 / symmetric per-channel int8 — the two
quant_tool schemes), write the tmfile, execute it in the reference's own
per-dtype C kernels (conv_kernel_ref_uint8.c:67-177, *_int8.c, pooling/
eltwise/concat/fc uint8 kernels under device/cpu/op/*/), and require our
fast MXU path to agree to <=1 quantization LSB.

This extends the ~102 fp32 per-op cases (test_reference_parity_ops.py) into
the quantized domain, per op instead of only per full net.
"""

import numpy as np
import pytest

from test_reference_parity import (  # noqa: F401
    _op_graph,
    _save,
    run_reference_multi,
)

from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.ops import qmath
from tengine_tpu.quantize.quantizer import quantize_graph
from tengine_tpu.serializer.tm2 import format as fmt
from tengine_tpu.utils.config import Options


@pytest.fixture(scope="module", autouse=True)
def _need_ref(ref_lib):
    """Every test in this module drives the real C engine."""


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def conv_p(k_h, k_w=None, stride=1, pad=None, group=1, c_in=4, c_out=6, act=-1):
    k_w = k_h if k_w is None else k_w
    pad = (k_h // 2) if pad is None else pad
    return dict(
        kernel_h=k_h, kernel_w=k_w, stride_h=stride, stride_w=stride,
        dilation_h=1, dilation_w=1, input_channel=c_in, output_channel=c_out,
        group=group, activation=act,
        pad_h0=pad, pad_w0=pad, pad_h1=pad, pad_w1=pad,
    )


def wconst(o, c, kh, kw=None):
    kw = kh if kw is None else kw
    return lambda r: (r.standard_normal((o, c, kh, kw)) * 0.3).astype(np.float32)


def bconst(o):
    return lambda r: (r.standard_normal((o,)) * 0.1).astype(np.float32)


# (op, params, in_shapes, consts, schemes)
QCASES = {}


def qcase(name, op, params, in_shapes, consts=None, schemes=("uint8", "int8"),
          ref_env=None):
    assert name not in QCASES, name
    QCASES[name] = (op, params, in_shapes, consts, schemes, ref_env or {})


# --- convolution: kernel/stride/shape sweep (conv_kernel_ref_{uint8,int8}.c)
qcase("conv_k1s1", "Convolution", conv_p(1, c_in=6, c_out=8),
      [(1, 6, 8, 8)], [wconst(8, 6, 1), bconst(8)])
qcase("conv_k1s2", "Convolution", conv_p(1, stride=2, c_in=6, c_out=8),
      [(1, 6, 8, 8)], [wconst(8, 6, 1), bconst(8)])
qcase("conv_k3s1_relu", "Convolution", conv_p(3, c_in=4, c_out=6, act=0),
      [(1, 4, 8, 8)], [wconst(6, 4, 3), bconst(6)])
qcase("conv_k3s2", "Convolution", conv_p(3, stride=2, c_in=4, c_out=6),
      [(1, 4, 9, 9)], [wconst(6, 4, 3), bconst(6)])
qcase("conv_k7s2", "Convolution", conv_p(7, stride=2, pad=3, c_in=3, c_out=8),
      [(1, 3, 14, 14)], [wconst(8, 3, 7), bconst(8)])
qcase("conv_k3_nobias", "Convolution", conv_p(3, c_in=4, c_out=4),
      [(1, 4, 7, 7)], [wconst(4, 4, 3)])
qcase("conv_rect_1x5", "Convolution",
      dict(conv_p(1, 5, c_in=3, c_out=4), pad_h0=0, pad_h1=0, pad_w0=2, pad_w1=2),
      [(1, 3, 6, 8)], [wconst(4, 3, 1, 5), bconst(4)])
qcase("conv_relu6", "Convolution", conv_p(3, c_in=4, c_out=6, act=6),
      [(1, 4, 8, 8)], [wconst(6, 4, 3), bconst(6)])

# depthwise (conv ref kernels' group path). int8 must force the reference's
# ref tier: its x86 optimized dw-int8 kernels write fp32 intermediates into
# the int8-sized output buffer (observed byte pattern = float32 Inf;
# conv_dw_hcl_x86.c int8 path) — TG_DEBUG_REF=1 selects conv_ref, which
# agrees with us exactly.
qcase("conv_dw_k3s1", "Convolution", conv_p(3, group=4, c_in=4, c_out=4),
      [(1, 4, 8, 8)], [wconst(4, 1, 3), bconst(4)],
      ref_env={"int8": {"TG_DEBUG_REF": "1"}})
qcase("conv_dw_k3s2", "Convolution", conv_p(3, stride=2, group=4, c_in=4, c_out=4),
      [(1, 4, 9, 9)], [wconst(4, 1, 3), bconst(4)],
      ref_env={"int8": {"TG_DEBUG_REF": "1"}})

# --- fully connected (fc_kernel_ref_{uint8,int8}.c) ---------------------
qcase("fc", "FullyConnected", dict(num_output=7), [(2, 3, 4, 4)],
      [lambda r: (r.standard_normal((7, 48)) * 0.2).astype(np.float32),
       bconst(7)])
qcase("fc_nobias", "FullyConnected", dict(num_output=5), [(2, 24)],
      [lambda r: (r.standard_normal((5, 24)) * 0.2).astype(np.float32)])

# --- pooling (pooling_kernel_ref_uint8.c + int8) ------------------------
pool_p = dict(global_pool=0, caffe_flavor=0)
qcase("pool_max_k2s2", "Pooling",
      dict(alg=0, kernel_h=2, kernel_w=2, stride_h=2, stride_w=2,
           pad_h0=0, pad_w0=0, pad_h1=0, pad_w1=0, **pool_p),
      [(1, 4, 8, 8)])
qcase("pool_max_k3s2_pad", "Pooling",
      dict(alg=0, kernel_h=3, kernel_w=3, stride_h=2, stride_w=2,
           pad_h0=1, pad_w0=1, pad_h1=1, pad_w1=1, **pool_p),
      [(1, 4, 9, 9)])
qcase("pool_avg_k2s2", "Pooling",
      dict(alg=1, kernel_h=2, kernel_w=2, stride_h=2, stride_w=2,
           pad_h0=0, pad_w0=0, pad_h1=0, pad_w1=0, **pool_p),
      [(1, 4, 8, 8)])
qcase("pool_global_avg", "Pooling",
      dict(alg=1, kernel_h=0, kernel_w=0, stride_h=1, stride_w=1,
           global_pool=1, caffe_flavor=0,
           pad_h0=0, pad_w0=0, pad_h1=0, pad_w1=0),
      [(1, 6, 7, 7)])
qcase("pool_global_max", "Pooling",
      dict(alg=0, kernel_h=0, kernel_w=0, stride_h=1, stride_w=1,
           global_pool=1, caffe_flavor=0,
           pad_h0=0, pad_w0=0, pad_h1=0, pad_w1=0),
      [(1, 6, 7, 7)])

# --- eltwise (eltwise uint8/int8 ref kernels) ---------------------------
elt = dict(caffe_flavor=0, shift=0.0, power=1.0, scale=1.0)
qcase("eltwise_sum", "Eltwise", dict(type=fmt.ELT_SUM, **elt),
      [(1, 4, 6, 6), (1, 4, 6, 6)])
qcase("eltwise_prod", "Eltwise", dict(type=fmt.ELT_PROD, **elt),
      [(1, 4, 6, 6), (1, 4, 6, 6)], schemes=("uint8",))
qcase("eltwise_sub", "Eltwise", dict(type=fmt.ELT_SUB, **elt),
      [(1, 4, 6, 6), (1, 4, 6, 6)], schemes=("uint8",))

# --- data movement in the quantized domain ------------------------------
qcase("concat_c", "Concat", dict(axis=1), [(1, 3, 5, 5), (1, 5, 5, 5)])
qcase("relu_standalone", "ReLu", dict(negative_slope=0.0), [(1, 4, 6, 6)])
qcase("clip_standalone", "Clip", dict(min=-0.3, max=0.5), [(1, 4, 6, 6)],
      schemes=("uint8",))
qcase("flatten", "Flatten", dict(axis=1, end_axis=3), [(2, 3, 4, 4)])
qcase("reshape", "Reshape", dict(shape=[1, -1], is_onnx=1, is_mxnet=0, reverse=0),
      [(1, 4, 3, 3)])
qcase("dropout", "Dropout", {}, [(1, 4, 5, 5)])
qcase("upsample_x2", "Upsample", dict(scale=2.0), [(1, 3, 5, 5)],
      schemes=("uint8",))

# Quantized ops investigated and NOT parity-testable — reference-side gaps,
# each verified by reading the C source and probing the built engine:
QUANT_DROPPED = {
    "Deconvolution": "no quantized deconv kernel exists in the reference "
        "CPU tier: deconv_ref.c:271-300 unconditionally calls "
        "ref_deconv_fp32 on the raw int8/uint8 buffers (garbage output "
        "verified under TG_DEBUG_REF=1 too); our quantized deconv is "
        "covered by the generic dequant->fp32->requant wrapper + the fp32 "
        "deconv C-parity cases instead",
}


ALL = [(n, s) for n, c in sorted(QCASES.items()) for s in c[4]]


@pytest.mark.parametrize("name,scheme", ALL, ids=[f"{n}_{s}" for n, s in ALL])
def test_quant_op_parity(name, scheme, tmp_path, rng):
    import os

    op, params, in_shapes, consts, _, ref_env = QCASES[name]
    const_arrays = [c(rng) for c in (consts or [])]
    g = _op_graph(op, params, in_shapes, const_arrays or None)
    calib = [
        tuple(rng.standard_normal(s).astype(np.float32) for s in in_shapes)
        for _ in range(3)
    ]
    qg = quantize_graph(g, calib, scheme=scheme)
    xqs = []
    for tid, x in zip(qg.input_tensors, calib[0]):
        t = qg.tensors[tid]
        xqs.append(qmath.quantize_np(x, t.quant, t.dtype))

    ours = np.asarray(compile_graph(qg, Options(quant_mode="fast")).run(*xqs)[0])
    extra = ref_env.get(scheme, {})
    old = {k: os.environ.get(k) for k in extra}
    os.environ.update(extra)
    try:
        ref = run_reference_multi(_save(qg, tmp_path), xqs, tmp_path)
    finally:
        for k, v in old.items():
            os.environ.pop(k, None) if v is None else os.environ.update({k: v})
    assert ref.size == ours.size, f"size mismatch: ours {ours.shape} ref {ref.shape}"
    ref = ref.reshape(ours.shape)
    assert ref.dtype == ours.dtype, (ref.dtype, ours.dtype)
    diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, (
        f"{name}/{scheme}: max LSB diff {diff.max()} "
        f"(frac>1 {(diff > 1).mean():.4%})"
    )
