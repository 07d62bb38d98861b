"""Cross-layer equalization (DFQ): fp32-function preserving, uint8-improving."""

import copy

import numpy as np

from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.graph.ir import DType, Graph, TensorType
from tengine_tpu.ops import qmath
from tengine_tpu.quantize.dfq import equalize_graph
from tengine_tpu.quantize.quantizer import quantize_graph
from tengine_tpu.utils.config import Options


def skewed_net(rng, C=8, C2=8):
    """conv(relu) -> conv with wildly skewed per-channel weight magnitudes —
    the case per-tensor uint8 weight quantization handles worst."""
    g = Graph(name="skew")
    x = g.add_tensor("x", DType.FP32, [1, 4, 8, 8], TensorType.INPUT)
    inp = g.add_node("InputOp", "input", [], [x.idx])
    w1 = rng.standard_normal((C, 4, 3, 3)).astype(np.float32)
    w1 *= np.logspace(-2, 1, C).reshape(-1, 1, 1, 1).astype(np.float32)  # skew
    b1 = (rng.standard_normal(C) * 0.05).astype(np.float32)
    w2 = (rng.standard_normal((C2, C, 1, 1)) * 0.3).astype(np.float32)
    b2 = (rng.standard_normal(C2) * 0.05).astype(np.float32)
    w1t = g.add_tensor("w1", DType.FP32, list(w1.shape), TensorType.CONST, data=w1)
    b1t = g.add_tensor("b1", DType.FP32, [C], TensorType.CONST, data=b1)
    w2t = g.add_tensor("w2", DType.FP32, list(w2.shape), TensorType.CONST, data=w2)
    b2t = g.add_tensor("b2", DType.FP32, [C2], TensorType.CONST, data=b2)
    mid = g.add_tensor("mid", DType.FP32, [], TensorType.VAR)
    out = g.add_tensor("out", DType.FP32, [], TensorType.VAR)
    g.add_node("Convolution", "c1", [x.idx, w1t.idx, b1t.idx], [mid.idx],
               params=dict(kernel_h=3, kernel_w=3, stride_h=1, stride_w=1,
                           dilation_h=1, dilation_w=1, input_channel=4,
                           output_channel=C, group=1, activation=0,
                           pad_h0=1, pad_w0=1, pad_h1=1, pad_w1=1))
    g.add_node("Convolution", "c2", [mid.idx, w2t.idx, b2t.idx], [out.idx],
               params=dict(kernel_h=1, kernel_w=1, stride_h=1, stride_w=1,
                           dilation_h=1, dilation_w=1, input_channel=C,
                           output_channel=C2, group=1, activation=-1,
                           pad_h0=0, pad_w0=0, pad_h1=0, pad_w1=0))
    g.inputs = [inp.idx]
    g.outputs = [g.nodes[-1].idx]
    return g


def _cos(a, b):
    a, b = a.reshape(-1).astype(np.float64), b.reshape(-1).astype(np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_dfq_preserves_fp32_and_improves_uint8(rng):
    g = skewed_net(rng)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    (y_ref,) = compile_graph(copy.deepcopy(g), Options()).run(x)

    ge = copy.deepcopy(g)
    n = equalize_graph(ge)
    assert n == 1
    (y_eq,) = compile_graph(copy.deepcopy(ge), Options()).run(x)
    np.testing.assert_allclose(y_eq, y_ref, rtol=1e-4, atol=1e-5)

    # per-channel ranges meet at the geometric mean sqrt(r1*r2): the 1000x
    # skew collapses to ~sqrt(1000*r2_spread)
    w1 = next(t for t in ge.tensors if t.name == "w1").data
    r1 = np.abs(w1.reshape(w1.shape[0], -1)).max(axis=1)
    assert r1.max() / r1.min() < 60  # was 1000x skewed

    calib = [x] + [rng.standard_normal((1, 4, 8, 8)).astype(np.float32) for _ in range(2)]

    def quant_cos(graph):
        qg = quantize_graph(copy.deepcopy(graph), calib, scheme="uint8")
        t_in = qg.tensors[qg.input_tensors[0]]
        xq = qmath.quantize_np(x, t_in.quant, t_in.dtype)
        (yq,) = compile_graph(qg, Options(quant_mode="ref")).run(xq)
        t_out = qg.tensors[qg.output_tensors[0]]
        return _cos(qmath.dequantize_np(yq, t_out.quant), y_ref)

    cos_plain = quant_cos(g)
    cos_dfq = quant_cos(ge)
    assert cos_dfq > cos_plain, (cos_plain, cos_dfq)
    assert cos_dfq > 0.99


def test_bias_correction_improves_quant(rng):
    """Empirical bias correction moves the quantized output toward fp32."""
    from tengine_tpu.quantize.dfq import bias_correction

    g = skewed_net(rng)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    calib = [x] + [rng.standard_normal((1, 4, 8, 8)).astype(np.float32) for _ in range(3)]
    (y_ref,) = compile_graph(copy.deepcopy(g), Options()).run(x)

    qg = quantize_graph(copy.deepcopy(g), calib, scheme="uint8")
    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(x, t_in.quant, t_in.dtype)
    t_out = qg.tensors[qg.output_tensors[0]]

    def err(graph):
        (yq,) = compile_graph(graph, Options(quant_mode="fast")).run(xq)
        return np.abs(qmath.dequantize_np(yq, t_out.quant) - y_ref).mean()

    e_before = err(copy.deepcopy(qg))
    n = bias_correction(g, qg, calib)
    assert n >= 2
    e_after = err(qg)
    assert e_after <= e_before * 1.05, (e_before, e_after)
