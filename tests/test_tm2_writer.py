"""TM2 writer round-trip tests: Graph -> bytes -> Graph must preserve
structure, params, weights, and quantization metadata; execution results must
be identical."""

import numpy as np
import pytest

from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.graph.ir import TensorType
from tengine_tpu.models.zoo import load_benchmark_model
from tengine_tpu.ops import qmath
from tengine_tpu.quantize.quantizer import quantize_graph
from tengine_tpu.serializer.tm2.reader import load_tm_bytes
from tengine_tpu.serializer.tm2.writer import graph_to_tm_bytes
from tengine_tpu.utils.config import Options

from test_execute_small import make_conv_graph


def _roundtrip(g):
    return load_tm_bytes(graph_to_tm_bytes(g), name=g.name)


def test_roundtrip_conv_graph(rng):
    g, w, b = make_conv_graph(rng=rng)
    g2 = _roundtrip(g)
    assert len(g2.nodes) == len(g.nodes)
    assert len(g2.tensors) == len(g.tensors)
    conv = [n for n in g2.nodes if n.op == "Convolution"][0]
    assert conv.params["kernel_h"] == 3
    np.testing.assert_array_equal(g2.tensors[conv.inputs[1]].data, w)

    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    (a,) = compile_graph(g).run(x)
    (b2,) = compile_graph(g2).run(x)
    np.testing.assert_array_equal(a, b2)


def test_roundtrip_imported_model(rng):
    g = load_benchmark_model("squeezenet_v1.1", fill_missing_weights="random")
    g2 = _roundtrip(g)
    assert [n.op for n in g2.nodes] == [n.op for n in g.nodes]
    assert [t.shape for t in g2.tensors] == [t.shape for t in g.tensors]
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    for tid in g.input_tensors:
        g.tensors[tid].shape = [1, 3, 64, 64]
    for tid in g2.input_tensors:
        g2.tensors[tid].shape = [1, 3, 64, 64]
    (a,) = compile_graph(g).run(x)
    (b,) = compile_graph(g2).run(x)
    np.testing.assert_array_equal(a, b)


def test_roundtrip_quantized_graph(rng):
    g, _, _ = make_conv_graph(rng=rng)
    calib = [rng.standard_normal((1, 3, 8, 8)).astype(np.float32) for _ in range(2)]
    qg = quantize_graph(g, calib, scheme="int8")
    qg2 = _roundtrip(qg)

    # per-channel quant params survive
    conv = [n for n in qg2.nodes if n.op == "Convolution"][0]
    wq = qg2.tensors[conv.inputs[1]].quant
    wq0 = qg.tensors[conv.inputs[1]].quant
    np.testing.assert_allclose(wq.scales, wq0.scales, rtol=1e-6)
    assert wq.per_channel

    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(calib[0], t_in.quant, t_in.dtype)
    (a,) = compile_graph(qg, Options(quant_mode="fast")).run(xq)
    (b,) = compile_graph(qg2, Options(quant_mode="fast")).run(xq)
    np.testing.assert_array_equal(a, b)


def test_save_load_file(tmp_path, rng):
    from tengine_tpu.serializer.tm2.writer import save_tmfile
    import tengine_tpu as tt

    g, _, _ = make_conv_graph(rng=rng)
    p = str(tmp_path / "model.tmfile")
    save_tmfile(g, p)
    g2 = tt.load_model(p)
    assert len(g2.nodes) == len(g.nodes)


def test_flatten_end_axis_resolved_on_wire():
    """The reference's flatten infer_shape iterates axis..end_axis literally
    (flatten.c:44-48): a caffe-style end_axis=-1 flattens ZERO dims there
    and any Flatten->FC net fails its prerun. The writer must resolve -1 to
    the last 4-D axis (the form the reference's own converters emit)."""
    from tengine_tpu.graph.ir import DType, Graph

    g = Graph(name="flat")
    x = g.add_tensor("x", DType.FP32, [1, 4, 2, 2], TensorType.INPUT)
    y = g.add_tensor("y", DType.FP32, [], TensorType.VAR)
    inp = g.add_node("InputOp", "input", [], [x.idx])
    g.add_node("Flatten", "flat", [x.idx], [y.idx],
               params=dict(axis=1, end_axis=-1))
    g.inputs = [inp.idx]
    g.outputs = [g.nodes[-1].idx]

    g2 = load_tm_bytes(graph_to_tm_bytes(g))
    flat = [n for n in g2.nodes if n.op == "Flatten"][0]
    assert flat.params["end_axis"] == 3
    assert flat.params["axis"] == 1
