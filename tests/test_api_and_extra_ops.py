"""Tests for the pytengine-compatible API, custom-op registration, and the
extra op lowerings (recurrent, ROI, misc)."""

import numpy as np
import pytest

from tengine_tpu.api import Graph as ApiGraph, register_custom_op
from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.graph.ir import DType, Graph, TensorType
from tengine_tpu.serializer.tm2.writer import save_tmfile

from test_execute_small import make_conv_graph, _simple_graph


def test_pytengine_style_api(tmp_path, rng):
    g, w, b = make_conv_graph(rng=rng)
    p = str(tmp_path / "m.tmfile")
    save_tmfile(g, p)

    graph = ApiGraph(None, "tengine", p)
    t = graph.getInputTensor(0, 0)
    assert t.shape == [1, 3, 8, 8]
    graph.preRun()
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    t.buf = x
    graph.run(1)
    out = graph.getOutputTensor(0, 0).buf
    (expected,) = compile_graph(g).run(x)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)
    assert "Convolution" in graph.dump()
    graph.postRun()


def test_custom_op_registration(rng):
    from tengine_tpu.ops.layout import like
    from tengine_tpu.ops.registry import SCORE_STATIC

    def lower_double_relu(ctx, x):
        import jax.numpy as jnp

        return like(x, jnp.maximum(x.x, 0) * ctx.params.get("gain", 2.0))

    unregister = register_custom_op("Threshold", lower_double_relu, score=SCORE_STATIC)
    try:
        g = _simple_graph("Threshold", dict(threshold=0.0, gain=2.0), [(1, 4)])
        s = compile_graph(g)
        x = rng.standard_normal((1, 4)).astype(np.float32)
        (out,) = s.run(x)
        np.testing.assert_allclose(out, np.maximum(x, 0) * 2.0, rtol=1e-6)
    finally:
        unregister()  # don't leak the override into the global registry


def _recurrent_graph(op, T, B, I, H, n_gates, rng, extra_params=None):
    g = Graph(name=op.lower())
    x = g.add_tensor("x", DType.FP32, [T, B, I], TensorType.INPUT)
    w = rng.standard_normal((n_gates * H, I)).astype(np.float32) * 0.3
    r = rng.standard_normal((n_gates * H, H)).astype(np.float32) * 0.3
    wt = g.add_tensor("w", DType.FP32, list(w.shape), TensorType.CONST, data=w)
    rt = g.add_tensor("r", DType.FP32, list(r.shape), TensorType.CONST, data=r)
    y = g.add_tensor("y", DType.FP32, [], TensorType.VAR)
    inp = g.add_node("InputOp", "input", [], [x.idx])
    params = dict(hidden_size=H, input_size=I, sequence_len=T, output_len=H)
    params.update(extra_params or {})
    g.add_node(op, op.lower(), [x.idx, wt.idx, rt.idx], [y.idx], params=params)
    g.inputs = [inp.idx]
    g.outputs = [g.nodes[-1].idx]
    return g, w, r


def test_lstm_scan(rng):
    T, B, I, H = 5, 2, 3, 4
    g, w, r = _recurrent_graph(
        "LSTM", T, B, I, H, 4, rng,
        extra_params=dict(forget_bias=0.0, cell_size=H, has_bias=0),
    )
    s = compile_graph(g)
    x = rng.standard_normal((T, B, I)).astype(np.float32)
    (out,) = s.run(x)
    assert out.shape == (T, 1, B, H)

    # numpy reference with the same gate order (I, O, F, G)
    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    h = np.zeros((B, H), np.float32)
    c = np.zeros((B, H), np.float32)
    for t in range(T):
        gates = x[t] @ w.T + h @ r.T
        i_g = sigmoid(gates[:, 0 * H : 1 * H])
        o_g = sigmoid(gates[:, 1 * H : 2 * H])
        f_g = sigmoid(gates[:, 2 * H : 3 * H])
        g_g = np.tanh(gates[:, 3 * H : 4 * H])
        c = f_g * c + i_g * g_g
        h = o_g * np.tanh(c)
        np.testing.assert_allclose(out[t, 0], h, rtol=1e-4, atol=1e-5)


def test_rnn_and_gru_shapes(rng):
    T, B, I, H = 4, 2, 3, 5
    for op, gates in (("RNN", 1), ("GRU", 3)):
        g, _, _ = _recurrent_graph(op, T, B, I, H, gates, rng)
        (out,) = compile_graph(g).run(rng.standard_normal((T, B, I)).astype(np.float32))
        assert out.shape == (T, 1, B, H), (op, out.shape)


def test_roipooling(rng):
    g = Graph(name="roi")
    x = g.add_tensor("x", DType.FP32, [1, 2, 8, 8], TensorType.INPUT)
    rois = g.add_tensor("rois", DType.FP32, [2, 4], TensorType.INPUT)
    y = g.add_tensor("y", DType.FP32, [], TensorType.VAR)
    i0 = g.add_node("InputOp", "in0", [], [x.idx])
    i1 = g.add_node("InputOp", "in1", [], [rois.idx])
    g.add_node("ROIPooling", "roi", [x.idx, rois.idx], [y.idx],
               params=dict(pooled_h=2, pooled_w=2, spatial_scale=1.0))
    g.inputs = [i0.idx, i1.idx]
    g.outputs = [g.nodes[-1].idx]
    s = compile_graph(g)
    xv = rng.standard_normal((1, 2, 8, 8)).astype(np.float32)
    rv = np.array([[0, 0, 3, 3], [2, 2, 7, 7]], np.float32)
    (out,) = s.run(xv, rv)
    assert out.shape == (2, 2, 2, 2)
    # roi 0 covers rows/cols 0..3 → bin (0,0) is max over [0:2,0:2]
    np.testing.assert_allclose(out[0, :, 0, 0], xv[0, :, 0:2, 0:2].max((1, 2)), rtol=1e-6)


def test_bias_embedding_l2pool(rng):
    # Bias
    b = rng.standard_normal((4,)).astype(np.float32)
    g = _simple_graph("Bias", dict(bias_size=4), [(1, 4, 3, 3)], consts=[b])
    (out,) = compile_graph(g).run(x := rng.standard_normal((1, 4, 3, 3)).astype(np.float32))
    np.testing.assert_allclose(out, x + b.reshape(1, 4, 1, 1), rtol=1e-6)

    # Embedding
    w = rng.standard_normal((10, 6)).astype(np.float32)
    g = _simple_graph("Embedding", dict(num_output=6, input_dim=10, bias_term=0,
                                        weight_data_size=60), [(3,)], consts=[w])
    (out,) = compile_graph(g).run(np.array([1, 5, 9], np.float32))
    np.testing.assert_allclose(out, w[[1, 5, 9]], rtol=1e-6)

    # L2Pool
    g = _simple_graph("L2Pool", dict(padding_type=0, kernel_h=2, kernel_w=2,
                                     stride_h=2, stride_w=2), [(1, 2, 4, 4)])
    (out,) = compile_graph(g).run(x := rng.standard_normal((1, 2, 4, 4)).astype(np.float32))
    ref = np.sqrt((x.reshape(1, 2, 2, 2, 2, 2) ** 2).mean(axis=(3, 5)))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_load_tengine_plugin(tmp_path, rng):
    """Plugin loading (api/plugin.c analog): a python file whose init()
    registers a custom op lowering."""
    from tengine_tpu.api import load_tengine_plugin
    from tengine_tpu.executor.engine import compile_graph
    from tengine_tpu.graph.ir import DType, Graph, TensorType
    from tengine_tpu.utils.config import Options

    plugin = tmp_path / "myplugin.py"
    plugin.write_text(
        "def init():\n"
        "    from tengine_tpu.api import register_custom_op\n"
        "    from tengine_tpu.ops.layout import like\n"
        "    def lower_double(ctx, x):\n"
        "        return like(x, x.x * 2.0)\n"
        "    register_custom_op('MyDouble', lower_double)\n"
    )
    assert load_tengine_plugin("myplugin", str(plugin)) == 0
    assert load_tengine_plugin("myplugin", str(plugin)) == 0  # idempotent

    g = Graph(name="plug")
    x = g.add_tensor("x", DType.FP32, [2, 3], TensorType.INPUT)
    inp = g.add_node("InputOp", "input", [], [x.idx])
    y = g.add_tensor("y", DType.FP32, [], TensorType.VAR)
    g.add_node("MyDouble", "dbl", [x.idx], [y.idx])
    g.inputs, g.outputs = [inp.idx], [g.nodes[-1].idx]
    import numpy as np

    xv = rng.standard_normal((2, 3)).astype(np.float32)
    (out,) = compile_graph(g, Options()).run(xv)
    np.testing.assert_allclose(out, xv * 2.0, rtol=1e-6)


def test_cost_analysis(rng):
    """CompiledGraph.cost_analysis surfaces XLA's compiled cost model
    (GRAPH_PERF_STAT_* analog)."""
    import numpy as np
    from tengine_tpu.executor.engine import compile_graph
    from tengine_tpu.graph.ir import DType, Graph, TensorType
    from tengine_tpu.utils.config import Options

    g = Graph(name="cost")
    x = g.add_tensor("x", DType.FP32, [1, 3, 8, 8], TensorType.INPUT)
    inp = g.add_node("InputOp", "input", [], [x.idx])
    w = (rng.standard_normal((4, 3, 3, 3)) * 0.3).astype(np.float32)
    wt = g.add_tensor("w", DType.FP32, list(w.shape), TensorType.CONST, data=w)
    y = g.add_tensor("y", DType.FP32, [], TensorType.VAR)
    g.add_node("Convolution", "c", [x.idx, wt.idx], [y.idx],
               params=dict(kernel_h=3, kernel_w=3, stride_h=1, stride_w=1,
                           dilation_h=1, dilation_w=1, input_channel=3,
                           output_channel=4, group=1, activation=-1,
                           pad_h0=1, pad_w0=1, pad_h1=1, pad_w1=1))
    g.inputs, g.outputs = [inp.idx], [g.nodes[-1].idx]
    cg = compile_graph(g, Options())
    ca = cg.cost_analysis()
    assert ca.get("flops", 0) > 0


def test_donate_input(rng):
    """Options.donate_input lets XLA alias input buffers (exec-graph
    inplace-reuse analog, cpu_pool.c)."""
    import jax
    import numpy as np
    from tengine_tpu.executor.engine import compile_graph
    from tengine_tpu.graph.ir import DType, Graph, TensorType
    from tengine_tpu.utils.config import Options

    g = Graph(name="don")
    x = g.add_tensor("x", DType.FP32, [4, 4], TensorType.INPUT)
    inp = g.add_node("InputOp", "input", [], [x.idx])
    y = g.add_tensor("y", DType.FP32, [], TensorType.VAR)
    g.add_node("ReLu", "r", [x.idx], [y.idx], params=dict(negative_slope=0.0))
    g.inputs, g.outputs = [inp.idx], [g.nodes[-1].idx]
    cg = compile_graph(g, Options(donate_input=True))
    for _ in range(2):  # fresh device buffer each call — donation-safe
        xv = jax.device_put(rng.standard_normal((4, 4)).astype(np.float32))
        host = np.asarray(xv)
        (out,) = cg.run(xv)
        np.testing.assert_allclose(out, np.maximum(host, 0.0))
