"""End-to-end execution tests on small hand-built graphs, checked against
straightforward numpy computations (the role the reference's ref kernels +
ONNX fixtures play in tests/op/, SURVEY §4)."""

import numpy as np
import pytest

from tengine_tpu.graph.ir import DType, Graph, TensorType
from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.utils.config import Options


def make_conv_graph(
    in_shape=(1, 3, 8, 8),
    out_c=4,
    k=3,
    stride=1,
    pad=1,
    group=1,
    activation=-1,
    rng=None,
):
    rng = rng or np.random.default_rng(0)
    g = Graph(name="conv_test")
    n, c, h, w = in_shape
    x = g.add_tensor("data", DType.FP32, in_shape, TensorType.INPUT)
    wdata = rng.standard_normal((out_c, c // group, k, k)).astype(np.float32)
    bdata = rng.standard_normal((out_c,)).astype(np.float32)
    wt = g.add_tensor("w", DType.FP32, wdata.shape, TensorType.CONST, data=wdata)
    bt = g.add_tensor("b", DType.FP32, bdata.shape, TensorType.CONST, data=bdata)
    y = g.add_tensor("y", DType.FP32, [], TensorType.VAR)
    inp = g.add_node("InputOp", "input", [], [x.idx])
    g.add_node(
        "Convolution",
        "conv",
        [x.idx, wt.idx, bt.idx],
        [y.idx],
        params=dict(
            kernel_h=k, kernel_w=k, stride_h=stride, stride_w=stride,
            dilation_h=1, dilation_w=1, input_channel=c, output_channel=out_c,
            group=group, activation=activation,
            pad_h0=pad, pad_w0=pad, pad_h1=pad, pad_w1=pad,
        ),
    )
    g.inputs = [inp.idx]
    g.outputs = [g.nodes[-1].idx]
    return g, wdata, bdata


def conv2d_numpy(x, w, b, stride=1, pad=1, group=1):
    n, c, h, w_ = x.shape
    oc, icg, kh, kw = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh = (h + 2 * pad - kh) // stride + 1
    ow = (w_ + 2 * pad - kw) // stride + 1
    out = np.zeros((n, oc, oh, ow), np.float32)
    cpg = c // group
    opg = oc // group
    for gi in range(group):
        for o in range(opg):
            oco = gi * opg + o
            for i in range(oh):
                for j in range(ow):
                    patch = xp[:, gi * cpg : (gi + 1) * cpg,
                               i * stride : i * stride + kh,
                               j * stride : j * stride + kw]
                    out[:, oco, i, j] = np.sum(
                        patch * w[oco][None], axis=(1, 2, 3)
                    ) + b[oco]
    return out


@pytest.mark.parametrize("group,stride,act", [(1, 1, -1), (1, 2, 0), (3, 1, 6)])
def test_conv_vs_numpy(group, stride, act, rng):
    in_shape = (1, 3, 8, 8)
    out_c = 6 if group == 1 else 3
    g, w, b = make_conv_graph(
        in_shape, out_c=out_c, stride=stride, group=group, activation=act, rng=rng
    )
    s = compile_graph(g)
    x = rng.standard_normal(in_shape).astype(np.float32)
    (out,) = s.run(x)
    ref = conv2d_numpy(x, w, b, stride=stride, pad=1, group=group)
    if act == 0:
        ref = np.maximum(ref, 0)
    elif act == 6:
        ref = np.clip(ref, 0, 6)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def _simple_graph(op, params, in_shapes, n_outputs=1, consts=None, rng=None):
    g = Graph(name=f"{op}_test")
    in_ids = []
    input_nodes = []
    for i, shp in enumerate(in_shapes):
        t = g.add_tensor(f"in{i}", DType.FP32, shp, TensorType.INPUT)
        inp = g.add_node("InputOp", f"input{i}", [], [t.idx])
        input_nodes.append(inp.idx)
        in_ids.append(t.idx)
    for cdata in consts or []:
        t = g.add_tensor(
            f"c{len(in_ids)}", DType.FP32, cdata.shape, TensorType.CONST, data=cdata
        )
        in_ids.append(t.idx)
    out_ids = [g.add_tensor(f"out{i}", DType.FP32, [], TensorType.VAR).idx for i in range(n_outputs)]
    g.add_node(op, op.lower(), in_ids, out_ids, params=params)
    g.inputs = input_nodes
    g.outputs = [g.nodes[-1].idx]
    return g


def test_pooling_max(rng):
    g = _simple_graph(
        "Pooling",
        dict(alg=0, kernel_h=2, kernel_w=2, stride_h=2, stride_w=2,
             global_pool=0, caffe_flavor=0, pad_h0=0, pad_w0=0, pad_h1=0, pad_w1=0),
        [(1, 4, 8, 8)],
    )
    s = compile_graph(g)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    (out,) = s.run(x)
    ref = x.reshape(1, 4, 4, 2, 4, 2).max(axis=(3, 5))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_pooling_avg_with_pad(rng):
    # non-caffe: divisor counts only valid elements
    g = _simple_graph(
        "Pooling",
        dict(alg=1, kernel_h=3, kernel_w=3, stride_h=2, stride_w=2,
             global_pool=0, caffe_flavor=0, pad_h0=1, pad_w0=1, pad_h1=1, pad_w1=1),
        [(1, 2, 6, 6)],
    )
    s = compile_graph(g)
    x = rng.standard_normal((1, 2, 6, 6)).astype(np.float32)
    (out,) = s.run(x)
    # manual reference
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    valid = np.pad(np.ones_like(x), ((0, 0), (0, 0), (1, 1), (1, 1)))
    oh = ow = (6 + 2 - 3) // 2 + 1
    ref = np.zeros((1, 2, oh, ow), np.float32)
    for i in range(oh):
        for j in range(ow):
            win = xp[:, :, 2 * i : 2 * i + 3, 2 * j : 2 * j + 3]
            cnt = valid[:, :, 2 * i : 2 * i + 3, 2 * j : 2 * j + 3].sum((2, 3))
            ref[:, :, i, j] = win.sum((2, 3)) / cnt
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_fc(rng):
    w = rng.standard_normal((10, 3 * 4 * 4)).astype(np.float32)
    b = rng.standard_normal((10,)).astype(np.float32)
    g = _simple_graph("FullyConnected", dict(num_output=10), [(2, 3, 4, 4)], consts=[w, b])
    s = compile_graph(g)
    x = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    (out,) = s.run(x)
    ref = (x.reshape(2, -1) @ w.T + b).reshape(2, 10, 1, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_softmax_axis1(rng):
    g = _simple_graph("Softmax", dict(axis=1), [(2, 5, 3, 3)])
    s = compile_graph(g)
    x = rng.standard_normal((2, 5, 3, 3)).astype(np.float32)
    (out,) = s.run(x)
    e = np.exp(x - x.max(1, keepdims=True))
    np.testing.assert_allclose(out, e / e.sum(1, keepdims=True), rtol=1e-5, atol=1e-6)


def test_concat_channel(rng):
    g = _simple_graph("Concat", dict(axis=1), [(1, 2, 4, 4), (1, 3, 4, 4)])
    s = compile_graph(g)
    a = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
    b = rng.standard_normal((1, 3, 4, 4)).astype(np.float32)
    (out,) = s.run(a, b)
    np.testing.assert_allclose(out, np.concatenate([a, b], 1), rtol=1e-6)


def test_eltwise_sum_channel_broadcast(rng):
    # second input of size C broadcasts over H,W (eltwise_ref.c:72-80)
    from tengine_tpu.serializer.tm2.format import ELT_SUM

    g = _simple_graph("Eltwise", dict(type=ELT_SUM, caffe_flavor=0, shift=0.0, power=1.0, scale=1.0),
                      [(1, 4, 3, 3), (4,)])
    s = compile_graph(g)
    a = rng.standard_normal((1, 4, 3, 3)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    (out,) = s.run(a, b)
    np.testing.assert_allclose(out, a + b.reshape(1, 4, 1, 1), rtol=1e-6)


def test_prelu(rng):
    slope = rng.standard_normal((4,)).astype(np.float32)
    g = _simple_graph("PReLU", {}, [(1, 4, 3, 3)], consts=[slope])
    s = compile_graph(g)
    x = rng.standard_normal((1, 4, 3, 3)).astype(np.float32)
    (out,) = s.run(x)
    ref = np.where(x > 0, x, x * slope.reshape(1, 4, 1, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_shufflechannel(rng):
    g = _simple_graph("ShuffleChannel", dict(group=2), [(1, 6, 2, 2)])
    s = compile_graph(g)
    x = rng.standard_normal((1, 6, 2, 2)).astype(np.float32)
    (out,) = s.run(x)
    ref = x.reshape(1, 2, 3, 2, 2).swapaxes(1, 2).reshape(1, 6, 2, 2)
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_batchnorm(rng):
    c = 5
    gamma = rng.standard_normal((c,)).astype(np.float32)
    beta = rng.standard_normal((c,)).astype(np.float32)
    mean = rng.standard_normal((c,)).astype(np.float32)
    var = np.abs(rng.standard_normal((c,))).astype(np.float32) + 0.5
    g = _simple_graph(
        "BatchNormalization",
        dict(rescale_factor=1.0, eps=1e-5, caffe_flavor=0),
        [(2, c, 4, 4)],
        consts=[gamma, beta, mean, var],
    )
    s = compile_graph(g)
    x = rng.standard_normal((2, c, 4, 4)).astype(np.float32)
    (out,) = s.run(x)
    sh = (1, c, 1, 1)
    ref = gamma.reshape(sh) * (x - mean.reshape(sh)) / np.sqrt(var.reshape(sh) + 1e-5) + beta.reshape(sh)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_upsample_nearest(rng):
    g = _simple_graph("Upsample", dict(scale=2.0), [(1, 2, 3, 3)])
    s = compile_graph(g)
    x = rng.standard_normal((1, 2, 3, 3)).astype(np.float32)
    (out,) = s.run(x)
    ref = x.repeat(2, axis=2).repeat(2, axis=3)
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_force_ref_kernels_same_result(rng):
    g, w, b = make_conv_graph(rng=rng)
    s1 = compile_graph(g, Options(force_ref_kernels=False))
    s2 = compile_graph(g, Options(force_ref_kernels=True))
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(s1.run(x)[0], s2.run(x)[0], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("precision,tol", [("fp32_fast", 2e-2), ("bf16", 3e-2), ("fp16", 1e-2)])
def test_reduced_precision_tolerance(precision, tol, rng):
    """Half-precision float parity (VERDICT r1 item 8): fp16/bf16 storage
    with fp32 MXU accumulation must track fp32 within reduced-precision
    tolerance on a conv graph (reference analog: conv_kernel_ref_fp16.c)."""
    g, w, b = make_conv_graph((2, 3, 16, 16), out_c=8, rng=rng)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    (ref,) = compile_graph(g, Options(precision="fp32")).run(x)
    (out,) = compile_graph(g, Options(precision=precision)).run(x)
    assert out.dtype == np.float16 if precision == "fp16" else True
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        out.astype(np.float32), ref, atol=tol * scale, rtol=tol
    )
