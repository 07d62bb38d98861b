"""ONNX front-end: wire-format decoding + import parity vs torch front-end.

Builds ONNX ModelProto bytes with a minimal in-test protobuf encoder (the
environment has no `onnx` package), imports via convert.onnx_frontend, and
cross-checks numerics against the same network imported through the torch
front-end — two independent paths into the IR must agree.
"""

import struct

import numpy as np
import pytest

from tengine_tpu.convert.onnx_frontend import from_onnx, parse_onnx
from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.utils.config import Options


# ---- minimal protobuf encoder ----------------------------------------------


def _vint(v: int) -> bytes:
    out = b""
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _f(field: int, wire: int) -> bytes:
    return _vint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _f(field, 2) + _vint(len(payload)) + payload


def _s(field: int, s: str) -> bytes:
    return _ld(field, s.encode())


def _i(field: int, v: int) -> bytes:
    return _f(field, 0) + _vint(v)


def _fl(field: int, v: float) -> bytes:
    return _f(field, 5) + struct.pack("<f", v)


def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    out = b"".join(_i(1, d) for d in arr.shape)
    dt = {np.dtype(np.float32): 1, np.dtype(np.int64): 7, np.dtype(np.int32): 6}[arr.dtype]
    out += _i(2, dt)
    out += _s(8, name)
    out += _ld(9, np.ascontiguousarray(arr).tobytes())  # raw_data
    return out


def attr(name: str, val) -> bytes:
    out = _s(1, name)
    if isinstance(val, float):
        out += _fl(2, val) + _i(20, 1)
    elif isinstance(val, int):
        out += _i(3, val) + _i(20, 2)
    elif isinstance(val, str):
        out += _ld(4, val.encode()) + _i(20, 3)
    elif isinstance(val, np.ndarray):
        out += _ld(5, tensor_proto("", val)) + _i(20, 4)
    elif isinstance(val, (list, tuple)) and val and isinstance(val[0], int):
        out += b"".join(_i(8, v) for v in val) + _i(20, 7)
    elif isinstance(val, (list, tuple)):
        out += b"".join(_fl(7, v) for v in val) + _i(20, 6)
    else:
        raise TypeError(type(val))
    return out


def node(op: str, inputs, outputs, name="", **attrs) -> bytes:
    out = b"".join(_s(1, i) for i in inputs)
    out += b"".join(_s(2, o) for o in outputs)
    out += _s(3, name or outputs[0])
    out += _s(4, op)
    out += b"".join(_ld(5, attr(k, v)) for k, v in attrs.items())
    return out


def value_info(name: str, shape) -> bytes:
    dims = b"".join(_ld(1, _i(1, d)) for d in shape)
    tensor_type = _i(1, 1) + _ld(2, dims)  # elem_type=float, shape
    return _s(1, name) + _ld(2, _ld(1, tensor_type))


def model(nodes, inits, inputs, outputs, opset=13) -> bytes:
    gr = b"".join(_ld(1, n) for n in nodes)
    gr += _s(2, "testgraph")
    gr += b"".join(_ld(5, tensor_proto(k, v)) for k, v in inits.items())
    gr += b"".join(_ld(11, value_info(n, s)) for n, s in inputs)
    gr += b"".join(_ld(12, value_info(n, [])) for n in outputs)
    return _i(1, 8) + _ld(7, gr) + _ld(8, _s(1, "") + _i(2, opset))


# ---- tests -----------------------------------------------------------------


def test_wire_parse_roundtrip(rng):
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
    m = model(
        [node("Conv", ["x", "w"], ["y"], kernel_shape=[3, 3], pads=[1, 1, 1, 1],
              strides=[2, 2], group=1)],
        {"w": w},
        [("x", [1, 3, 8, 8])],
        ["y"],
    )
    gname, nodes, inits, g_in, g_out, opset = parse_onnx(m)
    assert gname == "testgraph" and opset == 13
    assert nodes[0].op == "Conv" and nodes[0].attrs["strides"] == [2, 2]
    np.testing.assert_array_equal(inits["w"], w)
    assert g_in == [("x", [1, 3, 8, 8])] and g_out == ["y"]


def _onnx_convnet(rng):
    """conv -> bn -> relu -> maxpool -> conv(dw) -> clip6 -> gap -> gemm."""
    C, O = 4, 8
    w1 = (rng.standard_normal((C, 3, 3, 3)) * 0.3).astype(np.float32)
    b1 = rng.standard_normal(C).astype(np.float32) * 0.1
    gamma = (1 + 0.1 * rng.standard_normal(C)).astype(np.float32)
    beta = rng.standard_normal(C).astype(np.float32) * 0.1
    mean = rng.standard_normal(C).astype(np.float32) * 0.1
    var = (1 + 0.1 * rng.standard_normal(C)).astype(np.float32) ** 2
    wd = (rng.standard_normal((C, 1, 3, 3)) * 0.3).astype(np.float32)
    wfc = (rng.standard_normal((O, C)) * 0.3).astype(np.float32)
    bfc = rng.standard_normal(O).astype(np.float32) * 0.1

    nodes = [
        node("Conv", ["x", "w1", "b1"], ["c1"], kernel_shape=[3, 3],
             pads=[1, 1, 1, 1], strides=[1, 1], group=1),
        node("BatchNormalization", ["c1", "gamma", "beta", "mean", "var"], ["bn"],
             epsilon=1e-5),
        node("Relu", ["bn"], ["r1"]),
        node("MaxPool", ["r1"], ["p1"], kernel_shape=[2, 2], strides=[2, 2]),
        node("Conv", ["p1", "wd"], ["c2"], kernel_shape=[3, 3],
             pads=[1, 1, 1, 1], strides=[1, 1], group=C),
        node("Clip", ["c2"], ["r2"], min=0.0, max=6.0),
        node("GlobalAveragePool", ["r2"], ["gap"]),
        node("Flatten", ["gap"], ["fl"], axis=1),
        node("Gemm", ["fl", "wfc", "bfc"], ["y"], transB=1),
    ]
    inits = dict(w1=w1, b1=b1, gamma=gamma, beta=beta, mean=mean, var=var,
                 wd=wd, wfc=wfc, bfc=bfc)
    m = model(nodes, inits, [("x", [1, 3, 16, 16])], ["y"])
    params = dict(w1=w1, b1=b1, gamma=gamma, beta=beta, mean=mean, var=var,
                  wd=wd, wfc=wfc, bfc=bfc)
    return m, params


def _torch_equivalent(params):
    import torch
    import torch.nn as nn

    C, O = 4, 8

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, C, 3, padding=1)
            self.bn = nn.BatchNorm2d(C)
            self.relu = nn.ReLU()
            self.pool = nn.MaxPool2d(2, 2)
            self.convd = nn.Conv2d(C, C, 3, padding=1, groups=C, bias=False)
            self.relu6 = nn.ReLU6()
            self.gap = nn.AdaptiveAvgPool2d(1)
            self.flat = nn.Flatten(1)
            self.fc = nn.Linear(C, O)

        def forward(self, x):
            x = self.pool(self.relu(self.bn(self.conv1(x))))
            x = self.relu6(self.convd(x))
            return self.fc(self.flat(self.gap(x)))

    net = Net().eval()
    with torch.no_grad():
        net.conv1.weight.copy_(torch.from_numpy(params["w1"]))
        net.conv1.bias.copy_(torch.from_numpy(params["b1"]))
        net.bn.weight.copy_(torch.from_numpy(params["gamma"]))
        net.bn.bias.copy_(torch.from_numpy(params["beta"]))
        net.bn.running_mean.copy_(torch.from_numpy(params["mean"]))
        net.bn.running_var.copy_(torch.from_numpy(params["var"]))
        net.convd.weight.copy_(torch.from_numpy(params["wd"]))
        net.fc.weight.copy_(torch.from_numpy(params["wfc"]))
        net.fc.bias.copy_(torch.from_numpy(params["bfc"]))
    return net


def test_onnx_vs_torch_frontend(rng):
    from tengine_tpu.convert.torch_frontend import from_torch
    import torch

    m, params = _onnx_convnet(rng)
    g_onnx = from_onnx(m)
    assert [n.op for n in g_onnx.toposorted()][:2] == ["Convolution", "BatchNormalization"]

    x = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    net = _torch_equivalent(params)
    g_torch = from_torch(net, torch.from_numpy(x))

    (y_onnx,) = compile_graph(g_onnx, Options()).run(x)
    (y_torch,) = compile_graph(g_torch, Options()).run(x)
    with torch.no_grad():
        y_ref = net(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(y_onnx, y_torch, atol=1e-5)
    np.testing.assert_allclose(y_onnx.reshape(y_ref.shape), y_ref, atol=1e-4)


def test_onnx_to_tmfile_roundtrip(tmp_path, rng):
    """onnx bytes -> IR -> tmfile -> reload -> same outputs."""
    import tengine_tpu as tt
    from tengine_tpu.serializer.tm2.writer import save_tmfile

    m, params = _onnx_convnet(rng)
    g = from_onnx(m)
    x = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    (y0,) = compile_graph(g, Options()).run(x)

    path = str(tmp_path / "m.tmfile")
    save_tmfile(g, path)
    g2 = tt.load_model(path)
    (y1,) = compile_graph(g2, Options()).run(x)
    np.testing.assert_allclose(y0, y1, atol=1e-6)


def test_onnx_misc_ops(rng):
    """Eltwise/concat/transpose/reshape/slice/resize paths."""
    w = (rng.standard_normal((4, 4, 1, 1)) * 0.3).astype(np.float32)
    nodes = [
        node("Conv", ["x", "w"], ["c"], kernel_shape=[1, 1], pads=[0, 0, 0, 0],
             strides=[1, 1], group=1),
        node("Add", ["c", "x"], ["a"]),
        node("Sigmoid", ["a"], ["s"]),
        node("Mul", ["a", "s"], ["m"]),  # silu
        node("Concat", ["m", "x"], ["cc"], axis=1),
        node("Slice", ["cc", "st", "en", "ax", "sp"], ["sl"]),
        node("Upsample", ["sl"], ["up"], mode="nearest", scales=[1.0, 1.0, 2.0, 2.0]),
        node("Transpose", ["up"], ["tr"], perm=[0, 2, 3, 1]),
        node("Reshape", ["tr", "shp"], ["y"]),
    ]
    inits = dict(
        w=w,
        st=np.asarray([0], np.int64), en=np.asarray([4], np.int64),
        ax=np.asarray([1], np.int64), sp=np.asarray([2], np.int64),
        shp=np.asarray([1, -1], np.int64),
    )
    m = model(nodes, inits, [("x", [1, 4, 6, 6])], ["y"])
    g = from_onnx(m)
    x = rng.standard_normal((1, 4, 6, 6)).astype(np.float32)
    (y,) = compile_graph(g, Options()).run(x)

    # numpy reference
    c = np.einsum("oihw,nihw->nohw", w[:, :, 0:1, 0:1][:, :, 0, 0][..., None, None] * np.ones((1, 1, 1, 1), np.float32), x) if False else (
        np.tensordot(x.transpose(0, 2, 3, 1), w[:, :, 0, 0].T, axes=1).transpose(0, 3, 1, 2)
    )
    a = c + x
    mm = a * (1.0 / (1.0 + np.exp(-a)))
    cc = np.concatenate([mm, x], axis=1)
    sl = cc[:, 0:4:2]
    up = sl.repeat(2, axis=2).repeat(2, axis=3)
    tr = up.transpose(0, 2, 3, 1)
    ref = tr.reshape(1, -1)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


# ---- breadth tier (VERDICT r1 item 4): one import test per op family -------


def _run1(m, *xs, input_shape=None):
    g = from_onnx(m, input_shape=input_shape)
    return np.asarray(compile_graph(g).run(*xs)[0])


def test_onnx_unary_family(rng):
    x = (np.abs(rng.standard_normal((1, 3, 4, 4))) + 0.5).astype(np.float32)
    for op, fn in [
        ("Abs", np.abs), ("Neg", np.negative), ("Floor", np.floor),
        ("Ceil", np.ceil), ("Sqrt", np.sqrt), ("Exp", np.exp),
        ("Log", np.log), ("Sin", np.sin), ("Cos", np.cos),
        ("Reciprocal", lambda v: 1.0 / v), ("Round", np.round),
        ("Softplus", lambda v: np.log1p(np.exp(v))),
    ]:
        m = model([node(op, ["x"], ["y"])], {}, [("x", list(x.shape))], ["y"])
        np.testing.assert_allclose(_run1(m, x), fn(x), rtol=1e-5, atol=1e-5,
                                   err_msg=op)


def test_onnx_binary_family(rng):
    a = rng.standard_normal((1, 3, 4, 4)).astype(np.float32)
    b = (np.abs(rng.standard_normal((1, 3, 4, 4))) + 0.5).astype(np.float32)
    for op, fn in [
        ("Pow", np.power),
        ("Min", np.minimum), ("Max", np.maximum),
        ("Mean", lambda u, v: (u + v) / 2),
        ("Greater", lambda u, v: (u > v).astype(np.float32)),
        ("Less", lambda u, v: (u < v).astype(np.float32)),
        ("Equal", lambda u, v: (u == v).astype(np.float32)),
    ]:
        aa = np.abs(a) + 0.5 if op == "Pow" else a
        m = model([node(op, ["a", "b"], ["y"])], {},
                  [("a", list(a.shape)), ("b", list(b.shape))], ["y"])
        np.testing.assert_allclose(_run1(m, aa, b), fn(aa, b), rtol=1e-4,
                                   atol=1e-4, err_msg=op)


def test_onnx_reduce_family(rng):
    x = (np.abs(rng.standard_normal((2, 3, 4, 5))) + 0.1).astype(np.float32)
    for op, fn in [
        ("ReduceSum", lambda v: v.sum(axis=(2, 3), keepdims=True)),
        ("ReduceMean", lambda v: v.mean(axis=(2, 3), keepdims=True)),
        ("ReduceMax", lambda v: v.max(axis=(2, 3), keepdims=True)),
        ("ReduceMin", lambda v: v.min(axis=(2, 3), keepdims=True)),
        ("ReduceProd", lambda v: v.prod(axis=(2, 3), keepdims=True)),
        ("ReduceSumSquare", lambda v: (v * v).sum(axis=(2, 3), keepdims=True)),
        ("ReduceL1", lambda v: np.abs(v).sum(axis=(2, 3), keepdims=True)),
        ("ReduceLogSum", lambda v: np.log(v.sum(axis=(2, 3), keepdims=True))),
        ("ReduceLogSumExp",
         lambda v: np.log(np.exp(v).sum(axis=(2, 3), keepdims=True))),
    ]:
        m = model([node(op, ["x"], ["y"], axes=[2, 3], keepdims=1)], {},
                  [("x", [2, 3, 4, 5])], ["y"])
        np.testing.assert_allclose(_run1(m, x), fn(x), rtol=1e-4, atol=1e-4,
                                   err_msg=op)
    # ReduceL2 maps to the dedicated true-L2 op
    m = model([node("ReduceL2", ["x"], ["y"], axes=[1], keepdims=1)], {},
              [("x", [2, 3, 4, 5])], ["y"])
    want = np.sqrt((x * x).sum(axis=1, keepdims=True))
    np.testing.assert_allclose(_run1(m, x), want, rtol=1e-4, atol=1e-4)


def test_onnx_movement_family(rng):
    x = rng.standard_normal((1, 8, 4, 4)).astype(np.float32)
    # DepthToSpace DCR
    m = model([node("DepthToSpace", ["x"], ["y"], blocksize=2, mode="DCR")],
              {}, [("x", [1, 8, 4, 4])], ["y"])
    xn = x.transpose(0, 2, 3, 1)
    n, h, w, c = xn.shape
    want = (xn.reshape(n, h, w, 2, 2, c // 4).transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h * 2, w * 2, c // 4).transpose(0, 3, 1, 2))
    np.testing.assert_allclose(_run1(m, x), want, rtol=1e-6, atol=1e-6)
    # Gather (const indices, channel axis)
    idx = np.array([3, 1, 5], np.int64)
    m = model([node("Gather", ["x", "i"], ["y"], axis=1)], {"i": idx},
              [("x", [1, 8, 4, 4])], ["y"])
    np.testing.assert_allclose(_run1(m, x), x[:, [3, 1, 5]], rtol=1e-6, atol=0)
    # Tile (block semantics)
    reps = np.array([1, 2, 1, 3], np.int64)
    m = model([node("Tile", ["x", "r"], ["y"])], {"r": reps},
              [("x", [1, 8, 4, 4])], ["y"])
    np.testing.assert_allclose(_run1(m, x), np.tile(x, (1, 2, 1, 3)),
                               rtol=1e-6, atol=0)
    # Expand
    e = np.array([1, 8, 4, 4], np.int64)
    m = model([node("Expand", ["x2", "e"], ["y"])], {"e": e},
              [("x2", [1, 8, 1, 4])], ["y"])
    x2 = rng.standard_normal((1, 8, 1, 4)).astype(np.float32)
    np.testing.assert_allclose(_run1(m, x2), np.broadcast_to(x2, (1, 8, 4, 4)),
                               rtol=1e-6, atol=0)
    # Split into 2 along channels (attr form)
    m = model([node("Split", ["x"], ["y", "z"], axis=1, split=[5, 3])], {},
              [("x", [1, 8, 4, 4])], ["y"])
    np.testing.assert_allclose(_run1(m, x), x[:, :5], rtol=1e-6, atol=0)
    # ArgMax
    m = model([node("ArgMax", ["x"], ["y"], axis=1, keepdims=0)], {},
              [("x", [1, 8, 4, 4])], ["y"])
    np.testing.assert_array_equal(_run1(m, x), np.argmax(x, axis=1))
    # Where
    m = model([node("Greater", ["x", "x0"], ["c"]),
               node("Where", ["c", "x", "x0"], ["y"])], {},
              [("x", [1, 8, 4, 4]), ("x0", [1, 8, 4, 4])], ["y"])
    x0 = np.zeros_like(x)
    np.testing.assert_allclose(_run1(m, x, x0), np.maximum(x, 0), rtol=1e-6,
                               atol=0)


def test_onnx_norm_family(rng):
    x = rng.standard_normal((2, 4, 6, 6)).astype(np.float32)
    gam = (1 + 0.1 * rng.standard_normal(4)).astype(np.float32)
    bet = (0.1 * rng.standard_normal(4)).astype(np.float32)
    m = model([node("InstanceNormalization", ["x", "g", "b"], ["y"],
                    epsilon=1e-5)], {"g": gam, "b": bet},
              [("x", [2, 4, 6, 6])], ["y"])
    mean = x.mean(axis=(2, 3), keepdims=True)
    var = x.var(axis=(2, 3), keepdims=True)
    want = (x - mean) / np.sqrt(var + 1e-5) * gam.reshape(1, 4, 1, 1) + bet.reshape(1, 4, 1, 1)
    np.testing.assert_allclose(_run1(m, x), want, rtol=1e-4, atol=1e-4)
    # LRN
    m = model([node("LRN", ["x"], ["y"], size=3, alpha=2e-4, beta=0.75,
                    bias=1.0)], {}, [("x", [2, 4, 6, 6])], ["y"])
    out = _run1(m, x)
    assert out.shape == x.shape and np.isfinite(out).all()
    # PRelu
    slope = np.abs(rng.standard_normal(4)).astype(np.float32)
    m = model([node("PRelu", ["x", "s"], ["y"])], {"s": slope},
              [("x", [2, 4, 6, 6])], ["y"])
    want = np.where(x > 0, x, x * slope.reshape(1, 4, 1, 1))
    np.testing.assert_allclose(_run1(m, x), want, rtol=1e-5, atol=1e-5)


def test_onnx_lstm_gru(rng):
    import torch

    T, B, I, H = 5, 2, 3, 4
    x = rng.standard_normal((T, B, I)).astype(np.float32)
    # LSTM: ONNX gate order iofc; torch uses ifgo — build torch oracle
    W = (rng.standard_normal((1, 4 * H, I)) * 0.3).astype(np.float32)
    R = (rng.standard_normal((1, 4 * H, H)) * 0.3).astype(np.float32)
    Bi = (rng.standard_normal((1, 8 * H)) * 0.1).astype(np.float32)
    m = model([node("LSTM", ["x", "W", "R", "B"], ["y"], hidden_size=H)],
              {"W": W, "R": R, "B": Bi}, [("x", [T, B, I])], ["y"])
    out = _run1(m, x)
    assert out.shape == (T, 1, B, H)

    lstm = torch.nn.LSTM(I, H)
    # onnx iofc rows -> torch ifgo
    perm = np.r_[0:H, 2 * H:3 * H, 3 * H:4 * H, H:2 * H]
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(torch.from_numpy(W[0][perm]))
        lstm.weight_hh_l0.copy_(torch.from_numpy(R[0][perm]))
        lstm.bias_ih_l0.copy_(torch.from_numpy(Bi[0, :4 * H][perm]))
        lstm.bias_hh_l0.copy_(torch.from_numpy(Bi[0, 4 * H:][perm]))
        want = lstm(torch.from_numpy(x))[0].numpy()
    np.testing.assert_allclose(out[:, 0], want, rtol=1e-4, atol=1e-4)

    # GRU (zrh vs torch rzh), torch linear_before_reset=0 matches ours
    W3 = (rng.standard_normal((1, 3 * H, I)) * 0.3).astype(np.float32)
    R3 = (rng.standard_normal((1, 3 * H, H)) * 0.3).astype(np.float32)
    m = model([node("GRU", ["x", "W", "R"], ["y"], hidden_size=H)],
              {"W": W3, "R": R3}, [("x", [T, B, I])], ["y"])
    out = _run1(m, x)
    assert out.shape == (T, 1, B, H)
    gru = torch.nn.GRU(I, H, bias=False)
    permg = np.r_[H:2 * H, 0:H, 2 * H:3 * H]  # onnx z,r,h -> torch r,z,n
    with torch.no_grad():
        gru.weight_ih_l0.copy_(torch.from_numpy(W3[0][permg]))
        gru.weight_hh_l0.copy_(torch.from_numpy(R3[0][permg]))
        want = gru(torch.from_numpy(x))[0].numpy()
    np.testing.assert_allclose(out[:, 0], want, rtol=1e-3, atol=1e-3)
