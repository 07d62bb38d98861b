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
