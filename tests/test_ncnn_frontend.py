"""ncnn front-end: .param text parsing, .bin blob order/flags, op mapping.

Oracle: torch.nn.functional."""

import struct

import numpy as np
import torch
import torch.nn.functional as F

from tengine_tpu.convert.ncnn_frontend import FLAG_FP32, from_ncnn, parse_param
from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.utils.config import Options


def test_parse_param():
    txt = """7767517
3 3
Input        data    0 1 data 0=8 1=8 2=3
Convolution  conv0   1 1 data c0 0=4 1=3 4=1 5=1 6=108 9=2 10=1,0.15
Slice        split0  1 2 c0 a b -23300=2,2,-233 1=0
"""
    layers = parse_param(txt)
    assert [l.op for l in layers] == ["Input", "Convolution", "Slice"]
    conv = layers[1]
    assert conv.geti(0) == 4 and conv.geti(6) == 108
    assert conv.attrs[10] == [0.15]
    assert layers[2].attrs[0] == [2.0, -233.0]
    assert layers[2].tops == ["a", "b"]


def _bin(*blobs_with_flag) -> bytes:
    """Encode (arr, with_flag) pairs as an ncnn .bin."""
    out = b""
    for arr, with_flag in blobs_with_flag:
        if with_flag:
            out += struct.pack("<I", FLAG_FP32)
        out += np.ascontiguousarray(arr, np.float32).tobytes()
    return out


def test_ncnn_end_to_end(rng):
    txt = """7767517
9 10
Input        data  0 1 data 0=8 1=8 2=3
Convolution  conv0 1 1 data c0 0=6 1=3 3=1 4=1 5=1 6=162 9=2 10=1,0.1
Split        sp0   1 2 c0 c0a c0b
Pooling      pool0 1 1 c0a p0 0=0 1=2 2=2 5=1
Pooling      pool1 1 1 c0b p1 0=1 1=2 2=2 5=1
Eltwise      add0  2 1 p0 p1 e0 0=1
BatchNorm    bn0   1 1 e0 b0 0=6 1=0.001
InnerProduct fc0   1 1 b0 f0 0=5 1=1 2=480
Softmax      sm0   1 1 f0 s0 0=0
"""
    w = rng.standard_normal((6, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    slope = rng.standard_normal(6).astype(np.float32)
    mean = rng.standard_normal(6).astype(np.float32)
    var = (np.abs(rng.standard_normal(6)) + 0.5).astype(np.float32)
    bnb = rng.standard_normal(6).astype(np.float32)
    wfc = rng.standard_normal((5, 6 * 4 * 4)).astype(np.float32)
    bfc = rng.standard_normal(5).astype(np.float32)

    blob = _bin((w, True), (b, False),
                (slope, False), (mean, False), (var, False), (bnb, False),
                (wfc, True), (bfc, False))
    g = from_ncnn(txt, blob)
    cg = compile_graph(g, Options())
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    out = np.asarray(cg(x)[0])

    xt = torch.from_numpy(x)
    y = F.conv2d(xt, torch.from_numpy(w), torch.from_numpy(b), padding=1)
    y = F.leaky_relu(y, 0.1)
    y = F.max_pool2d(y, 2, 2) + F.avg_pool2d(y, 2, 2)
    y = F.batch_norm(y, torch.from_numpy(mean), torch.from_numpy(var),
                     torch.from_numpy(slope), torch.from_numpy(bnb),
                     False, 0.0, 1e-3)
    y = F.linear(y.flatten(1), torch.from_numpy(wfc), torch.from_numpy(bfc))
    y = F.softmax(y, dim=1)
    np.testing.assert_allclose(out.reshape(1, 5), y.numpy(), rtol=2e-5, atol=2e-5)


def test_ncnn_slice_and_binary(rng):
    txt = """7767517
5 6
Input    data 0 1 data 0=4 1=4 2=4
Slice    sl0  1 2 data a b -23300=2,2,-233 1=0
BinaryOp sub0 2 1 a b d0 0=1
BinaryOp muls 1 1 d0 m0 0=2 1=1 2=0.5
UnaryOp  abs0 1 1 m0 u0 0=0
"""
    g = from_ncnn(txt, b"")
    cg = compile_graph(g, Options())
    x = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    out = np.asarray(cg(x)[0])
    ref = np.abs((x[:, :2] - x[:, 2:]) * 0.5)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_ncnn_weightless_shapes():
    txt = """7767517
3 3
Input         data  0 1 data 0=16 1=16 2=8
ConvolutionDepthWise conv0 1 1 data c0 0=8 1=3 3=2 4=1 5=0 6=72 7=8
ShuffleChannel shuf 1 1 c0 s0 0=2
"""
    g = from_ncnn(txt, None)
    conv = [n for n in g.nodes if n.op == "Convolution"][0]
    assert conv.params["group"] == 8
    assert conv.params["input_channel"] == 8
    cg = compile_graph(g, Options())
    out = cg(np.zeros((1, 8, 16, 16), np.float32))
    assert np.asarray(out[0]).shape == (1, 8, 8, 8)
