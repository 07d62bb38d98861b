"""Caffe front-end: prototxt text-format parsing + caffemodel blobs + import."""

import numpy as np

from tengine_tpu.convert.caffe_frontend import (
    from_caffe,
    parse_caffemodel,
    parse_prototxt,
)
from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.utils.config import Options

from test_execute_small import conv2d_numpy
from test_onnx_frontend import _f, _i, _ld, _s, _vint
import struct


def test_parse_prototxt():
    txt = """
    name: "toy"   # comment
    input: "data"
    input_dim: 1 input_dim: 3 input_dim: 8 input_dim: 8
    layer {
      name: "conv1" type: "Convolution"
      bottom: "data" top: "conv1"
      convolution_param { num_output: 4 kernel_size: 3 pad: 1 stride: 2 }
    }
    layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
    """
    net = parse_prototxt(txt)
    assert net["name"] == "toy"
    assert net["input_dim"] == [1, 3, 8, 8]
    layers = net["layer"]
    assert layers[0]["type"] == "Convolution"
    assert layers[0]["convolution_param"]["num_output"] == 4
    assert layers[1]["bottom"] == "conv1"


def _blob(arr: np.ndarray) -> bytes:
    shape = b"".join(_i(1, d) for d in arr.shape)
    data = np.ascontiguousarray(arr, np.float32).tobytes()
    return _ld(7, shape) + _ld(5, data)


def _layer(name: str, blobs) -> bytes:
    out = _s(1, name)
    for b in blobs:
        out += _ld(7, _blob(b))
    return out


def make_caffemodel(weights: dict) -> bytes:
    return b"".join(_ld(100, _layer(k, v)) for k, v in weights.items())


def test_caffemodel_blob_roundtrip(rng):
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    blobs = parse_caffemodel(make_caffemodel({"conv1": [w, b]}))
    np.testing.assert_array_equal(blobs["conv1"][0], w)
    np.testing.assert_array_equal(blobs["conv1"][1], b)


PROTOTXT = """
name: "caffenet-mini"
input: "data"
input_dim: 1 input_dim: 3 input_dim: 8 input_dim: 8
layer {
  name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 4 kernel_size: 3 pad: 1 stride: 1 }
}
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "relu1" }
layer {
  name: "pool1" type: "Pooling" bottom: "relu1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 }
}
layer {
  name: "fc1" type: "InnerProduct" bottom: "pool1" top: "fc1"
  inner_product_param { num_output: 5 }
}
layer { name: "prob" type: "Softmax" bottom: "fc1" top: "prob" }
"""


def test_caffe_end_to_end(rng):
    w1 = (rng.standard_normal((4, 3, 3, 3)) * 0.3).astype(np.float32)
    b1 = (rng.standard_normal(4) * 0.1).astype(np.float32)
    wf = (rng.standard_normal((5, 4 * 4 * 4)) * 0.2).astype(np.float32)
    bf = (rng.standard_normal(5) * 0.1).astype(np.float32)
    model = make_caffemodel({"conv1": [w1, b1], "fc1": [wf.reshape(5, 4, 4, 4), bf]})

    g = from_caffe(PROTOTXT, model)
    assert [n.op for n in g.toposorted()] == [
        "Convolution", "ReLu", "Pooling", "FullyConnected", "Softmax"
    ]
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    (y,) = compile_graph(g, Options()).run(x)

    # numpy reference
    c = conv2d_numpy(x, w1, b1, stride=1, pad=1, group=1)
    r = np.maximum(c, 0)
    p = r.reshape(1, 4, 4, 2, 4, 2).max(axis=(3, 5))
    f = p.reshape(1, -1) @ wf.T + bf
    e = np.exp(f - f.max())
    ref = e / e.sum()
    np.testing.assert_allclose(y.reshape(ref.shape), ref, rtol=1e-4, atol=1e-5)
