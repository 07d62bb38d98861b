"""Darknet front-end: cfg parsing, weights blob order/BN fold, op mapping.

Oracle: torch.nn.functional on the same tensors (the per-op golden suite's
pattern, tests/test_op_golden_torch.py)."""

import struct

import numpy as np
import torch
import torch.nn.functional as F

from tengine_tpu.convert.darknet_frontend import from_darknet, parse_cfg
from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.utils.config import Options


def test_parse_cfg():
    txt = """
# a comment
[net]
height=8
width=8
channels=3

[convolutional]
batch_normalize=1
filters=4
size=3
stride=1
pad=1
activation=leaky   # trailing comment

[maxpool]
size=2
stride=2
"""
    sections = parse_cfg(txt)
    assert [s[0] for s in sections] == ["net", "convolutional", "maxpool"]
    assert sections[1][1]["filters"] == "4"
    assert sections[1][1]["activation"] == "leaky"


def _weights_blob(*arrays) -> bytes:
    """Darknet .weights: header (0,2,0 + seen double) then raw floats."""
    out = struct.pack("<iii", 0, 2, 0) + struct.pack("<d", 0.0)
    for a in arrays:
        out += np.ascontiguousarray(a, np.float32).tobytes()
    return out


CFG = """
[net]
height=8
width=8
channels=4

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
filters=8
size=1
stride=1
pad=0
activation=linear

[shortcut]
from=-2
activation=linear

[route]
layers=-1
groups=2
group_id=1

[convolutional]
filters=4
size=1
stride=1
activation=mish

[upsample]
stride=2

[route]
layers=-1,-7

[yolo]
classes=2
num=3
anchors=10,14, 23,27, 37,58
mask=0,1,2
"""


def test_darknet_end_to_end(rng):
    c_in, h = 4, 8
    # conv1: 8 filters 3x3 with BN
    w1 = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)
    b1 = rng.standard_normal(8).astype(np.float32)
    s1 = rng.standard_normal(8).astype(np.float32)
    m1 = rng.standard_normal(8).astype(np.float32)
    v1 = np.abs(rng.standard_normal(8)).astype(np.float32) + 0.5
    # conv2: 8 filters 1x1 no BN
    b2 = rng.standard_normal(8).astype(np.float32)
    w2 = rng.standard_normal((8, 8, 1, 1)).astype(np.float32)
    # conv3: 4 filters 1x1 no BN (after route groups=2 -> 4 channels in)
    b3 = rng.standard_normal(4).astype(np.float32)
    w3 = rng.standard_normal((4, 4, 1, 1)).astype(np.float32)

    blob = _weights_blob(b1, s1, m1, v1, w1, b2, w2, b3, w3)
    g = from_darknet(CFG, blob)

    x = rng.standard_normal((1, c_in, h, h)).astype(np.float32)
    cg = compile_graph(g, Options())
    outs = cg(x)
    assert len(outs) == 1  # single yolo head

    # torch oracle with the same BN fold
    xt = torch.from_numpy(x)
    scale = torch.from_numpy(s1 / np.sqrt(v1 + 1e-5))
    w1f = torch.from_numpy(w1) * scale[:, None, None, None]
    b1f = torch.from_numpy(b1) - torch.from_numpy(m1) * scale
    y1 = F.leaky_relu(F.conv2d(xt, w1f, b1f, padding=1), 0.1)  # layer1
    y2 = F.max_pool2d(y1, 2, 2)                                # layer2
    y3 = F.conv2d(y2, torch.from_numpy(w2), torch.from_numpy(b2))  # layer3
    y4 = y3 + y2                                               # shortcut
    y5 = y4[:, 4:, :, :]                                       # route groups=2 id=1
    y6raw = F.conv2d(y5, torch.from_numpy(w3), torch.from_numpy(b3))
    y6 = y6raw * torch.tanh(F.softplus(y6raw))                 # mish
    y7 = F.interpolate(y6, scale_factor=2, mode="nearest")     # upsample
    y8 = torch.cat([y7, y1], dim=1)                            # route -1,-7

    np.testing.assert_allclose(np.asarray(outs[0]), y8.numpy(), rtol=2e-5, atol=2e-5)


def test_darknet_weight_mismatch_raises(rng):
    # weights file with too few floats must raise, not silently misparse
    blob = _weights_blob(np.zeros(3, np.float32))
    try:
        from_darknet(CFG, blob)
    except ValueError as e:
        assert "truncated" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_darknet_weightless_build():
    g = from_darknet(CFG, None)
    ops = [n.op for n in g.nodes]
    assert ops.count("Convolution") == 3
    assert "Reorg" not in ops
    assert "Concat" in ops and "Slice" in ops and "Upsample" in ops
    # yolo head params kept for host-side decode
    yolo = [n for n in g.nodes if n.op == "Dropout"][0]
    assert yolo.params["classes"] == 2
    assert yolo.params["mask"] == [0, 1, 2]


def test_darknet_classifier_sections(rng):
    cfg = """
[net]
height=8
width=8
channels=2

[convolutional]
filters=4
size=3
stride=1
pad=1
activation=relu

[avgpool]

[connected]
output=5
activation=linear

[softmax]
"""
    w1 = rng.standard_normal((4, 2, 3, 3)).astype(np.float32)
    b1 = rng.standard_normal(4).astype(np.float32)
    bfc = rng.standard_normal(5).astype(np.float32)
    wfc = rng.standard_normal((5, 4)).astype(np.float32)
    g = from_darknet(cfg, _weights_blob(b1, w1, bfc, wfc))
    cg = compile_graph(g, Options())
    x = rng.standard_normal((1, 2, 8, 8)).astype(np.float32)
    out = np.asarray(cg(x)[0])

    xt = torch.from_numpy(x)
    y = F.relu(F.conv2d(xt, torch.from_numpy(w1), torch.from_numpy(b1), padding=1))
    y = y.mean(dim=(2, 3))
    y = F.linear(y, torch.from_numpy(wfc), torch.from_numpy(bfc))
    y = F.softmax(y, dim=1)
    np.testing.assert_allclose(out.reshape(1, 5), y.numpy(), rtol=2e-5, atol=2e-5)
