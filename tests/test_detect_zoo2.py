"""Model-zoo batch 4 — the reference example families yolox / scrfd /
movenet (examples/tm_yolox.cpp, tm_scrfd.cpp, tm_movenet.cpp) plus the
full-size darknet nets yolov3 / yolo-fastest
(tests/models/test_model_yolov3.cpp, test_model_yolofastest.cpp):
fp32 parity vs the torch oracle, darknet import structure, host decodes."""

import numpy as np
import pytest

import tengine_tpu as tt
from tengine_tpu.utils.config import Options

torch = pytest.importorskip("torch")

from tengine_tpu.models.detect_zoo2 import (  # noqa: E402
    build_movenet_graph,
    build_scrfd_graph,
    build_yolox_graph,
    decode_movenet,
    decode_scrfd,
    decode_yolox,
)

CASES = {
    "yolox": (lambda: build_yolox_graph(img=64, width=16), (1, 3, 64, 64)),
    "scrfd": (lambda: build_scrfd_graph(img=64, width=8), (1, 3, 64, 64)),
    "movenet": (lambda: build_movenet_graph(img=64, width=8), (1, 3, 64, 64)),
}


def _build(name):
    torch.manual_seed(0)
    return CASES[name][0]()


@pytest.mark.parametrize("name", sorted(CASES))
def test_fp32_matches_torch(name):
    m, g = _build(name)
    x = np.random.default_rng(0).standard_normal(CASES[name][1]).astype(np.float32)
    with torch.no_grad():
        exp = m(torch.from_numpy(x))
    exp = [e.numpy() for e in (exp if isinstance(exp, tuple) else (exp,))]
    got = tt.compile_graph(g, Options(precision="fp32")).run(x)
    assert len(got) == len(exp)
    for a, b in zip(got, exp):
        np.testing.assert_allclose(a.reshape(b.shape), b, rtol=1e-3, atol=1e-4)


def test_yolox_decode():
    torch.manual_seed(0)
    _, g = build_yolox_graph(img=64, width=16)
    outs = tt.compile_graph(g, Options(precision="fp32")).run(
        np.zeros((1, 3, 64, 64), np.float32)
    )
    dets = decode_yolox([np.asarray(o) for o in outs], score_threshold=0.0)
    # anchor-free: one candidate per cell over strides 8/16/32
    assert dets.shape == (8 * 8 + 4 * 4 + 2 * 2, 6)
    assert (dets[:, 4] >= 0).all() and (dets[:, 4] <= 1).all()


def test_scrfd_decode_shapes():
    torch.manual_seed(0)
    _, g = build_scrfd_graph(img=64, width=8)
    outs = tt.compile_graph(g, Options(precision="fp32")).run(
        np.zeros((1, 3, 64, 64), np.float32)
    )
    boxes, kps = decode_scrfd([np.asarray(o) for o in outs], 64, score_threshold=0.0)
    n = 2 * (8 * 8 + 4 * 4 + 2 * 2)  # 2 anchors per cell
    assert boxes.shape == (n, 5) and kps.shape == (n, 5, 2)


def test_movenet_decode():
    torch.manual_seed(0)
    _, g = build_movenet_graph(img=64, width=8)
    outs = tt.compile_graph(g, Options(precision="fp32")).run(
        np.zeros((1, 3, 64, 64), np.float32)
    )
    kps, scores = decode_movenet(*[np.asarray(o) for o in outs], img=64)
    assert kps.shape == (17, 2) and scores.shape == (17,)
    assert (kps >= 0).all() and (kps <= 64).all()


# ---------------------------------------------------------------------------
# darknet full-size nets
# ---------------------------------------------------------------------------


def test_yolov3_full_structure():
    from tengine_tpu.models.darknet_zoo import build_yolov3_graph

    g = build_yolov3_graph(img=96)
    cg = tt.compile_graph(g, Options(precision="fp32"))
    outs = cg.run(np.random.default_rng(0).standard_normal((1, 3, 96, 96)).astype(np.float32))
    # 3 heads at strides 32/16/8, 255 = 3*(5+80) channels
    assert [tuple(o.shape) for o in outs] == [
        (1, 255, 3, 3),
        (1, 255, 6, 6),
        (1, 255, 12, 12),
    ]
    # darknet-53: 52 conv layers in the backbone + 23 head convs = 75
    n_conv = sum(1 for n in g.nodes if n.op == "Convolution")
    assert n_conv == 75


def test_yolofastest_structure():
    from tengine_tpu.models.darknet_zoo import build_yolofastest_graph

    g = build_yolofastest_graph(img=96)
    outs = tt.compile_graph(g, Options(precision="fp32")).run(
        np.random.default_rng(0).standard_normal((1, 3, 96, 96)).astype(np.float32)
    )
    assert [tuple(o.shape) for o in outs] == [(1, 255, 3, 3), (1, 255, 6, 6)]
    # every dw conv must really be depthwise (groups == channels)
    dw = [n for n in g.nodes if n.op == "Convolution" and n.params.get("group", 1) > 1]
    assert dw, "yolo-fastest must contain depthwise convolutions"


def test_yolov3_decode_roundtrip():
    from tengine_tpu.models.darknet_zoo import build_yolov3_graph, decode_darknet_yolo

    g = build_yolov3_graph(img=96)
    outs = tt.compile_graph(g, Options(precision="fp32")).run(
        np.zeros((1, 3, 96, 96), np.float32)
    )
    params = [n.params for n in g.nodes if n.op == "Dropout" and "classes" in n.params]
    assert len(params) == 3
    dets = decode_darknet_yolo(
        [np.asarray(o) for o in outs], params, img=96, score_threshold=0.0
    )
    assert dets.shape[1] == 6
