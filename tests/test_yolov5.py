"""YOLOv5s (BASELINE.json config 4) — fp32 parity vs the torch oracle and
quantized-run agreement. Small input (64x64) keeps the CPU-backend suite
fast; the arch is identical at 640 (fully convolutional)."""

import numpy as np
import pytest

import tengine_tpu as tt
from tengine_tpu.utils.config import Options

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def y5():
    from tengine_tpu.models.yolov5 import build_yolov5s_graph

    m, g = build_yolov5s_graph(num_classes=80, img=64)
    return m, g


def test_yolov5s_fp32_matches_torch(y5):
    m, g = y5
    x = torch.from_numpy(
        np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    )
    with torch.no_grad():
        expected = [o.numpy() for o in m(x)]
    outs = tt.compile_graph(g, Options(precision="fp32")).run(x.numpy())
    assert len(outs) == 3
    for got, exp in zip(outs, expected):
        np.testing.assert_allclose(
            got.reshape(exp.shape), exp, rtol=2e-3, atol=2e-3
        )


def test_yolov5s_focus_folded_into_6x6_conv(y5):
    _, g = y5
    ops = {n.op for n in g.nodes}
    # fuse_focus folds the 4 slices + concat into the stem conv;
    # split_concat_conv1x1 then removes every remaining channel concat
    assert "StridedSlice" not in ops and "Upsample" in ops
    assert "Concat" not in ops
    stem = next(n for n in g.nodes if n.op == "Convolution")
    p = stem.params
    assert (p["kernel_h"], p["kernel_w"], p["stride_h"], p["pad_h0"]) == (6, 6, 2, 2)
    assert p["input_channel"] == 3


def test_yolov5s_spp_decomposed(y5):
    """decompose_spp rewrites the 5/9/13 SPP pools as a chain of 5x5 pools
    (SPPF form) — numerics covered by the torch-oracle test above."""
    _, g = y5
    pools = [n for n in g.nodes if n.op == "Pooling"]
    assert len(pools) == 3
    assert all(n.params["kernel_h"] == 5 for n in pools)
    # chained: pool i+1 consumes pool i's output
    assert pools[1].inputs == [pools[0].outputs[0]]
    assert pools[2].inputs == [pools[1].outputs[0]]


def test_fuse_focus_exact():
    """Folded 6x6/s2 stem == explicit slices+concat+3x3 stem, fp32 (the
    transform is a weight re-indexing, not an approximation)."""
    from tengine_tpu.models.yolov5 import build_yolov5s_graph

    x = np.random.default_rng(3).standard_normal((1, 3, 64, 64)).astype(np.float32)
    outs = []
    for fold in (False, True):
        torch.manual_seed(0)
        _, g = build_yolov5s_graph(num_classes=80, img=64, fold_focus=fold)
        outs.append(tt.compile_graph(g, Options(precision="fp32")).run(x))
    for a, b in zip(*outs):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_yolov5s_int8_agreement(y5):
    from tengine_tpu.quantize.quantizer import quantize_graph

    m, g = y5
    rng = np.random.default_rng(1)
    calib = [rng.standard_normal((1, 3, 64, 64)).astype(np.float32) for _ in range(2)]
    qg = quantize_graph(g, calib, scheme="int8", algorithm="minmax")

    x = calib[0]
    fp = tt.compile_graph(g, Options(precision="fp32")).run(x)
    from tengine_tpu.ops import qmath

    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(x, t_in.quant, t_in.dtype)
    qres = tt.compile_graph(qg, Options(quant_mode="fast")).run(xq)
    for tid, got in zip(
        [qg.nodes[i].outputs[0] for i in qg.outputs], qres
    ):
        t = qg.tensors[tid]
        deq = qmath.dequantize_np(np.asarray(got, np.float32), t.quant)
        ref = fp[[qg.nodes[i].outputs[0] for i in qg.outputs].index(tid)]
        cos = np.dot(deq.ravel(), ref.ravel()) / (
            np.linalg.norm(deq) * np.linalg.norm(ref) + 1e-9
        )
        # per-layer cosine gate, like the reference quant tools' Step Evaluate
        assert cos > 0.95, f"head {t.name} cosine {cos:.4f}"


def test_yolov5s_silu_fused(y5):
    """All backbone/neck convs carry the fused SiLU (ACT_SILU); no
    free-standing Sigmoid/BroadMul pairs survive except none at all."""
    from tengine_tpu.ops.lowering import ACT_SILU

    _, g = y5
    n_silu = sum(
        1 for n in g.nodes if n.op in ("Convolution", "Eltwise")
        and n.params.get("activation") == ACT_SILU
    )
    # every ConvBNSiLU block keeps its fused SiLU — on the conv itself, or
    # on the final sum when split_concat_conv1x1 decomposed it
    assert n_silu > 50, n_silu
    assert not any(n.op in ("Sigmoid", "BroadMul") for n in g.nodes)
