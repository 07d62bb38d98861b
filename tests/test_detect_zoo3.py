"""NanoDet-Plus and PicoDet families (detect_zoo3): fp32 parity vs torch,
quantized execution, and decoder sanity. Reference apps:
tm_nanodet_plus.cpp / tm_picodet.cpp."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import tengine_tpu as tt
from tengine_tpu.quantize.quantizer import quantize_graph
from tengine_tpu.utils.config import Options


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_nanodet_plus_fp32_matches_torch(rng):
    from tengine_tpu.models.detect_zoo3 import build_nanodet_plus_graph

    torch.manual_seed(0)
    m, g = build_nanodet_plus_graph(num_classes=8, img=64, width=16)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        exp = m(torch.from_numpy(x)).numpy()
    (got,) = tt.compile_graph(g, Options(precision="fp32")).run(x)
    # merged output: [1, priors(8/16/32/64 grids), 8 + 4*(reg_max+1)]
    n_priors = sum((-(-64 // s)) ** 2 for s in (8, 16, 32, 64))
    assert exp.shape == (1, n_priors, 8 + 32)
    np.testing.assert_allclose(got.reshape(exp.shape), exp, rtol=1e-3, atol=1e-4)


def test_nanodet_plus_decode_and_quantized(rng):
    from tengine_tpu.models.detect_zoo3 import (
        build_nanodet_plus_graph, decode_nanodet_plus,
    )
    from tengine_tpu.ops import qmath

    torch.manual_seed(0)
    m, g = build_nanodet_plus_graph(num_classes=8, img=64, width=16)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    qg = quantize_graph(g, [x], scheme="uint8", algorithm="minmax")
    cg = tt.compile_graph(qg, Options(quant_mode="fast"))
    t_in = qg.tensors[qg.input_tensors[0]]
    (got,) = cg.run(qmath.quantize_np(x, t_in.quant, t_in.dtype))
    out_t = qg.tensors[qg.nodes[qg.outputs[0]].outputs[0]]
    outf = qmath.dequantize_np(np.asarray(got, np.float32), out_t.quant)

    with torch.no_grad():
        exp = m(torch.from_numpy(x)).numpy()
    dq = decode_nanodet_plus(outf.reshape(exp.shape), 64, num_classes=8,
                             score_threshold=0.0)
    de = decode_nanodet_plus(exp, 64, num_classes=8, score_threshold=0.0)
    assert dq.shape == de.shape and dq.shape[1] == 6
    # random-weight scores hover near 0.5; box geometry must agree closely
    np.testing.assert_allclose(dq[:, 4], de[:, 4], atol=0.1)


def test_picodet_fp32_matches_torch_and_decodes(rng):
    from tengine_tpu.models.detect_zoo3 import build_picodet_graph, decode_picodet

    torch.manual_seed(0)
    m, g = build_picodet_graph(num_classes=8, img=64, width=16)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        exp = [e.numpy() for e in m(torch.from_numpy(x))]
    got = tt.compile_graph(g, Options(precision="fp32")).run(x)
    assert len(got) == 8  # 4 levels x (cls, dis)
    for a, b in zip(got, exp):
        np.testing.assert_allclose(a.reshape(b.shape), b, rtol=1e-3, atol=1e-4)

    dets = decode_picodet(exp, 64, num_classes=8, score_threshold=0.0)
    assert dets.shape[1] == 6
    # DFL distances are bounded by reg_max * stride around in-image centers
    lim = 7 * 64
    assert (dets[:, :4].min() > -lim) and (dets[:, :4].max() < 64 + lim)
    assert (dets[:, 4] >= 0).all() and (dets[:, 4] <= 1).all()


def test_picodet_quantized_runs(rng):
    from tengine_tpu.models.detect_zoo3 import build_picodet_graph

    torch.manual_seed(0)
    _, g = build_picodet_graph(num_classes=8, img=64, width=16)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    from tengine_tpu.ops import qmath

    qg = quantize_graph(g, [x], scheme="int8", algorithm="minmax")
    cg = tt.compile_graph(qg, Options(quant_mode="fast"))
    t_in = qg.tensors[qg.input_tensors[0]]
    outs = cg.run(qmath.quantize_np(x, t_in.quant, t_in.dtype))
    assert len(outs) == 8
