"""Model families from the reference integration-test zoo
(tests/models/test_model_{alphapose,nanodet_m,ultraface}.cpp):
fp32 parity vs the torch oracle + quantized agreement + host decodes."""

import numpy as np
import pytest

import tengine_tpu as tt
from tengine_tpu.utils.config import Options

torch = pytest.importorskip("torch")

from tengine_tpu.models.detect_zoo import (  # noqa: E402
    build_fastpose_graph,
    build_nanodet_graph,
    build_ultraface_graph,
    decode_nanodet,
    decode_pose_heatmaps,
    decode_ultraface,
    flatten_ultraface,
    ultraface_priors,
)

CASES = {
    "fastpose": (lambda: build_fastpose_graph(img_h=64, img_w=48), (1, 3, 64, 48)),
    "nanodet": (lambda: build_nanodet_graph(img=64), (1, 3, 64, 64)),
    "ultraface": (lambda: build_ultraface_graph(img_h=64, img_w=64), (1, 3, 64, 64)),
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
    for a, b in zip(got, exp):
        np.testing.assert_allclose(a.reshape(b.shape), b, rtol=1e-3, atol=1e-4)


# ultraface's deepest head sits 12 dw-pw layers deep with 2x2 spatial at
# this test resolution; with RANDOM weights 8-bit activation rounding
# accumulates to cosine ~0.88 there (scheme-independent — verified equal
# for int8/uint8), so its gate is looser. Real weights behave like the
# reference quant tools' per-layer 0.95+ (tools/quantize/README.md).
@pytest.mark.parametrize("name,scheme,gate", [
    ("fastpose", "int8", 0.95),
    ("nanodet", "uint8", 0.95),
    ("ultraface", "int8", 0.85),
])
def test_quantized_agreement(name, scheme, gate):
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph

    _, g = _build(name)
    rng = np.random.default_rng(1)
    calib = [rng.standard_normal(CASES[name][1]).astype(np.float32) for _ in range(2)]
    qg = quantize_graph(g, calib, scheme=scheme, algorithm="minmax")
    x = calib[0]
    fp = tt.compile_graph(g, Options(precision="fp32")).run(x)
    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(x, t_in.quant, t_in.dtype)
    qres = tt.compile_graph(qg, Options(quant_mode="fast")).run(xq)
    out_ids = [qg.nodes[i].outputs[0] for i in qg.outputs]
    for tid, got, ref in zip(out_ids, qres, fp):
        t = qg.tensors[tid]
        deq = qmath.dequantize_np(np.asarray(got, np.float32), t.quant)
        cos = np.dot(deq.ravel(), ref.ravel()) / (
            np.linalg.norm(deq) * np.linalg.norm(ref) + 1e-9
        )
        assert cos > gate, f"{name} {t.name} cosine {cos:.4f}"


def test_pose_decode():
    hm = np.zeros((1, 17, 16, 12), np.float32)
    hm[0, :, 5, 7] = 3.0
    kps, scores = decode_pose_heatmaps(hm)
    assert kps.shape == (1, 17, 2) and (scores == 3.0).all()
    assert (kps[0, 0] == [28.0, 20.0]).all()  # 4x stride


def test_nanodet_decode_shapes():
    _, g = _build("nanodet")
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    outs = tt.compile_graph(g, Options(precision="fp32")).run(x)
    dets = decode_nanodet(outs, score_threshold=0.0)
    assert dets.shape[1] == 6 and len(dets) > 0
    assert (dets[:, 4] >= 0).all() and (dets[:, 4] <= 1).all()


def test_ultraface_decode_shapes():
    _, g = _build("ultraface")
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    outs = tt.compile_graph(g, Options(precision="fp32")).run(x)
    scores, boxes = flatten_ultraface(outs)
    priors = ultraface_priors(64, 64)
    assert scores.shape[1] == boxes.shape[1] == priors.shape[0]
    dets = decode_ultraface(scores, boxes, priors, score_threshold=0.0)
    assert dets.shape[1] == 5


def test_hrnet_fp32_matches_torch():
    from tengine_tpu.models.detect_zoo import build_hrnet_graph

    torch.manual_seed(0)
    m, g = build_hrnet_graph(img=64)
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        exp = m(torch.from_numpy(x)).numpy()
    (got,) = tt.compile_graph(g, Options(precision="fp32")).run(x)
    assert got.reshape(exp.shape).shape == (1, 16, 16, 16)  # J, /4, /4
    np.testing.assert_allclose(got.reshape(exp.shape), exp, rtol=1e-3, atol=1e-4)


def test_yolact_fp32_and_mask_assembly():
    from tengine_tpu.models.detect_zoo import assemble_yolact_masks, build_yolact_graph

    torch.manual_seed(0)
    m, g = build_yolact_graph(img=64)
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        exp = [e.numpy() for e in m(torch.from_numpy(x))]
    got = tt.compile_graph(g, Options(precision="fp32")).run(x)
    assert len(got) == 10  # proto + 3 levels x (cls, box, coef)
    for a, b in zip(got, exp):
        np.testing.assert_allclose(a.reshape(b.shape), b, rtol=1e-3, atol=1e-4)
    proto = got[0].reshape(exp[0].shape)[0]          # [P, H/4, W/4]
    coeffs = np.random.default_rng(1).standard_normal((5, proto.shape[0])).astype(np.float32)
    masks = assemble_yolact_masks(proto, coeffs)
    assert masks.shape == (5, proto.shape[1], proto.shape[2])
    assert (masks > 0).all() and (masks < 1).all()


def test_yolov4_tiny_darknet_build_and_run():
    """yolov4-tiny from its cfg through the darknet front-end: CSP grouped
    routes, two yolo heads (strides 32/16), host decode."""
    from tengine_tpu.models.darknet_zoo import (
        build_yolov4_tiny_graph,
        decode_darknet_yolo,
    )

    g = build_yolov4_tiny_graph(img=160)
    yolo = [n for n in g.nodes if n.op == "Dropout" and "classes" in n.params]
    assert [n.params["mask"] for n in yolo] == [[3, 4, 5], [1, 2, 3]]
    x = np.random.default_rng(0).standard_normal((1, 3, 160, 160)).astype(np.float32)
    outs = tt.compile_graph(g, Options(precision="fp32")).run(x)
    assert [o.shape[-1] for o in outs] == [5, 10]    # strides 32, 16
    dets = decode_darknet_yolo(outs, [n.params for n in yolo], 160, 0.3)
    assert dets.shape[1] == 6


@pytest.mark.parametrize("name,build,shape", [
    ("openpose", "build_openpose_graph", (1, 3, 64, 64)),
    ("efficientdet", "build_efficientdet_graph", (1, 3, 64, 64)),
    ("landmark", "build_landmark_graph", (1, 3, 64, 64)),
])
def test_batch3_fp32_matches_torch(name, build, shape):
    import tengine_tpu.models.detect_zoo as dz

    torch.manual_seed(0)
    m, g = getattr(dz, build)(img=shape[-1])
    x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
    with torch.no_grad():
        exp = m(torch.from_numpy(x))
    exp = [e.numpy() for e in (exp if isinstance(exp, tuple) else (exp,))]
    got = tt.compile_graph(g, Options(precision="fp32")).run(x)
    for a, b in zip(got, exp):
        np.testing.assert_allclose(a.reshape(b.shape), b, rtol=1e-3, atol=1e-4)


def test_landmark_output_contract():
    """test_model_landmark.cpp expects 106 points x 2 = 212 values."""
    from tengine_tpu.models.detect_zoo import build_landmark_graph

    torch.manual_seed(0)
    _, g = build_landmark_graph(img=64)
    x = np.zeros((1, 3, 64, 64), np.float32)
    (out,) = tt.compile_graph(g, Options(precision="fp32")).run(x)
    assert out.reshape(1, -1).shape == (1, 212)
