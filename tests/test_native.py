"""Native C++ layer tests: build, numerics vs numpy fallbacks, tm2 scan."""

import numpy as np
import pytest

from tengine_tpu import native


def test_native_builds():
    assert native.available(), "g++ is in the image; native build should work"


def test_resize_matches_fallback(rng):
    img = rng.integers(0, 255, (37, 53, 3)).astype(np.uint8)
    a = native.resize_bilinear(img, 24, 24)
    # force fallback path
    lib = native._LIB
    try:
        native._LIB = None
        native._TRIED = True
        b = native.resize_bilinear(img, 24, 24)
    finally:
        native._LIB = lib
    assert a.shape == b.shape == (24, 24, 3)
    # implementations may differ by 1 LSB on rounding
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_normalize_and_quantize(rng):
    img = rng.integers(0, 255, (8, 9, 3)).astype(np.uint8)
    mean = np.array([104.0, 117.0, 123.0], np.float32)
    scale = np.array([0.017, 0.017, 0.017], np.float32)
    out = native.normalize_chw(img, mean, scale)
    ref = ((img.astype(np.float32) - mean) * scale).transpose(2, 0, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-6)

    x = rng.standard_normal(1000).astype(np.float32)
    q = native.quantize_u8(x, 0.05, 128)
    ref_q = np.clip(np.rint(x / 0.05) + 128, 0, 255).astype(np.uint8)
    assert np.abs(q.astype(int) - ref_q.astype(int)).max() <= 1


def test_letterbox(rng):
    img = rng.integers(0, 255, (30, 60, 3)).astype(np.uint8)
    out = native.letterbox(img, 64, 64, pad_value=114)
    assert out.shape == (64, 64, 3)
    # top/bottom bands are padding
    assert (out[:15] == 114).all() and (out[-15:] == 114).all()


def _graphs_equal(a, b):
    assert (a.name, a.layout, a.model_layout, a.source_format) == (
        b.name, b.layout, b.model_layout, b.source_format
    )
    assert a.inputs == b.inputs and a.outputs == b.outputs
    assert len(a.tensors) == len(b.tensors) and len(a.nodes) == len(b.nodes)
    for ta, tb in zip(a.tensors, b.tensors):
        assert (ta.name, ta.dtype, ta.shape, ta.tensor_type) == (
            tb.name, tb.dtype, tb.shape, tb.tensor_type
        )
        assert (ta.quant is None) == (tb.quant is None)
        if ta.quant:
            assert np.array_equal(ta.quant.scales, tb.quant.scales)
            assert np.array_equal(ta.quant.zero_points, tb.quant.zero_points)
            assert ta.quant.width == tb.quant.width
        assert (ta.data is None) == (tb.data is None)
        if ta.data is not None:
            assert np.array_equal(ta.data, tb.data)
    for na, nb in zip(a.nodes, b.nodes):
        assert (na.op, na.name, na.inputs, na.outputs) == (
            nb.op, nb.name, nb.inputs, nb.outputs
        )
        assert list(na.params.keys()) == list(nb.params.keys()), na.op
        for k in na.params:
            va, vb = na.params[k], nb.params[k]
            assert type(va) is type(vb), (na.op, k, va, vb)
            assert va == vb, (na.op, k, va, vb)


@pytest.mark.parametrize(
    "fname",
    [
        "squeezenet_v1.1_benchmark.tmfile",
        "mobilenet_benchmark.tmfile",
        "mssd_benchmark.tmfile",        # PriorBox/DetectionOutput vec params
        "retinaface_benchmark.tmfile",
        "yolov3_tiny_benchmark.tmfile",
        "mobilenet_v3_benchmark.tmfile",
    ],
)
def test_native_tm2_parser_equals_python(fname):
    """Native serializer (tm2_parser.cc) must produce the identical IR the
    pure-Python reader does — params byte-for-byte, weights view-for-view."""
    if not native.available():
        pytest.skip("native unavailable")
    from tengine_tpu.serializer.tm2.reader import load_tm_bytes, load_tm_bytes_py

    with open(f"/root/reference/benchmark/models/{fname}", "rb") as f:
        data = f.read()
    gp = load_tm_bytes_py(data, name=fname, fill_missing_weights="random")
    gn = load_tm_bytes(data, name=fname, fill_missing_weights="random")
    _graphs_equal(gp, gn)


def test_native_tm2_parser_quantized_roundtrip(rng):
    """Writer output (with real weights + per-channel quant params) parses
    identically through both parsers."""
    if not native.available():
        pytest.skip("native unavailable")
    from tengine_tpu.serializer.tm2.reader import load_tm_bytes, load_tm_bytes_py
    from tengine_tpu.serializer.tm2.writer import graph_to_tm_bytes
    from tests.test_quantize import make_quant_conv_graph

    _, qg, _ = make_quant_conv_graph("int8", rng)
    data = graph_to_tm_bytes(qg)
    _graphs_equal(load_tm_bytes_py(data), load_tm_bytes(data))


def test_native_tm2_parser_rejects_malformed():
    """Bounds-checked parse: truncated/corrupt files raise, never crash
    (the reference's loader trusts the file; ours must not)."""
    if not native.available():
        pytest.skip("native unavailable")
    with open(
        "/root/reference/benchmark/models/mobilenet_benchmark.tmfile", "rb"
    ) as f:
        data = f.read()
    with pytest.raises(ValueError):
        native.tm2_parse(data[: len(data) // 3])
    bad = bytearray(data)
    bad[8:12] = (0xFFFFFFF0).to_bytes(4, "little")  # root offset past EOF
    with pytest.raises(ValueError):
        native.tm2_parse(bytes(bad))
    with pytest.raises(ValueError):
        native.tm2_parse(b"\x07\x00bogus")


def test_native_nms_matches_fallback(rng):
    boxes = rng.uniform(0, 100, (200, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(1, 40, (200, 2)).astype(np.float32)
    scores = rng.uniform(0, 1, 200).astype(np.float32)
    a = native.nms(boxes, scores, 0.45)
    lib = native._LIB
    try:
        native._LIB = None
        native._TRIED = True
        b = native.nms(boxes, scores, 0.45)
    finally:
        native._LIB = lib
    assert np.array_equal(a, b)


def test_preprocess_batch_matches_scalar_path(rng):
    """Threaded batch preprocessor == per-image resize+normalize(+quantize)."""
    images = [
        rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        for h, w in [(40, 50), (64, 64), (31, 77)]
    ]
    mean = [104.0, 117.0, 123.0]
    scale = [0.017, 0.017, 0.017]
    out = native.preprocess_batch(images, 32, 32, mean, scale, n_threads=3)
    assert out.shape == (3, 3, 32, 32) and out.dtype == np.float32
    for i, im in enumerate(images):
        r = native.resize_bilinear(im, 32, 32)
        ref = ((r.astype(np.float32) - np.asarray(mean, np.float32))
               * np.asarray(scale, np.float32)).transpose(2, 0, 1)
        np.testing.assert_allclose(out[i], ref, rtol=1e-6)

    q = native.preprocess_batch(images, 32, 32, mean, scale, quant=(0.02, 110))
    assert q.shape == (3, 3, 32, 32) and q.dtype == np.uint8
    ref_q = np.clip(np.rint(out / 0.02) + 110, 0, 255).astype(np.uint8)
    assert np.abs(q.astype(int) - ref_q.astype(int)).max() <= 1


def test_image_batch_loader(tmp_path, rng):
    PIL = pytest.importorskip("PIL.Image")
    from tengine_tpu.utils.data import ImageBatchLoader, list_images

    for i in range(5):
        arr = rng.integers(0, 255, (48 + i, 40, 3)).astype(np.uint8)
        PIL.fromarray(arr).save(tmp_path / f"img{i}.png")
    paths = list_images(str(tmp_path))
    assert len(paths) == 5
    loader = ImageBatchLoader(paths, (32, 32), batch_size=2, prefetch=2)
    batches = list(loader)
    assert len(batches) == len(loader) == 3
    sizes = [b.shape for b, _ in batches]
    assert sizes == [(2, 3, 32, 32), (2, 3, 32, 32), (1, 3, 32, 32)]
    seen = [p for _, chunk in batches for p in chunk]
    assert seen == paths
    # deterministic: same files -> same pixels
    again = list(ImageBatchLoader(paths, (32, 32), batch_size=2))
    for (a, _), (b, _) in zip(batches, again):
        assert np.array_equal(a, b)


def test_tm2_scan_matches_python():
    path = "/root/reference/benchmark/models/mobilenet_benchmark.tmfile"
    with open(path, "rb") as f:
        data = f.read()
    table = native.tm2_scan_buffers(data)
    if table is None:
        pytest.skip("native unavailable")
    from tengine_tpu.serializer.tm2.reader import load_tm_bytes
    from tengine_tpu.graph.ir import TensorType

    g = load_tm_bytes(data)
    const_ids = [t.idx for t in g.tensors if t.tensor_type == TensorType.CONST]
    assert sorted(int(r[0]) for r in table) == sorted(const_ids)
