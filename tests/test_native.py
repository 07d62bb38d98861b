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
