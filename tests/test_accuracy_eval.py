"""tools/accuracy_eval.py pipeline test — the BASELINE.json top-1 Δ axis:
train a real CNN on sklearn digits (3 quick epochs), convert via the torch
frontend, quantize uint8 with real calibration images, and require the
quantized top-1 within 3 points of fp32 (full runs use 30 epochs and also
int8-KL; see BASELINE.json.published)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

torch = pytest.importorskip("torch")
pytest.importorskip("sklearn")


def test_digit_cnn_quant_top1():
    import accuracy_eval as ae

    xtr, ytr, xte, yte = ae.load_digits_32()
    model = ae.build_models()["digit_cnn"]
    torch_acc = ae.train(model, xtr, ytr, xte, yte, epochs=3)
    assert torch_acc > 0.9

    from tengine_tpu.convert.torch_frontend import from_torch
    from tengine_tpu.quantize.quantizer import quantize_graph

    g = from_torch(model, torch.zeros(1, 1, 32, 32))
    fp32 = ae.top1_ours(g, xte, yte, quantized=False)
    assert abs(fp32 - torch_acc) < 0.02

    rng = np.random.default_rng(0)
    calib = [xtr[i : i + 1] for i in rng.choice(len(xtr), 16, replace=False)]
    qg = quantize_graph(g, calib, scheme="uint8", algorithm="minmax")
    q1 = ae.top1_ours(qg, xte, yte, quantized=True)
    assert q1 >= fp32 - 0.03, (q1, fp32)
