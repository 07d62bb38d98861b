"""U-Net (segmentation) and CRNN (OCR, conv+LSTM) full-model tests —
the tm_unet / tm_crnn example-family analogs (tests/models/test_model_*.cpp
in the reference)."""

import numpy as np
import pytest

import tengine_tpu as tt
from tengine_tpu.utils.config import Options

torch = pytest.importorskip("torch")


def test_unet_fp32_matches_torch():
    from tengine_tpu.models.extra import build_unet_graph

    m, g = build_unet_graph(img=32, base=8, depth=2)
    x = torch.from_numpy(
        np.random.default_rng(0).standard_normal((1, 3, 32, 32)).astype(np.float32)
    )
    with torch.no_grad():
        expected = m(x).numpy()
    (out,) = tt.compile_graph(g, Options(precision="fp32")).run(x.numpy())
    np.testing.assert_allclose(out.reshape(expected.shape), expected, rtol=2e-3, atol=2e-3)


def test_unet_uint8_agreement():
    from tengine_tpu.models.extra import build_unet_graph
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph

    _, g = build_unet_graph(img=32, base=8, depth=2)
    rng = np.random.default_rng(1)
    calib = [rng.standard_normal((1, 3, 32, 32)).astype(np.float32)]
    qg = quantize_graph(g, calib, scheme="uint8")
    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(calib[0], t_in.quant, t_in.dtype)
    (got,) = tt.compile_graph(qg, Options(quant_mode="fast")).run(xq)
    (ref,) = tt.compile_graph(g, Options(precision="fp32")).run(calib[0])
    t_out = qg.tensors[qg.nodes[qg.outputs[0]].outputs[0]]
    deq = qmath.dequantize_np(np.asarray(got, np.float32), t_out.quant)
    # segmentation quality gate: per-pixel argmax agreement with fp32
    agree = (deq.reshape(ref.shape).argmax(1) == ref.argmax(1)).mean()
    assert agree > 0.9, f"mask agreement {agree:.3f}"


def _np_crnn_oracle(x, weights, img_w, hidden, num_classes):
    """Numpy re-implementation (torch conv + explicit LSTM loop, Tengine
    gate order I,O,F,G — matches lstm.c and ops/lowering_extra.py)."""
    import torch.nn.functional as F

    t = torch.from_numpy(x)

    def conv(name, t, s=1, p=1):
        w = torch.from_numpy(weights[f"{name}/w"])
        b = torch.from_numpy(weights[f"{name}/b"])
        return F.relu(F.conv2d(t, w, b, stride=s, padding=p))

    t = conv("conv1", t)
    t = F.max_pool2d(t, 2)
    t = conv("conv2", t)
    t = F.max_pool2d(t, 2)
    t = conv("conv3", t)
    t = conv("conv4", t)
    t = F.max_pool2d(t, (2, 1), stride=(2, 1))
    t = conv("conv5", t)
    t = conv("conv6", t)
    t = F.max_pool2d(t, (2, 1), stride=(2, 1))
    t = conv("conv7", t, p=0)
    feat = t.numpy()  # [1, C, 1, T]
    seq = feat[0, :, 0, :].T  # [T, C]

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    def lstm(seq, w, r, h_dim):
        h = np.zeros((h_dim,), np.float32)
        c = np.zeros((h_dim,), np.float32)
        outs = []
        for xt in seq:
            gates = w @ xt + r @ h
            i = sigmoid(gates[0 * h_dim : 1 * h_dim])
            o = sigmoid(gates[1 * h_dim : 2 * h_dim])
            f = sigmoid(gates[2 * h_dim : 3 * h_dim])
            g_ = np.tanh(gates[3 * h_dim : 4 * h_dim])
            c = f * c + i * g_
            h = o * np.tanh(c)
            outs.append(h)
        return np.stack(outs)

    seq = lstm(seq, weights["lstm1/w"], weights["lstm1/r"], hidden)
    seq = lstm(seq, weights["lstm2/w"], weights["lstm2/r"], hidden)
    return seq @ weights["fc/w"].T + weights["fc/b"]


def test_crnn_fp32_matches_numpy_oracle():
    from tengine_tpu.models.extra import CRNN_CHARSET, build_crnn_graph, ctc_greedy_decode

    img_w, hidden = 48, 32
    g, weights = build_crnn_graph(img_w=img_w, hidden=hidden)
    x = np.random.default_rng(0).standard_normal((1, 1, 32, img_w)).astype(np.float32)
    (out,) = tt.compile_graph(g, Options(precision="fp32")).run(x)
    expected = _np_crnn_oracle(x, weights, img_w, hidden, len(CRNN_CHARSET))
    np.testing.assert_allclose(out.reshape(expected.shape), expected, rtol=2e-3, atol=2e-3)
    # decode runs (random weights -> arbitrary but deterministic string)
    s1 = ctc_greedy_decode(out.reshape(expected.shape))
    s2 = ctc_greedy_decode(expected)
    assert s1 == s2
