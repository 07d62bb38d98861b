"""Transformer family (examples/tm_segformer.cpp analog + ViT):
fp32 parity vs the torch oracle, attention op plumbing (LayerNorm /
ND-Linear-as-MatMul / SwapAxis / scalar-div / token softmax / GELU),
and quantized agreement on the ViT classifier."""

import numpy as np
import pytest

import tengine_tpu as tt
from tengine_tpu.utils.config import Options

torch = pytest.importorskip("torch")

from tengine_tpu.models.transformer_zoo import (  # noqa: E402
    build_segformer_graph,
    build_vit_graph,
    segformer_classmap,
)


def test_segformer_fp32_matches_torch():
    torch.manual_seed(0)
    m, g = build_segformer_graph(
        num_classes=19, img=64, dims=(16, 32, 48, 64), depths=(1, 1, 1, 1)
    )
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        exp = m(torch.from_numpy(x)).numpy()
    got = np.asarray(tt.compile_graph(g, Options(precision="fp32")).run(x)[0])
    np.testing.assert_allclose(got.reshape(exp.shape), exp, rtol=1e-3, atol=1e-4)
    assert segformer_classmap(got.reshape(exp.shape)).shape == (16, 16)


def test_vit_fp32_matches_torch():
    torch.manual_seed(0)
    m, g = build_vit_graph(num_classes=10, img=64, patch=16, dim=48, depth=2, nheads=3)
    x = np.random.default_rng(1).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        exp = m(torch.from_numpy(x)).numpy()
    got = np.asarray(tt.compile_graph(g, Options(precision="fp32")).run(x)[0])
    np.testing.assert_allclose(got.reshape(exp.shape), exp, rtol=1e-3, atol=1e-4)


def test_transformer_graph_uses_attention_ops():
    torch.manual_seed(0)
    _, g = build_vit_graph(num_classes=10, img=64, patch=16, dim=48, depth=1, nheads=3)
    ops = {n.op for n in g.nodes}
    for required in ("MatMul", "LayerNorm", "Softmax", "Gelu", "SwapAxis"):
        assert required in ops, f"{required} missing from traced transformer graph"


def test_vit_quantized_agreement():
    """8-bit ViT: cosine vs fp32 logits (per-tensor activations, per-channel
    weights) — same gate style as the CNN zoo."""
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph

    torch.manual_seed(0)
    _, g = build_vit_graph(num_classes=10, img=64, patch=16, dim=48, depth=2, nheads=3)
    rng = np.random.default_rng(2)
    calib = [rng.standard_normal((1, 3, 64, 64)).astype(np.float32) for _ in range(2)]
    fp = np.asarray(tt.compile_graph(g, Options(precision="fp32")).run(calib[0])[0]).ravel()

    qg = quantize_graph(g, calib, scheme="int8", algorithm="minmax")
    cg = tt.compile_graph(qg, Options(quant_mode="fast"))
    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(calib[0], t_in.quant, t_in.dtype)
    out_id = qg.nodes[qg.outputs[0]].outputs[0]
    q = qmath.dequantize_np(
        np.asarray(cg.run(xq)[0], np.float32), qg.tensors[out_id].quant
    ).ravel()
    cos = float(np.dot(fp, q) / (np.linalg.norm(fp) * np.linalg.norm(q) + 1e-9))
    assert cos > 0.95, f"cosine {cos}"
