"""Data-free quantization: cross-layer weight equalization.

Reference: tools/quantize/algorithm/quant_dfq.cpp (the -a 3 "dfq" mode of
quant_tool_int8). Per Nagel et al. ("Data-Free Quantization Through Weight
Equalization and Bias Correction"): for a Conv1 -> [ReLU] -> Conv2 pair,
per-channel ranges can be balanced without changing the float function by
rescaling channel c of Conv1's output and the matching input channel of
Conv2:

    s[c]        = sqrt(r1[c] / r2[c])      r1 = max|W1[c,...]|, r2 = max|W2[:,c,...]|
    W1[c] /= s[c],  b1[c] /= s[c],  W2[:, c] *= s[c]

ReLU (and identity) are positively homogeneous, so the composition is
unchanged in fp32 but the per-channel dynamic ranges meet in the middle —
exactly what per-tensor (uint8) weight quantization needs. Run before
`quantize_graph` on the fp32 graph; iterate a few times for chains.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..graph.ir import Graph, Node

_HOMOGENEOUS_ACTS = (-1, 0)  # none, relu — positively homogeneous only


def _conv_pair(g: Graph, conv1: Node) -> Optional[Node]:
    """conv1 -> conv2 with conv1's output consumed only by conv2, both float,
    activation of conv1 positively homogeneous, conv2 group==1."""
    if conv1.op != "Convolution":
        return None
    if conv1.params.get("activation", -1) not in _HOMOGENEOUS_ACTS:
        return None
    out = g.tensors[conv1.outputs[0]]
    consumers = [c for c in out.consumers if g.nodes[c].inputs[:1] == [out.idx]]
    if len(out.consumers) != 1 or not consumers:
        return None
    conv2 = g.nodes[consumers[0]]
    if conv2.op != "Convolution" or conv2.params.get("group", 1) != 1:
        return None
    if conv1.idx in g.outputs:
        return None
    return conv2


def equalize_pair(g: Graph, conv1: Node, conv2: Node, eps: float = 1e-8) -> float:
    """Equalize one pair in place; returns max |log s| applied (0 = no-op)."""
    w1 = g.tensors[conv1.inputs[1]]
    w2 = g.tensors[conv2.inputs[1]]
    a1 = w1.data.astype(np.float64)
    a2 = w2.data.astype(np.float64)
    C = a1.shape[0]
    if a2.shape[1] != C:
        return 0.0
    r1 = np.abs(a1.reshape(C, -1)).max(axis=1)
    r2 = np.abs(a2.transpose(1, 0, 2, 3).reshape(C, -1)).max(axis=1)
    s = np.sqrt(np.maximum(r1, eps) / np.maximum(r2, eps))
    s = np.clip(s, 1e-4, 1e4)
    w1.data = (a1 / s.reshape(-1, 1, 1, 1)).astype(np.float32)
    if len(conv1.inputs) > 2:
        b1 = g.tensors[conv1.inputs[2]]
        b1.data = (b1.data.astype(np.float64) / s).astype(np.float32)
    w2.data = (a2 * s.reshape(1, -1, 1, 1)).astype(np.float32)
    return float(np.abs(np.log(s)).max())


def equalize_graph(g: Graph, iterations: int = 3, tol: float = 1e-3) -> int:
    """Sweep all eligible pairs `iterations` times (chains re-balance each
    sweep, like the reference's iterative dfq loop). Returns pair count."""
    pairs = []
    for n in g.nodes:
        c2 = _conv_pair(g, n)
        if c2 is not None:
            pairs.append((n, c2))
    for _ in range(iterations):
        moved = 0.0
        for c1, c2 in pairs:
            moved = max(moved, equalize_pair(g, c1, c2))
        if moved < tol:
            break
    return len(pairs)
