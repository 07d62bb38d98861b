"""Graph-level optimization passes.

The reference runs these at convert time (tools/convert_tool/utils/
graph_optimizer/graph_opt.cpp:624-947: conv+bn fold, conv+relu fuse,
bn+scale fold, ...). Here they run on the IR before compilation. XLA would
fuse the arithmetic anyway; the wins are (a) quantization sees the folded
graph (per-channel scales on the folded weights — matching how the
reference's quant tools see already-folded tmfiles) and (b) fewer nodes to
requantize in quantized graphs.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set

import numpy as np

from .ir import DType, Graph, Node, TensorType


def _replace_uses(g: Graph, old_tid: int, new_tid: int):
    for n in g.nodes:
        n.inputs = [new_tid if t == old_tid else t for t in n.inputs]
    old = g.tensors[old_tid]
    new = g.tensors[new_tid]
    new.consumers = sorted(set(new.consumers + old.consumers))
    old.consumers = []


def _single_consumer(g: Graph, node: Node) -> Optional[Node]:
    tid = node.outputs[0]
    consumers = [c for c in g.tensors[tid].consumers if c < len(g.nodes)]
    consumers = [c for c in consumers if node.outputs[0] in g.nodes[c].inputs]
    if len(consumers) != 1:
        return None
    return g.nodes[consumers[0]]


def fold_batchnorm(g: Graph) -> int:
    """Fold Conv -> BatchNormalization into the conv weights/bias
    (graph_opt.cpp fuse_conv_bn). Returns number of folds."""
    folds = 0
    for conv in list(g.nodes):
        if conv.op != "Convolution":
            continue
        bn = _single_consumer(g, conv)
        if bn is None or bn.op != "BatchNormalization" or bn.inputs[0] != conv.outputs[0]:
            continue
        p = bn.params
        mean = g.tensors[bn.inputs[3]].data.astype(np.float64)
        var = g.tensors[bn.inputs[4]].data.astype(np.float64)
        rf = p.get("rescale_factor", 1.0)
        rf = 1.0 / rf if rf else 0.0
        s = 1.0 / np.sqrt(var * rf + p.get("eps", 1e-5))
        b = -mean * rf * s
        if not p.get("caffe_flavor", 0):
            gamma = g.tensors[bn.inputs[1]].data.astype(np.float64)
            beta = g.tensors[bn.inputs[2]].data.astype(np.float64)
            s, b = gamma * s, gamma * b + beta

        wt = g.tensors[conv.inputs[1]]
        wt.data = (wt.data.astype(np.float64) * s.reshape(-1, 1, 1, 1)).astype(np.float32)
        if len(conv.inputs) > 2:
            bt = g.tensors[conv.inputs[2]]
            bt.data = (bt.data.astype(np.float64) * s + b).astype(np.float32)
        else:
            bt = g.add_tensor(
                f"{conv.name}/folded_bias", DType.FP32, [int(s.size)],
                TensorType.CONST, data=b.astype(np.float32),
            )
            conv.inputs.append(bt.idx)
            bt.consumers.append(conv.idx)

        # bypass the BN node
        _replace_uses(g, bn.outputs[0], conv.outputs[0])
        if bn.idx in g.outputs:
            g.outputs = [conv.idx if o == bn.idx else o for o in g.outputs]
        bn.op = "Noop"
        bn.inputs = []
        bn.outputs = []
        folds += 1
    if folds:
        dce(g)
    return folds


def fuse_activation(g: Graph) -> int:
    """Fuse Conv -> ReLU/ReLU6 into the conv's activation field
    (graph_opt.cpp fuse_relu). Returns number of fuses."""
    fuses = 0
    for conv in list(g.nodes):
        if conv.op not in ("Convolution", "Deconvolution"):
            continue
        if conv.params.get("activation", -1) >= 0:
            continue
        act = _single_consumer(g, conv)
        if act is None or act.inputs[:1] != [conv.outputs[0]]:
            continue
        if act.op == "ReLu" and not act.params.get("negative_slope"):
            code = 0
        elif act.op == "ReLu6":
            code = 6
        else:
            continue
        conv.params["activation"] = code
        _replace_uses(g, act.outputs[0], conv.outputs[0])
        if act.idx in g.outputs:
            g.outputs = [conv.idx if o == act.idx else o for o in g.outputs]
        act.op = "Noop"
        act.inputs = []
        act.outputs = []
        fuses += 1
    if fuses:
        dce(g)
    return fuses


def dce(g: Graph) -> int:
    """Drop nodes whose outputs nothing consumes (and aren't graph outputs),
    and orphaned Noop shells left by fusion passes."""
    out_nodes = set(g.outputs)
    removed = 0
    changed = True
    while changed:
        changed = False
        live_tensors: Set[int] = set()
        for n in g.nodes:
            if n.op == "Noop" and not n.outputs:
                continue
            live_tensors.update(n.inputs)
        for ni in out_nodes:
            live_tensors.update(g.nodes[ni].outputs)
        for n in g.nodes:
            if n.idx in out_nodes or n.op in ("InputOp",):
                continue
            if not n.outputs and n.op == "Noop":
                continue
            if n.outputs and not any(t in live_tensors for t in n.outputs):
                n.op = "Noop"
                for t in n.inputs:
                    g.tensors[t].consumers = [c for c in g.tensors[t].consumers if c != n.idx]
                n.inputs = []
                n.outputs = []
                removed += 1
                changed = True
    # physically drop dead Noop shells is unnecessary: toposorted() skips them
    return removed


def _is_dw3x3(g: Graph, n: Node) -> bool:
    """Depthwise 3x3, pad 1 on all sides (or stride-1 SAME), stride 1 or 2,
    no dilation — the envelope of the fused Pallas block kernel."""
    if n.op != "Convolution" or len(n.inputs) < 2:
        return False
    p = n.params
    wt = g.tensors[n.inputs[1]]
    if len(wt.shape) != 4 or wt.shape[1] != 1:
        return False
    c = wt.shape[0]
    pads = [p.get(k, 0) for k in ("pad_h0", "pad_h1", "pad_w0", "pad_w1")]
    stride = p.get("stride_h", 1)
    pads_ok = all(pd == 1 for pd in pads) or (
        stride == 1 and all(pd < 0 for pd in pads)  # SAME at k=3,s=1 == (1,1)
    )
    return (
        p.get("kernel_h") == 3
        and p.get("kernel_w") == 3
        and p.get("dilation_h", 1) == 1
        and p.get("dilation_w", 1) == 1
        and pads_ok
        and stride in (1, 2)
        and p.get("stride_w", 1) == stride
        and p.get("group", 1) == c
    )


def _is_pw1x1(g: Graph, n: Node) -> bool:
    if n.op != "Convolution" or len(n.inputs) < 2:
        return False
    p = n.params
    return (
        p.get("kernel_h") == 1
        and p.get("kernel_w") == 1
        and p.get("group", 1) == 1
        and p.get("stride_h", 1) == 1
        and p.get("stride_w", 1) == 1
        and all(p.get(k, 0) == 0 for k in ("pad_h0", "pad_h1", "pad_w0", "pad_w1"))
    )


def _act_quant_ok(t) -> bool:
    return (
        t.quant is not None
        and not t.quant.per_channel
        and t.dtype.name in ("UINT8", "INT8")
    )


def fuse_dwpw(g: Graph) -> int:
    """Fuse quantized depthwise-3x3 -> pointwise-1x1 pairs (the
    mobilenet-family block) into one `FusedDwPwConv` node, lowered to a
    single Pallas kernel that keeps the depthwise intermediate in VMEM
    (ops/pallas/fused_dwpw.py). The reference fuses at a different
    granularity (conv+relu, graph_opt.cpp) — on TPU the win is HBM traffic,
    so the fusion boundary is the whole block. Returns number of fusions."""
    fused = 0
    for dw in list(g.nodes):
        if not _is_dw3x3(g, dw):
            continue
        pw = _single_consumer(g, dw)
        if pw is None or not _is_pw1x1(g, pw) or pw.inputs[0] != dw.outputs[0]:
            continue
        if dw.idx in g.outputs:
            continue
        mid = g.tensors[dw.outputs[0]]
        t_x = g.tensors[dw.inputs[0]]
        t_out = g.tensors[pw.outputs[0]]
        # quantized activations per-tensor, same scheme end-to-end
        if not (_act_quant_ok(t_x) and _act_quant_ok(mid) and _act_quant_ok(t_out)):
            continue
        if not (t_x.dtype == mid.dtype == t_out.dtype):
            continue
        if g.tensors[dw.inputs[1]].quant is None or g.tensors[pw.inputs[1]].quant is None:
            continue

        inputs = list(dw.inputs)  # x, wd[, bd]
        wp_pos = len(inputs)
        inputs += pw.inputs[1:]  # wp[, bp]
        params = dict(
            stride=dw.params.get("stride_h", 1),
            act_d=dw.params.get("activation", -1),
            act_p=pw.params.get("activation", -1),
            mid_tid=mid.idx,
            wp_pos=wp_pos,
            bd_pos=2 if len(dw.inputs) > 2 else -1,
            bp_pos=wp_pos + 1 if len(pw.inputs) > 2 else -1,
        )
        out_tid = pw.outputs[0]
        for tid in set(dw.inputs + pw.inputs):
            g.tensors[tid].consumers = [
                c for c in g.tensors[tid].consumers if c not in (dw.idx, pw.idx)
            ]
        node = g.add_node("FusedDwPwConv", f"{dw.name}+{pw.name}", inputs, [out_tid], params)
        mid.consumers = []
        if pw.idx in g.outputs:
            g.outputs = [node.idx if o == pw.idx else o for o in g.outputs]
        for shell in (dw, pw):
            shell.op = "Noop"
            shell.inputs = []
            shell.outputs = []
        fused += 1
    return fused


def optimize(g: Graph) -> Graph:
    """Standard pass pipeline (converter-parity): bn fold, activation fuse,
    dce."""
    fold_batchnorm(g)
    fuse_activation(g)
    dce(g)
    return g
