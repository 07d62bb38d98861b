"""Debug/observability tools: per-node profiling and layer dump.

Reference equivalents:
  * TG_DEBUG_TIME — per-node wall-clock timing with min/avg and per-layer %
    (cpu_device.c:79-156, report format in doc/docs_en/user_guides/debug.md).
    One XLA program has no per-node boundary, so profiling runs the graph
    node-by-node eagerly (each node's lowering dispatched and synced) — the
    timings are relative (the tunnel sync adds a constant) but the ranking
    and FLOP rates match the fused program's cost structure.
  * TG_DEBUG_DATA — dump every node's output tensors to text files
    (cpu_device.c:157-199, cpu_dump.c extract_feature_from_tensor).
"""

from __future__ import annotations

import os
import re
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import numpy as np

from ..graph.ir import Graph, TensorType
from ..ops import qmath
from ..ops.layout import TArr, as_semantic, nchw
from ..ops.registry import LowerCtx, select_kernel
from ..utils.config import Options
from .engine import ConstIn, DequantConstIn, ParamStore, _graph_quantized


@dataclass
class NodeTiming:
    node: str
    op: str
    ms: float
    flops: int = 0

    @property
    def gflops_rate(self) -> float:
        return self.flops / (self.ms * 1e6) if self.ms > 0 else 0.0


@dataclass
class ProfileResult:
    timings: List[NodeTiming] = field(default_factory=list)

    @property
    def total_ms(self) -> float:
        return sum(t.ms for t in self.timings)

    def report(self) -> str:
        """Per-node table like the reference's TG_DEBUG_TIME dump."""
        lines = [f"{'#':>3} {'ms':>9} {'%':>6} {'MFLOPS':>9}  {'op':20} node"]
        total = self.total_ms or 1.0
        for i, t in enumerate(self.timings):
            lines.append(
                f"{i:3d} {t.ms:9.3f} {100*t.ms/total:5.1f}% {t.gflops_rate*1e3:9.1f}"
                f"  {t.op:20} {t.node}"
            )
        lines.append(f"total {total:.3f} ms")
        return "\n".join(lines)


def _node_flops(node, shapes) -> int:
    """Rough FLOP count for conv/fc (the reference reports MFLOPS for these)."""
    if node.op in ("Convolution", "Deconvolution"):
        p = node.params
        out_shape = shapes.get(node.outputs[0])
        if out_shape is None or len(out_shape) != 4:
            return 0
        n, c, h, w = out_shape
        kin = p.get("input_channel", 0) // max(p.get("group", 1), 1)
        return 2 * n * c * h * w * p["kernel_h"] * p["kernel_w"] * kin
    if node.op == "FullyConnected":
        out_shape = shapes.get(node.outputs[0])
        in_shape = shapes.get(node.inputs[0])
        if out_shape is None or in_shape is None:
            return 0
        return 2 * int(np.prod(in_shape)) * int(out_shape[1])
    return 0


def profile_graph(
    graph: Graph, inputs, options: Optional[Options] = None, repeats: int = 3
) -> ProfileResult:
    """Execute node-by-node with per-node sync timing (TG_DEBUG_TIME analog)."""
    options = options or Options.from_env()
    store = ParamStore()
    quantized = _graph_quantized(graph)
    topo = graph.toposorted()

    env: Dict[int, TArr] = {}
    for tid, arr in zip(graph.input_tensors, inputs):
        env[tid] = nchw(jax.device_put(np.asarray(arr)))

    result = ProfileResult()
    shapes = {}
    for node in topo:
        ctx = LowerCtx(graph=graph, node=node, options=options, store=store)
        kernel = select_kernel(node.op, ctx)
        wrap_quant = quantized and not kernel.quant_aware
        args = []
        for tid in node.inputs:
            t = graph.tensors[tid]
            if tid in env:
                a = env[tid]
                if wrap_quant and qmath.is_quantized_tensor(t):
                    a = TArr(qmath.dequantize(a.x, t.quant), a.layout)
                args.append(a)
            else:
                args.append(
                    DequantConstIn(t, store)
                    if wrap_quant and qmath.is_quantized_tensor(t)
                    else ConstIn(t, store)
                )

        def run_once():
            out = kernel.fn(ctx, *args)
            outs = out if isinstance(out, tuple) else (out,)
            if wrap_quant:
                outs = tuple(
                    TArr(
                        qmath.requantize(
                            o.x, graph.tensors[tid].quant, graph.tensors[tid].dtype
                        ),
                        o.layout,
                    )
                    if qmath.is_quantized_tensor(graph.tensors[tid])
                    and np.issubdtype(np.dtype(o.x.dtype), np.floating)
                    else o
                    for tid, o in zip(node.outputs, outs)
                )
            return outs

        outs = run_once()  # warm (trace/compile of eager ops)
        for o in outs:
            np.asarray(o.x).reshape(-1)[:1]
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            outs = run_once()
            for o in outs:
                np.asarray(o.x).reshape(-1)[:1]  # sync
            best = min(best, time.perf_counter() - t0)

        for tid, o in zip(node.outputs, outs):
            env[tid] = o
            shapes[tid] = tuple(as_semantic(o).shape)
        result.timings.append(
            NodeTiming(node=node.name, op=node.op, ms=best * 1e3, flops=_node_flops(node, shapes))
        )
    return result


def _safe_name(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", name)


def dump_graph_tensors(
    graph: Graph, inputs, dump_dir: str, options: Optional[Options] = None
) -> List[str]:
    """Run the graph and dump every tensor to text files (TG_DEBUG_DATA
    analog; naming mirrors extract_feature_from_tensor in cpu_dump.c)."""
    from .engine import build_forward, _input_spec

    options = options or Options.from_env()
    store = ParamStore()
    forward_all, input_ids, _ = build_forward(graph, options, store, return_all=True)
    abstract = [jax.ShapeDtypeStruct(np.asarray(a).shape, np.asarray(a).dtype) for a in inputs]
    store.phase = "prepare"
    jax.eval_shape(forward_all, {}, *abstract)
    params = {k: jax.numpy.asarray(v) for k, v in store.values.items()}
    store.phase = "trace"
    env = jax.jit(forward_all)(params, *inputs)

    os.makedirs(dump_dir, exist_ok=True)
    written = []
    for tid, arr in env.items():
        t = graph.tensors[tid]
        if t.tensor_type == TensorType.CONST:
            continue
        a = np.asarray(arr)
        if a.dtype.name in ("bfloat16", "float16"):
            a = a.astype(np.float32)  # bf16-stored quantized activations
        path = os.path.join(dump_dir, f"{_safe_name(t.name)}_{tid}.txt")
        with open(path, "w") as f:
            f.write(f"# {t.name} shape={list(a.shape)} dtype={a.dtype}\n")
            np.savetxt(f, a.reshape(-1)[:100000], fmt="%.6f")
        written.append(path)
    return written
