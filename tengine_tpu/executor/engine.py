"""Graph executor: IR -> one jitted XLA program.

Replaces the reference's prerun/run machinery (c_api.c:445-626,
scheduler/scheduler.c, cpu_device.c exec loop) with a single trace:

  * prepare pass — abstract-shape walk of the graph. Op lowerings register
    host-computed compile-time params (repacked weights, folded BN scales,
    precomputed priors) in the ParamStore; this is the analog of
    node_ops->prerun weight repacking (cpu_graph.c:143). Shapes inferred
    during this pass are written back into the IR (infer_ir_graph_shape
    analog, graph/graph.c:213).
  * trace/compile — jax.jit of the whole-graph forward with the params
    pytree as an argument, so weights live once in HBM and XLA handles
    fusion, layout, and memory planning (the reference's optimizer/
    estimation.c memory pool is subsumed by XLA buffer assignment).

There is no per-node dispatch at runtime.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.ir import DType, Graph, Node, Tensor, TensorType
from ..ops import lowering as _lowering  # noqa: F401 — populate registry
from ..ops import lowering_extra as _lowering_extra  # noqa: F401
from ..ops import detection as _detection  # noqa: F401
from ..ops import fused as _fused  # noqa: F401
from ..ops import qmath
from ..ops import quantized as _quantized  # noqa: F401
from ..ops.layout import TArr, as_semantic, nchw, nhwc, semantic_shape
from ..ops.registry import LowerCtx, select_kernel
from ..utils.config import Options


class ParamStore:
    """Named compile-time parameters, computed on the host during the prepare
    pass and passed to the jitted function as a pytree argument."""

    def __init__(self):
        self.phase = "prepare"
        self.values: Dict[str, np.ndarray] = {}
        self.tracers: Dict[str, Any] = {}

    def get(self, key: str, compute: Callable[[], np.ndarray]):
        if self.phase == "prepare":
            if key not in self.values:
                self.values[key] = np.asarray(compute())
            return self.values[key]
        return self.tracers[key]


class ConstIn:
    """Lazy const-tensor input: materializes into the params pytree only if a
    lowering actually reads it as data (conv weights, e.g., are consumed via
    ctx.weight() with a repacking transform instead)."""

    layout = None

    def __init__(self, tensor: Tensor, store: ParamStore):
        self._t = tensor
        self._store = store

    @property
    def x(self):
        t = self._t
        return self._store.get(f"t{t.idx}/raw", lambda: t.data)

    @property
    def shape(self):
        return tuple(self._t.shape)

    @property
    def dtype(self):
        return self._t.dtype.np


class DequantConstIn(ConstIn):
    """Const input materialized pre-dequantized on the host — used when a
    float kernel consumes a quantized const under the generic fallback.
    Per-channel scales assume axis 0 (tmfile weight convention)."""

    @property
    def x(self):
        from ..ops import qmath

        t = self._t
        return self._store.get(
            f"t{t.idx}/dequant", lambda: qmath.dequantize_np(t.data, t.quant, channel_axis=0)
        )

    @property
    def dtype(self):
        return np.float32


class CompiledGraph:
    """The runnable artifact: jitted forward + params pytree."""

    def __init__(
        self,
        graph: Graph,
        options: Options,
        fn: Callable,
        params: Dict[str, jnp.ndarray],
        input_ids: List[int],
        output_ids: List[int],
    ):
        self.graph = graph
        self.options = options
        self._fn = fn
        self.params = params
        self.input_ids = input_ids
        self.output_ids = output_ids

    def __call__(self, *inputs):
        return self._fn(self.params, *inputs)

    @property
    def forward_fn(self) -> Callable:
        """Public jittable forward: fn(params, *inputs) -> outputs. The
        un-jitted traced function, for AOT lowering / re-jitting under
        shardings (used by parallel/sharding.py and the driver entry)."""
        return self._fn.__wrapped__

    def run(self, *inputs) -> List[np.ndarray]:
        outs = self._fn(self.params, *inputs)
        return [np.asarray(o) for o in outs]

    def cost_analysis(self) -> Dict[str, float]:
        """XLA's compiled cost model for the whole program: flops,
        bytes accessed, optimal seconds, peak memory — the analog of the
        reference's per-graph perf stats (GRAPH_PERF_STAT_*, c_api.h:95-101)
        computed by the compiler instead of timers."""
        in_spec = _input_spec(self.graph, self.options)
        abstract = [jax.ShapeDtypeStruct(s, dt) for _, s, dt in in_spec]
        compiled = self._fn.lower(self.params, *abstract).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return dict(ca) if ca else {}


def _input_spec(graph: Graph, options: Options) -> List[Tuple[int, Tuple[int, ...], Any]]:
    spec = []
    for tid in graph.input_tensors:
        t = graph.tensors[tid]
        shape = list(t.shape)
        if not shape:
            raise ValueError(f"input tensor {t.name!r} has no shape; set one before compile")
        if options.batch_size:
            shape[0] = options.batch_size
        if options.input_layout == "NHWC" and len(shape) == 4:
            shape = [shape[0], shape[2], shape[3], shape[1]]
        # quantized graphs take quantized inputs, like the reference C API
        spec.append((tid, tuple(shape), t.dtype.np))
    return spec


def build_forward(graph: Graph, options: Options, store: ParamStore, return_all: bool = False):
    """The traced whole-graph function. Also used abstractly in the prepare
    pass (with numpy params) and concretely under jit (with tracer params).
    return_all=True returns every tensor (for shape inference / layer dump)."""
    topo = graph.toposorted()
    input_ids = graph.input_tensors
    output_ids = graph.output_tensors

    def forward(params, *inputs):
        store.tracers = params
        env: Dict[int, TArr] = {}
        for tid, arr in zip(input_ids, inputs):
            if options.input_layout == "NHWC" and getattr(arr, "ndim", 0) == 4:
                env[tid] = nhwc(arr)
            else:
                env[tid] = nchw(arr)

        for node in topo:
            ctx = LowerCtx(graph=graph, node=node, options=options, store=store)
            kernel = select_kernel(node.op, ctx)
            wrap_quant = _graph_quantized(graph) and not kernel.quant_aware
            args = []
            for tid in node.inputs:
                t = graph.tensors[tid]
                if tid in env:
                    a = env[tid]
                    if wrap_quant and qmath.is_quantized_tensor(t):
                        a = TArr(qmath.dequantize(a.x, t.quant), a.layout)
                    args.append(a)
                elif t.is_const:
                    if wrap_quant and qmath.is_quantized_tensor(t):
                        args.append(DequantConstIn(t, store))
                    else:
                        args.append(ConstIn(t, store))
                else:
                    raise RuntimeError(
                        f"tensor {t.name!r} consumed by {node.name!r} before production"
                    )
            out = kernel.fn(ctx, *args)
            outs = out if isinstance(out, tuple) else (out,)
            if wrap_quant:
                # re-quantize float results into the node's quantized output
                # tensors — the reference stores every activation quantized,
                # so per-node requantization is part of its numerics
                plan = getattr(graph, "_bf16_tids", None)
                outs = tuple(
                    TArr(
                        qmath.requantize(
                            o.x,
                            graph.tensors[tid].quant,
                            graph.tensors[tid].dtype,
                            store_bf16=options.quant_bf16_storage
                            and (plan is None or tid in plan),
                        ),
                        o.layout,
                    )
                    if qmath.is_quantized_tensor(graph.tensors[tid])
                    and jnp.issubdtype(o.x.dtype, jnp.floating)
                    else o
                    for tid, o in zip(node.outputs, outs)
                )
            for tid, o in zip(node.outputs, outs):
                env[tid] = o

        def finalize(tid):
            arr = as_semantic(env[tid])
            t = graph.tensors[tid]
            # bf16-stored quantized activations (quant_bf16_storage) hold
            # exact integers — cast back to the tensor's integer dtype at
            # the graph boundary
            if qmath.is_quantized_tensor(t) and arr.dtype == jnp.bfloat16:
                arr = arr.astype(jnp.int32).astype(t.dtype.np)
            return arr

        if return_all:
            return {tid: finalize(tid) for tid in env}
        return tuple(finalize(tid) for tid in output_ids)

    return forward, input_ids, output_ids


def _plan_quant_storage(graph: Graph) -> set:
    """Per-tensor storage plan for the quantized fast path (exact — the
    stored values are small integers either way): return the set of tensor
    ids that must store bf16; every other quantized activation stores its
    raw 1-byte integer dtype.

    Rationale (r4 traces): the bf16-storage path is HBM-BW-bound at 2 B/elt.
    A consumer-side s8->bf16 shift-convert is ONE elementwise pass that
    fuses into the consumer and rides free under the BW bound — EXCEPT when
    the consumer is a windowed op (k>1 conv, avg pool, resize), where input
    fusions are recomputed once per overlapping window read (the k^2
    amplification lesson, ARCHITECTURE). So: store 1 byte unless some
    consumer reads through a window. Halves HBM bytes on exactly the widest
    tensors of the resnet/mobilenet families (block outputs, residual
    reads, pw-conv inputs)."""
    # Depthwise-family nets are poisoned by mixed storage wholesale, not
    # just at the producer/consumer sites the per-tensor rules cover:
    # measured r4 b128 with the plan on vs off — mobilenet-v1 uint8 -24%,
    # mobilenet-v3 uint8 -31% (6.28 vs 4.32 ms), v2/v3 int8 -20%; while
    # resnet50 int8 gains +4% (8.81 vs 9.15 ms). The dw window emitters'
    # layout choices propagate through the whole program. So: 1-byte
    # storage only for graphs with NO depthwise convolutions.
    for n in graph.nodes:
        if n.op == "Convolution" and n.params.get("group", 1) > 1:
            return None
    need = set()
    for n in graph.nodes:
        p = n.params
        # producer side: a windowed producer's epilogue must not end in the
        # f32->s8 convert chain (dw conv emitters degrade when their output
        # fusion narrows to s8), while 1x1-conv producers are neutral. Keep
        # window-op outputs bf16.
        if n.op in ("Pooling", "Deconvolution", "Interp",
                    "Upsample", "BilinearResize", "LRN"):
            need.update(n.outputs)
        elif n.op == "Convolution" and (
            p.get("kernel_h", 1) * p.get("kernel_w", 1) > 1
            or p.get("group", 1) > 1
        ):
            need.update(n.outputs)
        for pos, tid in enumerate(n.inputs):
            if n.op in ("Convolution", "Deconvolution"):
                if pos == 0 and p.get("kernel_h", 1) * p.get("kernel_w", 1) > 1:
                    need.add(tid)
            elif n.op == "Pooling":
                if p.get("global_pool"):
                    continue  # raw-integer fast path (lower_global_avgpool)
                t_in = graph.tensors[n.inputs[0]]
                t_out = graph.tensors[n.outputs[0]]
                same = (
                    p.get("alg") == 0
                    and t_in.quant is not None and t_out.quant is not None
                    and not t_in.quant.per_channel and not t_out.quant.per_channel
                    and float(t_in.quant.scales) == float(t_out.quant.scales)
                    and int(t_in.quant.zero_points) == int(t_out.quant.zero_points)
                )
                if not same:
                    need.add(tid)  # wrapper dequantizes per window read
            elif n.op in ("Interp", "Upsample", "BilinearResize", "LRN",
                          "Reorg", "PriorBox", "Resize"):
                need.add(tid)
    return need


def _native_profitable(graph: Graph) -> bool:
    """Per-graph gate for the native-int8 plan, from the r4 A/B sweep of
    every benchmark family on v5e (b128, default options, native vs legacy
    bf16-storage):

        resnet50 +15%, resnet18 +17%, vgg16 +37%, googlenet +23%   (native)
        squeezenet -8%, inceptionv3 -5%, yolov5s -8%,
        mobilenet v1 -24% / v3 -63%, all dw families             (legacy)

    Two measured failure modes: (a) XLA's s8 depthwise window emitters run
    3-10x off the byte roofline and their layout choices poison the whole
    program; (b) small-channel convs (min(c_in, c_out) < 64) pay the s8
    (4,1) packed-tile overhead without filling the int8 MXU. The separating
    statistic is the fraction of conv output ELEMENTS produced by
    small-channel convs (stems with c_in <= 4 excluded — they run the
    bf16/Pallas-stem path either way): winners measure 0.00-0.11, losers
    0.31-0.78; gate at < 0.2. Needs shapes: falls back to legacy (never
    wrongly native) when shape inference is unavailable."""
    convs = [n for n in graph.nodes if n.op == "Convolution"]
    if any(n.params.get("group", 1) > 1 for n in convs):
        return False  # depthwise family
    if any(
        not graph.tensors[n.outputs[0]].shape
        or len(graph.tensors[n.outputs[0]].shape) < 4
        for n in convs
    ):
        try:  # one abstract trace fills the IR shapes (no compile)
            infer_shapes(graph)
        except Exception:
            return False  # cannot judge; take the safe path
    small = tot = 0
    for n in convs:
        if len(n.inputs) < 2:
            continue
        tw = graph.tensors[n.inputs[1]]
        t_out = graph.tensors[n.outputs[0]]
        if not t_out.shape or len(t_out.shape) < 4:
            return False
        out_c, in_c = int(tw.shape[0]), int(tw.shape[1])
        if in_c <= 4:
            continue
        elts = 1
        for d in t_out.shape[1:]:
            elts *= int(d)
        tot += elts
        if min(in_c, out_c) < 64:
            small += elts
    return tot > 0 and small / tot < 0.2


def _graph_quantized(graph: Graph) -> bool:
    cached = getattr(graph, "_is_quantized", None)
    if cached is None:
        cached = any(qmath.is_quantized_tensor(t) for t in graph.tensors)
        graph._is_quantized = cached
    return cached


_CACHE_SET = False


def _enable_compilation_cache():
    """JAX persistent compilation cache — the analog of the reference's
    compiled-NPU-kernel cache (TENGINE_CACHE_DIR / TIM-VX .tmcache,
    timvx_executor.cc:411-426). Controlled by TT_CACHE_DIR."""
    global _CACHE_SET
    if _CACHE_SET:
        return
    _CACHE_SET = True
    import os

    cache_dir = os.environ.get("TT_CACHE_DIR")
    if cache_dir is None:
        # On by default (VERDICT r1 item 9): first-compile of a large net is
        # ~O(minutes); the persistent cache makes every later process start in
        # ms. TT_CACHE_DIR=<path> overrides, TT_CACHE_DIR=0/off disables.
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "tengine_tpu", "xla"
        )
    if cache_dir and cache_dir not in ("0", "off", "false"):
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass


def compile_graph(graph: Graph, options: Optional[Options] = None) -> CompiledGraph:
    """prerun_graph_multithread analog: prepare, trace, jit-compile."""
    _enable_compilation_cache()
    options = options or Options.from_env()
    if options.debug_nans:
        jax.config.update("jax_debug_nans", True)
    fast_quant = (
        _graph_quantized(graph)
        and options.quant_mode in ("auto", "fast")
        and not options.force_ref_kernels
    )
    if options.stem_s2d and not options.force_ref_kernels:
        from ..graph.passes import stem_conv_s2d

        g2 = graph.clone()
        if stem_conv_s2d(g2):
            graph = g2
    native_int8 = (
        fast_quant
        and options.quant_native != "off"
        and (options.quant_native == "on" or options.quant_relaxed)
        and os.environ.get("TT_NATIVE_INT", "1") not in ("0", "off")
        and (options.quant_native == "on" or _native_profitable(graph))
    )
    if fast_quant and (
        options.fuse_resblock or (options.quant_relaxed and not native_int8)
    ):
        # whole bottleneck-block chains -> one Pallas kernel per VMEM-sized
        # sub-chain (runs before fuse_conv_add, which would otherwise absorb
        # the residual Eltwise into the conv epilogue). quant_relaxed also
        # enables the pass on the legacy path: the relaxed single-rounding
        # epilogue is what made the chain kernel beat the bf16-storage XLA
        # tier. Under the native-int8 plan the chain kernels LOSE to XLA's
        # own s8 convs (r50 int8 b128: 8.8 ms with chains vs 8.0 without,
        # measured r4 — the VPU-serial chain body cannot overlap DMA/MXU
        # the way XLA's s8 fusions do), so only fuse_resblock forces them.
        from ..graph.passes import fuse_resnet_blocks

        graph = graph.clone()
        fuse_resnet_blocks(
            graph,
            min_cmid=0 if options.fuse_resblock else options.chain_min_cmid,
        )
    if fast_quant and os.environ.get("TT_FOLD_SHUFFLE", "1") not in ("0", "off"):
        # shuffle+slice chains fold into consumer conv weights / one
        # ChannelGather (graph/passes.py:fold_shuffle_gathers — exact on
        # the shared grid the quantizer pins)
        from ..graph.passes import fold_shuffle_gathers

        g2 = graph.clone()
        if fold_shuffle_gathers(g2):
            graph = g2
    if fast_quant:
        # residual eltwise-sums fold into the conv requant epilogue: the
        # pallas direct-conv kernel (int-storage path) or the XLA conv
        # fusion (bf16-storage path — saves a full HBM round trip of the
        # block-sized intermediate per residual block)
        from ..graph.passes import fuse_conv_add

        graph = graph.clone()
        geometry = "pallas" if (
            options.pallas_qconv and not options.quant_bf16_storage
        ) else "any"
        fuse_conv_add(
            graph, geometry=geometry, relaxed_relu=options.quant_relaxed
        )
    if native_int8:
        # native-int8 plan: 1-byte activation storage everywhere, convs/FCs
        # consume raw s8 on the int8 MXU (Options.quant_native; uint8 graphs
        # are shift-rewritten by to_native_int8 — relaxed-tier contract)
        from ..graph.passes import to_native_int8

        graph = graph.clone()
        to_native_int8(graph)
        graph._bf16_tids = set()
    elif fast_quant and options.quant_bf16_storage:
        # selective 1-byte storage (exact): see _plan_quant_storage
        graph._bf16_tids = _plan_quant_storage(graph)
    store = ParamStore()
    forward, input_ids, output_ids = build_forward(graph, options, store)

    in_spec = _input_spec(graph, options)
    abstract_inputs = [jax.ShapeDtypeStruct(shape, dt) for _, shape, dt in in_spec]

    # --- prepare pass: collect params, infer shapes ---
    store.phase = "prepare"
    out_shapes = jax.eval_shape(forward, {}, *abstract_inputs)

    # write inferred output shapes back into the IR (semantic NCHW order)
    for tid, aval in zip(output_ids, out_shapes):
        graph.tensors[tid].shape = list(aval.shape)

    params = {k: jnp.asarray(v) for k, v in store.values.items()}

    # --- compile pass ---
    store.phase = "trace"
    donate = (
        tuple(range(1, 1 + len(in_spec))) if options.donate_input else ()
    )  # input-buffer donation: XLA may alias them for outputs/temps
    jitted = jax.jit(forward, donate_argnums=donate)
    return CompiledGraph(graph, options, jitted, params, input_ids, output_ids)


def infer_shapes(graph: Graph, options: Optional[Options] = None) -> Graph:
    """Standalone shape inference via an abstract trace — records every
    tensor's shape into the IR (infer_ir_graph_shape analog)."""
    options = options or Options.from_env()
    store = ParamStore()
    forward_all, _, _ = build_forward(graph, options, store, return_all=True)
    in_spec = _input_spec(graph, options)
    abstract_inputs = [jax.ShapeDtypeStruct(shape, dt) for _, shape, dt in in_spec]
    store.phase = "prepare"
    shapes = jax.eval_shape(forward_all, {}, *abstract_inputs)
    for tid, aval in shapes.items():
        graph.tensors[tid].shape = list(aval.shape)
    return graph
