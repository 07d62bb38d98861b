"""Quantized-domain passthrough kernels + restricted-op scale sharing
(r5): value-preserving data-movement ops run on RAW stored values when
every activation in/out shares one quant grid, and the quantizer makes
the grids match (shuffle/reshape outputs pin to input; Concat inputs pin
to the concat output; Slice/Split outputs pin to input — TFLite's
restricted-op rule)."""

import numpy as np
import pytest

from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.graph.ir import DType, Graph, QuantParam, TensorType
from tengine_tpu.ops import qmath
from tengine_tpu.quantize.quantizer import quantize_graph
from tengine_tpu.utils.config import Options


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def _qp(scale, zp):
    return QuantParam(scales=np.float32(scale), zero_points=np.int32(zp))


def build_shuffle_net(rng, same_grid=True):
    """conv -> shuffle -> slice(2 halves) -> concat -> conv, hand-quantized
    so the grid equality (or inequality) is controlled exactly."""
    g = Graph(name="pt")
    C, HW = 32, 8
    x = g.add_tensor("x", DType.UINT8, [2, C, HW, HW], TensorType.INPUT,
                     quant=_qp(0.05, 128))
    inp = g.add_node("InputOp", "in", [], [x.idx])

    w = rng.integers(0, 256, (C, C, 1, 1)).astype(np.uint8)
    wt = g.add_tensor("w", DType.UINT8, list(w.shape), TensorType.CONST,
                      data=w, quant=_qp(0.004, 128))
    t1 = g.add_tensor("c1", DType.UINT8, [], TensorType.VAR, quant=_qp(0.1, 120))
    g.add_node("Convolution", "conv1", [x.idx, wt.idx], [t1.idx],
               params=dict(kernel_h=1, kernel_w=1, stride_h=1, stride_w=1,
                           dilation_h=1, dilation_w=1, group=1, activation=-1,
                           pad_h0=0, pad_h1=0, pad_w0=0, pad_w1=0,
                           input_channel=C, output_channel=C))
    grid2 = _qp(0.1, 120) if same_grid else _qp(0.11, 119)
    t2 = g.add_tensor("sh", DType.UINT8, [], TensorType.VAR, quant=grid2)
    g.add_node("ShuffleChannel", "shuf", [t1.idx], [t2.idx],
               params=dict(group=2))
    sa = g.add_tensor("sa", DType.UINT8, [], TensorType.VAR, quant=grid2)
    sb = g.add_tensor("sb", DType.UINT8, [], TensorType.VAR, quant=grid2)
    g.add_node("Slice", "sl", [t2.idx], [sa.idx, sb.idx],
               params=dict(axis=1, iscaffe=1, slice_points=[C // 2]))
    t3 = g.add_tensor("cc", DType.UINT8, [], TensorType.VAR, quant=grid2)
    n3 = g.add_node("Concat", "cat", [sb.idx, sa.idx], [t3.idx],
                    params=dict(axis=1))
    g.inputs, g.outputs = [inp.idx], [n3.idx]
    return g


@pytest.mark.parametrize("same_grid", [True, False])
def test_passthrough_matches_wrapper(rng, same_grid):
    """Same-grid (passthrough engaged) and differing-grid (wrapper path)
    both match the ref oracle; the passthrough case is bit-equal."""
    g = build_shuffle_net(rng, same_grid=same_grid)
    xq = rng.integers(0, 256, (2, 32, 8, 8)).astype(np.uint8)
    (y_fast,) = compile_graph(g, Options(quant_mode="fast")).run(xq)
    (y_ref,) = compile_graph(g, Options(quant_mode="ref")).run(xq)
    # <=1 LSB comes from the conv tier (fast vs ref accumulation); the
    # movement ops themselves add nothing — pinned exactly by
    # test_passthrough_is_pure_permutation below
    d = np.abs(y_fast.astype(np.int32) - y_ref.astype(np.int32)).max()
    assert d <= 1


def test_passthrough_is_pure_permutation(rng):
    """Feed the shuffle->slice->concat chain directly (input = graph
    input): the passthrough output must be exactly a permutation of the
    input bytes (bit-equal to the ref path's value movement)."""
    g = Graph(name="perm")
    C, HW = 32, 8
    grid = _qp(0.1, 120)
    x = g.add_tensor("x", DType.UINT8, [2, C, HW, HW], TensorType.INPUT,
                     quant=grid)
    inp = g.add_node("InputOp", "in", [], [x.idx])
    t2 = g.add_tensor("sh", DType.UINT8, [], TensorType.VAR, quant=grid)
    g.add_node("ShuffleChannel", "shuf", [x.idx], [t2.idx],
               params=dict(group=2))
    sa = g.add_tensor("sa", DType.UINT8, [], TensorType.VAR, quant=grid)
    sb = g.add_tensor("sb", DType.UINT8, [], TensorType.VAR, quant=grid)
    g.add_node("Slice", "sl", [t2.idx], [sa.idx, sb.idx],
               params=dict(axis=1, iscaffe=1, slice_points=[C // 2]))
    t3 = g.add_tensor("cc", DType.UINT8, [], TensorType.VAR, quant=grid)
    n3 = g.add_node("Concat", "cat", [sb.idx, sa.idx], [t3.idx],
                    params=dict(axis=1))
    g.inputs, g.outputs = [inp.idx], [n3.idx]
    xq = rng.integers(0, 256, (2, C, HW, HW)).astype(np.uint8)
    (y_fast,) = compile_graph(g, Options(quant_mode="fast")).run(xq)
    # numpy oracle of the same permutation
    sh = xq.reshape(2, 2, C // 2, HW, HW).swapaxes(1, 2).reshape(2, C, HW, HW)
    want = np.concatenate([sh[:, C // 2:], sh[:, :C // 2]], axis=1)
    np.testing.assert_array_equal(y_fast, want)


def test_passthrough_selected_when_grids_match(rng):
    from tengine_tpu.ops.registry import LowerCtx, select_kernel

    g = build_shuffle_net(rng, same_grid=True)
    opts = Options(quant_mode="fast")
    for n in g.nodes:
        if n.op in ("ShuffleChannel", "Slice", "Concat"):
            k = select_kernel(n.op, LowerCtx(graph=g, node=n, options=opts,
                                             store=None))
            assert "passthrough" in k.fn.__name__, (n.op, k.fn.__name__)
    # differing-grid variant: only the shuffle straddles the two grids
    # (slice/concat sit entirely inside grid2 and legitimately engage)
    g2 = build_shuffle_net(rng, same_grid=False)
    for n in g2.nodes:
        if n.op == "ShuffleChannel":
            k = select_kernel(n.op, LowerCtx(graph=g2, node=n, options=opts,
                                             store=None))
            assert "passthrough" not in k.fn.__name__


def test_quantizer_pins_restricted_ops(rng):
    """quantize_graph applies the scale-sharing rules on a float graph."""
    from tengine_tpu.serializer.tm2 import format as tmfmt

    g = Graph(name="pin")
    C, HW = 8, 8
    x = g.add_tensor("x", DType.FP32, [2, C, HW, HW], TensorType.INPUT)
    inp = g.add_node("InputOp", "in", [], [x.idx])

    def conv(name, src, scale):
        w = (rng.standard_normal((C, C, 1, 1)) * scale).astype(np.float32)
        wt = g.add_tensor(f"{name}_w", DType.FP32, list(w.shape),
                          TensorType.CONST, data=w)
        t = g.add_tensor(f"{name}_o", DType.FP32, [], TensorType.VAR)
        g.add_node("Convolution", name, [src, wt.idx], [t.idx],
                   params=dict(kernel_h=1, kernel_w=1, stride_h=1, stride_w=1,
                               dilation_h=1, dilation_w=1, group=1,
                               activation=-1, pad_h0=0, pad_h1=0, pad_w0=0,
                               pad_w1=0, input_channel=C, output_channel=C))
        return t.idx

    # two branches with very different ranges -> different calibrated scales
    a = conv("a", x.idx, 0.1)
    b = conv("b", x.idx, 2.0)
    t3 = g.add_tensor("cc", DType.FP32, [], TensorType.VAR)
    cat = g.add_node("Concat", "cat", [a, b], [t3.idx], params=dict(axis=1))
    g.inputs, g.outputs = [inp.idx], [cat.idx]

    calib = [rng.standard_normal((2, C, HW, HW)).astype(np.float32)]
    qg = quantize_graph(g, calib, scheme="uint8")
    q_out = qg.tensors[qg.nodes[cat.idx].outputs[0]].quant
    for tid in qg.nodes[cat.idx].inputs:
        q_in = qg.tensors[tid].quant
        assert float(np.asarray(q_in.scales)) == float(np.asarray(q_out.scales))
        assert int(np.asarray(q_in.zero_points)) == int(
            np.asarray(q_out.zero_points)
        )
    # and the engine result stays within the ref-oracle contract
    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(calib[0], t_in.quant, t_in.dtype)
    (yf,) = compile_graph(qg, Options(quant_mode="fast")).run(xq)
    (yr,) = compile_graph(qg, Options(quant_mode="ref")).run(xq)
    assert np.abs(yf.astype(np.int32) - yr.astype(np.int32)).max() <= 1


def test_concat_with_float_const_input_rejected(rng):
    """A Concat holding an unquantized float const operand must NOT take
    the raw passthrough (r5 self-review finding: raw floats would sit next
    to integer codes)."""
    from tengine_tpu.ops.registry import LowerCtx, select_kernel

    g = Graph(name="cc")
    x = g.add_tensor("x", DType.UINT8, [1, 4, 2, 2], TensorType.INPUT,
                     quant=_qp(0.1, 128))
    inp = g.add_node("InputOp", "in", [], [x.idx])
    anchors = g.add_tensor(
        "anchors", DType.FP32, [1, 4, 2, 2], TensorType.CONST,
        data=rng.standard_normal((1, 4, 2, 2)).astype(np.float32),
    )
    out = g.add_tensor("y", DType.UINT8, [], TensorType.VAR, quant=_qp(0.1, 128))
    cat = g.add_node("Concat", "cat", [x.idx, anchors.idx], [out.idx],
                     params=dict(axis=1))
    g.inputs, g.outputs = [inp.idx], [cat.idx]
    k = select_kernel("Concat", LowerCtx(graph=g, node=g.nodes[cat.idx],
                                         options=Options(quant_mode="fast"),
                                         store=None))
    assert "passthrough" not in k.fn.__name__


def test_fold_shuffle_gathers_exact(rng):
    """graph/passes.py:fold_shuffle_gathers on the real shufflenet-v2
    graph: the fold engages (shuffles vanish from the compiled clone), the
    conv-side weight scatter is exact, and the whole net is bit-equal to
    the unfolded engine and the ref oracle."""
    import os

    import tengine_tpu as tt
    from tengine_tpu.graph.passes import fold_shuffle_gathers
    from tengine_tpu.models.zoo import load_benchmark_model

    g = load_benchmark_model("shufflenetv2", fill_missing_weights="random")
    for tid in g.input_tensors:
        g.tensors[tid].shape = [1, 3, 64, 64]
    calib = [rng.standard_normal((1, 3, 64, 64)).astype(np.float32)]
    qg = quantize_graph(g, calib, scheme="uint8")

    qc = qg.clone()
    n = fold_shuffle_gathers(qc)
    assert n == 16  # every shuffle folds (incl. the dw-consumer downsample
    # blocks, whose permutation propagates through the dw weights)
    assert not any(x.op == "ShuffleChannel" for x in qc.nodes)
    assert any(x.op == "ChannelGather" for x in qc.nodes)

    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(calib[0], t_in.quant, t_in.dtype)
    (y_fold,) = compile_graph(qg, Options(quant_mode="fast")).run(xq)
    os.environ["TT_FOLD_SHUFFLE"] = "0"
    try:
        (y_plain,) = compile_graph(qg, Options(quant_mode="fast")).run(xq)
    finally:
        os.environ.pop("TT_FOLD_SHUFFLE")
    (y_ref,) = compile_graph(qg, Options(quant_mode="ref")).run(xq)
    np.testing.assert_array_equal(y_fold, y_plain)
    np.testing.assert_array_equal(y_fold, y_ref)
