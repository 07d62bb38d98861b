"""Oracle tests for the native-int8 plan (Options.quant_native /
graph/passes.py:to_native_int8) — VERDICT r4 item 2 / ADVICE r4 item 3.

The plan rewrites internal UINT8 activations to zero-point-shifted INT8
(exact relabeling), requantizes UINT8-asymmetric weights to symmetric
per-channel INT8 (one re-round per weight, the relaxed-tier contract), and
runs convs/FCs as s8*s8->s32 on the int8 MXU with the activation zero-point
folded into a ones-conv correction constant. These tests pin:

  * exactness of everything EXCEPT the weight re-round: with crafted
    weights whose symmetric requant is lossless, native-on vs the exact
    engine is <= 1 LSB (f32 association of the folded zp term only), on
    padded, unpadded, strided-1x1 and FC geometries;
  * the relaxed contract on calibrated weights: tight LSB distribution +
    argmax agreement (mirrors tests/test_relaxed_tier.py);
  * the profitability gate (engine._native_profitable) separating the
    wide-channel (native) and depthwise/small-channel (legacy) families;
  * the UINT8-weight fallback guard: an INT8-shifted activation feeding a
    conv whose weight stayed UINT8-asymmetric must take the bf16-shift
    branch, not the raw-byte s8 dot (ADVICE r4 item 1);
  * per-channel UINT8 weights are requantized with their own per-channel
    scales (ADVICE r4 item 2);
  * the graph-boundary contract: graph inputs/outputs keep their original
    dtype (pytengine/C-API buffer compatibility).

Reference bar: SURVEY §4 — optimized tiers diff against the ref oracle
(TG_DEBUG_REF, cpu_module.c:157-166).
"""

import numpy as np
import pytest

from tengine_tpu.executor.engine import _native_profitable, compile_graph
from tengine_tpu.graph.ir import DType, Graph, QuantParam, TensorType
from tengine_tpu.graph.passes import to_native_int8
from tengine_tpu.ops import qmath
from tengine_tpu.quantize.quantizer import quantize_graph
from tengine_tpu.utils.config import Options


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _conv_params(k, s=1, pad=None, c_in=0, c_out=0, act=-1, group=1):
    if pad is None:
        pad = k // 2
    return dict(
        kernel_h=k, kernel_w=k, stride_h=s, stride_w=s,
        dilation_h=1, dilation_w=1, input_channel=c_in, output_channel=c_out,
        group=group, activation=act,
        pad_h0=pad, pad_w0=pad, pad_h1=pad, pad_w1=pad,
    )


def build_wide_net(rng, n=2, c=64, hw=16, dw=False):
    """dw-free wide-channel fp32 net that passes engine._native_profitable:
    stem (3->c, excluded from the gate stat by c_in<=4), padded k3 body conv
    with relu, strided 1x1 (c->2c s2), pointwise with bias, residual
    Eltwise+ReLu pair (fuse_conv_add under the native plan), FC head.
    dw=True swaps the body conv for a depthwise one (gate must refuse)."""
    from tengine_tpu.serializer.tm2 import format as tmfmt

    g = Graph(name="widenet")
    x = g.add_tensor("x", DType.FP32, [n, 3, hw, hw], TensorType.INPUT)
    inp = g.add_node("InputOp", "input", [], [x.idx])
    g.inputs = [inp.idx]

    def conv(name, src, c_in, c_out, k, s=1, pad=None, act=-1, bias=False,
             group=1):
        w = (rng.standard_normal((c_out, c_in // group, k, k)) * 0.2).astype(
            np.float32
        )
        wt = g.add_tensor(f"{name}_w", DType.FP32, list(w.shape),
                          TensorType.CONST, data=w)
        ins = [src, wt.idx]
        if bias:
            b = (rng.standard_normal(c_out) * 0.1).astype(np.float32)
            bt = g.add_tensor(f"{name}_b", DType.FP32, [c_out],
                              TensorType.CONST, data=b)
            ins.append(bt.idx)
        out = g.add_tensor(f"{name}_out", DType.FP32, [], TensorType.VAR)
        g.add_node("Convolution", name, ins, [out.idx],
                   params=_conv_params(k, s, pad, c_in, c_out, act, group))
        return out.idx

    t1 = conv("stem", x.idx, 3, c, 3, act=0)
    if dw:
        t2 = conv("dw", t1, c, c, 3, group=c, act=0)
    else:
        t2 = conv("body", t1, c, c, 3, act=0)  # padded k3
    t3 = conv("down", t2, c, 2 * c, 1, s=2, pad=0)  # strided 1x1 subsample
    t4 = conv("pw", t3, 2 * c, c, 1, pad=0, bias=True)
    # residual pair: conv_b(out of t4) + t4, then ReLu — the fuse_conv_add
    # epilogue under the native plan
    t5 = conv("res", t4, c, c, 3)
    t6 = g.add_tensor("sum_out", DType.FP32, [], TensorType.VAR)
    g.add_node("Eltwise", "sum", [t5, t4], [t6.idx],
               params=dict(type=tmfmt.ELT_SUM))
    t7 = g.add_tensor("relu_out", DType.FP32, [], TensorType.VAR)
    g.add_node("ReLu", "relu", [t6.idx], [t7.idx], params={})
    fc_in = c * (hw // 2) * (hw // 2)
    wf = (rng.standard_normal((10, fc_in)) * 0.05).astype(np.float32)
    wt = g.add_tensor("fc_w", DType.FP32, list(wf.shape), TensorType.CONST,
                      data=wf)
    bf = (rng.standard_normal(10) * 0.1).astype(np.float32)
    bt = g.add_tensor("fc_b", DType.FP32, [10], TensorType.CONST, data=bf)
    out = g.add_tensor("fc_out", DType.FP32, [], TensorType.VAR)
    fc = g.add_node("FullyConnected", "fc", [t7.idx, wt.idx, bt.idx],
                    [out.idx], params=dict(num_output=10))
    g.outputs = [fc.idx]
    return g


# ---------------------------------------------------------------------------
# profitability gate
# ---------------------------------------------------------------------------


def test_native_profitable_gate(rng):
    wide = build_wide_net(rng, c=64, hw=16)
    assert _native_profitable(wide) is True
    dwnet = build_wide_net(rng, c=64, hw=16, dw=True)
    assert _native_profitable(dwnet) is False  # depthwise family -> legacy
    narrow = build_wide_net(rng, c=16, hw=16)
    assert _native_profitable(narrow) is False  # small-channel fraction


def test_native_engages_on_wide_uint8(rng):
    """Default Options (quant_native='auto', relaxed on) must actually take
    the native path on the wide fixture: internal activations turn INT8
    full_range while graph I/O stays UINT8."""
    g = build_wide_net(rng, c=64, hw=16)
    calib = [rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
             for _ in range(2)]
    qg = quantize_graph(g, calib, scheme="uint8")
    qc = qg.clone()
    changed = to_native_int8(qc)
    assert changed > 0
    boundary = set(qc.input_tensors) | set(qc.output_tensors)
    for t in qc.tensors:
        if t.idx in boundary and t.quant is not None and not t.is_const:
            assert t.dtype == DType.UINT8  # I/O buffer contract unchanged
    assert any(
        t.dtype == DType.INT8 and t.quant is not None and t.quant.full_range
        for t in qc.tensors
        if not t.is_const and t.idx not in boundary
    )


# ---------------------------------------------------------------------------
# exactness modulo the weight re-round (crafted lossless weights)
# ---------------------------------------------------------------------------


def _lossless_uint8_weights(rng, shape):
    """uint8 weights with zp=128 whose symmetric-int8 requant is lossless:
    values in [1, 255] with an exact ±127 extreme per out-channel, so
    s_new == s_old and q' == q - 128 bit-exactly."""
    q = rng.integers(1, 256, size=shape).astype(np.uint8)
    flat = q.reshape(shape[0], -1)
    flat[:, 0] = 255  # |q - 128| == 127 -> scale preserved per channel
    return flat.reshape(shape)


def build_crafted_uint8_graph(rng, n=2, c=32, hw=8):
    """Hand-quantized uint8 graph: padded k3 conv, unpadded k3 conv,
    strided-1x1 subsample conv, FC — each with crafted lossless weights and
    varied activation zero-points, so native-on vs exact isolates the
    shift-relabel + ones-conv zp correction + strided-subsample + fc_zp_corr
    rewrites (every divergence <= 1 LSB of f32 association)."""
    g = Graph(name="crafted")

    def qp(scale, zp):
        return QuantParam(
            scales=np.float32(scale), zero_points=np.int32(zp), width=8
        )

    x = g.add_tensor("x", DType.UINT8, [n, c, hw, hw], TensorType.INPUT,
                     quant=qp(0.05, 121))
    inp = g.add_node("InputOp", "input", [], [x.idx])
    g.inputs = [inp.idx]

    def qconv(name, src, c_in, c_out, k, s, pad, zp_act, bias=False):
        wq = _lossless_uint8_weights(rng, (c_out, c_in, k, k))
        wt = g.add_tensor(f"{name}_w", DType.UINT8, list(wq.shape),
                          TensorType.CONST, data=wq, quant=qp(0.004, 128))
        ins = [src, wt.idx]
        if bias:
            braw = rng.integers(-2000, 2000, size=c_out).astype(np.int32)
            bt = g.add_tensor(f"{name}_b", DType.INT32, [c_out],
                              TensorType.CONST, data=braw)
            ins.append(bt.idx)
        out = g.add_tensor(f"{name}_out", DType.UINT8, [], TensorType.VAR,
                           quant=qp(0.1, zp_act))
        g.add_node("Convolution", name, ins, [out.idx],
                   params=_conv_params(k, s, pad, c_in, c_out))
        return out.idx

    t1 = qconv("pad3", x.idx, c, c, 3, 1, 1, 133, bias=True)  # padded: [oh,ow,O] corr
    t2 = qconv("nopad3", t1, c, c, 3, 1, 0, 117)              # interior: [O] corr
    t3 = qconv("s2pw", t2, c, c, 1, 2, 0, 126)                # strided-1x1 subsample
    wq = _lossless_uint8_weights(rng, (10, c * 3 * 3))
    wt = g.add_tensor("fc_w", DType.UINT8, list(wq.shape), TensorType.CONST,
                      data=wq, quant=qp(0.004, 128))
    braw = rng.integers(-2000, 2000, size=10).astype(np.int32)
    bt = g.add_tensor("fc_b", DType.INT32, [10], TensorType.CONST, data=braw)
    out = g.add_tensor("fc_out", DType.UINT8, [], TensorType.VAR,
                       quant=qp(0.2, 128))
    fc = g.add_node("FullyConnected", "fc", [t3, wt.idx, bt.idx], [out.idx],
                    params=dict(num_output=10))
    g.outputs = [fc.idx]
    return g


def test_native_exact_on_lossless_weights(rng):
    """quant_native='on' (relaxed OFF — isolates the storage/shift/correction
    rewrites from the relaxed epilogues) vs the exact engine: <= 1 LSB."""
    g = build_crafted_uint8_graph(rng)
    t_in = g.tensors[g.input_tensors[0]]
    xq = rng.integers(0, 256, size=[int(d) for d in t_in.shape]).astype(
        np.uint8
    )
    opt_nat = Options(quant_mode="fast", quant_native="on",
                      quant_relaxed=False)
    opt_ref = Options(quant_mode="fast", quant_native="off",
                      quant_relaxed=False)
    (y_nat,) = compile_graph(g, opt_nat).run(xq)
    (y_ref,) = compile_graph(g, opt_ref).run(xq)
    assert y_nat.dtype == y_ref.dtype == np.uint8  # output contract
    d = np.abs(y_nat.astype(np.int32) - y_ref.astype(np.int32))
    assert d.max() <= 1, f"native-vs-exact max diff {d.max()}"


def test_native_exact_per_layer_against_ref_oracle(rng):
    """The same crafted graph against the quant_mode='ref' oracle (the
    TG_DEBUG_REF analog: dequant -> fp32 HIGHEST conv -> requant). The fast
    exact engine holds <= 1 LSB vs ref; native-on must hold the same bound
    (transitively pinning the rewrites against the reference semantics)."""
    g = build_crafted_uint8_graph(rng)
    t_in = g.tensors[g.input_tensors[0]]
    xq = rng.integers(0, 256, size=[int(d) for d in t_in.shape]).astype(
        np.uint8
    )
    (y_nat,) = compile_graph(
        g, Options(quant_mode="fast", quant_native="on", quant_relaxed=False)
    ).run(xq)
    (y_oracle,) = compile_graph(g, Options(quant_mode="ref")).run(xq)
    d = np.abs(y_nat.astype(np.int32) - y_oracle.astype(np.int32))
    assert d.max() <= 1, f"native-vs-ref-oracle max diff {d.max()}"


# ---------------------------------------------------------------------------
# relaxed contract on calibrated weights (the default path)
# ---------------------------------------------------------------------------


def test_native_relaxed_contract_wide_net(rng):
    """Default engine (native auto-engaged) vs the exact engine on the wide
    calibrated fixture: tight LSB distribution + FC argmax agreement — the
    weight re-round plus relaxed epilogues stay in the relaxed-tier
    contract (mirrors test_relaxed_tier.relaxed_vs_exact)."""
    g = build_wide_net(rng, n=8, c=64, hw=16)
    calib = [rng.standard_normal((8, 3, 16, 16)).astype(np.float32)
             for _ in range(2)]
    qg = quantize_graph(g, calib, scheme="uint8")
    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(calib[0], t_in.quant, t_in.dtype)
    (y_nat,) = compile_graph(qg, Options(quant_mode="fast")).run(xq)
    (y_exact,) = compile_graph(
        qg, Options(quant_mode="fast", quant_native="off",
                    quant_relaxed=False)
    ).run(xq)
    d = np.abs(y_nat.astype(np.int32) - y_exact.astype(np.int32))
    assert d.max() <= 8, f"max diff {d.max()}"
    # principled accuracy bound: both engines against the fp32 oracle on the
    # output grid — the weight re-round may not add more error than the
    # quantization noise already present in the exact engine (the relaxed
    # tier's real contract; a raw LSB histogram on a 10-logit head behind
    # five re-rounded convs is the wrong statistic)
    (y_f32,) = compile_graph(g, Options()).run(calib[0])
    t_out = qg.tensors[qg.output_tensors[0]]
    s = float(np.asarray(t_out.quant.scales))
    zp = int(np.asarray(t_out.quant.zero_points))
    qtrue = y_f32.reshape(y_nat.shape) / s + zp
    err_nat = np.abs(y_nat.astype(np.float64) - qtrue).mean()
    err_exact = np.abs(y_exact.astype(np.float64) - qtrue).mean()
    assert err_nat <= err_exact * 1.5 + 0.5, (err_nat, err_exact)
    agree = (
        y_nat.reshape(8, -1).argmax(1) == y_exact.reshape(8, -1).argmax(1)
    ).mean()
    assert agree >= 0.85, f"argmax agreement {agree:.2f}"


# ---------------------------------------------------------------------------
# fallback guards (ADVICE r4 items 1 & 2)
# ---------------------------------------------------------------------------


def test_uint8_weight_with_shifted_s8_activation(rng):
    """An INT8 full_range activation (native-shifted) feeding a conv whose
    weight is still UINT8-asymmetric — the case to_native_int8 leaves behind
    for shared/per-channel weights. The integer-MXU branch must NOT consume
    the raw uint8 bytes; the bf16-shift branch handles it exactly."""
    g = Graph(name="mixed")

    def qp(scale, zp, full_range=False):
        return QuantParam(scales=np.float32(scale), zero_points=np.int32(zp),
                          width=8, full_range=full_range)

    c, hw = 32, 8
    x = g.add_tensor("x", DType.INT8, [2, c, hw, hw], TensorType.INPUT,
                     quant=qp(0.05, -7, full_range=True))
    inp = g.add_node("InputOp", "input", [], [x.idx])
    wq = rng.integers(30, 220, size=(c, c, 3, 3)).astype(np.uint8)
    wt = g.add_tensor("w", DType.UINT8, list(wq.shape), TensorType.CONST,
                      data=wq, quant=qp(0.004, 117))  # asymmetric zp_w
    out = g.add_tensor("y", DType.INT8, [], TensorType.VAR,
                       quant=qp(0.1, 3, full_range=True))
    nconv = g.add_node("Convolution", "c", [x.idx, wt.idx], [out.idx],
                       params=_conv_params(3, 1, 1, c, c))
    g.inputs, g.outputs = [inp.idx], [nconv.idx]

    xq = rng.integers(-128, 128, size=(2, c, hw, hw)).astype(np.int8)
    (y_fast,) = compile_graph(
        g, Options(quant_mode="fast", quant_relaxed=False)
    ).run(xq)
    (y_ref,) = compile_graph(g, Options(quant_mode="ref")).run(xq)
    d = np.abs(y_fast.astype(np.int32) - y_ref.astype(np.int32))
    assert d.max() <= 1, f"uint8-weight fallback diverges: {d.max()}"


def test_per_channel_uint8_weight_requant(rng):
    """to_native_int8 on a per-channel-quantized UINT8 weight must use each
    channel's own scale/zp (ADVICE r4 item 2: channel-0-only corrupted all
    other channels). Crafted lossless per-channel weights -> <= 1 LSB."""
    g = Graph(name="pcw")

    def qp(scale, zp):
        return QuantParam(scales=np.float32(scale), zero_points=np.int32(zp),
                          width=8)

    c, hw = 32, 8
    x = g.add_tensor("x", DType.UINT8, [2, c, hw, hw], TensorType.INPUT,
                     quant=qp(0.05, 128))
    inp = g.add_node("InputOp", "input", [], [x.idx])
    wq = _lossless_uint8_weights(rng, (c, c, 3, 3))
    # per-channel scales spanning 50x — channel-0-only dequant would corrupt
    scales = np.geomspace(0.001, 0.05, c).astype(np.float32)
    wt = g.add_tensor(
        "w", DType.UINT8, list(wq.shape), TensorType.CONST, data=wq,
        quant=QuantParam(scales=scales, zero_points=np.full(c, 128, np.int32),
                         width=8),
    )
    mid = g.add_tensor("mid", DType.UINT8, [], TensorType.VAR,
                       quant=qp(0.3, 124))
    g.add_node("Convolution", "c1", [x.idx, wt.idx], [mid.idx],
               params=_conv_params(3, 1, 1, c, c))
    # second conv so the first's OUTPUT is internal (shift-relabeled)
    w2 = _lossless_uint8_weights(rng, (c, c, 1, 1))
    wt2 = g.add_tensor("w2", DType.UINT8, list(w2.shape), TensorType.CONST,
                       data=w2, quant=qp(0.004, 128))
    out = g.add_tensor("y", DType.UINT8, [], TensorType.VAR,
                       quant=qp(0.5, 128))
    n2 = g.add_node("Convolution", "c2", [mid.idx, wt2.idx], [out.idx],
                    params=_conv_params(1, 1, 0, c, c))
    g.inputs, g.outputs = [inp.idx], [n2.idx]

    xq = rng.integers(0, 256, size=(2, c, hw, hw)).astype(np.uint8)
    (y_nat,) = compile_graph(
        g, Options(quant_mode="fast", quant_native="on", quant_relaxed=False)
    ).run(xq)
    (y_ref,) = compile_graph(
        g, Options(quant_mode="fast", quant_native="off", quant_relaxed=False)
    ).run(xq)
    d = np.abs(y_nat.astype(np.int32) - y_ref.astype(np.int32))
    assert d.max() <= 1, f"per-channel weight requant diverges: {d.max()}"
