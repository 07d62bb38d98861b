"""Fused dw3x3+pw1x1 Pallas kernel vs the unfused quantized engine path."""

import numpy as np
import pytest

from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.graph.ir import DType, Graph, TensorType
from tengine_tpu.ops import qmath
from tengine_tpu.quantize.quantizer import quantize_graph
from tengine_tpu.utils.config import Options


def make_block_graph(C=8, C2=16, hw=8, stride=1, rng=None):
    """fp32 dw3x3 -> relu -> pw1x1 -> relu block."""
    rng = rng or np.random.default_rng(0)
    g = Graph(name="dwpw")
    x = g.add_tensor("x", DType.FP32, [1, C, hw, hw], TensorType.INPUT)
    wd = rng.standard_normal((C, 1, 3, 3)).astype(np.float32) * 0.3
    bd = rng.standard_normal((C,)).astype(np.float32) * 0.1
    wp = rng.standard_normal((C2, C, 1, 1)).astype(np.float32) * 0.3
    bp = rng.standard_normal((C2,)).astype(np.float32) * 0.1
    wd_t = g.add_tensor("wd", DType.FP32, list(wd.shape), TensorType.CONST, data=wd)
    bd_t = g.add_tensor("bd", DType.FP32, [C], TensorType.CONST, data=bd)
    wp_t = g.add_tensor("wp", DType.FP32, list(wp.shape), TensorType.CONST, data=wp)
    bp_t = g.add_tensor("bp", DType.FP32, [C2], TensorType.CONST, data=bp)
    mid = g.add_tensor("mid", DType.FP32, [], TensorType.VAR)
    out = g.add_tensor("out", DType.FP32, [], TensorType.VAR)
    inp = g.add_node("InputOp", "input", [], [x.idx])
    g.add_node(
        "Convolution", "dw", [x.idx, wd_t.idx, bd_t.idx], [mid.idx],
        params=dict(kernel_h=3, kernel_w=3, stride_h=stride, stride_w=stride,
                    dilation_h=1, dilation_w=1, input_channel=C, output_channel=C,
                    group=C, activation=0, pad_h0=1, pad_w0=1, pad_h1=1, pad_w1=1),
    )
    g.add_node(
        "Convolution", "pw", [mid.idx, wp_t.idx, bp_t.idx], [out.idx],
        params=dict(kernel_h=1, kernel_w=1, stride_h=1, stride_w=1,
                    dilation_h=1, dilation_w=1, input_channel=C, output_channel=C2,
                    group=1, activation=0, pad_h0=0, pad_w0=0, pad_h1=0, pad_w1=0),
    )
    g.inputs = [inp.idx]
    g.outputs = [g.nodes[-1].idx]
    return g


def fused_inputs_from_graph(qg):
    """Fold the quantized block's params into fused-kernel arguments."""
    dw = [n for n in qg.nodes if n.name == "dw"][0]
    pw = [n for n in qg.nodes if n.name == "pw"][0]
    t_in = qg.tensors[dw.inputs[0]]
    t_wd = qg.tensors[dw.inputs[1]]
    t_bd = qg.tensors[dw.inputs[2]]
    t_mid = qg.tensors[dw.outputs[0]]
    t_wp = qg.tensors[pw.inputs[1]]
    t_bp = qg.tensors[pw.inputs[2]]
    t_out = qg.tensors[pw.outputs[0]]

    def sc(q):
        return float(np.asarray(q.scales).reshape(-1)[0])

    def zp(q):
        return int(np.asarray(q.zero_points).reshape(-1)[0])

    C = t_wd.shape[0]
    C2 = t_wp.shape[0]
    is_u8 = t_in.dtype == DType.UINT8

    s_in, zp_in = sc(t_in.quant), zp(t_in.quant)
    s_mid, zp_mid = sc(t_mid.quant), zp(t_mid.quant)
    s_out, zp_out = sc(t_out.quant), zp(t_out.quant)

    wd_scales = np.asarray(t_wd.quant.scales, np.float32).reshape(-1)
    if wd_scales.size == 1:
        wd_scales = np.full(C, wd_scales[0], np.float32)
    wp_scales = np.asarray(t_wp.quant.scales, np.float32).reshape(-1)
    if wp_scales.size == 1:
        wp_scales = np.full(C2, wp_scales[0], np.float32)

    zp_wd = zp(t_wd.quant) if not t_wd.quant.per_channel else 0
    zp_wp = zp(t_wp.quant) if not t_wp.quant.per_channel else 0

    # dw taps: (w - zp_wd), laid out [9, C]
    wd_q = t_wd.data.reshape(C, 9).astype(np.int32) - zp_wd
    wd_taps = np.ascontiguousarray(wd_q.T).astype(np.int32)
    md = (s_in * wd_scales / s_mid).astype(np.float32)
    bd = (t_bd.data.astype(np.float64) * (s_in * wd_scales / s_mid) + zp_mid).astype(
        np.float32
    )

    # pw: shifted weights [C, C2]
    wp_flat = t_wp.data.reshape(C2, C)
    if is_u8:
        wp_sh = (wp_flat.astype(np.int32) - 128).astype(np.int8)
        cx_p = 128 - zp_mid
        cw_p = 128 - zp_wp
        mid_shift = 128
    else:
        wp_sh = wp_flat.astype(np.int8)
        cx_p = cw_p = 0
        mid_shift = 0
    wp_kn = np.ascontiguousarray(wp_sh.T)
    mp = (s_mid * wp_scales / s_out).astype(np.float32)
    colsum = wp_sh.astype(np.int64).sum(axis=1)  # per C2 row? careful: [C2, C] sum over C
    b0 = cx_p * colsum + C * cx_p * cw_p + t_bp.data.astype(np.int64)
    bp = (b0.astype(np.float64) * mp + zp_out).astype(np.float32)

    lo, hi = qmath.QRANGE[t_out.dtype]
    mid_lo, mid_hi = qmath.QRANGE[t_mid.dtype]
    return dict(
        wd=wd_taps, md=md, bd=bd, wp=wp_kn, mp=mp, bp=bp,
        zp_in=zp_in, act_d=0, act_p=0,
        inv_s_mid=1.0 / s_mid, zp_mid=zp_mid, mid_lo=mid_lo, mid_hi=mid_hi,
        mid_shift=mid_shift, inv_s_out=1.0 / s_out, zp_out=zp_out,
        lo=lo, hi=hi, cw_p=cw_p,
        out_dtype="uint8" if t_out.dtype == DType.UINT8 else "int8",
    ), t_in, t_out


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("scheme", ["uint8", "int8"])
def test_fused_matches_unfused(stride, scheme, rng):
    from tengine_tpu.ops.pallas.fused_dwpw import fused_dwpw_requant

    g = make_block_graph(C=8, C2=16, hw=8, stride=stride, rng=rng)
    calib = [rng.standard_normal((1, 8, 8, 8)).astype(np.float32) for _ in range(3)]
    qg = quantize_graph(g, calib, scheme=scheme)

    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(calib[0], t_in.quant, t_in.dtype)
    # exact tier: the fused kernel reproduces the unfused bit-exact engine
    # chain (the relaxed default re-rounds uint8 weights — different oracle)
    (expected,) = compile_graph(
        qg, Options(quant_mode="fast", quant_relaxed=False)
    ).run(xq)

    kwargs, t_in2, t_out = fused_inputs_from_graph(qg)
    x_nhwc = np.ascontiguousarray(xq.transpose(0, 2, 3, 1))
    out = np.asarray(
        fused_dwpw_requant(x_nhwc, stride=stride, th=4, **kwargs)
    ).transpose(0, 3, 1, 2)

    diff = np.abs(out.astype(np.int32) - expected.astype(np.int32))
    assert diff.max() <= 1, f"max LSB diff {diff.max()} ({(diff>0).mean():.3f} frac)"


def make_two_block_graph(C=8, C2=16, hw=8, rng=None):
    """input -> [dw3x3 s1 -> pw] -> [dw3x3 s2 -> pw] chain."""
    rng = rng or np.random.default_rng(1)
    g = Graph(name="dwpw2")
    x = g.add_tensor("x", DType.FP32, [1, C, hw, hw], TensorType.INPUT)
    inp = g.add_node("InputOp", "input", [], [x.idx])
    cur, cin = x, C
    for bi, (cout, stride) in enumerate([(C2, 1), (C2, 2)]):
        wd = rng.standard_normal((cin, 1, 3, 3)).astype(np.float32) * 0.3
        bd = rng.standard_normal((cin,)).astype(np.float32) * 0.1
        wp = rng.standard_normal((cout, cin, 1, 1)).astype(np.float32) * 0.3
        bp = rng.standard_normal((cout,)).astype(np.float32) * 0.1
        wd_t = g.add_tensor(f"wd{bi}", DType.FP32, list(wd.shape), TensorType.CONST, data=wd)
        bd_t = g.add_tensor(f"bd{bi}", DType.FP32, [cin], TensorType.CONST, data=bd)
        wp_t = g.add_tensor(f"wp{bi}", DType.FP32, list(wp.shape), TensorType.CONST, data=wp)
        bp_t = g.add_tensor(f"bp{bi}", DType.FP32, [cout], TensorType.CONST, data=bp)
        mid = g.add_tensor(f"mid{bi}", DType.FP32, [], TensorType.VAR)
        out = g.add_tensor(f"out{bi}", DType.FP32, [], TensorType.VAR)
        g.add_node(
            "Convolution", f"dw{bi}", [cur.idx, wd_t.idx, bd_t.idx], [mid.idx],
            params=dict(kernel_h=3, kernel_w=3, stride_h=stride, stride_w=stride,
                        dilation_h=1, dilation_w=1, input_channel=cin, output_channel=cin,
                        group=cin, activation=0, pad_h0=1, pad_w0=1, pad_h1=1, pad_w1=1),
        )
        g.add_node(
            "Convolution", f"pw{bi}", [mid.idx, wp_t.idx, bp_t.idx], [out.idx],
            params=dict(kernel_h=1, kernel_w=1, stride_h=1, stride_w=1,
                        dilation_h=1, dilation_w=1, input_channel=cin, output_channel=cout,
                        group=1, activation=0, pad_h0=0, pad_w0=0, pad_h1=0, pad_w1=0),
        )
        cur, cin = out, cout
    g.inputs = [inp.idx]
    g.outputs = [g.nodes[-1].idx]
    return g


@pytest.mark.parametrize("scheme", ["uint8", "int8"])
def test_fuse_pass_end_to_end(scheme, rng):
    """compile_graph(fuse_dwpw=True) rewrites both blocks and matches the
    unfused fast path within 1 LSB; ref mode on the fused graph is exact."""
    from tengine_tpu.graph.passes import fuse_dwpw

    g = make_two_block_graph(rng=rng)
    calib = [rng.standard_normal((1, 8, 8, 8)).astype(np.float32) for _ in range(3)]
    qg = quantize_graph(g, calib, scheme=scheme)

    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(calib[0], t_in.quant, t_in.dtype)

    opts = dict(quant_mode="fast", quant_bf16_storage=False)  # exercise pallas
    (unfused,) = compile_graph(qg, Options(fuse_dwpw=False, **opts)).run(xq)
    (ref_unfused,) = compile_graph(qg, Options(quant_mode="ref")).run(xq)

    cg = compile_graph(qg, Options(fuse_dwpw=True, **opts))
    # compile_graph rewrites a per-compile clone (cg.graph), never the input
    assert sum(1 for n in qg.nodes if n.op == "FusedDwPwConv") == 0
    assert sum(1 for n in cg.graph.nodes if n.op == "FusedDwPwConv") == 2
    (fused,) = cg.run(xq)
    diff = np.abs(fused.astype(np.int32) - unfused.astype(np.int32))
    assert diff.max() <= 1, f"fused-vs-unfused max LSB diff {diff.max()}"

    # ref mode on the already-fused graph reproduces the unfused ref path
    (ref_fused,) = compile_graph(cg.graph, Options(quant_mode="ref")).run(xq)
    np.testing.assert_array_equal(ref_fused, ref_unfused)


def test_fuse_pass_skips_multi_consumer(rng):
    """A dw whose mid tensor feeds two consumers must not be fused."""
    from tengine_tpu.graph.passes import fuse_dwpw

    g = make_block_graph(rng=rng)
    # add a second consumer of the mid tensor
    mid = g.find_tensor("mid")
    extra = g.add_tensor("extra", DType.FP32, [], TensorType.VAR)
    g.add_node("ReLu", "extra_relu", [mid.idx], [extra.idx], params=dict(negative_slope=0.0))
    calib = [rng.standard_normal((1, 8, 8, 8)).astype(np.float32) for _ in range(2)]
    qg = quantize_graph(g, calib, scheme="uint8")
    assert fuse_dwpw(qg) == 0
