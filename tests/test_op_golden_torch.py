"""Per-op golden tests against an independent oracle (torch where its
semantics match the reference's C kernels, numpy otherwise).

This is the analog of the reference's per-op ONNX-fixture suite
(tests/op/test_onnx_op_*.cpp, SURVEY §4): every case builds a tiny graph
through the public IR, executes it through the full compile path, and
compares against an implementation this framework does not share code with.
"""

import numpy as np
import pytest

from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.graph.ir import DType, Graph, TensorType

from tests.test_execute_small import _simple_graph

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def run_graph(g, *xs):
    s = compile_graph(g)
    outs = s.run(*xs)
    return outs[0] if len(outs) == 1 else outs


def t2n(t):
    return t.detach().numpy()


ATOL = 1e-4


# ---------------------------------------------------------------------------
# convolution family
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("stride,pad,opad,group", [(2, 1, 1, 1), (1, 0, 0, 2), (2, 0, 0, 1)])
def test_deconvolution_vs_torch(stride, pad, opad, group, rng):
    in_c, out_c, k = 4, 6, 3
    x = rng.standard_normal((1, in_c, 7, 7)).astype(np.float32)
    # tmfile deconv weight layout = [in_c, out_c/group, kh, kw] == torch's
    w = rng.standard_normal((in_c, out_c // group, k, k)).astype(np.float32)
    b = rng.standard_normal((out_c,)).astype(np.float32)
    g = _simple_graph(
        "Deconvolution",
        dict(
            num_output=out_c, kernel_h=k, kernel_w=k, stride_h=stride,
            stride_w=stride, pad_w0=pad, pad_h0=pad, pad_w1=pad, pad_h1=pad,
            dilation_h=1, dilation_w=1, group=group, activation=-1,
            output_pad_h0=opad, output_pad_w0=opad,
        ),
        [(1, in_c, 7, 7)],
        consts=[w, b],
    )
    out = run_graph(g, x)
    ref = F.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad, output_padding=opad, groups=group,
    )
    np.testing.assert_allclose(out, t2n(ref), rtol=1e-4, atol=ATOL)


def test_lrn_vs_torch(rng):
    x = rng.standard_normal((2, 8, 5, 5)).astype(np.float32)
    g = _simple_graph(
        "LRN",
        dict(local_size=5, alpha=1e-3, beta=0.75, norm_region=0, k=1.0,
             bias=1.0, is_onnx=False),
        [(2, 8, 5, 5)],
    )
    out = run_graph(g, x)
    ref = F.local_response_norm(torch.from_numpy(x), 5, alpha=1e-3, beta=0.75, k=1.0)
    np.testing.assert_allclose(out, t2n(ref), rtol=1e-4, atol=ATOL)


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


def test_instancenorm_vs_torch(rng):
    x = rng.standard_normal((2, 5, 6, 6)).astype(np.float32)
    gamma = rng.standard_normal((5,)).astype(np.float32)
    beta = rng.standard_normal((5,)).astype(np.float32)
    g = _simple_graph("InstanceNorm", dict(eps=1e-5), [(2, 5, 6, 6)],
                      consts=[gamma, beta])
    out = run_graph(g, x)
    ref = F.instance_norm(
        torch.from_numpy(x), weight=torch.from_numpy(gamma),
        bias=torch.from_numpy(beta), eps=1e-5,
    )
    np.testing.assert_allclose(out, t2n(ref), rtol=1e-4, atol=ATOL)


def test_layernorm_vs_torch(rng):
    x = rng.standard_normal((4, 10, 16)).astype(np.float32)
    gamma = rng.standard_normal((16,)).astype(np.float32)
    beta = rng.standard_normal((16,)).astype(np.float32)
    g = _simple_graph("LayerNorm", dict(eps=1e-5), [(4, 10, 16)],
                      consts=[gamma, beta])
    out = run_graph(g, x)
    ref = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(gamma),
                       torch.from_numpy(beta), eps=1e-5)
    np.testing.assert_allclose(out, t2n(ref), rtol=1e-4, atol=ATOL)


@pytest.mark.parametrize("across,normvar", [(0, 1), (1, 1), (0, 0)])
def test_mvn_vs_numpy(across, normvar, rng):
    x = rng.standard_normal((2, 4, 5, 5)).astype(np.float32)
    g = _simple_graph(
        "MVN", dict(across_channels=across, normalize_variance=normvar, eps=1e-9),
        [(2, 4, 5, 5)],
    )
    out = run_graph(g, x)
    axes = (1, 2, 3) if across else (2, 3)
    ref = x - x.mean(axis=axes, keepdims=True)
    if normvar:
        # the reference normalizes by sqrt(E[x^2]) of the RAW input — the
        # second moment, not centered variance (mvn_ref.c:130-190)
        ref = ref / (np.sqrt((x * x).mean(axis=axes, keepdims=True)) + 1e-9)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=ATOL)


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

ACT_CASES = [
    ("Elu", dict(alpha=1.0), lambda t: F.elu(t)),
    ("Selu", dict(alpha=1.67326319, lambda_=1.05070102), lambda t: F.selu(t)),
    ("HardSwish", dict(alpha=1 / 6.0, beta=0.5), lambda t: F.hardswish(t)),
    ("Hardsigmoid", dict(alpha=1 / 6.0, beta=0.5), lambda t: F.hardsigmoid(t)),
    ("Mish", {}, lambda t: F.mish(t)),
    ("Softplus", {}, lambda t: F.softplus(t)),
    ("Gelu", {}, lambda t: F.gelu(t)),
    ("Tanh", {}, torch.tanh),
    ("Sigmoid", {}, torch.sigmoid),
    ("Logistic", {}, torch.sigmoid),
    ("Clip", dict(min=-0.3, max=0.6), lambda t: torch.clamp(t, -0.3, 0.6)),
    ("ReLu6", {}, lambda t: torch.clamp(t, 0, 6)),
    ("Absval", {}, torch.abs),
]


@pytest.mark.parametrize("op,params,torch_fn", ACT_CASES, ids=[c[0] for c in ACT_CASES])
def test_activation_vs_torch(op, params, torch_fn, rng):
    x = (rng.standard_normal((2, 3, 6, 6)) * 2).astype(np.float32)
    g = _simple_graph(op, params, [(2, 3, 6, 6)])
    out = run_graph(g, x)
    ref = t2n(torch_fn(torch.from_numpy(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=ATOL)


# ---------------------------------------------------------------------------
# reductions / argmax / topk / softmax
# ---------------------------------------------------------------------------

RED_CASES = [
    (0, lambda t, d, k: t.sum(dim=d, keepdim=k)),
    (1, lambda t, d, k: t.mean(dim=d, keepdim=k)),
    (4, lambda t, d, k: t.amax(dim=d, keepdim=k)),
    (5, lambda t, d, k: t.amin(dim=d, keepdim=k)),
    (6, lambda t, d, k: t.prod(dim=d[0], keepdim=k)),
    # 7/8 are both sum(|x|) in the reference runtime ("l2" there is
    # elementwise sqrt(x^2) summed, reduction_kernel_ref.h:3005); 9 is
    # log(sum) and 10 logsumexp
    (7, lambda t, d, k: t.abs().sum(dim=d, keepdim=k)),
    (8, lambda t, d, k: t.abs().sum(dim=d, keepdim=k)),
    (10, lambda t, d, k: t.logsumexp(dim=d, keepdim=k)),
]


@pytest.mark.parametrize("rtype,torch_fn", RED_CASES, ids=[str(c[0]) for c in RED_CASES])
@pytest.mark.parametrize("keepdim", [0, 1])
def test_reduction_vs_torch(rtype, torch_fn, keepdim, rng):
    x = (rng.standard_normal((2, 3, 4, 5)) * 0.5).astype(np.float32)
    dims = (1,) if rtype == 6 else (2, 3)
    dim_params = list(dims) + [-2] * (4 - len(dims))
    g = _simple_graph(
        "Reduction",
        dict(dim_0=dim_params[0], dim_1=dim_params[1], dim_2=dim_params[2],
             dim_3=dim_params[3], type=rtype, keepdim=keepdim),
        [(2, 3, 4, 5)],
    )
    out = run_graph(g, x)
    ref = t2n(torch_fn(torch.from_numpy(x), dims, bool(keepdim)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=ATOL)


@pytest.mark.parametrize("axis", [1, 3])
def test_softmax_logsoftmax_vs_torch(axis, rng):
    x = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    g = _simple_graph("Softmax", dict(axis=axis), [(2, 3, 4, 5)])
    np.testing.assert_allclose(
        run_graph(g, x), t2n(F.softmax(torch.from_numpy(x), dim=axis)),
        rtol=1e-4, atol=ATOL,
    )
    g = _simple_graph("LogSoftmax", dict(axis=axis), [(2, 3, 4, 5)])
    np.testing.assert_allclose(
        run_graph(g, x), t2n(F.log_softmax(torch.from_numpy(x), dim=axis)),
        rtol=1e-4, atol=ATOL,
    )


def test_argmax_argmin_vs_torch(rng):
    x = rng.standard_normal((3, 7, 5)).astype(np.float32)
    g = _simple_graph("ArgMax", dict(axis=1, keepdims=0), [(3, 7, 5)])
    np.testing.assert_array_equal(
        np.asarray(run_graph(g, x)).astype(np.int64),
        t2n(torch.from_numpy(x).argmax(dim=1)),
    )
    g = _simple_graph("ArgMin", dict(axis=2, keepdims=0), [(3, 7, 5)])
    np.testing.assert_array_equal(
        np.asarray(run_graph(g, x)).astype(np.int64),
        t2n(torch.from_numpy(x).argmin(dim=2)),
    )


def test_topk_vs_torch(rng):
    x = rng.standard_normal((4, 20)).astype(np.float32)
    g = _simple_graph("TopKV2", dict(k=5, sorted=1), [(4, 20)], n_outputs=2)
    vals, idx = run_graph(g, x)
    tv, ti = torch.topk(torch.from_numpy(x), 5, dim=-1)
    np.testing.assert_allclose(vals, t2n(tv), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx).astype(np.int64), t2n(ti))


# ---------------------------------------------------------------------------
# gemm / matmul / embedding
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("transA,transB", [(0, 0), (0, 1), (1, 0), (1, 1)])
def test_gemm_vs_torch(transA, transB, rng):
    A = rng.standard_normal((6, 4) if transA else (4, 6)).astype(np.float32)
    B = rng.standard_normal((5, 6) if transB else (6, 5)).astype(np.float32)
    C = rng.standard_normal((4, 5)).astype(np.float32)
    g = _simple_graph(
        "Gemm", dict(alpha=1.3, beta=0.7, transA=transA, transB=transB),
        [A.shape, B.shape], consts=[C],
    )
    out = run_graph(g, A, B)
    ta = torch.from_numpy(A).T if transA else torch.from_numpy(A)
    tb = torch.from_numpy(B).T if transB else torch.from_numpy(B)
    ref = 1.3 * ta @ tb + 0.7 * torch.from_numpy(C)
    np.testing.assert_allclose(out, t2n(ref), rtol=1e-4, atol=ATOL)


def test_matmul_batched_vs_torch(rng):
    A = rng.standard_normal((3, 4, 6)).astype(np.float32)
    B = rng.standard_normal((3, 6, 5)).astype(np.float32)
    g = _simple_graph("MatMul", {}, [A.shape, B.shape])
    out = run_graph(g, A, B)
    np.testing.assert_allclose(
        out, t2n(torch.from_numpy(A) @ torch.from_numpy(B)), rtol=1e-4, atol=ATOL
    )


def test_embedding_vs_torch(rng):
    table = rng.standard_normal((20, 8)).astype(np.float32)
    ids = np.array([1, 5, 19, 0, 7], np.float32)  # reference feeds fp ids
    g = _simple_graph(
        "Embedding",
        dict(num_output=8, input_dim=20, bias_term=0, weight_data_size=160),
        [(5,)], consts=[table],
    )
    out = run_graph(g, ids)
    ref = F.embedding(torch.from_numpy(ids.astype(np.int64)), torch.from_numpy(table))
    np.testing.assert_allclose(out, t2n(ref), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# data movement
# ---------------------------------------------------------------------------


def test_interp_bilinear_vs_torch(rng):
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    g = _simple_graph(
        "Interp",
        dict(resize_type=2, width_scale=2.0, height_scale=2.0,
             output_width=16, output_height=16),
        [(1, 3, 8, 8)],
    )
    out = run_graph(g, x)
    ref = F.interpolate(torch.from_numpy(x), size=(16, 16), mode="bilinear",
                        align_corners=False)
    np.testing.assert_allclose(out, t2n(ref), rtol=1e-4, atol=ATOL)


def test_interp_nearest_vs_torch(rng):
    x = rng.standard_normal((1, 3, 6, 6)).astype(np.float32)
    g = _simple_graph(
        "Interp",
        dict(resize_type=1, width_scale=2.0, height_scale=2.0,
             output_width=12, output_height=12),
        [(1, 3, 6, 6)],
    )
    out = run_graph(g, x)
    ref = F.interpolate(torch.from_numpy(x), size=(12, 12), mode="nearest")
    np.testing.assert_allclose(out, t2n(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode,torch_mode", [(0, "constant"), (1, "replicate"), (2, "reflect")])
def test_pad_vs_torch(mode, torch_mode, rng):
    x = rng.standard_normal((1, 2, 5, 5)).astype(np.float32)
    g = _simple_graph(
        "Pad",
        dict(pad_n_0=0, pad_n_1=0, pad_c_0=0, pad_c_1=0,
             pad_h_0=1, pad_h_1=2, pad_w_0=2, pad_w_1=1, mode=mode, value=0.5),
        [(1, 2, 5, 5)],
    )
    out = run_graph(g, x)
    kwargs = dict(value=0.5) if torch_mode == "constant" else {}
    ref = F.pad(torch.from_numpy(x), (2, 1, 1, 2), mode=torch_mode, **kwargs)
    np.testing.assert_allclose(out, t2n(ref), rtol=1e-5, atol=1e-6)


def test_depth_to_space_vs_numpy(rng):
    """TF-style DCR depth_to_space in NHWC semantics (explicit mode; the
    tmfile default is CRD to match depthtospace_ref.c — see parity suite)."""
    x = rng.standard_normal((1, 8, 3, 3)).astype(np.float32)
    g = _simple_graph("DepthToSpace", dict(block_size=2, mode="DCR"), [(1, 8, 3, 3)])
    out = run_graph(g, x)
    xn = x.transpose(0, 2, 3, 1)  # NHWC
    n, h, w, c = xn.shape
    ref = (
        xn.reshape(n, h, w, 2, 2, c // 4)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h * 2, w * 2, c // 4)
        .transpose(0, 3, 1, 2)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)


def test_space_to_depth_roundtrips_depth_to_space(rng):
    x = rng.standard_normal((1, 2, 6, 6)).astype(np.float32)
    g1 = _simple_graph("SpaceToDepth", dict(block_size=3), [(1, 2, 6, 6)])
    mid = np.asarray(run_graph(g1, x))
    assert mid.shape == (1, 18, 2, 2)
    g2 = _simple_graph("DepthToSpace", dict(block_size=3), [(1, 18, 2, 2)])
    back = run_graph(g2, mid)
    np.testing.assert_allclose(back, x, rtol=1e-6, atol=1e-7)


def test_reorg_vs_numpy(rng):
    """YOLOv2 reorg — literal transcription of the reference's flat-buffer
    loop (reorg_ref.c:44-60, darknet "backward" flavor): the output buffer
    is written with the INPUT's (c,h,w) strides and read back as
    (c*s*s, h/s, w/s); the input buffer is read as (c/s², h*s, w*s)."""
    s = 2
    x = rng.standard_normal((1, 4, 6, 6)).astype(np.float32)
    g = _simple_graph("Reorg", dict(stride=s), [(1, 4, 6, 6)])
    out = np.asarray(run_graph(g, x))
    n, c, h, w = x.shape
    oc = c // (s * s)
    in_flat = x.ravel()
    out_flat = np.zeros(x.size, np.float32)
    for b in range(n):
        for k in range(c):
            for j in range(h):
                for i in range(w):
                    in_index = i + w * (j + h * (k + c * b))
                    c2 = k % oc
                    offset = k // oc
                    w2 = i * s + offset % s
                    h2 = j * s + offset // s
                    out_index = w2 + w * s * (h2 + h * s * (c2 + oc * b))
                    out_flat[in_index] = in_flat[out_index]
    ref = out_flat.reshape(n, c * s * s, h // s, w // s)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)


def test_shufflechannel_vs_torch(rng):
    x = rng.standard_normal((1, 6, 4, 4)).astype(np.float32)
    g = _simple_graph("ShuffleChannel", dict(group=3), [(1, 6, 4, 4)])
    out = run_graph(g, x)
    ref = F.channel_shuffle(torch.from_numpy(x), 3)
    np.testing.assert_allclose(out, t2n(ref), rtol=1e-6, atol=1e-7)


def test_gather_vs_torch(rng):
    x = rng.standard_normal((5, 7, 3)).astype(np.float32)
    idx = np.array([4, 0, 2], np.int32)
    g = _simple_graph("Gather", dict(axis=1, indices_num=3, is_onnx=True),
                      [(5, 7, 3)])
    # indices as const input
    gi = g.add_tensor("idx", DType.INT32, idx.shape, TensorType.CONST, data=idx)
    g.nodes[-1].inputs.append(gi.idx)
    out = run_graph(g, x)
    ref = torch.index_select(torch.from_numpy(x), 1, torch.from_numpy(idx.astype(np.int64)))
    np.testing.assert_allclose(out, t2n(ref), rtol=1e-6, atol=1e-7)


def test_tile_expand_vs_numpy(rng):
    # tile_ref.c conventions: reps is reversed (reps[0] repeats the LAST
    # axis); caffe flavor (flag 0) repeats elements, onnx flavor (flag 1)
    # tiles blocks
    x = rng.standard_normal((2, 1, 3)).astype(np.float32)
    g = _simple_graph("Tile", dict(frame_flag=0, reps_size=3, reps=[2, 4, 1]),
                      [(2, 1, 3)])
    want = np.repeat(np.repeat(x, 4, axis=1), 2, axis=2)
    np.testing.assert_allclose(run_graph(g, x), want, rtol=1e-6, atol=1e-7)
    g = _simple_graph("Tile", dict(frame_flag=1, reps_size=3, reps=[2, 4, 1]),
                      [(2, 1, 3)])
    np.testing.assert_allclose(run_graph(g, x), np.tile(x, (1, 4, 2)),
                               rtol=1e-6, atol=1e-7)
    g = _simple_graph("Expand", dict(shape=[2, 5, 3], dim_num=3), [(2, 1, 3)])
    np.testing.assert_allclose(run_graph(g, x), np.broadcast_to(x, (2, 5, 3)),
                               rtol=1e-6, atol=1e-7)


def test_reverse_where_zeroslike(rng):
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    g = _simple_graph("ZerosLike", {}, [(2, 3, 4)])
    np.testing.assert_array_equal(np.asarray(run_graph(g, x)), np.zeros_like(x))


# ---------------------------------------------------------------------------
# elementwise binary / comparison / logical
# ---------------------------------------------------------------------------

ELT_BIN = [(0, np.multiply), (2, np.add), (4, np.subtract), (6, np.maximum),
           (10, np.divide)]


@pytest.mark.parametrize("etype,np_fn", ELT_BIN, ids=[str(c[0]) for c in ELT_BIN])
def test_eltwise_binary_vs_numpy(etype, np_fn, rng):
    a = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    b = (rng.standard_normal((2, 3, 4, 4)) + 2.5).astype(np.float32)
    g = _simple_graph(
        "Eltwise", dict(type=etype, caffe_flavor=0, shift=0.0, power=1.0, scale=1.0),
        [(2, 3, 4, 4), (2, 3, 4, 4)],
    )
    np.testing.assert_allclose(run_graph(g, a, b), np_fn(a, b), rtol=1e-5, atol=1e-5)


ELT_UN = [(7, lambda x: 1 / np.sqrt(x)), (11, np.log), (12, np.exp),
          (13, np.sqrt), (14, np.floor), (15, np.square)]


@pytest.mark.parametrize("etype,np_fn", ELT_UN, ids=[str(c[0]) for c in ELT_UN])
def test_eltwise_unary_vs_numpy(etype, np_fn, rng):
    a = (np.abs(rng.standard_normal((2, 3, 4, 4))) + 0.5).astype(np.float32)
    g = _simple_graph(
        "Eltwise", dict(type=etype, caffe_flavor=0, shift=0.0, power=1.0, scale=1.0),
        [(2, 3, 4, 4)],
    )
    np.testing.assert_allclose(run_graph(g, a), np_fn(a), rtol=1e-5, atol=1e-5)


def test_maximum_minimum_squareddiff(rng):
    a = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    b = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    for op, fn in [("Maximum", np.maximum), ("Minimum", np.minimum),
                   ("SquaredDifference", lambda x, y: (x - y) ** 2)]:
        g = _simple_graph(op, {}, [a.shape, b.shape])
        np.testing.assert_allclose(run_graph(g, a, b), fn(a, b), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ctype,np_fn", [
    (0, np.equal), (1, np.not_equal), (2, np.greater),
    (3, np.greater_equal), (4, np.less), (5, np.less_equal),
])
def test_comparison_vs_numpy(ctype, np_fn, rng):
    a = rng.integers(-2, 3, (3, 4)).astype(np.float32)
    b = rng.integers(-2, 3, (3, 4)).astype(np.float32)
    g = _simple_graph("Comparison", dict(type=ctype), [a.shape, b.shape])
    np.testing.assert_array_equal(
        np.asarray(run_graph(g, a, b)), np_fn(a, b).astype(np.float32)
    )


@pytest.mark.parametrize("ltype", [0, 1, 2])
def test_logical_vs_numpy(ltype, rng):
    a = rng.integers(0, 2, (3, 4)).astype(np.float32)
    b = rng.integers(0, 2, (3, 4)).astype(np.float32)
    if ltype == 2:
        g = _simple_graph("Logical", dict(type=2), [a.shape])
        ref = (a == 0).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(run_graph(g, a)), ref)
    else:
        g = _simple_graph("Logical", dict(type=ltype), [a.shape, b.shape])
        fn = np.logical_and if ltype == 0 else np.logical_or
        ref = fn(a != 0, b != 0).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(run_graph(g, a, b)), ref)


def test_cast(rng):
    x = (rng.standard_normal((3, 4)) * 10).astype(np.float32)
    g = _simple_graph("Cast", dict(type_from=0, type_to=4), [(3, 4)])
    out = np.asarray(run_graph(g, x))
    np.testing.assert_array_equal(out, x.astype(np.int32))
