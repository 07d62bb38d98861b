"""Golden parity tests against the REAL reference implementation.

These run the same model through our engine and through the reference's C
runtime (libtengine-lite.so via pytengine ctypes) and require the outputs to
match. This validates both TM2 writer format compatibility (the reference
parses our files) and kernel numerics (SURVEY §4 oracle #2).

The library is built on demand by the session-scoped `ref_lib` fixture
(conftest.py, `tools/build_reference.sh`) so the suite runs in a stock
`pytest` invocation and never silently skips.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REF_LIB_DIR = os.environ.get("TENGINE_REF_BUILD", "/tmp/tengine-build/source")
REF_LIB = os.path.join(REF_LIB_DIR, "libtengine-lite.so")


@pytest.fixture(scope="module", autouse=True)
def _need_ref(ref_lib):
    """Every test in this module drives the real C engine."""

_RUNNER = r"""
import sys, os, json
import numpy as np
sys.path.insert(0, '/root/reference/pytengine')
from tengine import tg

tmfile, in_npy, out_npy, shape_json = sys.argv[1:5]
shape = json.loads(shape_json)
x = np.load(in_npy)
graph = tg.Graph(None, 'tengine', tmfile)
itensor = graph.getInputTensor(0, 0)
itensor.shape = shape
graph.preRun()
itensor.buf = x
graph.run(1)
outs = []
i = 0
while True:
    try:
        t = graph.getOutputTensor(i, 0)
    except Exception:
        break
    if t is None:
        break
    outs.append(np.array(t.buf))
    i += 1
    if i > 16:
        break
np.save(out_npy, outs[0])
sys.stdout.flush()
os._exit(0)
"""


def run_reference(tmfile, x, tmp_path):
    """Run a tmfile through the reference C engine in a subprocess (its
    ctypes wrapper has destructor issues; isolation keeps our process clean)."""
    import json

    in_npy = str(tmp_path / "in.npy")
    out_npy = str(tmp_path / "out.npy")
    np.save(in_npy, x)
    env = dict(os.environ, LD_LIBRARY_PATH=REF_LIB_DIR, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c", _RUNNER, tmfile, in_npy, out_npy, json.dumps(list(x.shape))],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )
    assert os.path.exists(out_npy), f"reference run failed:\n{r.stdout}\n{r.stderr}"
    return np.load(out_npy)


def _ours(g, x, **opt):
    from tengine_tpu.executor.engine import compile_graph
    from tengine_tpu.utils.config import Options

    return compile_graph(g, Options(**opt)).run(x)[0]


def _save(g, tmp_path, name="m.tmfile"):
    from tengine_tpu.serializer.tm2.writer import save_tmfile

    p = str(tmp_path / name)
    save_tmfile(g, p)
    return p


def test_conv_parity(tmp_path, rng):
    from test_execute_small import make_conv_graph

    g, _, _ = make_conv_graph(in_shape=(1, 3, 8, 8), out_c=4, activation=0, rng=rng)
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    ours = _ours(g, x)
    ref = run_reference(_save(g, tmp_path), x, tmp_path).reshape(ours.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_depthwise_stride2_parity(tmp_path, rng):
    from test_execute_small import make_conv_graph

    g, _, _ = make_conv_graph(
        in_shape=(1, 4, 10, 10), out_c=4, group=4, stride=2, activation=6, rng=rng
    )
    x = rng.standard_normal((1, 4, 10, 10)).astype(np.float32)
    ours = _ours(g, x)
    ref = run_reference(_save(g, tmp_path), x, tmp_path).reshape(ours.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_pool_fc_softmax_parity(tmp_path, rng):
    """conv -> maxpool -> fc -> softmax chain."""
    from tengine_tpu.graph.ir import DType, Graph, TensorType

    g = Graph(name="chain")
    x_t = g.add_tensor("data", DType.FP32, [1, 3, 8, 8], TensorType.INPUT)
    w = rng.standard_normal((6, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal((6,)).astype(np.float32)
    w_t = g.add_tensor("w", DType.FP32, list(w.shape), TensorType.CONST, data=w)
    b_t = g.add_tensor("b", DType.FP32, [6], TensorType.CONST, data=b)
    c_t = g.add_tensor("conv_out", DType.FP32, [], TensorType.VAR)
    p_t = g.add_tensor("pool_out", DType.FP32, [], TensorType.VAR)
    fw = rng.standard_normal((10, 6 * 4 * 4)).astype(np.float32)
    fw_t = g.add_tensor("fw", DType.FP32, list(fw.shape), TensorType.CONST, data=fw)
    f_t = g.add_tensor("fc_out", DType.FP32, [], TensorType.VAR)
    s_t = g.add_tensor("sm_out", DType.FP32, [], TensorType.VAR)

    inp = g.add_node("InputOp", "input", [], [x_t.idx])
    g.add_node(
        "Convolution", "conv", [x_t.idx, w_t.idx, b_t.idx], [c_t.idx],
        params=dict(kernel_h=3, kernel_w=3, stride_h=1, stride_w=1, dilation_h=1,
                    dilation_w=1, input_channel=3, output_channel=6, group=1,
                    activation=0, pad_h0=1, pad_w0=1, pad_h1=1, pad_w1=1),
    )
    g.add_node(
        "Pooling", "pool", [c_t.idx], [p_t.idx],
        params=dict(alg=0, kernel_h=2, kernel_w=2, stride_h=2, stride_w=2,
                    global_pool=0, caffe_flavor=0, pad_h0=0, pad_w0=0, pad_h1=0, pad_w1=0),
    )
    g.add_node("FullyConnected", "fc", [p_t.idx, fw_t.idx], [f_t.idx],
               params=dict(num_output=10))
    g.add_node("Softmax", "softmax", [f_t.idx], [s_t.idx], params=dict(axis=1))
    g.inputs = [inp.idx]
    g.outputs = [g.nodes[-1].idx]

    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    ours = _ours(g, x)
    ref = run_reference(_save(g, tmp_path), x, tmp_path).reshape(ours.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_full_model_parity_squeezenet(tmp_path, rng):
    """Full squeezenet with random weights through both engines."""
    from tengine_tpu.models.zoo import load_benchmark_model

    g = load_benchmark_model("squeezenet_v1.1", fill_missing_weights="random")
    for tid in g.input_tensors:
        g.tensors[tid].shape = [1, 3, 64, 64]
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    ours = _ours(g, x)
    ref = run_reference(_save(g, tmp_path), x, tmp_path).reshape(ours.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_uint8_quantized_parity(tmp_path, rng):
    """Quantized graph: our uint8 tmfile through the reference C uint8
    kernels vs our fast path — top-1 and per-element LSB agreement."""
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph
    from test_execute_small import make_conv_graph

    g, _, _ = make_conv_graph(in_shape=(1, 3, 8, 8), out_c=4, activation=0, rng=rng)
    calib = [rng.standard_normal((1, 3, 8, 8)).astype(np.float32) for _ in range(2)]
    qg = quantize_graph(g, calib, scheme="uint8")
    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(calib[0], t_in.quant, t_in.dtype)

    from tengine_tpu.executor.engine import compile_graph
    from tengine_tpu.utils.config import Options

    ours = compile_graph(qg, Options(quant_mode="fast")).run(xq)[0]
    ref = run_reference(_save(qg, tmp_path), xq, tmp_path)
    assert ref.dtype == np.uint8, ref.dtype
    ref = ref.reshape(ours.shape)
    diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, f"max LSB diff {diff.max()}"


# ---------------------------------------------------------------------------
# batch 2: per-op parity via single-op graphs (the ONNX-fixture role of
# the reference's tests/op/ suite, SURVEY §4 — with the real C engine as
# the oracle instead of stored fixtures)
# ---------------------------------------------------------------------------


def _op_graph(op, params, in_shapes, consts=None):
    from tengine_tpu.graph.ir import DType, Graph, TensorType

    g = Graph(name=f"{op}_parity")
    in_ids = []
    for i, shp in enumerate(in_shapes):
        t = g.add_tensor(f"in{i}", DType.FP32, list(shp), TensorType.INPUT)
        n = g.add_node("InputOp", f"input{i}", [], [t.idx])
        g.inputs.append(n.idx)
        in_ids.append(t.idx)
    for j, c in enumerate(consts or []):
        t = g.add_tensor(f"c{j}", DType.FP32, list(c.shape), TensorType.CONST, data=c)
        in_ids.append(t.idx)
    out = g.add_tensor("out", DType.FP32, [], TensorType.VAR)
    g.add_node(op, op.lower(), in_ids, [out.idx], params=params)
    g.outputs = [g.nodes[-1].idx]
    return g


OP_CASES = [
    ("ReLu", dict(negative_slope=0.1), [(1, 4, 6, 6)], None),
    ("ReLu6", {}, [(1, 4, 6, 6)], None),
    ("Clip", dict(min=-0.3, max=0.4), [(1, 4, 6, 6)], None),
    ("Softmax", dict(axis=1), [(1, 10, 2, 2)], None),
    ("Flatten", dict(axis=1, end_axis=3), [(1, 4, 3, 3)], None),
    ("Permute", dict(flag=0, order0=0, order1=2, order2=3, order3=1), [(1, 3, 4, 5)], None),
    ("Upsample", dict(scale=2.0), [(1, 3, 5, 5)], None),
    ("Interp", dict(resize_type=1, width_scale=2.0, height_scale=2.0,
                    output_width=10, output_height=10), [(1, 2, 5, 5)], None),
    ("ShuffleChannel", dict(group=2), [(1, 8, 3, 3)], None),
    ("Sigmoid", {}, [(1, 4, 3, 3)], None),
    ("Tanh", {}, [(1, 4, 3, 3)], None),
    ("HardSwish", dict(alpha=1.0 / 6.0, beta=0.5), [(1, 4, 3, 3)], None),
    ("Mish", {}, [(1, 4, 3, 3)], None),
    ("Reshape", dict(shape=[1, -1], is_onnx=1, is_mxnet=0, reverse=0), [(1, 4, 3, 3)], None),
]


@pytest.mark.parametrize(
    "op,params,in_shapes,consts", OP_CASES, ids=[c[0] for c in OP_CASES]
)
def test_single_op_parity(op, params, in_shapes, consts, tmp_path, rng):
    g = _op_graph(op, params, in_shapes, consts)
    xs = [rng.standard_normal(s).astype(np.float32) for s in in_shapes]
    ours = _ours_multi(g, xs)
    ref = run_reference(_save(g, tmp_path), xs[0], tmp_path).reshape(ours.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def _ours_multi(g, xs):
    from tengine_tpu.executor.engine import compile_graph

    return compile_graph(g).run(*xs)[0]


def test_eltwise_sum_parity(tmp_path, rng):
    from tengine_tpu.serializer.tm2.format import ELT_SUM

    g = _op_graph(
        "Eltwise", dict(type=ELT_SUM, caffe_flavor=0, shift=0.0, power=1.0, scale=1.0),
        [(1, 4, 5, 5), (1, 4, 5, 5)],
    )
    xs = [rng.standard_normal((1, 4, 5, 5)).astype(np.float32) for _ in range(2)]
    ours = _ours_multi(g, xs)
    ref = run_reference_multi(_save(g, tmp_path), xs, tmp_path).reshape(ours.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_prelu_parity(tmp_path, rng):
    slope = rng.standard_normal((4,)).astype(np.float32)
    g = _op_graph("PReLU", {}, [(1, 4, 5, 5)], consts=[slope])
    xs = [rng.standard_normal((1, 4, 5, 5)).astype(np.float32)]
    ours = _ours_multi(g, xs)
    ref = run_reference(_save(g, tmp_path), xs[0], tmp_path).reshape(ours.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_batchnorm_parity(tmp_path, rng):
    c = 4
    consts = [
        rng.standard_normal((c,)).astype(np.float32),  # gamma
        rng.standard_normal((c,)).astype(np.float32),  # beta
        rng.standard_normal((c,)).astype(np.float32),  # mean
        (np.abs(rng.standard_normal((c,))) + 0.5).astype(np.float32),  # var
    ]
    g = _op_graph(
        "BatchNormalization", dict(rescale_factor=1.0, eps=1e-5, caffe_flavor=0),
        [(1, c, 5, 5)], consts=consts,
    )
    xs = [rng.standard_normal((1, c, 5, 5)).astype(np.float32)]
    ours = _ours_multi(g, xs)
    ref = run_reference(_save(g, tmp_path), xs[0], tmp_path).reshape(ours.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_avgpool_caffe_parity(tmp_path, rng):
    g = _op_graph(
        "Pooling",
        dict(alg=1, kernel_h=3, kernel_w=3, stride_h=2, stride_w=2, global_pool=0,
             caffe_flavor=1, pad_h0=1, pad_w0=1, pad_h1=1, pad_w1=1),
        [(1, 2, 7, 7)],
    )
    xs = [rng.standard_normal((1, 2, 7, 7)).astype(np.float32)]
    ours = _ours_multi(g, xs)
    ref = run_reference(_save(g, tmp_path), xs[0], tmp_path).reshape(ours.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_concat_parity(tmp_path, rng):
    g = _op_graph("Concat", dict(axis=1), [(1, 2, 4, 4), (1, 3, 4, 4)])
    xs = [rng.standard_normal((1, 2, 4, 4)).astype(np.float32),
          rng.standard_normal((1, 3, 4, 4)).astype(np.float32)]
    ours = _ours_multi(g, xs)
    ref = run_reference_multi(_save(g, tmp_path), xs, tmp_path).reshape(ours.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


_RUNNER_MULTI = r"""
import sys, os, json
import numpy as np
sys.path.insert(0, '/root/reference/pytengine')
from tengine import tg

tmfile, out_npy = sys.argv[1], sys.argv[2]
in_files = sys.argv[3:]
graph = tg.Graph(None, 'tengine', tmfile)
arrays = [np.load(f) for f in in_files]
tensors = []
for i, a in enumerate(arrays):
    t = graph.getInputTensor(i, 0)
    t.shape = list(a.shape)
    tensors.append(t)
graph.preRun()
for t, a in zip(tensors, arrays):
    t.buf = a
graph.run(1)
out = np.array(graph.getOutputTensor(0, 0).buf)
np.save(out_npy, out)
os._exit(0)
"""


def run_reference_multi(tmfile, xs, tmp_path):
    import json

    in_files = []
    for i, x in enumerate(xs):
        p = str(tmp_path / f"in{i}.npy")
        np.save(p, x)
        in_files.append(p)
    out_npy = str(tmp_path / "out_multi.npy")
    env = dict(os.environ, LD_LIBRARY_PATH=REF_LIB_DIR, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c", _RUNNER_MULTI, tmfile, out_npy] + in_files,
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert os.path.exists(out_npy), f"reference run failed:\n{r.stdout}\n{r.stderr}"
    return np.load(out_npy)


def test_yolov5s_tmfile_runs_in_reference(tmp_path, rng):
    """Full clean-room YOLOv5s written by our TM2 writer, executed by the
    reference C engine (StridedSlice focus, Sigmoid/BroadMul SiLU, SPP
    pooling, Upsample, PANet concats — 200+ nodes), vs our fp32 engine.
    SiLU fusion is off: the reference conv kernels only know the 0/1/6
    activation clamp set."""
    from tengine_tpu.models.yolov5 import build_yolov5s_graph

    _, g = build_yolov5s_graph(num_classes=80, img=64, fuse_silu=False, fold_focus=False)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    ours = _ours_multi(g, [x])
    ref = run_reference(_save(g, tmp_path), x, tmp_path).reshape(ours.shape)
    # 200+ fp32 layers of random (untrained) weights amplify summation-order
    # differences between XLA and the reference's im2col+gemm; a fixed atol
    # is the wrong yardstick. Gate on agreement relative to signal instead.
    a, b = ours.ravel().astype(np.float64), ref.ravel().astype(np.float64)
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.9999, f"cosine {cos}"
    assert np.abs(a - b).max() < 0.05 * b.std()


@pytest.mark.parametrize("net", ["squeezenet_v1.1", "mobilenetv1"])
def test_uint8_fullnet_parity(net, tmp_path, rng):
    """Full-net quantized parity (VERDICT r1 item 3): quantize a whole
    benchmark net to asymmetric uint8 with our calibrator, write the tmfile,
    run it through the reference's C uint8 kernels, and require <=1 LSB
    element agreement + identical top-1 against our fast MXU path."""
    from tengine_tpu.executor.engine import compile_graph
    from tengine_tpu.models.zoo import load_benchmark_model
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph
    from tengine_tpu.utils.config import Options

    g = load_benchmark_model(net, fill_missing_weights="random")
    for tid in g.input_tensors:
        g.tensors[tid].shape = [1, 3, 64, 64]
    calib = [rng.standard_normal((1, 3, 64, 64)).astype(np.float32) for _ in range(2)]
    qg = quantize_graph(g, calib, scheme="uint8")
    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(calib[0], t_in.quant, t_in.dtype)

    ours = compile_graph(qg, Options(quant_mode="fast")).run(xq)[0]
    ref = run_reference(_save(qg, tmp_path), xq, tmp_path)
    assert ref.dtype == np.uint8, ref.dtype
    ref = ref.reshape(ours.shape)
    diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, f"max LSB diff {diff.max()} ({(diff > 1).mean():.4%} > 1)"
    # top-1 must agree, modulo exact ties at the same quantized level
    # (random weights make many logits collide within 1 LSB)
    ai, ar = int(np.argmax(ours)), int(np.argmax(ref))
    assert ai == ar or int(ref.ravel()[ai]) >= int(ref.max()) - 1, (ai, ar)
