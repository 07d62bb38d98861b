"""Golden parity tests against the REAL reference implementation.

These run the same model through our engine and through the reference's C
runtime (libtengine-lite.so via pytengine ctypes) and require the outputs to
match. This validates both TM2 writer format compatibility (the reference
parses our files) and kernel numerics (SURVEY §4 oracle #2).

Skipped unless the reference library is built; `tools/build_reference.sh`
builds it out-of-tree (the reference mount is read-only).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REF_LIB_DIR = os.environ.get("TENGINE_REF_BUILD", "/tmp/tengine-build/source")
REF_LIB = os.path.join(REF_LIB_DIR, "libtengine-lite.so")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_LIB), reason="reference libtengine-lite.so not built"
)

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
