"""Parallel/serving tests on the virtual 8-device CPU mesh (the QEMU-style
hardware-free topology check, SURVEY §4)."""

import numpy as np
import pytest

import jax

from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.parallel.mesh import make_mesh
from tengine_tpu.parallel.serving import InferenceServer, _bucket
from tengine_tpu.parallel.sharding import shard_compiled, param_spec
from tengine_tpu.utils.config import Options

from test_execute_small import make_conv_graph


def test_mesh_shapes():
    devs = jax.devices()
    assert len(devs) == 8, "conftest should provide 8 virtual devices"
    mesh = make_mesh(devs, shape=(2, 4))
    assert dict(mesh.shape) == {"data": 2, "model": 4}


def test_sharded_equals_single(rng):
    """DP+TP sharded execution must match single-device numerics."""
    g, _, _ = make_conv_graph(in_shape=(4, 3, 8, 8), out_c=8, rng=rng)
    cg = compile_graph(g, Options())
    mesh = make_mesh(jax.devices(), shape=(2, 4))
    sharded = shard_compiled(cg, mesh)
    x = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    (a,) = cg.run(x)
    (b,) = sharded.run(x)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert param_spec("t3/hwio", np.zeros((3, 3, 64, 128)), tp=4) == P(None, None, None, "model")
    assert param_spec("t9/raw", np.zeros((1000, 512)), tp=4) == P("model", None)
    assert param_spec("t9/raw", np.zeros((10, 512)), tp=4) == P()  # not divisible usefully
    assert param_spec("n1/requant_m", np.zeros((64,)), tp=4) == P()


def test_bucket():
    assert _bucket(1, 32) == 1
    assert _bucket(3, 32) == 4
    assert _bucket(32, 32) == 32
    assert _bucket(60, 32) == 32


def test_serving_continuous_batching(rng):
    g, _, _ = make_conv_graph(in_shape=(1, 3, 8, 8), out_c=4, rng=rng)
    cg = compile_graph(g)  # oracle

    server = InferenceServer(g, Options(), max_batch=8, max_wait_ms=20.0)
    server.start()
    try:
        xs = [rng.standard_normal((1, 3, 8, 8)).astype(np.float32) for _ in range(12)]
        futs = [server.submit(x) for x in xs]
        results = [f.result(timeout=120) for f in futs]
        for x, res in zip(xs, results):
            (expected,) = cg.run(x)
            np.testing.assert_allclose(res[0], expected, rtol=1e-4, atol=1e-5)
        assert server.stats["requests"] == 12
        assert server.stats["batches"] < 12, "requests should have been batched"
    finally:
        server.stop()


def test_serving_with_mesh(rng):
    g, _, _ = make_conv_graph(in_shape=(1, 3, 8, 8), out_c=8, rng=rng)
    mesh = make_mesh(jax.devices(), shape=(2, 4))
    cg = compile_graph(g)
    server = InferenceServer(g, Options(), mesh=mesh, max_batch=4, max_wait_ms=30.0)
    server.start()
    try:
        xs = [rng.standard_normal((1, 3, 8, 8)).astype(np.float32) for _ in range(4)]
        futs = [server.submit(x) for x in xs]
        results = [f.result(timeout=120) for f in futs]
        for x, res in zip(xs, results):
            (expected,) = cg.run(x)
            np.testing.assert_allclose(res[0], expected, rtol=1e-4, atol=1e-5)
    finally:
        server.stop()


def test_heartbeat_single_process():
    from tengine_tpu.parallel.distributed import Heartbeat

    hb = Heartbeat(interval_s=0.1)
    hb.start()
    import time

    time.sleep(0.3)
    healthy, missing = hb.check_peers()
    hb.stop()
    assert healthy and missing == []


def test_serving_latency_stats(rng):
    """p50/p99 request-latency percentiles (BASELINE serving metric)."""
    import numpy as np
    from tengine_tpu.parallel.serving import InferenceServer

    g = _small_graph(rng) if "_small_graph" in dir() else None
    if g is None:
        from tengine_tpu.graph.ir import DType, Graph, TensorType

        g = Graph(name="lat")
        x = g.add_tensor("x", DType.FP32, [1, 4], TensorType.INPUT)
        inp = g.add_node("InputOp", "input", [], [x.idx])
        y = g.add_tensor("y", DType.FP32, [], TensorType.VAR)
        g.add_node("ReLu", "r", [x.idx], [y.idx], params=dict(negative_slope=0.0))
        g.inputs, g.outputs = [inp.idx], [g.nodes[-1].idx]

    server = InferenceServer(g, max_batch=4, max_wait_ms=1.0)
    server.start()
    futs = [server.submit(rng.standard_normal((1, 4)).astype(np.float32)) for _ in range(12)]
    for f in futs:
        f.result(timeout=60)
    server.stop()
    st = server.latency_stats()
    assert st["count"] == 12
    assert 0 < st["p50_ms"] <= st["p99_ms"]


def test_quantized_graph_tp_sharding(rng):
    """A quantized graph TP-shards its (zero-point-shifted) conv/FC weights
    over the model axis and matches the single-device output exactly."""
    import numpy as np
    import jax
    from jax.sharding import PartitionSpec as P
    from tengine_tpu.executor.engine import compile_graph
    from tengine_tpu.models.zoo import load_benchmark_model
    from tengine_tpu.ops import qmath
    from tengine_tpu.parallel.mesh import make_mesh
    from tengine_tpu.parallel.sharding import param_spec, shard_compiled
    from tengine_tpu.quantize.quantizer import quantize_graph
    from tengine_tpu.utils.config import Options

    g = load_benchmark_model("mobilenetv1", fill_missing_weights="random")
    for tid in g.input_tensors:
        g.tensors[tid].shape = [1, 3, 64, 64]
    calib = [rng.standard_normal((1, 3, 64, 64)).astype(np.float32)]
    qg = quantize_graph(g, calib, scheme="uint8")
    t_in = qg.tensors[qg.input_tensors[0]]
    xq = np.broadcast_to(
        qmath.quantize_np(calib[0], t_in.quant, t_in.dtype), (2, 3, 64, 64)
    ).copy()

    cg = compile_graph(qg, Options(quant_mode="fast", batch_size=2))
    (ref,) = cg.run(xq)

    mesh = make_mesh(jax.devices()[:8], shape=(2, 4))
    sharded = [
        k for k, v in cg.params.items()
        if param_spec(k, v, 4) != P()
    ]
    assert any("hwio_zshift" in k for k in sharded), sharded
    scg = shard_compiled(cg, mesh)
    (out,) = scg.run(jax.device_put(xq))
    np.testing.assert_array_equal(out, ref)
