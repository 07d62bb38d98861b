"""Actor-pipeline mini-framework (examples/pipeline analog)."""

import numpy as np
import pytest

from tengine_tpu.utils.pipeline import Pipeline


def test_pipeline_stages_and_order():
    p = Pipeline()
    src = p.source(range(10))
    doubled = p.node(lambda x: x * 2, src, name="double")
    shifted = p.node(lambda x: x + 1, doubled, name="inc")
    out = p.run_to_list(shifted)
    assert out == [i * 2 + 1 for i in range(10)]


def test_pipeline_filter_and_fanout():
    p = Pipeline()
    src = p.source(range(8))
    evens = p.node(lambda x: x if x % 2 == 0 else None, src)  # filter
    dup = p.node(lambda x: [x, x], evens)  # fan-out
    out = p.run_to_list(dup)
    assert out == [0, 0, 2, 2, 4, 4, 6, 6]


def test_pipeline_error_propagates():
    p = Pipeline()
    src = p.source([1, 2, 3])

    def boom(x):
        if x == 2:
            raise ValueError("boom")
        return x

    out_e = p.node(boom, src)
    with pytest.raises(ValueError, match="boom"):
        p.run_to_list(out_e)


def test_pipeline_with_compiled_graph(rng):
    """Stage 2 runs a jitted model — host preprocessing overlaps dispatch."""
    from tengine_tpu.executor.engine import compile_graph
    from tengine_tpu.graph.ir import DType, Graph, TensorType
    from tengine_tpu.utils.config import Options

    g = Graph(name="pipe")
    x = g.add_tensor("x", DType.FP32, [1, 4], TensorType.INPUT)
    inp = g.add_node("InputOp", "input", [], [x.idx])
    y = g.add_tensor("y", DType.FP32, [], TensorType.VAR)
    g.add_node("ReLu", "r", [x.idx], [y.idx], params=dict(negative_slope=0.0))
    g.inputs, g.outputs = [inp.idx], [g.nodes[-1].idx]
    cg = compile_graph(g, Options())

    frames = [rng.standard_normal((1, 4)).astype(np.float32) for _ in range(5)]
    p = Pipeline()
    src = p.source(frames)
    pre = p.node(lambda f: f * 2.0, src, name="pre")
    infer = p.node(lambda f: cg.run(f)[0], pre, name="infer")
    outs = p.run_to_list(infer)
    assert len(outs) == 5
    for f, o in zip(frames, outs):
        np.testing.assert_allclose(o, np.maximum(f * 2.0, 0.0), rtol=1e-6)
