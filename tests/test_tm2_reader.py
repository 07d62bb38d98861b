"""tmfile importer tests over the reference's real benchmark tmfiles."""

import glob

import numpy as np
import pytest

from tengine_tpu.graph.ir import DType, TensorType
from tengine_tpu.models.zoo import BENCHMARK_MODELS, load_benchmark_model
from tengine_tpu.serializer.tm2.reader import load_tmfile

MODELS = sorted(glob.glob("/root/reference/benchmark/models/*.tmfile"))


@pytest.mark.parametrize("path", MODELS, ids=[p.split("/")[-1] for p in MODELS])
def test_parse_benchmark_tmfile(path):
    g = load_tmfile(path)
    assert len(g.nodes) > 10
    assert len(g.tensors) == len(set(t.idx for t in g.tensors))
    assert g.inputs and g.outputs
    # every node's tensor indices are valid and consistent
    for n in g.nodes:
        for ti in n.inputs + n.outputs:
            assert 0 <= ti < len(g.tensors)
    # const tensors materialized (zero-filled for stripped buffers)
    for t in g.tensors:
        if t.tensor_type == TensorType.CONST:
            assert t.data is not None
            assert t.data.dtype == t.dtype.np


def test_mobilenet_structure():
    g = load_tmfile("/root/reference/benchmark/models/mobilenet_benchmark.tmfile")
    convs = [n for n in g.nodes if n.op == "Convolution"]
    assert len(convs) == 28
    first = convs[0]
    p = first.params
    assert p["kernel_h"] == 3 and p["stride_h"] == 2
    # depthwise convs present (group == channels)
    assert any(n.params["group"] > 1 for n in convs)
    # input tensor has the recorded shape
    tid = g.input_tensors[0]
    assert g.tensors[tid].shape == [1, 3, 224, 224]


def test_all_models_shape_infer():
    from tengine_tpu.executor.engine import infer_shapes

    for name in BENCHMARK_MODELS:
        g = load_benchmark_model(name, fill_missing_weights="zero")
        infer_shapes(g)
        for tid in g.output_tensors:
            assert g.tensors[tid].shape, f"{name}: output shape missing"
