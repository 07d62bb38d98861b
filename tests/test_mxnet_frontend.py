"""MXNet front-end: NDArray .params parsing + symbol JSON import.

Oracle: torch.nn.functional (per-op golden pattern)."""

import json
import struct

import numpy as np
import torch
import torch.nn.functional as F

from tengine_tpu.convert.mxnet_frontend import (
    NDARRAY_V2,
    from_mxnet,
    parse_params,
)
from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.utils.config import Options


def make_params(named: dict) -> bytes:
    """Encode an MXNet NDArray save file (V2 blocks, int64 dims)."""
    out = struct.pack("<QQQ", 0x112, 0, len(named))
    names = []
    for name, arr in named.items():
        arr = np.ascontiguousarray(arr, np.float32)
        out += struct.pack("<II", NDARRAY_V2, arr.ndim)
        for d in arr.shape:
            out += struct.pack("<q", d)
        out += struct.pack("<III", 1, 0, 0)  # dev_type, dev_id, type_flag fp32
        out += arr.tobytes()
        names.append(name)
    out += struct.pack("<Q", len(names))
    for n in names:
        nb = n.encode()
        out += struct.pack("<Q", len(nb)) + nb
    return out


def test_params_roundtrip(rng):
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    got = parse_params(make_params({"arg:conv0_weight": w, "aux:bn_mean": b}))
    np.testing.assert_array_equal(got["conv0_weight"], w)
    np.testing.assert_array_equal(got["bn_mean"], b)


def _mk(op, name, inputs, **attrs):
    return {
        "op": op,
        "name": name,
        "attrs": {k: str(v) for k, v in attrs.items()},
        "inputs": [[i, 0, 0] for i in inputs],
    }


def test_mxnet_end_to_end(rng):
    # data -> conv(bn fix_gamma, relu) -> maxpool(full) -> fc -> softmax
    #                                  \-> _mul_scalar -> elemwise_add (skip)
    nodes = [
        {"op": "null", "name": "data", "attrs": {}, "inputs": []},
        {"op": "null", "name": "c0_weight", "attrs": {}, "inputs": []},
        {"op": "null", "name": "c0_bias", "attrs": {}, "inputs": []},
        _mk("Convolution", "c0", [0, 1, 2], kernel="(3, 3)", stride="(1, 1)",
            pad="(1, 1)", num_filter=6),
        {"op": "null", "name": "bn_gamma", "attrs": {}, "inputs": []},
        {"op": "null", "name": "bn_beta", "attrs": {}, "inputs": []},
        {"op": "null", "name": "bn_mean", "attrs": {}, "inputs": []},
        {"op": "null", "name": "bn_var", "attrs": {}, "inputs": []},
        _mk("BatchNorm", "bn", [3, 4, 5, 6, 7], eps=0.001, fix_gamma="True"),
        _mk("Activation", "relu0", [8], act_type="relu"),
        _mk("_mul_scalar", "scaled", [9], scalar=0.5),
        _mk("elemwise_add", "skip", [9, 10]),
        _mk("Pooling", "pool0", [11], pool_type="max", kernel="(2, 2)",
            stride="(2, 2)", pad="(0, 0)"),
        _mk("Flatten", "flat", [12]),
        {"op": "null", "name": "fc_weight", "attrs": {}, "inputs": []},
        {"op": "null", "name": "fc_bias", "attrs": {}, "inputs": []},
        _mk("FullyConnected", "fc", [13, 14, 15], num_hidden=5),
        _mk("SoftmaxOutput", "softmax", [16]),
    ]
    sym = {"nodes": nodes, "arg_nodes": [0, 1, 2, 4, 5, 6, 7, 14, 15],
           "heads": [[17, 0, 0]]}

    w = rng.standard_normal((6, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    gamma = rng.standard_normal(6).astype(np.float32)  # fix_gamma -> ignored
    beta = rng.standard_normal(6).astype(np.float32)
    mean = rng.standard_normal(6).astype(np.float32)
    var = (np.abs(rng.standard_normal(6)) + 0.5).astype(np.float32)
    wfc = rng.standard_normal((5, 6 * 4 * 4)).astype(np.float32)
    bfc = rng.standard_normal(5).astype(np.float32)

    params = make_params({
        "arg:c0_weight": w, "arg:c0_bias": b,
        "arg:bn_gamma": gamma, "arg:bn_beta": beta,
        "aux:bn_mean": mean, "aux:bn_var": var,
        "arg:fc_weight": wfc, "arg:fc_bias": bfc,
    })

    g = from_mxnet(json.dumps(sym), params, input_shape=[1, 3, 8, 8])
    cg = compile_graph(g, Options())
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    out = np.asarray(cg(x)[0])

    xt = torch.from_numpy(x)
    y = F.conv2d(xt, torch.from_numpy(w), torch.from_numpy(b), padding=1)
    y = F.batch_norm(y, torch.from_numpy(mean), torch.from_numpy(var),
                     torch.ones(6), torch.from_numpy(beta), False, 0.0, 1e-3)
    y = F.relu(y)
    y = y + 0.5 * y
    y = F.max_pool2d(y, 2, 2)
    y = y.flatten(1)
    y = F.linear(y, torch.from_numpy(wfc), torch.from_numpy(bfc))
    y = F.softmax(y, dim=1)
    np.testing.assert_allclose(out.reshape(1, 5), y.numpy(), rtol=2e-5, atol=2e-5)


def test_mxnet_weightless_and_heads():
    nodes = [
        {"op": "null", "name": "data", "attrs": {}, "inputs": []},
        _mk("Activation", "s", [0], act_type="sigmoid"),
        _mk("clip", "c", [1], a_min=0.1, a_max=0.9),
        _mk("transpose", "t", [2], axes="(0, 2, 3, 1)"),
    ]
    sym = {"nodes": nodes, "heads": [[3, 0, 0]]}
    g = from_mxnet(json.dumps(sym), None, input_shape=[1, 2, 4, 4])
    assert [g.nodes[i].name for i in g.outputs] == ["t"]
    cg = compile_graph(g, Options())
    x = np.random.default_rng(0).standard_normal((1, 2, 4, 4)).astype(np.float32)
    out = np.asarray(cg(x)[0])
    ref = np.transpose(np.clip(1 / (1 + np.exp(-x)), 0.1, 0.9), (0, 2, 3, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
