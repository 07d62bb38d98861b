"""Python side of the C ABI shim (native/c_api_shim.c).

The reference exposes ~60 C functions (source/api/c_api.h); embedders link
libtengine-lite.so and drive graphs from C/C++. Our engine is Python/JAX, so
the C ABI is provided by a thin libtengine_tpu_capi.so that embeds (or
attaches to) CPython and forwards each call here. This module keeps the
handle tables and does all object management so the C layer stays a dumb
marshaller.

Handles are small ints; tensors are addressed as (graph_handle, tensor_idx).
Buffers: set_tensor_buffer copies from the caller's memory into the input
tensor; get_tensor_buffer returns the address of an output array kept alive
(and stable) until the next run or graph destruction — the same lifetime
contract as the reference (tensor buffers live until postrun/destroy).

Reference: c_api.h:318 (init), :363 (create_graph), :1006-1046 (pre/run/
postrun), :777-851 (tensor accessors).
"""

from __future__ import annotations

import itertools
from typing import Dict, Optional, Tuple

import numpy as np

_graphs: Dict[int, object] = {}
_pinned: Dict[Tuple[int, int], np.ndarray] = {}  # stable output buffers
_next = itertools.count(1)

_DTYPE_CODE = {  # c_api.h:55-63 TENGINE_DT_*
    "float32": 0, "float16": 1, "int8": 2, "uint8": 3, "int32": 4, "int16": 5,
}


def version() -> str:
    import tengine_tpu

    return getattr(tengine_tpu, "__version__", "1.0-tpu")


def create_graph(model_format: str, file_name: str) -> int:
    from .api import Graph

    g = Graph(None, model_format, file_name)
    h = next(_next)
    _graphs[h] = g
    return h


def destroy_graph(h: int) -> int:
    _graphs.pop(h, None)
    for k in [k for k in _pinned if k[0] == h]:
        _pinned.pop(k, None)
    return 0


def _graph(h: int):
    g = _graphs.get(h)
    if g is None:
        raise KeyError(f"invalid graph handle {h}")
    return g


def prerun_graph(h: int, num_thread: int = 0, precision: int = -1) -> int:
    from .utils.config import Options

    opts = None
    if precision == 1:  # TENGINE_MODE_FP16 (c_api.h precision constants)
        opts = Options(precision="fp16")
    _graph(h).preRun(opts)
    return 0


def _tensor(h: int, tidx: int):
    from .api import Tensor

    return Tensor(_graph(h), tidx)


def run_graph(h: int, block: int = 1) -> int:
    g = _graph(h)
    g.run(block)
    # refresh pinned output buffers in place where shapes match, so pointers
    # handed out by get_tensor_buffer stay valid across runs
    for (gh, tidx), arr in list(_pinned.items()):
        if gh != h:
            continue
        new = _tensor(gh, tidx).buf
        if new is not None and new.shape == arr.shape and new.dtype == arr.dtype:
            arr[...] = new
        else:
            _pinned[(gh, tidx)] = np.ascontiguousarray(new)
    return 0


def postrun_graph(h: int) -> int:
    return 0  # buffers released with the graph (XLA owns device memory)


def input_tensor_idx(h: int, node_idx: int, tensor_idx: int) -> int:
    return _graph(h).getInputTensor(node_idx, tensor_idx)._idx


def output_tensor_idx(h: int, node_idx: int, tensor_idx: int) -> int:
    return _graph(h).getOutputTensor(node_idx, tensor_idx)._idx


def tensor_idx_by_name(h: int, name: str) -> int:
    g = _graph(h)
    for t in g.ir.tensors:
        if t.name == name:
            return t.idx
    return -1


def input_count(h: int) -> int:
    return len(_graph(h).ir.inputs)


def output_count(h: int) -> int:
    return len(_graph(h).ir.outputs)


def tensor_shape(h: int, tidx: int) -> list:
    return [int(d) for d in _tensor(h, tidx).shape]


def set_tensor_shape(h: int, tidx: int, dims: list) -> int:
    _tensor(h, tidx).shape = list(dims)
    return 0


def tensor_dtype(h: int, tidx: int) -> int:
    t = _graph(h).ir.tensors[tidx]
    return _DTYPE_CODE.get(np.dtype(t.dtype.np).name, 0)


def tensor_buffer_size(h: int, tidx: int) -> int:
    t = _graph(h).ir.tensors[tidx]
    n = 1
    for d in _tensor(h, tidx).shape:
        n *= int(d)
    return n * np.dtype(t.dtype.np).itemsize


def set_tensor_buffer(h: int, tidx: int, mem) -> int:
    t = _graph(h).ir.tensors[tidx]
    shape = tensor_shape(h, tidx)
    arr = np.frombuffer(mem, dtype=t.dtype.np).reshape(shape).copy()
    _tensor(h, tidx).buf = arr
    return 0


def get_tensor_buffer(h: int, tidx: int) -> int:
    """Address of a stable, process-lifetime buffer holding the tensor's
    current data (0 if no data yet)."""
    key = (h, tidx)
    if key not in _pinned:
        buf = _tensor(h, tidx).buf
        if buf is None:
            return 0
        _pinned[key] = np.ascontiguousarray(buf)
    return int(_pinned[key].ctypes.data)


def set_log_level(level: int) -> int:
    import logging

    from .utils.log import logger

    # UNIX syslog levels (c_api.h:104-114) -> python logging
    table = {0: logging.CRITICAL, 1: logging.CRITICAL, 2: logging.CRITICAL,
             3: logging.ERROR, 4: logging.WARNING, 5: logging.INFO,
             6: logging.INFO, 7: logging.DEBUG}
    logger.setLevel(table.get(level, logging.INFO))
    return 0


def dump_graph(h: int) -> int:
    print(_graph(h).dump())
    return 0
