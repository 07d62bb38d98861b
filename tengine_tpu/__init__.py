"""tengine-tpu: a TPU-native quantized inference framework with the
capabilities of OAID/Tengine (tmfile import, full-integer quantization,
post-training calibration), built on JAX/XLA/Pallas.

Quick start (mirrors the reference C API flow of init/create_graph/prerun/run,
c_api.h):

    import tengine_tpu as tt
    g = tt.load_model("model.tmfile")
    session = tt.compile_graph(g)
    outputs = session.run(input_array)
"""

from .graph.ir import DType, Graph, Layout, Node, QuantParam, Tensor, TensorType
from .serializer.tm2.reader import load_tm_bytes, load_tmfile
from .serializer.tm2.writer import graph_to_tm_bytes, save_tmfile
from .executor.engine import CompiledGraph, compile_graph, infer_shapes
from .utils.config import Options
from .utils.log import set_log_level, set_log_output
from .api import register_custom_op

__version__ = "0.1.0"


def load_model(path: str, format: str = "tengine", **kwargs) -> Graph:
    """create_graph analog (c_api.c:368): load a model file into IR."""
    if format != "tengine":
        raise ValueError(f"unknown model format {format!r} (supported: 'tengine')")
    return load_tmfile(path, **kwargs)
