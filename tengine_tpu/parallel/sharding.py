"""Sharding rules: place a compiled graph's params/inputs on a mesh.

Idiomatic-TPU replacement for the reference's graph partitioner
(optimizer/split.c): instead of cutting the graph into per-device subgraphs,
we annotate shardings and let GSPMD propagate them and insert ICI collectives
(all-gather on the sharded-weight contractions, psum where outputs are
partial). Rules:

  * activations: batch dim over "data" (DP serving);
  * conv weights (HWIO): output-channel dim over "model" when divisible —
    makes each chip compute a channel slice, all-gather at layout boundaries;
  * FC weights ([N, K]): N over "model";
  * everything else replicated.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..executor.engine import CompiledGraph


def param_spec(key: str, arr, tp: int) -> P:
    shape = np.shape(arr)
    if tp <= 1:
        return P()
    tag = key.rsplit("/", 1)[-1]
    # conv weights, HWIO layout (float + quantized zero-point-shifted/deq
    # variants): shard output channels
    if (
        tag in ("hwio", "hwio_zshift", "hwio_zshift_bf16", "hwio_i8", "hwio_deq")
        and len(shape) == 4
        and shape[3] % tp == 0
        and shape[3] >= 2 * tp
    ):
        return P(None, None, None, "model")
    # FC weights, [K, N] transposed layouts: shard output dim
    if (
        tag in ("kt_zshift", "kt_zshift_bf16", "kt_i8", "kt_deq")
        and len(shape) == 2
        and shape[1] % tp == 0
        and shape[1] >= 2 * tp
    ):
        return P(None, "model")
    if tag == "raw" and len(shape) == 2 and shape[0] % tp == 0 and shape[0] >= 2 * tp:
        return P("model", None)
    return P()


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    tp = mesh.shape.get("model", 1)
    return {
        k: jax.device_put(v, NamedSharding(mesh, param_spec(k, v, tp)))
        for k, v in params.items()
    }


def shard_compiled(cg: CompiledGraph, mesh: Mesh) -> CompiledGraph:
    """Re-jit the compiled graph's forward with mesh shardings. Batch dim of
    every input goes over "data"; params follow param_spec. GSPMD inserts the
    collectives."""
    tp = mesh.shape.get("model", 1)
    params = shard_params(cg.params, mesh)

    in_shardings = (
        {k: NamedSharding(mesh, param_spec(k, v, tp)) for k, v in cg.params.items()},
    ) + tuple(
        NamedSharding(mesh, P("data", *([None] * (len(cg.graph.tensors[tid].shape) - 1))))
        for tid in cg.input_ids
    )
    fn = jax.jit(cg.forward_fn, in_shardings=in_shardings)
    out = CompiledGraph(cg.graph, cg.options, fn, params, cg.input_ids, cg.output_ids)
    return out
