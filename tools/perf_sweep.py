#!/usr/bin/env python
"""Config/batch sweep for the quantized headline nets (dev tool).

Usage: python tools/perf_sweep.py [model] [scheme]
Prints ms/iter + img/s for each (batch, storage-mode) point.
"""
import sys
import time

import jax
import numpy as np

import tengine_tpu as tt
from tengine_tpu.models.zoo import load_benchmark_model
from tengine_tpu.ops import qmath
from tengine_tpu.quantize.quantizer import quantize_graph
from tengine_tpu.utils.config import Options

from bench import measure_device_ms, _sync_out  # noqa: E402


def sweep(model, scheme, batches, modes):
    rng = np.random.default_rng(0)
    g = load_benchmark_model(model, fill_missing_weights="random")
    shape = [int(d) for d in g.tensors[g.input_tensors[0]].shape]
    calib = [rng.standard_normal(shape).astype(np.float32)]
    qg = quantize_graph(g, calib, scheme=scheme,
                        algorithm="kl" if scheme == "int8" else "minmax")
    t_in = qg.tensors[qg.input_tensors[0]]
    for batch in batches:
        s2 = list(shape)
        s2[0] = batch
        xq_np = qmath.quantize_np(np.broadcast_to(calib[0], s2), t_in.quant, t_in.dtype)
        for name, opt_kw in modes.items():
            try:
                cg = tt.compile_graph(qg, Options(quant_mode="fast", batch_size=batch, **opt_kw))
                xq = jax.device_put(xq_np)
                ms = measure_device_ms(lambda: cg(xq), _sync_out, n=21, trials=2)
                print(f"{model} {scheme} b={batch:4d} {name:14s}: "
                      f"{ms:8.3f} ms  {batch/(ms/1e3):9.0f} img/s", flush=True)
            except Exception as e:
                print(f"{model} {scheme} b={batch:4d} {name:14s}: FAIL {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    model = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    scheme = sys.argv[2] if len(sys.argv) > 2 else "int8"
    batches = [int(b) for b in (sys.argv[3].split(",") if len(sys.argv) > 3 else [32, 128, 256])]
    modes = {
        "bf16store": dict(quant_bf16_storage=True),
        "int-pallas": dict(quant_bf16_storage=False, pallas_qconv=True, pallas_qgemm=True),
    }
    sweep(model, scheme, batches, modes)
