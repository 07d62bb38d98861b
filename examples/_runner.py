"""Shared example-CLI runner: build a zoo graph, optionally quantize it the
way the reference's *_uint8/*_int8 example variants do, compile, run once,
and hand back dequantized fp32 outputs + timing.

The reference ships a separate .cpp per precision (tm_yolact.cpp,
tm_yolact_uint8.cpp, ...); here every example CLI takes `-q fp32|uint8|int8`
and shares this path, so one file covers the whole variant row.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def std_parser(**defaults):
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--image", default=None)
    ap.add_argument(
        "-q", "--quant", choices=["fp32", "int8", "uint8"],
        default=defaults.get("quant", "fp32"),
    )
    ap.add_argument("-s", "--size", type=int, default=defaults.get("size", 320))
    ap.add_argument("-r", "--repeat", type=int, default=1)
    return ap


def load_input(args, mean=0.0, scale=1.0 / 255.0):
    """Image file -> normalized NCHW float input (synthetic if no -i)."""
    size = args.size
    if args.image:
        from PIL import Image

        img = np.asarray(
            Image.open(args.image).convert("RGB").resize((size, size))
        ).astype(np.float32)
        x = ((img - np.asarray(mean, np.float32))
             * np.asarray(scale, np.float32)).transpose(2, 0, 1)[None]
        return np.ascontiguousarray(x, np.float32)
    return np.random.default_rng(0).standard_normal(
        (1, 3, size, size)
    ).astype(np.float32)


def run_graph(g, x, quant="fp32", repeat=1):
    """Compile (quantizing first unless fp32), run, return (fp32 outs, ms)."""
    import tengine_tpu as tt
    from tengine_tpu.utils.config import Options

    if quant != "fp32":
        from tengine_tpu.ops import qmath
        from tengine_tpu.quantize.quantizer import quantize_graph

        qg = quantize_graph(g, [x], scheme=quant, algorithm="minmax")
        cg = tt.compile_graph(qg, Options(quant_mode="fast"))
        t_in = qg.tensors[qg.input_tensors[0]]
        out_ids = [qg.nodes[i].outputs[0] for i in qg.outputs]
        xq = qmath.quantize_np(x, t_in.quant, t_in.dtype)
        cg.run(xq)  # warm-up: exclude compile from the reported time
        t0 = time.time()
        for _ in range(repeat):
            outs = cg.run(xq)
        dt = (time.time() - t0) / repeat
        outs = [
            np.asarray(o, np.float32)
            if not np.issubdtype(np.asarray(o).dtype, np.integer)
            else qmath.dequantize_np(
                np.asarray(o, np.float32), qg.tensors[t].quant
            )
            for o, t in zip(outs, out_ids)
        ]
    else:
        cg = tt.compile_graph(g, Options(precision="fp32"))
        cg.run(x)  # warm-up: exclude compile from the reported time
        t0 = time.time()
        for _ in range(repeat):
            outs = cg.run(x)
        dt = (time.time() - t0) / repeat
        outs = [np.asarray(o, np.float32) for o in outs]
    return outs, dt * 1e3
