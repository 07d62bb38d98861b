#!/usr/bin/env python
"""Capture an XLA device trace of a quantized benchmark net and print the
per-op device-time breakdown (top HLO ops by self time).

Usage: python tools/tpu_trace.py [model] [batch] [scheme] [opt=val ...]
  opt=val pairs are forwarded to Options (e.g. quant_native=on) — same
  coercion as tools/quick_bench.py.
"""

import glob
import gzip
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(path, lines=("XLA Ops", "XLA Modules")):
    """Parse an .xplane.pb into [(event_name, total_duration_ps, count)].

    Only the named trace lines are aggregated — by default the synchronous
    per-op line ("XLA Ops", whose durations sum to the module time) and the
    module line. The "Async XLA Ops" line's copy-start/done events span
    their whole overlap window (a mobilenet b128 trace shows 22 ms/iter of
    async span inside a 2.7 ms module) and must not be mixed into self-time
    splits — doing so was the r4 MFU-table "copy:100%" artifact."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    with open(path, "rb") as f:
        space = xplane_pb2.XSpace.FromString(f.read())
    agg = defaultdict(lambda: [0, 0])
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        emeta = plane.event_metadata
        for line in plane.lines:
            if lines is not None and line.name not in lines:
                continue
            for ev in line.events:
                name = emeta[ev.metadata_id].name
                agg[name][0] += ev.duration_ps
                agg[name][1] += 1
    return sorted(((k, v[0], v[1]) for k, v in agg.items()), key=lambda t: -t[1])


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "mobilenetv1"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    scheme = sys.argv[3] if len(sys.argv) > 3 else "uint8"
    over = {}
    for kv in sys.argv[4:]:
        k, v = kv.split("=", 1)
        if v in ("True", "False"):
            v = v == "True"
        else:
            try:
                v = int(v)
            except ValueError:
                pass
        over[k] = v

    import jax
    import tengine_tpu as tt
    from tengine_tpu.models.zoo import load_benchmark_model
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph
    from tengine_tpu.utils.config import Options

    rng = np.random.default_rng(0)
    g = load_benchmark_model(model, fill_missing_weights="random")
    shape = [int(d) for d in g.tensors[g.input_tensors[0]].shape]
    calib = [rng.standard_normal(shape).astype(np.float32)]
    qg = quantize_graph(g, calib, scheme=scheme, algorithm="minmax")
    cg = tt.compile_graph(
        qg, Options(quant_mode="fast", batch_size=batch, **over)
    )
    t_in = qg.tensors[qg.input_tensors[0]]
    shape[0] = batch
    xq = jax.device_put(
        qmath.quantize_np(np.broadcast_to(calib[0], shape), t_in.quant, t_in.dtype)
    )
    # warmup
    out = cg(xq)
    jax.block_until_ready(out)

    tmpdir = tempfile.mkdtemp(prefix="tttrace_")
    with jax.profiler.trace(tmpdir):
        for _ in range(20):
            out = cg(xq)
        jax.block_until_ready(out)

    pbs = glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"), recursive=True)
    if not pbs:
        print("no xplane produced; files:", glob.glob(tmpdir + "/**", recursive=True))
        return
    rows = parse_xplane(pbs[0])
    total = sum(r[1] for r in rows)
    print(f"{'ms/iter':>9} {'%':>6} {'count':>6}  name")
    for name, ps, cnt in rows[:45]:
        ms = ps / 1e9 / 20
        print(f"{ms:9.4f} {100*ps/total:5.1f}% {cnt:6d}  {name[:110]}")
    print(f"total device: {total/1e9/20:.3f} ms/iter")


if __name__ == "__main__":
    main()
