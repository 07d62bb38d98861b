#!/usr/bin/env python
"""Benchmark driver — tm_benchmark equivalent (tm_benchmark.cc).

Runs the flagship net imported from the reference's own benchmark tmfile on
the TPU and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measurement: the dev-environment TPU sits behind a tunnel with ~30 ms
round-trip latency on any host<->device synchronization, so single-call wall
time measures the tunnel, not the chip. We therefore dispatch N inferences
back-to-back (the runtime pipelines them) and sync once; per-inference device
time = (t_N - t_1) / (N - 1). This matches what the reference measures
(pure engine run time, input already in memory, tm_benchmark.cc:110-130).

Baseline: the reference's published best CPU number for the same net
(benchmark/README.md, Khadas VIM3 4×A73 — BASELINE.md). vs_baseline > 1 means
faster by that factor. Extra results go to stderr; the driver parses stdout.
"""

import json
import sys
import time

import numpy as np


def measure_device_ms(call, sync, n=41, trials=5, warmup=2, target_ms=120.0):
    """Per-iteration device time via the pipelined-dispatch slope method.

    Tunnel RTT jitter is tens of ms, so for sub-ms iterations the slope
    needs enough dispatches that the device segment dominates: after a
    pilot estimate, n is raised until n*per_iter >= target_ms."""
    for _ in range(warmup):
        sync(call())

    def run_n(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = call()
        sync(out)
        return time.perf_counter() - t0

    # Noise (tunnel hiccups, host jitter) is strictly additive, so take the
    # min of each endpoint independently before differencing; a single noisy
    # t1 sample must not be able to drive the slope negative.
    t1_best = min(run_n(1) for _ in range(trials))
    tn_best = min(run_n(n) for _ in range(trials))
    slope = (tn_best - t1_best) / (n - 1)
    est_ms = slope * 1e3
    if 0 < est_ms and est_ms * n < target_ms:
        # Cap the escalation: a degenerate pilot (slope ~ 0) must not drive
        # n to ~1e5 dispatches at ~30us tunnel dispatch cost each
        # (ADVICE r3 item 1).
        n = min(int(target_ms / est_ms) + 1, 4096)
        tn_best = min(run_n(n) for _ in range(trials))
        slope = (tn_best - t1_best) / (n - 1)
    if slope <= 0:
        # Degenerate (device time below timer noise): bound by the full-run
        # average, which only over-estimates.
        slope = tn_best / n
    return slope * 1e3


def measure_device_ms_trace(call, sync, iters=200):
    """Blessed method for sub-ms (batch-1) configs (VERDICT r3 item 3):
    capture an XLA device trace and read the per-execution duration of the
    "XLA Modules" line — the pure on-device time of one inference, the
    tm_benchmark analog (engine run time, no dispatch overhead).

    Why not the dispatch-slope method: the r4 t(n) sweep (tools/b1_sweep.py)
    showed wall time is ~26 ms tunnel RTT flat until n*dt exceeds it, with
    tens-of-ms multiplicative jitter on large-n runs; slope estimates for a
    0.093 ms net ranged 0.17-0.92 ms across harness variants (the r3
    contradiction). The trace clock is the device's own: run-to-run sigma is
    ~1%. Each dispatch additionally pays a ~0.1-0.15 ms device-side gap
    through the tunnel runtime (visible as slope minus module time); that is
    platform overhead, not engine time, and is reported separately.

    Returns (median_ms, stdev_ms) or (None, None) if tracing/proto parsing
    is unavailable (caller falls back to the slope method)."""
    import glob
    import os
    import tempfile

    import jax

    for _ in range(3):
        sync(call())
    d = tempfile.mkdtemp(prefix="ttbench_trace")
    out = None
    with jax.profiler.trace(d):
        for _ in range(iters):
            out = call()
        sync(out)
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:
        return None, None
    durs = []
    for p in glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True):
        with open(p, "rb") as f:
            space = xplane_pb2.XSpace.FromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                if line.name == "XLA Modules":
                    durs += [e.duration_ps / 1e9 for e in line.events]
    if not durs:
        return None, None
    a = np.asarray(durs)
    return float(np.median(a)), float(a.std())


def measure_b1_ms(call, sync):
    """One blessed number for a batch-1 config: trace-based device time,
    slope-method fallback when tracing is unavailable. Returns
    (ms, sigma_or_None, method) with method in {"trace", "slope"} — the two
    are NOT comparable (the r4 t(n) sweep measured a 5.4x spread on the
    slope method at b1), so callers must publish slope-derived numbers
    under a *_slope history key and never against a trace-keyed gate
    (VERDICT r4 item 7)."""
    ms, sigma = measure_device_ms_trace(call, sync)
    if ms is None:
        print(
            "[bench] WARNING: xplane trace unavailable — b1 latency falls "
            "back to the slope method (5.4x spread; gate key gets a _slope "
            "suffix so rounds never compare across methods)",
            file=sys.stderr,
        )
        return measure_device_ms(call, sync), None, "slope"
    return ms, sigma, "trace"


def b1_gate_key(base: str, method: str) -> str:
    """History key for a b1-latency gate entry: the measurement method is
    part of the key, so a tooling change can neither fire nor mask a phantom
    regression across rounds (trace vs slope are different clocks)."""
    return base if method == "trace" else base + "_slope"


def _sync_out(out):
    arr = out[0]
    return float(arr[(0,) * arr.ndim])


def bench_model(name, baseline_ms, precision="fp32_fast", batch=1):
    import jax
    import tengine_tpu as tt
    from tengine_tpu.models.zoo import load_benchmark_model
    from tengine_tpu.utils.config import Options

    # time-to-first-inference breakdown (VERDICT r3 item 9): the total
    # varies 17-66 s across environments purely with the SERVER-side XLA
    # artifact cache state (compiles happen on the tunnel server; the local
    # TT_CACHE_DIR only skips the transfer) — the breakdown makes each run's
    # number attributable: load/prepare are host work, first-call is the
    # XLA compile.
    t0 = time.perf_counter()
    g = load_benchmark_model(name, fill_missing_weights="random")
    t_load = time.perf_counter() - t0
    t0 = time.perf_counter()
    cg = tt.compile_graph(g, Options(precision=precision, batch_size=batch))
    t_prep = time.perf_counter() - t0
    shape = [int(d) for d in g.tensors[g.input_tensors[0]].shape]
    shape[0] = batch
    x = jax.device_put(
        np.random.default_rng(0).standard_normal(shape).astype(np.float32)
    )
    t0 = time.perf_counter()
    _sync_out(cg(x))
    t_first = time.perf_counter() - t0
    print(
        f"[bench] first-inference breakdown: load {t_load:.1f} s, "
        f"prepare+trace {t_prep:.1f} s, first call (XLA compile+run) "
        f"{t_first:.1f} s",
        file=sys.stderr,
    )

    ms = measure_device_ms(lambda: cg(x), _sync_out)
    ips = batch / (ms / 1e3)
    print(
        f"[bench] {name} {precision} batch={batch}: {ms:.3f} ms/iter, "
        f"{ips:.0f} img/s (baseline {baseline_ms} ms -> {baseline_ms/ms:.1f}x)",
        file=sys.stderr,
    )
    return ms, ips


def bench_model_quant(name, batch, scheme="uint8", algorithm="minmax"):
    """Full-integer quantized inference (the BASELINE.json configs)."""
    import jax
    import tengine_tpu as tt
    from tengine_tpu.models.zoo import load_benchmark_model
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph
    from tengine_tpu.utils.config import Options

    rng = np.random.default_rng(0)
    g = load_benchmark_model(name, fill_missing_weights="random")
    shape = [int(d) for d in g.tensors[g.input_tensors[0]].shape]
    calib = [rng.standard_normal(shape).astype(np.float32)]
    qg = quantize_graph(g, calib, scheme=scheme, algorithm=algorithm)
    cg = tt.compile_graph(qg, Options(quant_mode="fast", batch_size=batch))
    t_in = qg.tensors[qg.input_tensors[0]]
    shape[0] = batch
    xq = jax.device_put(
        qmath.quantize_np(
            np.broadcast_to(calib[0], shape), t_in.quant, t_in.dtype
        )
    )
    ms = measure_device_ms(lambda: cg(xq), _sync_out)
    return ms, batch / (ms / 1e3)


def bench_model_uint8(name, batch):
    return bench_model_quant(name, batch, scheme="uint8")


def bench_model_quant_b1(name, scheme="uint8", algorithm="minmax"):
    """Batch-1 device latency by the blessed trace method (+ sigma)."""
    import jax
    import tengine_tpu as tt
    from tengine_tpu.models.zoo import load_benchmark_model
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph
    from tengine_tpu.utils.config import Options

    rng = np.random.default_rng(0)
    g = load_benchmark_model(name, fill_missing_weights="random")
    shape = [int(d) for d in g.tensors[g.input_tensors[0]].shape]
    calib = [rng.standard_normal(shape).astype(np.float32)]
    qg = quantize_graph(g, calib, scheme=scheme, algorithm=algorithm)
    cg = tt.compile_graph(qg, Options(quant_mode="fast", batch_size=1))
    t_in = qg.tensors[qg.input_tensors[0]]
    xq = jax.device_put(qmath.quantize_np(calib[0], t_in.quant, t_in.dtype))
    return measure_b1_ms(lambda: cg(xq), _sync_out)


def bench_yolov5s(batch=8, img=640):
    """BASELINE.json config 4: YOLOv5s 640x640 INT8 (focus/SiLU/upsample)."""
    import jax
    import tengine_tpu as tt
    from tengine_tpu.models.yolov5 import build_yolov5s_graph
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph
    from tengine_tpu.utils.config import Options

    rng = np.random.default_rng(0)
    _, g = build_yolov5s_graph(num_classes=80, img=img)
    calib = [rng.standard_normal((1, 3, img, img)).astype(np.float32)]
    qg = quantize_graph(g, calib, scheme="int8", algorithm="minmax")
    cg = tt.compile_graph(qg, Options(quant_mode="fast", batch_size=batch))
    t_in = qg.tensors[qg.input_tensors[0]]
    xq = jax.device_put(
        qmath.quantize_np(
            np.broadcast_to(calib[0], (batch, 3, img, img)), t_in.quant, t_in.dtype
        )
    )
    ms = measure_device_ms(lambda: cg(xq), _sync_out, n=21)
    return ms, batch / (ms / 1e3)


def bench_face_pipeline(max_faces=8):
    """BASELINE.json config 5: RetinaFace + MobileFaceNet two-stage pipeline,
    mixed UINT8 compute with fp32 fallback ops (softmax heads / l2-norm stay
    float under the quantizer, like the reference's blocked-op CPU fallback).
    Reports frames/s assuming every frame yields max_faces crops (worst case)."""
    import jax
    import tengine_tpu as tt
    from tengine_tpu.models.zoo import load_benchmark_model
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph
    from tengine_tpu.utils.config import Options

    rng = np.random.default_rng(0)
    stages = []
    methods = []
    for name, batch in (("retinaface", 1), ("mobilefacenets", max_faces)):
        g = load_benchmark_model(name, fill_missing_weights="random")
        shape = [int(d) for d in g.tensors[g.input_tensors[0]].shape]
        calib = [rng.standard_normal(shape).astype(np.float32)]
        qg = quantize_graph(g, calib, scheme="uint8", algorithm="minmax")
        cg = tt.compile_graph(qg, Options(quant_mode="fast", batch_size=batch))
        t_in = qg.tensors[qg.input_tensors[0]]
        shape[0] = batch
        xq = jax.device_put(
            qmath.quantize_np(np.broadcast_to(calib[0], shape), t_in.quant, t_in.dtype)
        )
        # both stages are sub-ms: use the blessed trace method (VERDICT r3
        # items 2+3 — the r3 "-44% face regression" was this config measured
        # by the slope method at noise-dominated dispatch counts)
        ms, _sigma, method = measure_b1_ms(lambda: cg(xq), _sync_out)
        stages.append(ms)
        methods.append(method)
    total_ms = sum(stages)
    return total_ms, stages, "trace" if all(m == "trace" for m in methods) else "slope"


HISTORY = "bench_history.json"


def regression_gate(results: dict, tol: float = 0.05):
    """Compare per-config img/s against the committed previous round
    (bench_history.json) and flag drops > tol loudly on stderr; then record
    the new numbers. The history file is committed each round, so every
    round's bench is gated against the last (VERDICT r2 item 3). tol covers
    the measured run-to-run tunnel jitter (~3% on small-batch configs)."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), HISTORY)
    prev = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                prev = json.load(f)
        except Exception:
            prev = {}
    regressions = []
    for k, v in results.items():
        p = prev.get(k)
        if p and v < p * (1 - tol):
            regressions.append((k, p, v))
            print(
                f"[bench] REGRESSION {k}: {p:.0f} -> {v:.0f} img/s "
                f"({100 * (v / p - 1):+.1f}%)",
                file=sys.stderr,
            )
    if not regressions:
        print(
            f"[bench] regression gate: {len(results)} configs, none below "
            f"previous round (tol {tol:.0%})",
            file=sys.stderr,
        )
    with open(path, "w") as f:
        json.dump({**prev, **results}, f, indent=1, sort_keys=True)
    return regressions


def main():
    model = "mobilenetv1"
    # mobilenet_v1, 4 threads, VIM3 big cluster (BASELINE.md) => 31.2 img/s.
    # BASELINE.json's metric is images/sec/chip for INT8/UINT8 inference.
    baseline_ms = 32.07
    baseline_ips = 1000.0 / baseline_ms

    # compile latency (VERDICT r1 item 9): time-to-first-inference with the
    # persistent XLA cache (on by default, ~/.cache/tengine_tpu/xla)
    t0 = time.perf_counter()
    fp32_ms, fp32_ips = bench_model(model, baseline_ms)
    print(
        f"[bench] first-model compile+run wall time: "
        f"{time.perf_counter() - t0:.1f} s (persistent cache "
        f"{'warm' if time.perf_counter() - t0 < 30 else 'cold'})",
        file=sys.stderr,
    )

    results = {}
    u8_lat_ms, u8_lat_sigma, u8_lat_method = bench_model_quant_b1(
        model, scheme="uint8"
    )
    u8_ms, u8_ips = bench_model_uint8(model, batch=128)
    results["mobilenetv1_uint8_b128"] = u8_ips
    # b1 latency rides the gate as a rate so "lower latency = higher value";
    # the method is part of the key (b1_gate_key) — slope-measured rounds
    # never gate against trace-measured history
    results[b1_gate_key("mobilenetv1_uint8_b1_fps", u8_lat_method)] = (
        1000.0 / u8_lat_ms
    )
    sig = f" σ{u8_lat_sigma*1e3:.1f}us" if u8_lat_sigma is not None else ""
    print(
        f"[bench] {model} uint8: b1 device latency {u8_lat_ms:.3f} ms{sig} "
        f"({u8_lat_method} method); {u8_ips:.0f} img/s (batch 128) vs baseline "
        f"{baseline_ips:.1f} img/s -> {u8_ips/baseline_ips:.0f}x",
        file=sys.stderr,
    )

    # secondary BASELINE.json configs (stderr only)
    try:
        r50_ms, r50_ips = bench_model_quant("resnet50", batch=128, scheme="int8", algorithm="kl")
        results["resnet50_int8kl_b128"] = r50_ips
        print(
            f"[bench] resnet50 int8(KL): {r50_ips:.0f} img/s (batch 128) "
            f"vs baseline {1000/174.66:.1f} img/s -> {r50_ips/(1000/174.66):.0f}x",
            file=sys.stderr,
        )
        mssd_ms, mssd_ips = bench_model_quant("mssd", batch=8, scheme="uint8")
        results["mssd_uint8_b8"] = mssd_ips
        print(
            f"[bench] mssd uint8 (incl. NMS): {mssd_ips:.0f} img/s (batch 8) "
            f"vs baseline {1000/66.67:.1f} img/s -> {mssd_ips/(1000/66.67):.0f}x",
            file=sys.stderr,
        )
        y5_ms, y5_ips = bench_yolov5s(batch=8)
        results["yolov5s640_int8_b8"] = y5_ips
        print(
            f"[bench] yolov5s 640 int8: {y5_ips:.0f} img/s (batch 8), "
            f"{y5_ms/8:.3f} ms/img device time",
            file=sys.stderr,
        )
        face_ms, face_stages, face_method = bench_face_pipeline(max_faces=8)
        results[b1_gate_key("face_pipeline_fps", face_method)] = 1000 / face_ms
        print(
            f"[bench] retinaface+mobilefacenet uint8 two-stage: "
            f"{1000/face_ms:.0f} frames/s (8 faces/frame worst case; "
            f"detect {face_stages[0]:.3f} ms + embed x8 {face_stages[1]:.3f} ms) "
            f"vs baseline 15.15 ms+8x16.97 ms (VIM3 4t) -> {(15.15+8*16.97)/face_ms:.0f}x",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] secondary configs failed: {e}", file=sys.stderr)
    regressions = regression_gate(results)
    result = {
        "metric": f"{model}_uint8_images_per_sec_per_chip",
        "value": round(u8_ips, 0),
        "unit": "img/s",
        "vs_baseline": round(u8_ips / baseline_ips, 1),
        # Blocking gate status (VERDICT r3 item 8): a round must not end
        # green with an undiagnosed perf regression. The driver records this
        # JSON verbatim, so a failure is loud in BENCH_r{N}.json itself.
        "gate": "FAILED: " + ", ".join(
            f"{k} {p:.0f}->{v:.0f}" for k, p, v in regressions
        ) if regressions else "ok",
    }
    print(json.dumps(result))
    if regressions:
        sys.exit(3)


if __name__ == "__main__":
    main()
