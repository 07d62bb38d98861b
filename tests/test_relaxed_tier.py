"""Relaxed-numerics quantized tier (Options.quant_relaxed) — VERDICT r3
item 1 / "next round" item 1.

Contract (the reference's own asm-tier contract, cpu_define.h score system:
the armv8.2 i8gemm kernels are NOT bit-identical to the ref C kernels —
different accumulation order — and the oracle is model accuracy, with
TG_DEBUG_REF to diff): the relaxed chain requantizes ONCE per block output
at the block-output scale, skipping the mid-tensor / eltwise-sum /
separate-ReLu integer grids. So vs the exact engine:

  * per-element differences are small (each skipped rounding moves a value
    by <= 1 ULP of the block-output grid, no compounding beyond the chain);
  * classification decisions (argmax over a downstream head) agree;
  * the exact engines remain available and unchanged
    (quant_relaxed=False bit-matches the unfused engine as before).
"""

import numpy as np
import pytest

from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.utils.config import Options

from test_resblock_fusion import build_chain_graph, quantized_pair


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def relaxed_vs_exact(rng, max_diff=6, **kw):
    # Per-element bound: each skipped intermediate rounding moves a value by
    # up to 0.5 * (skipped_scale / output_scale) output-LSBs, so with the
    # random fixture scales a few LSB on the tails is the expected relaxed
    # behavior (NOT a bug); the distribution must stay tight and decisions
    # must agree (test_relaxed_classification_agreement).
    qg, xq = quantized_pair(rng, **kw)
    cg_r = compile_graph(qg, Options(quant_mode="fast", quant_relaxed=True, chain_min_cmid=0))
    cg_e = compile_graph(qg, Options(quant_mode="fast", quant_relaxed=False))
    yr = cg_r.run(xq)
    ye = cg_e.run(xq)
    for a, b in zip(yr, ye):
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert d.max() <= max_diff, f"max diff {d.max()}"
        assert (d > 1).mean() < 0.10, f"{(d > 1).mean():.3f} differ by >1"
        assert (d > 3).mean() < 0.01, f"{(d > 3).mean():.3f} differ by >3"
    return yr, ye


def test_relaxed_identity_chain(rng):
    relaxed_vs_exact(rng, n=2, c0=16, c_mid=8, c_out=16, hw=8, nblocks=2)


def test_relaxed_proj_and_downsample(rng):
    relaxed_vs_exact(rng, n=2, c0=8, c_mid=8, c_out=16, hw=8, nblocks=3)
    relaxed_vs_exact(rng, n=2, c0=8, c_mid=8, c_out=16, hw=8, nblocks=2,
                     first_stride=2)


def test_relaxed_no_trailing_relu(rng):
    relaxed_vs_exact(rng, n=2, c0=16, c_mid=8, c_out=16, hw=8, nblocks=1,
                     trailing_relu=False)


def test_exact_engine_unchanged(rng):
    """quant_relaxed=False still bit-matches the unfused engine (the oracle
    tier is untouched)."""
    from test_resblock_fusion import fused_vs_unfused

    fused_vs_unfused(rng, n=2, c0=16, c_mid=8, c_out=16, hw=8, nblocks=2)


def test_relaxed_classification_agreement(rng):
    """Decision-level contract: argmax over a linear head on the chain
    output agrees between relaxed and exact for (nearly) every input —
    the unit-level stand-in for the published top-1-delta gate
    (tools/accuracy_eval.py runs the full harness)."""
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph

    g = build_chain_graph(rng, n=16, c0=16, c_mid=8, c_out=16, hw=8,
                          nblocks=2)
    calib = [rng.standard_normal((16, 16, 8, 8)).astype(np.float32)]
    qg = quantize_graph(g, calib, scheme="int8", algorithm="minmax")
    t_in = qg.tensors[qg.input_tensors[0]]

    head = rng.standard_normal((16 * 8 * 8, 10)).astype(np.float32)
    agree = 0
    total = 0
    for trial in range(4):
        x = rng.standard_normal((16, 16, 8, 8)).astype(np.float32)
        xq = qmath.quantize_np(x, t_in.quant, t_in.dtype)
        yr = compile_graph(qg, Options(quant_mode="fast", quant_relaxed=True, chain_min_cmid=0)).run(xq)[0]
        ye = compile_graph(qg, Options(quant_mode="fast", quant_relaxed=False)).run(xq)[0]
        lr = yr.reshape(16, -1).astype(np.float32) @ head
        le = ye.reshape(16, -1).astype(np.float32) @ head
        agree += int((lr.argmax(1) == le.argmax(1)).sum())
        total += 16
    assert agree / total >= 0.95, f"argmax agreement {agree}/{total}"


def test_relaxed_composes_with_mesh_sharding(rng):
    """The relaxed chain under GSPMD batch sharding must match its own
    unsharded run exactly (determinism across sharding, like the exact
    tier's composition test)."""
    import jax
    from jax.sharding import Mesh

    from tengine_tpu.parallel.sharding import shard_compiled

    qg, xq = quantized_pair(rng, n=8, c0=16, c_mid=8, c_out=16, hw=8,
                            nblocks=2)
    xq = np.broadcast_to(xq, (8,) + xq.shape[1:]).copy()
    cg = compile_graph(qg, Options(quant_mode="fast", quant_relaxed=True, chain_min_cmid=0,
                                   batch_size=8))
    base = cg.run(xq)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "model"))
    sharded = shard_compiled(cg, mesh).run(xq)
    for a, b in zip(base, sharded):
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert d.max() <= 1


def test_relaxed_xla_fused_add_epilogue(rng):
    """The relaxed single-rounding fused-residual epilogue on the XLA path
    (uint8 — chains never match asymmetric schemes, so this exercises
    _requant_conv_out's relaxed branch). Contract: the relaxed result is at
    least as close to the FLOAT reference as the exact engine is (single
    rounding + no premature mid-grid clipping can only reduce quantization
    error; what diverges vs the exact engine is two valid rounding paths,
    measured mean signed diff ~0)."""
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph

    g = build_chain_graph(rng, n=2, c0=16, c_mid=8, c_out=16, hw=8, nblocks=2)
    calib = [rng.standard_normal((2, 16, 8, 8)).astype(np.float32)]
    qg = quantize_graph(g, calib, scheme="uint8", algorithm="minmax")
    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(calib[0], t_in.quant, t_in.dtype)
    yr = compile_graph(qg, Options(quant_mode="fast", quant_relaxed=True, chain_min_cmid=0)).run(xq)[0].astype(np.int32)
    ye = compile_graph(qg, Options(quant_mode="fast", quant_relaxed=False)).run(xq)[0].astype(np.int32)
    d = yr - ye
    assert abs(d.mean()) < 0.1, f"systematic bias {d.mean():.3f}"
    # float oracle: dequantized fp32 graph, mapped onto the output grid
    yf = compile_graph(g, Options()).run(calib[0])[0]
    t_out = qg.tensors[qg.output_tensors[0]]
    s = float(np.asarray(t_out.quant.scales))
    zp = int(np.asarray(t_out.quant.zero_points))
    qtrue = yf / s + zp
    err_r = np.abs(yr - qtrue).mean()
    err_e = np.abs(ye - qtrue).mean()
    assert err_r <= err_e + 0.02, (err_r, err_e)
