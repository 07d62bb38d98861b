"""Runtime options — the typed-config equivalent of the reference's 3-tier
flag system (CMake options / options_t / TG_DEBUG_* env vars; SURVEY §5).

One dataclass + env-var overrides. The reference's `options_t
{num_thread, cluster, precision, affinity}` (c_api.h:153-159) maps to
{precision, quant mode, device/mesh selection} here — thread counts and core
affinity are meaningless on TPU; the analogous scale knobs are the mesh axes
(parallel/mesh.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace
from typing import Optional, Tuple


def _env_flag(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v not in ("", "0", "false", "False")


@dataclass(frozen=True)
class Options:
    """Per-run execution options.

    precision: "fp32" | "fp32_fast" | "bf16" | "fp16" — compute dtype for
        float graphs. "fp32" uses the multi-pass MXU decomposition (HIGHEST);
        "fp32_fast" keeps fp32 storage with one-pass bf16 MXU inputs; "bf16"
        and "fp16" use 16-bit storage with fp32 MXU accumulation.
    quant_mode: "auto"  — quantized tmfile runs quantized, float runs float;
                "ref"   — quantized graphs use the bit-faithful
                          dequant→fp32→requant reference semantics
                          (conv_kernel_ref_uint8.c:67-177 analog, the
                          TG_DEBUG_REF oracle);
                "fast"  — quantized graphs use int8 MXU kernels with fused
                          requantization;
                "float" — ignore quant params, run everything fp32.
    force_ref_kernels: pick the lowest-score kernel for every op
        (TG_DEBUG_REF analog, cpu_module.c:157-166).
    profile: record per-op timing (TG_DEBUG_TIME analog, cpu_device.c:79-156).
    dump_dir: dump every node's output tensors (TG_DEBUG_DATA analog).
    donate_input: allow XLA to reuse input buffers for outputs.
    """

    precision: str = "fp32"
    quant_mode: str = "auto"
    force_ref_kernels: bool = False
    profile: bool = False
    dump_dir: Optional[str] = None
    donate_input: bool = False
    batch_size: Optional[int] = None  # override model batch dim
    # numeric sanitizer: raise on NaN/Inf produced anywhere in the jitted
    # program (jax debug_nans — the TPU-side analog of the reference's
    # TE_ENABLE_MEMORY_CHECK/sanitizer tier, SURVEY §5). Env: TT_DEBUG_NANS.
    debug_nans: bool = False
    internal_layout: str = "NHWC"  # lowering layout for conv stacks: NHWC | NCHW
    # Physical layout of 4-D graph inputs at the jit boundary. The IR is
    # NCHW (tmfile semantics) and that stays the default API contract, but
    # an NCHW device input makes XLA fold the entry transpose into the first
    # conv (dim_labels=bf01) and then ripple transpose-remnant layouts +
    # copies through the early stages (~20% of yolov5s device time). With
    # "NHWC" the caller hands NHWC arrays (the natural camera/decode order)
    # and the program is NHWC end-to-end. Outputs are unaffected (semantic
    # NCHW).
    input_layout: str = "NCHW"
    # Rewrite small-channel stride-2 stem convs as SpaceToDepth + stride-1
    # conv at compile time (exact weight permutation; passes.stem_conv_s2d).
    # Device traces show XLA materializes the pixel shuffle as relayout
    # copies that cancel the conv win (yolov5s 640: 7.91 -> 8.24 ms/batch),
    # so this stays opt-in; the stem bottleneck is addressed by the Pallas
    # stem kernel instead.
    stem_s2d: bool = False
    # Use the Pallas int8 qgemm for large pointwise convs / FC. Bit-exact with
    # the XLA fast path; standalone it beats XLA at K>=256, but each
    # pallas_call is a fusion barrier, which currently costs more than it
    # saves inside full conv nets — hence opt-in until the fused block
    # kernels land.
    pallas_qgemm: bool = False
    # Store quantized activations as bf16 on the fast path. Every |q| <= 255
    # is exactly representable in bf16 (8 mantissa bits), so values are
    # bit-identical to int8/uint8 storage (verified on full nets), but convs
    # consume them directly at the MXU's bf16 rate with no per-conv
    # integer->bf16 cast pass (int8 symmetric: zero input-side elementwise
    # work; uint8: one exact bf16 subtract). Costs 2x activation bytes, wins
    # everywhere measured: mobilenet-v1 uint8 b128 30.3k -> 44.1k img/s,
    # resnet50 int8 b64 7.7k -> 8.6k img/s (v5e). Default on; disable to use
    # the integer-operand Pallas paths (pallas_qgemm).
    quant_bf16_storage: bool = True
    # Direct k×k int8 MXU conv (ops/pallas/qconv.py) for quantized convs
    # when activations are stored as raw integers (quant_bf16_storage=False):
    # k² shifted int8 MXU dots with fused (double-)requantization, fused
    # residual adds (fuse_conv_add pass), uint8 zero-point corrections via an
    # MXU ones-column, 1-byte activation streaming. Bit-exact with the
    # unfused chain (verified on resnet50). On v5e it reaches ~80% of the
    # bf16-storage XLA path end-to-end (resnet50 int8 b32: 4.4 ms vs 3.6 ms
    # — the remaining gap is XLA<->pallas layout copies at the C<128
    # boundary layers), so the default path stays bf16; flip
    # quant_bf16_storage=False to use it.
    pallas_qconv: bool = True
    # Fused Pallas stem kernel (ops/pallas/stem_conv.py) for the first-layer
    # small-channel stride-2 conv of every quantized net. XLA's emitters for
    # C_in < 8 cannot host the requant epilogue and wrap the conv in layout
    # copies; the kernel measured 2.6 vs 3.4 ms on the yolov5s 640 stem
    # cluster (batch 8, device trace), exact int32 accumulation, s8/u8.
    pallas_stem: bool = True

    # Relaxed-numerics quantized tier (the reference's armv8.2-asm-tier
    # accuracy contract: top-1 delta vs the exact engine, not bitwise — the
    # reference's own optimized asm kernels are NOT bit-identical to its ref
    # C kernels either, different accumulation order, TG_DEBUG_REF diffs
    # them). Where a fused chain kernel applies (resnet bottleneck chains,
    # dw+pw chains), requantization happens ONCE per block output at the
    # block-output scale: the intermediate mid-tensor / eltwise-sum /
    # separate-ReLu integer grids are skipped (single rounding), which cuts
    # the VPU epilogue floor that kept the exact int8 chain tier behind the
    # XLA bf16-storage path (ARCHITECTURE "where the time actually goes").
    # Accuracy: top-1 delta vs exact engine <= 0.1% on the published
    # accuracy harness (tests/test_relaxed_tier.py, tools/accuracy_eval.py
    # --seeds: measured 0.0 uint8 / 0.0..+0.28% int8 deltas). Default ON —
    # the winning tier (resnet50 int8 b128: 13.3k -> 15.2k img/s measured
    # r4); quant_mode="ref" and quant_relaxed=False give the exact engines
    # (the parity suites pin quant_relaxed=False — they validate the
    # oracle tier).
    quant_relaxed: bool = True

    # Native-int8 storage/compute plan ("auto" | "on" | "off"). When active
    # (auto = whenever quant_relaxed is on), every quantized activation is
    # stored as its raw 1-byte value and convolutions/FCs consume it DIRECTLY
    # as an s8×s8→s32 XLA convolution on the int8 MXU — no bf16 shift pass,
    # no 2 B/elt storage. UINT8-scheme graphs are rewritten by
    # graph/passes.py:to_native_int8: activations shift to s8 (q-128, zp-128
    # — exact), weights requantize to symmetric per-channel s8 (the relaxed
    # tier's accuracy contract; exact uint8 stays behind quant_relaxed=False),
    # and nonzero input zero-points fold into a compile-time constant
    # correction (zp·conv(1s, w), exact). Measured v5e (r4): a lone s8 3x3
    # conv runs 290 TOP/s vs 167 for the same conv in bf16, an s8 dw+pw
    # chain 0.43 vs 0.58 ms/block — the r2 conclusion that integer storage
    # loses ("the axon backend hangs on int8 convs") no longer holds after
    # the platform upgrade; re-probed across stem/dw/small-channel
    # geometries, all compile in seconds. TT_NATIVE_INT=0 reverts.
    quant_native: str = "auto"


    # Minimum bottleneck width (c_mid) for whole-chain Pallas fusion under
    # quant_relaxed: the r4 per-stage scan (tools/chain_scan.py) measured
    # chains LOSING below 256 lanes (stage2 c64: 3.56 ms chained vs ~2.6 ms
    # XLA — sub-128 channels underfill the VPU/MXU lanes and pay SEG row
    # padding) and winning at 256/512. Explicit fuse_resblock=True ignores
    # this (exact-tier tests fuse tiny fixtures).
    chain_min_cmid: int = 256

    # Fuse runs of int8-symmetric bottleneck residual blocks
    # (conv1x1 -> conv3x3 -> conv1x1 + residual [+relu], the resnet family)
    # into whole-chain Pallas kernels with every intermediate resident in
    # VMEM (ops/pallas/qblock.py). The round-2 traces showed these blocks
    # ~70% HBM-BW-bound on the XLA bf16-storage path; the chain kernel
    # streams 1-byte activations only at chain boundaries. Bit-faithful to
    # the unfused chain (tests/test_resblock_fusion.py). Opt-in while the
    # kernel's serial VPU epilogue chain still loses to the XLA path with
    # native-instruction rounding (r50 b128: 12.8 vs 9.6 ms) — the kernel
    # redesign (output-stationary taps, f32-carried residual) is in flight.
    fuse_resblock: bool = False

    @classmethod
    def from_env(cls, **overrides) -> "Options":
        """Env-var tier, mirroring TG_DEBUG_* (cpu_define.h:40-44)."""
        base = cls(
            force_ref_kernels=_env_flag("TT_DEBUG_REF"),
            profile=_env_flag("TT_DEBUG_TIME"),
            dump_dir=os.environ.get("TT_DEBUG_DATA_DIR")
            or ("tt_dump" if _env_flag("TT_DEBUG_DATA") else None),
            debug_nans=_env_flag("TT_DEBUG_NANS"),
        )
        return replace(base, **overrides)
