"""Quantized execution lowerings (UINT8 asymmetric / INT8 per-channel).

Placeholder for now — filled with:
  * reference-semantics dequant -> fp32 -> requant paths
    (conv_kernel_ref_uint8.c:67-177 analog), the bit-accuracy oracle;
  * fast int8 MXU paths with fused requantization (Pallas / XLA int8 dot).
"""
