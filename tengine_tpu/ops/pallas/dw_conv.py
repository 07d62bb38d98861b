"""Pallas TPU kernel: quantized depthwise k×k conv, batch-in-lanes layout.

The depthwise family is the one conv class with no MXU mapping (per-channel
elementwise windows — the reference dedicates hand asm to it:
conv_dw_kernel_int8_arm.c, conv_dw_hcl_arm.c). On TPU it is VPU work, and
the r5 measurements show XLA's s8 dw emitters run fine standalone but
2-6x worse inside a program (layout/fusion environment, worst on the
stride-2 layers), which is the single blocker keeping the native-int8
1-byte plan off the mobilenet family (engine._native_profitable).

Design (r5):
  * layout [H, W, C, N]: batch in LANES. Every VPU op runs at full 128-lane
    utilization regardless of C (the dwchain r4 kernel paid 4x lane padding
    at C=32); C and W live in sublanes where taps are static slices.
    Wrappers transpose NHWC -> HWCN; for the s8 in-graph tensors the
    producer's batch-minor physical layout makes this a layout change, not
    a data copy (XLA layout assignment).
  * grid (C-chunks, row-bands). Input rows are DMA'd manually (BlockSpec
    cannot express halo overlap), double-buffered across grid steps:
    each band DMAs its own body rows [bi*R*s, bi*R*s + R*s + δ) (δ =
    k - s - pad rows of bottom halo, re-read next band), and receives its
    `pad` top-halo rows by a small VMEM carry copy from the previous
    band's body (zp memset on band 0 / image bottom).
  * W padding lives inside the scratch block (pad columns memset to zp_in,
    the DMA writes only the interior columns).
  * taps: scratch row t holds input row bi*R*s - pad + t, so tap (r, a)
    reads row s*r + a and cols s*w + b — static slices for stride 1; for
    stride 2 the row slab is viewed [Wp/2, 2, Cc, N] and the column tap
    becomes (pair-slice, phase). No strided reads, no relayouts.
  * accumulate f32 (exact: |acc| <= k*k*127*127 < 2^24), per-output-row to
    bound VMEM; requant epilogue (per-channel M, B, round-away, clip)
    fused; relu/relu6/clip fold pre-round like _requant_conv_out.

Zero points: the input is fed RAW; pad slots carry zp_in and the caller
folds the exact -zp_in * colsum(w) * M correction into B (the same
dw_zp_fold scheme as the XLA branch, ops/quantized.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_away(x):
    return jax.lax.round(x, jax.lax.RoundingMethod.AWAY_FROM_ZERO)


def _dw_kernel(
    x_hbm,    # [H, W, C, N] int8/uint8 in ANY/HBM
    w_ref,    # [k*k, Cc] f32 taps for this C chunk
    m_ref,    # [1, Cc] f32 requant multipliers
    b_ref,    # [1, Cc] f32 requant bias (zp/bias corrections folded)
    o_ref,    # out block [R, OW, Cc, N]
    scratch,  # [2, rows_al, Wp, Cc, N] input dtype VMEM
    rowbuf,   # [k, Wp, Cc, N] f32 — once-converted input rows
    sem,      # DMA sems (2,)
    *,
    k, stride, pad_t, pad_l, delta, R, W, OW, n_bands, zp_in,
    act, s_out, zp_out, lo, hi, out_u8,
):
    ci = pl.program_id(0)
    bi = pl.program_id(1)
    nsteps = pl.num_programs(0) * pl.num_programs(1)
    step = ci * n_bands + bi
    slot = jax.lax.rem(step, 2)
    nsl = jax.lax.rem(step + 1, 2)

    Cc = o_ref.shape[2]
    N = o_ref.shape[3]
    body = R * stride

    def dma(slot_, ci_, bi_, size):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(bi_ * body, size), :, pl.ds(ci_ * Cc, Cc), :],
            scratch.at[slot_, pl.ds(pad_t, size), pl.ds(pad_l, W)],
            sem.at[slot_],
        )

    def start(slot_, ci_, bi_):
        if delta == 0 or n_bands == 1:
            dma(slot_, ci_, bi_, body).start()
        else:
            @pl.when(bi_ < n_bands - 1)
            def _():
                dma(slot_, ci_, bi_, body + delta).start()

            @pl.when(bi_ == n_bands - 1)
            def _():
                dma(slot_, ci_, bi_, body).start()

    def wait(slot_, ci_, bi_):
        if delta == 0 or n_bands == 1:
            dma(slot_, ci_, bi_, body).wait()
        else:
            @pl.when(bi_ < n_bands - 1)
            def _():
                dma(slot_, ci_, bi_, body + delta).wait()

            @pl.when(bi_ == n_bands - 1)
            def _():
                dma(slot_, ci_, bi_, body).wait()

    @pl.when(step == 0)
    def _():
        start(0, 0, 0)

    @pl.when(step + 1 < nsteps)
    def _():
        nci = jax.lax.select(bi + 1 < n_bands, ci, ci + 1)
        nbi = jax.lax.rem(bi + 1, n_bands)
        start(nsl, nci, nbi)

    wait(slot, ci, bi)

    zp_c = jnp.asarray(zp_in, scratch.dtype)
    rows_al = scratch.shape[1]
    Wp = scratch.shape[2]
    if pad_l or Wp - pad_l - W > 0:
        # W pad columns: the DMA never writes them; constant zp forever
        @pl.when(step < 2)
        def _():
            if pad_l:
                scratch[slot, :, :pad_l] = jnp.full(
                    (rows_al, pad_l, Cc, N), zp_c, scratch.dtype
                )
            wtail = Wp - pad_l - W
            if wtail > 0:
                scratch[slot, :, pad_l + W:] = jnp.full(
                    (rows_al, wtail, Cc, N), zp_c, scratch.dtype
                )
    if pad_t:
        # top halo: band 0 pads with zp (image top)
        @pl.when(bi == 0)
        def _():
            scratch[slot, :pad_t] = jnp.full(
                (pad_t, Wp, Cc, N), zp_c, scratch.dtype
            )
    if delta > 0:
        # bottom halo of the LAST band = image bottom pad rows
        @pl.when(bi == n_bands - 1)
        def _():
            scratch[slot, pad_t + body : pad_t + body + delta] = jnp.full(
                (delta, Wp, Cc, N), zp_c, scratch.dtype
            )

    w = w_ref[:]
    m = m_ref[0][None, :, None]
    bb = b_ref[0][None, :, None]

    # f32 rolling row window: each input row is converted ONCE (the naive
    # per-tap astype measured ~3x the FMA cost); slot index is static
    # (Python loop), window size covers one output row's taps plus the
    # stride advance.
    nbuf = rowbuf.shape[0]
    loaded = min(k, stride * (R - 1) + k)  # rows pre-converted
    for t in range(loaded):
        rowbuf[t % nbuf] = scratch[slot, t].astype(jnp.float32)

    # W tiled so the 9-tap accumulator stays register-resident: the
    # untiled [OW, Cc, N] accumulator measured VMEM-BW-bound on the
    # large-spatial layers (9 taps x read+write of a 1.8 MB acc)
    WT = OW
    for d in range(min(8, OW), 0, -1):
        if OW % d == 0:
            WT = d
            break

    def tile(r, wi, buf_rows):
        acc = None
        for a in range(k):
            ref = rowbuf.at[buf_rows[a]]
            for b in range(k):
                if stride == 1:
                    xs = ref[pl.ds(wi * WT + b, WT)]
                else:
                    xs = ref[pl.ds(2 * wi * WT + b, 2 * WT)].reshape(
                        WT, 2, Cc, N
                    )[:, 0]
                tv = xs * w[a * k + b][None, :, None]
                acc = tv if acc is None else acc + tv
        q = acc * m + bb
        if act is not None and act >= 0:
            if act == 1:
                q = jnp.clip(q, -1.0 / s_out, 1.0 / s_out)
            else:
                q = jnp.maximum(q, 0.0)
                if act > 0:
                    q = jnp.minimum(q, float(act) / s_out)
        q = jnp.clip(_round_away(q) + zp_out, lo, hi)
        o_ref[r, pl.ds(wi * WT, WT)] = q.astype(
            jnp.uint8 if out_u8 else jnp.int8
        )

    for r in range(R):
        lo_row = stride * r
        hi_row = stride * r + k
        while loaded < hi_row:
            rowbuf[loaded % nbuf] = scratch[slot, loaded].astype(
                jnp.float32
            )
            loaded += 1
        buf_rows = [(lo_row + a) % nbuf for a in range(k)]
        jax.lax.fori_loop(
            0, OW // WT, lambda wi, _: (tile(r, wi, buf_rows), 0)[1], 0
        )

    # hand the last `pad_t` body rows to the next band's top halo (disjoint
    # from that band's in-flight body DMA, which starts at row `pad_t`)
    if pad_t:
        @pl.when(bi + 1 < n_bands)
        def _():
            scratch[nsl, :pad_t] = scratch[slot, body : body + pad_t]


def _pick_band(OH, OW, Cc, N, stride, k, pad_t, in_bytes):
    """Largest row band R dividing OH that fits the VMEM budget."""
    best = 1
    for R in range(OH, 0, -1):
        if OH % R:
            continue
        rows_al = pad_t + R * stride + max(0, k - stride - pad_t)
        wp = (OW - 1) * stride + k  # max col index + 1 (pads included)
        if stride == 2:
            wp += wp % 2
        total = (
            2 * rows_al * wp * Cc * N * in_bytes
            + k * wp * Cc * N * 4          # f32 row window
            + R * OW * Cc * N
            + 3 * OW * Cc * N * 4
        )
        if total <= 11 * 1024 * 1024:
            best = R
            break
    return best


def dw_qconv_hwcn(
    x,            # [H, W, C, N] int8/uint8 raw quantized values
    w,            # [k*k, C] f32 tap values
    M,            # [C] f32 requant multipliers s_in*s_w/s_out
    B,            # [C] f32 requant bias (bias + zp corrections, no zp_out)
    *,
    k: int,
    stride: int,
    pad_t: int,
    pad_l: int,
    pad_b: int = None,
    pad_r: int = None,
    zp_in: int = 0,
    zp_out: int = 0,
    act: int = -1,
    s_out: float = 1.0,
    lo: float = -128.0,
    hi: float = 127.0,
    out_u8: bool = False,
):
    """Depthwise conv + requant on [H, W, C, N]; returns [OH, OW, C, N].

    Bottom/right pads (default: SAME-style k - stride - pad_t/l) realize as
    zp-memset halo rows/cols — this covers both the TF-style (0,1) pads of
    the tmfile stride-2 layers and symmetric caffe pads."""
    H, W, C, N = map(int, x.shape)
    if pad_b is None:
        pad_b = max(0, k - stride - pad_t)
    if pad_r is None:
        pad_r = max(0, k - stride - pad_l)
    OH = (H + pad_t + pad_b - k) // stride + 1
    OW = (W + pad_l + pad_r - k) // stride + 1
    delta = max(0, k - stride - pad_t)
    assert pad_b <= delta + (stride - 1), (k, stride, pad_t, pad_b)

    Cc = C if C <= 128 else 128
    while C % Cc:
        Cc //= 2
    R = _pick_band(OH, OW, Cc, N, stride, k, pad_t, 1)
    rows_al = pad_t + R * stride + delta
    Wp = max((OW - 1) * stride + k, pad_l + W)
    if stride == 2:
        Wp += Wp % 2

    n_bands = OH // R
    n_cchunks = C // Cc
    if n_bands > 1 and pad_b > R * stride:
        # interior bands DMA body+delta rows starting at bi*R*stride; with
        # pad_b > R*stride the second-to-last band's read would run past
        # the input's last row (silent corruption). A VMEM-forced tiny R
        # (the _pick_band R=1 fallback) can hit this on k5 SAME layers —
        # refuse loudly rather than mis-read.
        raise ValueError(
            f"dw_qconv: pad_b={pad_b} exceeds the row band ({R}x{stride}); "
            "geometry outside the kernel envelope"
        )

    kern = functools.partial(
        _dw_kernel,
        k=k, stride=stride, pad_t=pad_t, pad_l=pad_l, delta=delta, R=R,
        W=W, OW=OW,
        n_bands=n_bands, zp_in=zp_in, act=act, s_out=s_out, zp_out=zp_out,
        lo=lo, hi=hi, out_u8=out_u8,
    )
    out = pl.pallas_call(
        kern,
        grid=(n_cchunks, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k * k, Cc), lambda c, b: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cc), lambda c, b: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cc), lambda c, b: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (R, OW, Cc, N), lambda c, b: (b, 0, c, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (OH, OW, C, N), jnp.uint8 if out_u8 else jnp.int8
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows_al, Wp, Cc, N), x.dtype),
            pltpu.VMEM((k, Wp, Cc, N), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x, w, jnp.asarray(M).reshape(1, C), jnp.asarray(B).reshape(1, C))
    return out


def dw_qconv(
    x,            # [N, H, W, C] (NHWC) int8/uint8
    w,            # [k,k,1,C] HWIO or [C,1,k,k] OIHW int weights (true values)
    M, B,
    *,
    stride, pad, pad_l=None, pad_b=None, pad_r=None,
    zp_in=0, zp_out=0, act=-1, s_out=1.0,
    lo=-128.0, hi=127.0, out_u8=False,
):
    """NHWC wrapper: transpose to [H, W, C, N] (a layout change for
    batch-minor producers), run, transpose back."""
    wa = np.asarray(w)
    if wa.ndim == 4 and wa.shape[2] == 1 and wa.shape[0] == wa.shape[1]:
        wa = wa[:, :, 0, :]  # [k,k,1,C] HWIO -> [k,k,C]
    elif wa.ndim == 4 and wa.shape[1] == 1:
        wa = wa[:, 0].transpose(1, 2, 0)  # [C,1,k,k] OIHW -> [k,k,C]
    k = int(wa.shape[0])
    wf = jnp.asarray(wa.reshape(k * k, -1).astype(np.float32))
    xt = jnp.transpose(x, (1, 2, 3, 0))
    out = dw_qconv_hwcn(
        xt, wf, M, B, k=k, stride=stride, pad_t=pad,
        pad_l=pad if pad_l is None else pad_l, pad_b=pad_b, pad_r=pad_r,
        zp_in=zp_in,
        zp_out=zp_out, act=act, s_out=s_out, lo=lo, hi=hi, out_u8=out_u8,
    )
    return jnp.transpose(out, (3, 0, 1, 2))
