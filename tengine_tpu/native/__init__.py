"""Native (C++) runtime components with self-bootstrapping build.

The reference's runtime is C end-to-end; here the compute path is XLA, and
the native layer covers the host-side hot paths the reference also keeps
native: image preprocessing (examples/common/tengine_operations.c analog)
and tmfile scanning. Compiled on first use with g++ into
~/.cache/tengine_tpu/libtengine_tpu_native.so; every function has a numpy
fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

from ..utils.log import logger

_SRCS = [
    os.path.join(os.path.dirname(__file__), f)
    for f in ("improc.cc", "tm2_parser.cc", "postproc.cc")
]
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        h = hashlib.sha256()
        for src in _SRCS:
            with open(src, "rb") as f:
                h.update(f.read())
        digest = h.hexdigest()[:16]
        cache = os.path.join(
            os.environ.get("TT_CACHE_DIR", os.path.expanduser("~/.cache/tengine_tpu"))
        )
        os.makedirs(cache, exist_ok=True)
        lib_path = os.path.join(cache, f"libtengine_tpu_native-{digest}.so")
        if not os.path.exists(lib_path):
            tmp = lib_path + ".tmp"
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
                 *_SRCS, "-o", tmp],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, lib_path)
        lib = ctypes.CDLL(lib_path)
        lib.tt_tm2_scan_buffers.restype = ctypes.c_long
        lib.tt_tm2_parse.restype = ctypes.c_int
        lib.tt_tm2_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.tt_last_error.restype = ctypes.c_char_p
        lib.tt_nms.restype = ctypes.c_long
        _LIB = lib
    except Exception as e:  # pragma: no cover - depends on toolchain
        logger.info("native library unavailable (%s); using numpy fallbacks", e)
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def _cptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """HWC uint8 bilinear resize (tengine_operations.c resize_image)."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    lib = _build_and_load()
    out = np.empty((out_h, out_w, c), np.uint8)
    if lib is not None:
        lib.tt_resize_bilinear_u8(
            _cptr(img), h, w, c, _cptr(out), out_h, out_w
        )
        return out
    # numpy fallback: half-pixel bilinear
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    v = (
        img[y0][:, x0] * (1 - wy) * (1 - wx)
        + img[y0][:, x1] * (1 - wy) * wx
        + img[y1][:, x0] * wy * (1 - wx)
        + img[y1][:, x1] * wy * wx
    )
    return np.clip(np.rint(v), 0, 255).astype(np.uint8)


def normalize_chw(img: np.ndarray, mean, scale) -> np.ndarray:
    """HWC uint8 -> CHW fp32, (x - mean[c]) * scale[c]."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    mean = np.ascontiguousarray(mean, np.float32)
    scale = np.ascontiguousarray(scale, np.float32)
    lib = _build_and_load()
    if lib is not None:
        out = np.empty((c, h, w), np.float32)
        lib.tt_normalize_chw_f32(
            _cptr(img), h, w, c, _cptr(mean), _cptr(scale), _cptr(out)
        )
        return out
    return ((img.astype(np.float32) - mean) * scale).transpose(2, 0, 1)


def quantize_u8(x: np.ndarray, scale: float, zero_point: int) -> np.ndarray:
    """fp32 -> uint8 input quantization (tm_classification_uint8.c)."""
    x = np.ascontiguousarray(x, np.float32)
    lib = _build_and_load()
    if lib is not None:
        out = np.empty(x.shape, np.uint8)
        lib.tt_quantize_u8(
            _cptr(x), x.size, ctypes.c_float(scale), int(zero_point), _cptr(out)
        )
        return out
    return np.clip(np.rint(x / scale) + zero_point, 0, 255).astype(np.uint8)


def letterbox(img: np.ndarray, out_h: int, out_w: int, pad_value: int = 114) -> np.ndarray:
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    lib = _build_and_load()
    if lib is not None:
        out = np.empty((out_h, out_w, c), np.uint8)
        lib.tt_letterbox_u8(
            _cptr(img), h, w, c, _cptr(out), out_h, out_w, pad_value
        )
        return out
    r = min(out_h / h, out_w / w)
    nh, nw = round(h * r), round(w * r)
    resized = resize_bilinear(img, nh, nw)
    out = np.full((out_h, out_w, c), pad_value, np.uint8)
    oy, ox = (out_h - nh) // 2, (out_w - nw) // 2
    out[oy : oy + nh, ox : ox + nw] = resized
    return out


def preprocess_batch(
    images,
    out_h: int,
    out_w: int,
    mean,
    scale,
    quant: Optional[tuple] = None,
    n_threads: int = 0,
) -> np.ndarray:
    """Threaded batch preprocessing (resize -> normalize -> optional input
    quantization) into one [N,C,H,W] array — the data-loader hot path
    (improc.cc:tt_preprocess_batch). `quant` = (scale, zero_point) for uint8
    model inputs; None for fp32. Numpy fallback when native is unavailable."""
    images = [np.ascontiguousarray(im, np.uint8) for im in images]
    n = len(images)
    c = images[0].shape[2] if n else 3
    mean = np.ascontiguousarray(mean, np.float32)
    scale = np.ascontiguousarray(scale, np.float32)
    lib = _build_and_load()
    if lib is not None and n:
        ptrs = (ctypes.c_void_p * n)(*[im.ctypes.data for im in images])
        dims = np.asarray([[im.shape[0], im.shape[1]] for im in images], np.int32)
        if quant is None:
            out = np.empty((n, c, out_h, out_w), np.float32)
            qflag, qs, qzp = 0, 1.0, 0
        else:
            out = np.empty((n, c, out_h, out_w), np.uint8)
            qflag, (qs, qzp) = 1, quant
        lib.tt_preprocess_batch(
            ptrs, _cptr(dims), n, c, out_h, out_w, _cptr(mean), _cptr(scale),
            qflag, ctypes.c_float(float(qs)), int(qzp), _cptr(out),
            int(n_threads),
        )
        return out
    outs = []
    for im in images:
        r = resize_bilinear(im, out_h, out_w)
        v = ((r.astype(np.float32) - mean) * scale).transpose(2, 0, 1)
        if quant is not None:
            qs, qzp = quant
            v = np.clip(np.rint(v / qs) + qzp, 0, 255).astype(np.uint8)
        outs.append(v)
    dtype = np.uint8 if quant is not None else np.float32
    return np.stack(outs).astype(dtype) if outs else np.empty(
        (0, c, out_h, out_w), dtype
    )


def tm2_parse(data: bytes) -> Optional[bytes]:
    """Full native TM2 parse -> wire buffer (see tm2_parser.cc), or None when
    the native library is unavailable. Raises ValueError on malformed files."""
    lib = _build_and_load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_long()
    rc = lib.tt_tm2_parse(data, len(data), ctypes.byref(out), ctypes.byref(out_len))
    if rc != 0:
        raise ValueError(
            "native tm2 parse: " + lib.tt_last_error().decode("utf-8", "replace")
        )
    try:
        return ctypes.string_at(out, out_len.value)
    finally:
        lib.tt_buffer_free(out)


def nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float,
        max_out: int = 0) -> np.ndarray:
    """Hard NMS on [N,4] x1y1x2y2 boxes; returns kept indices sorted by score
    (examples/common NMS loop). Native when available, numpy fallback."""
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(scores)
    if max_out <= 0:
        max_out = n
    lib = _build_and_load()
    if lib is not None:
        keep = np.empty(min(n, max_out), np.int32)
        m = lib.tt_nms(
            _cptr(boxes), _cptr(scores), n,
            ctypes.c_float(iou_threshold), _cptr(keep), len(keep),
        )
        return keep[:m]
    order = np.argsort(-scores, kind="stable")
    keep_list = []
    suppressed = np.zeros(n, bool)
    areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    for i in order:
        if suppressed[i]:
            continue
        keep_list.append(i)
        if len(keep_list) >= max_out:
            break
        xx1 = np.maximum(boxes[i, 0], boxes[order, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[order, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[order, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[order, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(areas[i] + areas[order] - inter, 1e-9)
        suppressed[order[iou > iou_threshold]] = True
    return np.asarray(keep_list, np.int32)


def tm2_scan_buffers(data: bytes) -> Optional[np.ndarray]:
    """Const-buffer table [(tensor_id, offset, size)] via the native scanner;
    None when the native lib is unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    table = np.zeros((65536, 3), np.uint64)
    n = lib.tt_tm2_scan_buffers(_cptr(buf), len(data), _cptr(table), 65536)
    if n < 0:
        raise ValueError("native tm2 scan: malformed tmfile")
    return table[:n]


_CAPI_LIB: Optional[str] = None


def build_capi() -> Optional[str]:
    """Build libtengine_tpu_capi.so — the C ABI embedding surface
    (c_api_shim.c, drop-in subset of the reference's c_api.h). Returns the
    library path, or None when no toolchain/libpython is available."""
    global _CAPI_LIB
    if _CAPI_LIB is not None:
        return _CAPI_LIB
    import sysconfig

    src = os.path.join(os.path.dirname(__file__), "c_api_shim.c")
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache = os.environ.get(
            "TT_CACHE_DIR", os.path.expanduser("~/.cache/tengine_tpu")
        )
        os.makedirs(cache, exist_ok=True)
        lib_path = os.path.join(cache, f"libtengine_tpu_capi-{digest}.so")
        if not os.path.exists(lib_path):
            inc = sysconfig.get_paths()["include"]
            libdir = sysconfig.get_config_var("LIBDIR") or "/usr/local/lib"
            pyver = f"python{sysconfig.get_config_var('py_version_short')}"
            tmp = lib_path + ".tmp"
            subprocess.run(
                ["gcc", "-O2", "-fPIC", "-shared", src, f"-I{inc}",
                 f"-L{libdir}", f"-Wl,-rpath,{libdir}", f"-l{pyver}",
                 "-o", tmp],
                check=True, capture_output=True,
            )
            os.replace(tmp, lib_path)
        _CAPI_LIB = lib_path
        return lib_path
    except Exception as e:  # pragma: no cover
        logger.warning("C ABI shim build failed: %s", e)
        return None
