"""TensorFlow front-end: frozen GraphDef (.pb) -> IR Graph.

Reference: tools/convert_tool/tf/tf2tengine.cpp (GraphDef importer). Uses
the installed tensorflow package only for protobuf parsing and constant
decoding (tf.make_ndarray) — no TF runtime execution.

TF graphs are NHWC; the IR is NCHW-semantic (tmfile convention), so the
importer transposes the input shape and conv weights (HWIO -> OIHW,
depthwise HWCM -> [C*M,1,kh,kw]) and maps SAME padding to the IR's pad=-1
TF-SAME convention (ops/lowering.py:_conv_pads).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..graph.ir import DType, Graph, TensorType
from ..serializer.tm2.format import ELT_SUM, ELT_PROD


def _attr_list(node, name):
    return list(getattr(node.attr[name].list, "i", []))


def from_tf_graphdef(path_or_bytes, input_shape: Optional[List[int]] = None) -> Graph:
    """Import a frozen GraphDef. input_shape is NCHW (IR convention); when
    absent, the Placeholder's NHWC shape is transposed (unknown dims -> 1).

    Supported ops: Placeholder/Const/Identity, Conv2D,
    DepthwiseConv2dNative, BiasAdd, FusedBatchNorm(V2/V3), Relu/Relu6/
    LeakyRelu/Sigmoid/Tanh/Softmax, MaxPool/AvgPool/Mean(H,W), MatMul,
    Add/AddV2/Mul, ConcatV2, Reshape, Pad.
    """
    import tensorflow as tf

    gd = tf.compat.v1.GraphDef()
    if isinstance(path_or_bytes, (bytes, bytearray)):
        gd.ParseFromString(bytes(path_or_bytes))
    else:
        with open(path_or_bytes, "rb") as f:
            gd.ParseFromString(f.read())

    g = Graph(name="tf", source_format="tensorflow")
    env: Dict[str, int] = {}
    const_vals: Dict[str, np.ndarray] = {}
    consumed_by_graph_out: List[str] = []

    def const(name: str, arr: np.ndarray) -> int:
        arr = np.ascontiguousarray(arr)
        if arr.dtype == np.int64:
            arr = arr.astype(np.int32)
        if arr.dtype == np.float64:
            arr = arr.astype(np.float32)
        t = g.add_tensor(name, DType.FP32 if arr.dtype == np.float32 else DType.INT32,
                         list(arr.shape), TensorType.CONST, data=arr)
        return t.idx

    def var(name: str) -> int:
        return g.add_tensor(name, DType.FP32, [], TensorType.VAR).idx

    def emit(op: str, name: str, inputs: List[int], params: Optional[dict] = None) -> int:
        out = var(name)
        g.add_node(op, name, inputs, [out], params=params or {})
        env[name] = out
        return out

    def ref(name: str) -> str:
        # strip :0 port and ^control deps
        return name.split(":")[0].lstrip("^")

    def inp(node, i: int = 0) -> int:
        nm = ref(node.input[i])
        if nm in env:
            return env[nm]
        if nm in const_vals:
            arr = const_vals[nm]
            if getattr(arr, "ndim", 0) == 4:
                # TF consts are NHWC; activations in the IR are NCHW
                arr = np.ascontiguousarray(np.transpose(arr, (0, 3, 1, 2)))
            env[nm] = const(nm, arr)
            return env[nm]
        raise KeyError(f"tf value {nm!r} referenced before definition")

    def cval(node, i: int) -> Optional[np.ndarray]:
        return const_vals.get(ref(node.input[i]))

    def conv_params(node, w_oihw, group):
        strides = list(node.attr["strides"].list.i)  # NHWC
        pad = node.attr["padding"].s.decode()
        pv = -1 if pad == "SAME" else 0
        dil = list(node.attr["dilations"].list.i) or [1, 1, 1, 1]
        return dict(
            kernel_h=int(w_oihw.shape[2]), kernel_w=int(w_oihw.shape[3]),
            stride_h=int(strides[1]), stride_w=int(strides[2]),
            dilation_h=int(dil[1]), dilation_w=int(dil[2]),
            input_channel=int(w_oihw.shape[1] * group),
            output_channel=int(w_oihw.shape[0]),
            group=group, activation=-1,
            pad_h0=pv, pad_h1=pv, pad_w0=pv, pad_w1=pv,
        )

    for node in gd.node:
        op = node.op
        name = node.name

        if op == "Const":
            import tensorflow as tf

            const_vals[name] = tf.make_ndarray(node.attr["value"].tensor)
        elif op == "Placeholder":
            if input_shape:
                shape = list(input_shape)
            else:
                dims = [d.size for d in node.attr["shape"].shape.dim]
                dims = [1 if d < 0 else d for d in (dims or [1, 224, 224, 3])]
                shape = [dims[0], dims[3], dims[1], dims[2]]  # NHWC -> NCHW
            t = g.add_tensor(name, DType.FP32, shape, TensorType.INPUT)
            n = g.add_node("InputOp", name, [], [t.idx])
            g.inputs.append(n.idx)
            env[name] = t.idx
        elif op in ("Identity", "NoOp", "CheckNumerics", "StopGradient"):
            if node.input:
                nm = ref(node.input[0])
                if nm in const_vals:
                    const_vals[name] = const_vals[nm]
                elif nm in env:
                    env[name] = env[nm]
        elif op == "Conv2D":
            w = cval(node, 1)  # HWIO
            w_oihw = np.ascontiguousarray(w.transpose(3, 2, 0, 1))
            emit("Convolution", name, [inp(node, 0), const(f"{name}/w", w_oihw)],
                 conv_params(node, w_oihw, 1))
        elif op == "DepthwiseConv2dNative":
            w = cval(node, 1)  # [kh,kw,C,M]
            kh, kw, C, M = w.shape
            w_oihw = np.ascontiguousarray(
                w.transpose(2, 3, 0, 1).reshape(C * M, 1, kh, kw)
            )
            emit("Convolution", name, [inp(node, 0), const(f"{name}/w", w_oihw)],
                 conv_params(node, w_oihw, C))
        elif op == "BiasAdd":
            # fold into the producing conv when possible, else Eltwise add
            src = g.tensors[inp(node, 0)]
            prod = g.nodes[src.producer] if src.producer is not None else None
            b = cval(node, 1)
            if prod is not None and prod.op in ("Convolution", "FullyConnected") and len(prod.inputs) == 2:
                prod.inputs.append(const(f"{name}/b", b))
                g.tensors[prod.inputs[-1]].consumers.append(prod.idx)
                env[name] = src.idx
            else:
                emit("Eltwise", name, [inp(node, 0), const(f"{name}/b", b)],
                     dict(type=ELT_SUM, caffe_flavor=0, shift=0.0, power=1.0, scale=1.0))
        elif op in ("FusedBatchNorm", "FusedBatchNormV2", "FusedBatchNormV3"):
            ins = [inp(node, i) for i in range(5)]  # x, gamma, beta, mean, var
            emit("BatchNormalization", name, ins, dict(
                rescale_factor=1.0, eps=float(node.attr["epsilon"].f or 1e-5),
                caffe_flavor=0))
        elif op == "Relu":
            emit("ReLu", name, [inp(node)], dict(negative_slope=0.0))
        elif op == "Relu6":
            emit("ReLu6", name, [inp(node)])
        elif op == "LeakyRelu":
            emit("ReLu", name, [inp(node)],
                 dict(negative_slope=float(node.attr["alpha"].f)))
        elif op == "Sigmoid":
            emit("Sigmoid", name, [inp(node)])
        elif op == "Tanh":
            emit("Tanh", name, [inp(node)])
        elif op == "Softmax":
            emit("Softmax", name, [inp(node)], dict(axis=1))
        elif op in ("MaxPool", "AvgPool"):
            k = list(node.attr["ksize"].list.i)
            s = list(node.attr["strides"].list.i)
            pad = node.attr["padding"].s.decode()
            caffe = 2 if pad == "SAME" else 0
            # SAME pooling: emulate with symmetric semantics via caffe_flavor 2
            # (tf-style) handled by _pool paths; VALID -> zero pads
            emit("Pooling", name, [inp(node)], dict(
                alg=0 if op == "MaxPool" else 1,
                kernel_h=int(k[1]), kernel_w=int(k[2]),
                stride_h=int(s[1]), stride_w=int(s[2]),
                global_pool=0, caffe_flavor=0,
                pad_h0=0, pad_h1=0, pad_w0=0, pad_w1=0)
                 if pad == "VALID" else dict(
                alg=0 if op == "MaxPool" else 1,
                kernel_h=int(k[1]), kernel_w=int(k[2]),
                stride_h=int(s[1]), stride_w=int(s[2]),
                global_pool=0, caffe_flavor=0,
                pad_h0=-1, pad_h1=-1, pad_w0=-1, pad_w1=-1))
        elif op == "Mean":
            axes = cval(node, 1)
            if axes is not None and sorted(int(a) for a in np.asarray(axes).reshape(-1)) == [1, 2]:
                emit("Pooling", name, [inp(node, 0)], dict(
                    alg=1, kernel_h=0, kernel_w=0, stride_h=1, stride_w=1,
                    global_pool=1, caffe_flavor=0,
                    pad_h0=0, pad_h1=0, pad_w0=0, pad_w1=0))
                if not node.attr["keep_dims"].b:
                    prev = env[name]
                    emit("Flatten", f"{name}/flat", [prev], dict(axis=1, end_axis=-1))
                    env[name] = env[f"{name}/flat"]
            else:
                raise NotImplementedError("tf Mean over non-HW axes")
        elif op == "MatMul":
            w = cval(node, 1)
            if w is None:
                raise NotImplementedError("MatMul with non-const rhs")
            if not node.attr["transpose_b"].b:
                w = np.ascontiguousarray(w.T)  # -> [out, in]
            emit("FullyConnected", name, [inp(node, 0), const(f"{name}/w", w)],
                 dict(num_output=int(w.shape[0])))
        elif op in ("Add", "AddV2", "Mul", "Sub", "RealDiv", "Pow", "Minimum",
                    "Maximum"):
            from ..serializer.tm2.format import ELT_DIV, ELT_MAX, ELT_POW, ELT_SUB

            if op in ("Minimum", "Maximum") and op == "Minimum":
                ins = [inp(node, 0), inp(node, 1)]
                emit("Minimum", name, ins)
            else:
                emap = {"Add": ELT_SUM, "AddV2": ELT_SUM, "Mul": ELT_PROD,
                        "Sub": ELT_SUB, "RealDiv": ELT_DIV, "Pow": ELT_POW,
                        "Maximum": ELT_MAX}
                ins = []
                for i in range(2):
                    nm = ref(node.input[i])
                    ins.append(env[nm] if nm in env else inp(node, i))
                emit("Eltwise", name, ins, dict(
                    type=emap[op],
                    caffe_flavor=0, shift=0.0, power=1.0, scale=1.0))
        elif op == "AddN":
            ins = [inp(node, i) for i in range(len(node.input))]
            emit("Addn", name, ins, dict(axis=0))
        elif op in ("Exp", "Log", "Sqrt", "Rsqrt", "Abs", "Neg", "Floor",
                    "Ceil", "Square", "Sin", "Cos", "Reciprocal"):
            # unary_param.h types (the reference maps these to OP_ELTWISE;
            # our Unary op carries the same math)
            tmap = {"Abs": 0, "Neg": 1, "Floor": 2, "Ceil": 3, "Square": 4,
                    "Sqrt": 5, "Rsqrt": 6, "Exp": 7, "Log": 8, "Sin": 9,
                    "Cos": 10, "Reciprocal": 15}
            emit("Unary", name, [inp(node, 0)], dict(type=tmap[op]))
        elif op == "ConcatV2":
            n_in = len(node.input) - 1  # last input is the axis
            axis = int(np.asarray(cval(node, n_in)).reshape(()))
            # NHWC axis -> NCHW axis
            axis = {0: 0, 1: 2, 2: 3, 3: 1}.get(axis, axis)
            emit("Concat", name, [inp(node, i) for i in range(n_in)], dict(axis=axis))
        elif op == "Reshape":
            shp = cval(node, 1)
            shape = [int(v) for v in np.asarray(shp).reshape(-1)]
            emit("Reshape", name, [inp(node, 0)],
                 dict(shape=shape, is_onnx=1, is_mxnet=0, reverse=0))
        elif op == "Pad":
            pads = np.asarray(cval(node, 1)).reshape(-1, 2)  # NHWC rows
            emit("Pad", name, [inp(node, 0)], dict(
                mode=0, value=0.0,
                pad_n_0=int(pads[0, 0]), pad_n_1=int(pads[0, 1]),
                pad_c_0=int(pads[3, 0]), pad_c_1=int(pads[3, 1]),
                pad_h_0=int(pads[1, 0]), pad_h_1=int(pads[1, 1]),
                pad_w_0=int(pads[2, 0]), pad_w_1=int(pads[2, 1])))
        else:
            raise NotImplementedError(f"tf op {op!r} (node {name!r})")

    # graph outputs: nodes whose output nothing consumes
    consumed = set()
    for n in g.nodes:
        consumed.update(n.inputs)
    for n in g.nodes:
        if n.op in ("InputOp",) or not n.outputs:
            continue
        if not any(t in consumed for t in n.outputs):
            g.outputs.append(n.idx)
    return g
