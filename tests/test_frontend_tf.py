"""TF / Keras frontends: run TensorFlow itself as the golden.

Mirrors the reference's frontend test pattern
(`/root/reference/tests/python/frontend/tensorflow/test_forward.py`,
`test_forward.py` for keras): build the model in the source framework,
execute it there, import, execute here, compare.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from tachikoma_tpu import run_graph
from tachikoma_tpu.frontend.keras import from_keras
from tachikoma_tpu.frontend.tensorflow import from_tf_function
from tachikoma_tpu.runtime.executor import run_graph_jax

RTOL, ATOL = 2e-4, 2e-5


def _compare(g, feeds, want, rtol=RTOL, atol=ATOL):
    got = run_graph(g, feeds)
    got_jax = run_graph_jax(g, feeds)
    for gv, jv, wv in zip(got, got_jax, [want] if isinstance(want, np.ndarray) else want):
        np.testing.assert_allclose(gv, wv, rtol=rtol, atol=atol)
        np.testing.assert_allclose(jv, wv, rtol=rtol, atol=atol)


def test_tf_function_mlp():
    w1 = np.random.RandomState(0).randn(16, 32).astype(np.float32)
    b1 = np.random.RandomState(1).randn(32).astype(np.float32)
    w2 = np.random.RandomState(2).randn(32, 8).astype(np.float32)

    def f(x):
        h = tf.nn.relu(tf.matmul(x, w1) + b1)
        return tf.nn.softmax(tf.matmul(h, w2))

    x = np.random.RandomState(3).randn(4, 16).astype(np.float32)
    g = from_tf_function(f, [((4, 16), "float32")])
    _compare(g, {g.inputs[0].name: x}, f(tf.constant(x)).numpy())


def test_tf_function_conv_same_stride2():
    w = np.random.RandomState(0).randn(3, 3, 3, 8).astype(np.float32) * 0.2

    def f(x):
        y = tf.nn.conv2d(x, w, strides=[1, 2, 2, 1], padding="SAME")
        return tf.nn.relu6(y)

    x = np.random.RandomState(1).randn(2, 9, 9, 3).astype(np.float32)
    g = from_tf_function(f, [((2, 9, 9, 3), "float32")])
    _compare(g, {g.inputs[0].name: x}, f(tf.constant(x)).numpy())


def test_tf_function_depthwise_pool_mean():
    w = np.random.RandomState(0).randn(3, 3, 4, 2).astype(np.float32) * 0.3

    def f(x):
        y = tf.nn.depthwise_conv2d(x, w, strides=[1, 1, 1, 1], padding="SAME")
        y = tf.nn.max_pool2d(y, 2, 2, "VALID")
        return tf.reduce_mean(y, axis=[1, 2])

    x = np.random.RandomState(1).randn(2, 8, 8, 4).astype(np.float32)
    g = from_tf_function(f, [((2, 8, 8, 4), "float32")])
    _compare(g, {g.inputs[0].name: x}, f(tf.constant(x)).numpy())


def test_tf_shape_subgraph_constant_folds():
    """Shape -> StridedSlice -> Pack -> Reshape folds at import (TF2
    graphs are full of these; the reference partially evaluates them)."""

    def f(x):
        s = tf.shape(x)
        return tf.reshape(x, [s[0], s[1] * s[2] * s[3]])

    x = np.random.RandomState(1).randn(2, 4, 4, 3).astype(np.float32)
    g = from_tf_function(f, [((2, 4, 4, 3), "float32")])
    assert all(n.op != "shape_of" for n in g.nodes)
    _compare(g, {g.inputs[0].name: x}, f(tf.constant(x)).numpy())


def test_tf_elementwise_zoo():
    def f(x):
        a = tf.sigmoid(x) + tf.tanh(x) * tf.exp(-tf.abs(x))
        b = tf.sqrt(tf.nn.softplus(x)) - tf.math.rsqrt(1.0 + tf.square(x))
        return tf.where(x > 0.0, a, b)

    x = np.random.RandomState(1).randn(3, 17).astype(np.float32)
    g = from_tf_function(f, [((3, 17), "float32")])
    _compare(g, {g.inputs[0].name: x}, f(tf.constant(x)).numpy())


def test_tf_strided_slice_shrink_and_concat():
    def f(x):
        head = x[:, 0]                       # shrink axis
        tail = x[:, 1:, ::2]
        flat = tf.reshape(tail, [int(tail.shape[0]), -1])
        return tf.concat([head, flat], axis=1)

    x = np.random.RandomState(1).randn(2, 5, 6).astype(np.float32)
    g = from_tf_function(f, [((2, 5, 6), "float32")])
    _compare(g, {g.inputs[0].name: x}, f(tf.constant(x)).numpy())


def _keras_cnn():
    L = tf.keras.layers
    return tf.keras.Sequential([
        L.Input((16, 16, 3)),
        L.Conv2D(8, 3, padding="same"),
        L.BatchNormalization(),
        L.ReLU(),
        L.DepthwiseConv2D(3, strides=2, padding="same"),
        L.Conv2D(16, 1),
        L.GlobalAveragePooling2D(),
        L.Dense(10, activation="softmax"),
    ])


def test_keras_sequential_cnn():
    m = _keras_cnn()
    x = np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32)
    g = from_keras(m, batch=2)
    want = m(x, training=False).numpy()
    _compare(g, {g.inputs[0].name: x}, want)


def test_keras_functional_residual():
    L = tf.keras.layers
    inp = tf.keras.Input((10, 10, 4))
    y = L.Conv2D(4, 3, padding="same")(inp)
    y = L.Add()([y, inp])
    y = L.LayerNormalization()(y)
    z = L.Concatenate()([y, inp])
    out = L.AveragePooling2D(2)(z)
    m = tf.keras.Model(inp, out)
    x = np.random.RandomState(0).randn(2, 10, 10, 4).astype(np.float32)
    g = from_keras(m, batch=2)
    want = m(x, training=False).numpy()
    _compare(g, {g.inputs[0].name: x}, want)


def test_keras_saved_file_roundtrip(tmp_path):
    m = _keras_cnn()
    path = str(tmp_path / "model.keras")
    m.save(path)
    x = np.random.RandomState(0).randn(1, 16, 16, 3).astype(np.float32)
    g = from_keras(path)
    want = m(x, training=False).numpy()
    _compare(g, {g.inputs[0].name: x}, want)


def test_keras_mobilenetv2_random_init():
    """Full keras.applications MobileNetV2 topology (random weights —
    no downloads): 105 layers of conv/dwconv/BN/relu6/residual."""
    m = tf.keras.applications.MobileNetV2(
        input_shape=(96, 96, 3), weights=None, classes=10)
    x = np.random.RandomState(0).rand(1, 96, 96, 3).astype(np.float32)
    g = from_keras(m)
    want = m(x, training=False).numpy()
    got = run_graph(g, {g.inputs[0].name: x})[0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    got_jax = run_graph_jax(g, {g.inputs[0].name: x})[0]
    np.testing.assert_allclose(got_jax, want, rtol=1e-3, atol=1e-4)


def test_tf_import_then_quantize():
    """Imported Keras model runs through the standard int8 pipeline."""
    from tachikoma_tpu.quantize.quantizer import quantize

    m = _keras_cnn()
    x = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    g = from_keras(m, batch=2)
    data = [{g.inputs[0].name: x}]
    qg = quantize(g, data)
    fout = run_graph(g, data[0])[0]
    qout = run_graph(qg, data[0])[0]
    # int8 PTQ on a random-weight net: coarse agreement is the contract
    assert np.mean(np.argmax(fout, -1) == np.argmax(qout, -1)) >= 0.5


@pytest.mark.parametrize("build", [
    lambda L: [L.Input((7, 7, 4)), L.Conv2DTranspose(6, 3, strides=2, padding="same")],
    lambda L: [L.Input((5,)), L.Dense(8, activation="elu"),
               L.Dense(4, activation="selu")],
    lambda L: [L.Input((6, 6, 3)), L.UpSampling2D(2)],
    lambda L: [L.Input((9,)), L.Dense(6), L.LeakyReLU(0.1)],
], ids=["conv_transpose", "elu_selu", "upsample", "leaky_relu"])
def test_keras_layer_zoo(build):
    m = tf.keras.Sequential(build(tf.keras.layers))
    x = np.random.RandomState(0).randn(2, *m.input_shape[1:]).astype(np.float32)
    g = from_keras(m, batch=2)
    want = m(x, training=False).numpy()
    _compare(g, {g.inputs[0].name: x}, want)


def test_saved_model_roundtrip(tmp_path):
    L = tf.keras.layers
    m = tf.keras.Sequential([
        L.Input((8, 8, 3)), L.Conv2D(4, 3, activation="relu"),
        L.Flatten(), L.Dense(5)])
    path = str(tmp_path / "sm")
    tf.saved_model.save(
        m, path,
        signatures=tf.function(lambda x: m(x)).get_concrete_function(
            tf.TensorSpec((1, 8, 8, 3), tf.float32)))
    from tachikoma_tpu.frontend.tensorflow import from_saved_model

    g = from_saved_model(path)
    x = np.random.RandomState(0).randn(1, 8, 8, 3).astype(np.float32)
    want = m(x, training=False).numpy()
    _compare(g, {g.inputs[0].name: x}, want)
