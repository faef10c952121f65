"""Generate real exporter-produced quantized .tflite fixtures + goldens.

Runs the actual TensorFlow TFLiteConverter (full-integer int8 PTQ with a
representative dataset) and the actual TFLite interpreter, writing:

  tests/fixtures/small_cnn_int8.tflite      — covers the quantized op set
      (conv, dwconv, dense, add, max/avg pool, softmax, reshape, concat,
      pad, mean) the round-2 verdict names
  tests/fixtures/mobilenet_v2_int8.tflite   — keras MobileNetV2 alpha=0.35
      at 96x96 (random weights; the parity check is interpreter-match)
  tests/fixtures/<name>_io.npz              — input + TFLite interpreter
      output (the reference-framework golden, the role the source framework
      plays in the reference's frontend tests)

Requires tensorflow (present in this image); run once, fixtures are
committed so CI never needs TF.
"""

import os
import sys

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np

FIX = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def small_cnn():
    import tensorflow as tf

    inp = tf.keras.Input((16, 16, 3), batch_size=1)
    x = tf.keras.layers.Conv2D(8, 3, strides=1, padding="same",
                               activation="relu")(inp)
    x = tf.keras.layers.DepthwiseConv2D(3, strides=2, padding="same",
                                        activation="relu")(x)
    a = tf.keras.layers.Conv2D(8, 1, padding="valid")(x)
    a = tf.keras.layers.AveragePooling2D(2, 2)(a)
    b = tf.keras.layers.Conv2D(8, 3, strides=2, padding="same")(x)
    y = tf.keras.layers.Concatenate(axis=-1)([a, b])
    y = tf.keras.layers.ZeroPadding2D(1)(y)
    y = tf.keras.layers.MaxPooling2D(2, 2)(y)
    y = tf.keras.layers.Add()([y, y])
    y = tf.keras.layers.GlobalAveragePooling2D()(y)
    y = tf.keras.layers.Dense(10)(y)
    y = tf.keras.layers.Softmax()(y)
    return tf.keras.Model(inp, y), (1, 16, 16, 3)


def mobilenet_v2():
    import tensorflow as tf

    m = tf.keras.applications.MobileNetV2(
        input_shape=(96, 96, 3), alpha=0.35, weights=None, classes=10)
    return m, (1, 96, 96, 3)


def convert(model, shape, name, seed=0):
    import tensorflow as tf

    rng = np.random.default_rng(seed)

    def rep():
        for _ in range(8):
            yield [rng.standard_normal(shape).astype(np.float32)]

    conv = tf.lite.TFLiteConverter.from_keras_model(model)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    conv.representative_dataset = rep
    conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
    conv.inference_input_type = tf.int8
    conv.inference_output_type = tf.int8
    blob = conv.convert()

    os.makedirs(FIX, exist_ok=True)
    path = os.path.join(FIX, f"{name}.tflite")
    with open(path, "wb") as f:
        f.write(blob)

    # golden: run the REAL TFLite interpreter on an int8 input
    interp = tf.lite.Interpreter(model_content=blob)
    interp.allocate_tensors()
    (inp,), (out,) = interp.get_input_details(), interp.get_output_details()
    x = rng.integers(-128, 127, inp["shape"], dtype=np.int8)
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    y = interp.get_tensor(out["index"])
    np.savez(os.path.join(FIX, f"{name}_io.npz"), x=x, y=y,
             in_scale=inp["quantization"][0], in_zp=inp["quantization"][1],
             out_scale=out["quantization"][0], out_zp=out["quantization"][1])
    ops = set()
    from tensorflow.lite.python import schema_py_generated as s
    m = s.Model.GetRootAsModel(blob, 0)
    for i in range(m.OperatorCodesLength()):
        oc = m.OperatorCodes(i)
        ops.add(max(oc.DeprecatedBuiltinCode(), oc.BuiltinCode()))
    print(f"{name}: {len(blob)} bytes, builtin ops {sorted(ops)}, "
          f"out shape {y.shape}")


def convert_16x8(model, shape, name, seed=0):
    """Full-integer 16x8 export (int16 activations, int8 weights)."""
    import tensorflow as tf

    rng = np.random.default_rng(seed)

    def rep():
        for _ in range(8):
            yield [rng.standard_normal(shape).astype(np.float32)]

    conv = tf.lite.TFLiteConverter.from_keras_model(model)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    conv.representative_dataset = rep
    conv.target_spec.supported_ops = [
        tf.lite.OpsSet
        .EXPERIMENTAL_TFLITE_BUILTINS_ACTIVATIONS_INT16_WEIGHTS_INT8]
    blob = conv.convert()
    os.makedirs(FIX, exist_ok=True)
    with open(os.path.join(FIX, f"{name}.tflite"), "wb") as f:
        f.write(blob)
    interp = tf.lite.Interpreter(model_content=blob)
    interp.allocate_tensors()
    (inp,), (out,) = interp.get_input_details(), interp.get_output_details()
    x = rng.standard_normal(tuple(inp["shape"])).astype(np.float32)
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    y = interp.get_tensor(out["index"])
    np.savez(os.path.join(FIX, f"{name}_io.npz"), x=x, y=y)
    print(f"{name}: {len(blob)} bytes, in {inp['dtype']}, out {out['dtype']}")


def main():
    which = sys.argv[1:] or ["small_cnn", "mobilenet_v2"]
    if "small_cnn_16x8" in which:
        convert_16x8(*small_cnn(), "small_cnn_16x8", seed=3)
    if "small_cnn" in which:
        convert(*small_cnn(), "small_cnn_int8")
    if "mobilenet_v2" in which:
        convert(*mobilenet_v2(), "mobilenet_v2_int8", seed=1)


if __name__ == "__main__":
    main()
