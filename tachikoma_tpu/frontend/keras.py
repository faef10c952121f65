"""Keras frontend — import Keras 3 models (in memory or .keras/.h5 files).

Parity target: the reference's `relay.frontend.keras`
(`/root/reference/python/tvm/relay/frontend/keras.py:1543 from_keras`),
which walks Keras-1/2 layer objects and re-implements each layer's math.
Keras 3 has no stable layer-graph introspection API (the `_inbound_nodes`
internals the reference relies on churn per release), but it HAS a stable
graph export: every Keras model is a callable that traces through
`tf.function`.  So the TPU-native import path is: trace the model into a
frozen TF GraphDef (variables folded to constants) and convert that with
`frontend/tensorflow.py` — one op-level converter serves both frameworks,
and the imported graph is the model's own executed graph rather than a
re-implementation of layer semantics (no BN-fusion or activation-ordering
divergence possible by construction).

Golden validation mirrors the reference's frontend tests (run Keras as the
oracle, compare outputs — tests/test_frontend_tf.py).
"""

from __future__ import annotations

from ..ir.graph import Graph

__all__ = ["from_keras"]


def from_keras(model_or_path, input_shapes=None, batch: int = 1) -> Graph:
    """Import a Keras model (instance or path to .keras/.h5).

    input_shapes: optional list of concrete per-input shapes (with batch
    dim) overriding the model's declared inputs; otherwise shapes come from
    `model.inputs` with unknown batch dims replaced by `batch`.
    """
    import tensorflow as tf

    from .tensorflow import from_tf_function

    if isinstance(model_or_path, (str, bytes)):
        import keras

        model = keras.models.load_model(model_or_path, compile=False)
    else:
        model = model_or_path

    if input_shapes is None:
        input_shapes = []
        for t in model.inputs:
            shape = [batch if d is None else int(d) for d in t.shape]
            input_shapes.append((shape, t.dtype.name if hasattr(t.dtype, "name") else str(t.dtype)))
    else:
        input_shapes = [
            (list(s), "float32") if not (isinstance(s, tuple) and len(s) == 2
                                         and isinstance(s[1], str)) else s
            for s in input_shapes
        ]

    specs = [tf.TensorSpec(shape, getattr(tf, dtype)) for shape, dtype in input_shapes]
    if len(specs) == 1:
        fn = tf.function(lambda x: model(x, training=False))
        return from_tf_function(fn, specs)
    fn = tf.function(lambda *xs: model(list(xs), training=False))
    return from_tf_function(fn, specs)
