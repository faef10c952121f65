"""Model importers (the relay.frontend surface, SURVEY.md §2.6).

Available: from_torch (torch.fx), from_onnx (in-tree protobuf codec),
from_tflite (prequantized int8; in-tree flatbuffer reader).
TF/TFLite/Keras/MXNet/... importers are intentionally absent: those source
frameworks are not installed in the target environment, so their importers
could not be validated; export such models to ONNX and use from_onnx.
"""

from .onnx import from_onnx
from .tflite import from_tflite
from .torch_fx import from_torch

__all__ = ["from_onnx", "from_tflite", "from_torch"]
