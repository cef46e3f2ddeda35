"""ptq4vit_tpu — a TPU-native post-training quantization framework for
vision transformers (JAX / XLA / pjit / Pallas).

Built from scratch with the capabilities of hahnyuan/PTQ4ViT: W8A8/W6A6
quantization of ViT / DeiT / Swin without retraining, via a parallel
calibration paradigm, a Hessian-guided candidate metric, twin-uniform
quantization of post-Softmax / post-GELU activations, and a batched grid
search over scale-factor candidates executed as int8 matmuls on the MXU.
"""

__version__ = "0.1.0"

from .api import quantize  # noqa: E402,F401
