"""sg2im-tpu: a TPU-native JAX/XLA/Pallas framework for image generation from
scene graphs, with the full capabilities of the google/sg2im reference
(Johnson, Gupta & Fei-Fei, "Image Generation from Scene Graphs", CVPR 2018).

This is a ground-up TPU-first redesign, not a port:

- The differentiable spatial ops (reference ``sg2im/layout.py``,
  ``sg2im/bilinear.py``) are reformulated as *separable tent-weight matmuls*
  that run entirely on the MXU — no gather/scatter (see ``sg2im_tpu.ops``).
- Graph convolution scatter-add pooling (reference ``sg2im/graph.py:92-114``)
  becomes a batched one-hot matmul over padded per-image graphs.
- Ragged ``obj_to_img`` batching (reference ``sg2im/data/coco.py:376-419``)
  becomes static-shape padded ``GraphBatch`` tensors that XLA can compile once.
- The GAN training loop (reference ``scripts/train.py``) is a single jitted
  train step (generator + both discriminators + three optax optimizers) that
  shards over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps bare ``import sg2im_tpu`` dependency-light)."""
    if name == "InferenceEngine":
        from sg2im_tpu.inference import InferenceEngine

        return InferenceEngine
    if name == "Trainer":
        from sg2im_tpu.train.trainer import Trainer

        return Trainer
    if name == "TrainConfig":
        from sg2im_tpu.train.config import TrainConfig

        return TrainConfig
    if name == "Sg2ImGenerator":
        from sg2im_tpu.models import Sg2ImGenerator

        return Sg2ImGenerator
    raise AttributeError(f"module 'sg2im_tpu' has no attribute '{name}'")
