"""yolo_master_tpu — TPU-native (JAX/XLA/Pallas) rebuild of YOLO-Master.

Same capabilities as Tencent/YOLO-Master (reference mounted at /root/reference),
re-designed TPU-first: NHWC feature maps, static shapes everywhere, functional
parameter pytrees, routing as masked/capacity-bounded static dispatch, NMS and
box decode fused on device, scaling via jax.sharding meshes.
"""

__version__ = "0.1.0"

from .nn.tasks import DetectionModel, ClassificationModel

__all__ = ["DetectionModel", "ClassificationModel", "__version__"]
