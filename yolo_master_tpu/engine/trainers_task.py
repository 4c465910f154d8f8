"""Per-task trainers (reference: ultralytics/models/yolo/{segment,pose,obb,
classify}/train.py + the task_map dispatch in models/yolo/model.py:88).

Each task reuses the DetectionTrainer loop wholesale — the jitted step already
dispatches to the model's task loss (``model.compute_loss``, nn/tasks.py) and
the batch pytree flows through untouched — so a task trainer only binds its
dataset and validator classes (plus dataset-construction quirks)."""

from __future__ import annotations

from pathlib import Path

from ..data.dataset import (
    ClassificationDataset,
    OBBDataset,
    PoseDataset,
    SegmentDataset,
    SemanticDataset,
)
from .trainer import DetectionTrainer
from .validators_task import (
    ClassificationValidator,
    OBBValidator,
    PoseValidator,
    SegmentationValidator,
    SemanticValidator,
)


class SegmentationTrainer(DetectionTrainer):
    task = "segment"
    dataset_cls = SegmentDataset
    validator_cls = SegmentationValidator


class PoseTrainer(DetectionTrainer):
    task = "pose"
    dataset_cls = PoseDataset
    validator_cls = PoseValidator

    def __init__(self, yolo, data, kpt_shape=None, **kw):
        self.kpt_shape = kpt_shape or getattr(yolo.model, "kpt_shape", (17, 3))
        super().__init__(yolo, data, **kw)

    def _build_dataset(self, data, split):
        return PoseDataset(
            data, split=split, imgsz=self.imgsz, max_gt=self.max_gt,
            augment=split == "train", hyp=self.hyp, kpt_shape=self.kpt_shape,
        )

    def _build_validator(self):
        return PoseValidator(
            model=self.model, data=self.data, imgsz=self.imgsz, batch=min(self.batch, 8),
            max_gt=self.max_gt, kpt_shape=self.kpt_shape,
        )


class OBBTrainer(DetectionTrainer):
    task = "obb"
    dataset_cls = OBBDataset
    validator_cls = OBBValidator


class SemanticTrainer(DetectionTrainer):
    task = "semantic"
    dataset_cls = SemanticDataset
    validator_cls = SemanticValidator

    def _build_dataset(self, data, split):
        return SemanticDataset(data, split=split, imgsz=self.imgsz, augment=split == "train")

    def _build_validator(self):
        return SemanticValidator(model=self.model, data=self.data, imgsz=self.imgsz, batch=min(self.batch, 8))


class ClassificationTrainer(DetectionTrainer):
    """data = a root folder with train/ and val/ class-subfolder splits
    (reference classify convention)."""

    task = "classify"
    dataset_cls = ClassificationDataset
    validator_cls = ClassificationValidator

    def _build_dataset(self, data, split):
        return ClassificationDataset(str(Path(data) / split), imgsz=self.imgsz, augment=split == "train")

    def _build_validator(self):
        return ClassificationValidator(model=self.model, data=self.data, imgsz=self.imgsz, batch=min(self.batch, 16))


class WorldTrainer(DetectionTrainer):
    """YOLO-World open-vocabulary training (reference models/yolo/world/
    train.py + train_world.py): trains a WorldModel on a multimodal or
    grounding dataset, installing the epoch's text vocabulary as head
    ``txt_feats`` before the jitted step (param surgery, same-shape swaps
    re-use the compiled graph)."""

    task = "detect"

    def __init__(self, yolo, data, json_file: str = "", neg_prompts=None,
                 neg_samples: int = 0, text_encoder=None, **kw):
        self.json_file = json_file
        self.neg_prompts = neg_prompts
        self.neg_samples = neg_samples
        self.text_encoder = text_encoder
        super().__init__(yolo, data, **kw)
        if hasattr(self.model, "set_classes"):
            texts = self.train_set.sample_texts(seed=self.seed)
            self.yolo.params = self.model.set_classes(self.yolo.params, texts, encoder=self.text_encoder)
            self.yolo.names = dict(enumerate(texts))

    def _build_dataset(self, data, split):
        from ..data.multimodal import GroundingDataset, YOLOMultiModalDataset

        if self.json_file:
            return GroundingDataset(data, split=split, json_file=self.json_file,
                                    imgsz=self.imgsz, max_gt=self.max_gt,
                                    augment=split == "train", hyp=self.hyp)
        return YOLOMultiModalDataset(data, split=split, imgsz=self.imgsz, max_gt=self.max_gt,
                                     augment=split == "train", hyp=self.hyp,
                                     neg_prompts=self.neg_prompts, neg_samples=self.neg_samples)


TASK_TRAINERS = {
    "detect": DetectionTrainer,
    "world": WorldTrainer,
    "yoloe": WorldTrainer,
    "segment": SegmentationTrainer,
    "pose": PoseTrainer,
    "obb": OBBTrainer,
    "classify": ClassificationTrainer,
    "semantic": SemanticTrainer,
    # RT-DETR trains through the shared loop: detection dataset/validator,
    # the model's compute_loss dispatches to the Hungarian+CDN DETR loss
    "rtdetr": DetectionTrainer,
}
