"""Knowledge distillation (reference: ultralytics/nn/distill_model.py:17-313
DistillationModel + FeatureHook, and the trainer-side distill losses,
engine/trainer.py:565-577).

Functional recast: the teacher is a frozen (stop_grad) model+params pair; the
student's loss gains (a) feature-match MSE at tapped layers (1x1-projected
when channel counts differ) and (b) KL on head class logits.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..nn.module import Context


def default_tap_indices(model) -> List[int]:
    """Tap the detect-head input layers (P3/P4/P5 necks)."""
    head_spec = model.specs[-1]
    return list(head_spec.f) if isinstance(head_spec.f, list) else [len(model.specs) - 2]


def feature_distill_loss(student_feats: Dict[int, jnp.ndarray], teacher_feats: Dict[int, jnp.ndarray]) -> jnp.ndarray:
    """Normalized MSE between matched feature taps; channel mismatch handled by
    comparing channel-mean maps (projection-free; the reference uses hooks +
    adapters, engine/extensions/adapters.py distill path)."""
    total = jnp.zeros(())
    for i, sf in student_feats.items():
        tf_ = jax.lax.stop_gradient(teacher_feats[i])
        if sf.shape[-1] != tf_.shape[-1]:
            sf = jnp.mean(sf, -1, keepdims=True)
            tf_ = jnp.mean(tf_, -1, keepdims=True)
        sf32 = sf.astype(jnp.float32)
        tf32 = tf_.astype(jnp.float32)
        sf32 = sf32 / (jnp.std(sf32) + 1e-6)
        tf32 = tf32 / (jnp.std(tf32) + 1e-6)
        total = total + jnp.mean((sf32 - tf32) ** 2)
    return total / max(len(student_feats), 1)


def logit_distill_loss(student_scores: jnp.ndarray, teacher_scores: jnp.ndarray, temperature: float = 2.0) -> jnp.ndarray:
    """Binary KL between sigmoid class maps (detection heads use BCE logits)."""
    t = temperature
    ps = jax.nn.sigmoid(student_scores.astype(jnp.float32) / t)
    pt = jax.lax.stop_gradient(jax.nn.sigmoid(teacher_scores.astype(jnp.float32) / t))
    eps = 1e-7
    kl = pt * (jnp.log(pt + eps) - jnp.log(ps + eps)) + (1 - pt) * (jnp.log(1 - pt + eps) - jnp.log(1 - ps + eps))
    return jnp.mean(kl) * t * t


class DistillationModel:
    """Pairs a frozen teacher with a student for distilled detection training."""

    def __init__(self, student, student_params_template, teacher, teacher_params,
                 feat_gain: float = 1.0, logit_gain: float = 1.0,
                 tap_indices: Optional[Sequence[int]] = None):
        self.student = student
        self.teacher = teacher
        self.teacher_params = jax.tree_util.tree_map(jax.lax.stop_gradient, teacher_params)
        self.feat_gain = feat_gain
        self.logit_gain = logit_gain
        self.taps_s = list(tap_indices) if tap_indices else default_tap_indices(student)
        self.taps_t = default_tap_indices(teacher)
        assert len(self.taps_s) == len(self.taps_t), "student/teacher tap count mismatch"

    def distill_losses(self, student_params, x, ctx: Context) -> Tuple[jnp.ndarray, dict]:
        s_out, s_feats = self.student.forward_features_with_taps(student_params, x, ctx, set(self.taps_s))
        t_ctx = Context(training=False)
        t_out, t_feats = self.teacher.forward_features_with_taps(self.teacher_params, x, t_ctx, set(self.taps_t))
        s_map = {i: s_feats[si] for i, si in enumerate(self.taps_s)}
        t_map = {i: t_feats[ti] for i, ti in enumerate(self.taps_t)}
        feat = feature_distill_loss(s_map, t_map)
        logit = logit_distill_loss(s_out["one2many"]["scores"], t_out["one2many"]["scores"])
        total = self.feat_gain * feat + self.logit_gain * logit
        return total, {"distill_feat": feat, "distill_logit": logit, "preds": s_out}
