"""Semi-/partial-supervision components.

Reference inventory (SURVEY.md §2a): MultiSteamDetector teacher/student
container (nuhtc/models/multi_stream_detector.py:5), MaskRCNN_Cus
(mask_rcnn_part.py:11) and RoIHead_Partial (roi_head_partial.py:9) for the
NuCLS partial-mask training path, plus the MeanTeacher EMA hook
(nuhtc/utils/hooks/mean_teacher.py:8).

In the functional JAX design the teacher/student pair is two parameter trees
over ONE module; the teacher is updated by EMA and generates pseudo labels
under stop_gradient.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from nuhtc_tpu.registry import DETECTORS


class TeacherStudentState(NamedTuple):
    student_params: Any
    teacher_params: Any


def mean_teacher_update(state: TeacherStudentState, momentum: float = 0.999) -> TeacherStudentState:
    """EMA teacher update (reference MeanTeacher hook)."""
    new_teacher = jax.tree.map(
        lambda t, s: momentum * t + (1.0 - momentum) * s,
        state.teacher_params,
        state.student_params,
    )
    return TeacherStudentState(state.student_params, new_teacher)


@DETECTORS.register()
class MultiStreamDetector:
    """Teacher/student container over a shared detector module.

    ``pseudo_label`` runs the teacher's inference on the unsupervised batch
    and converts confident detections into training targets.
    """

    def __init__(self, model, score_thr: float = 0.9, max_gt: int = 128):
        self.model = model
        self.score_thr = score_thr
        self.max_gt = max_gt

    def pseudo_label(self, teacher_params, img) -> Dict[str, jnp.ndarray]:
        det = jax.lax.stop_gradient(self.model.apply(teacher_params, img))
        conf = det["valid"] & (det["scores"] >= self.score_thr)
        g = self.max_gt
        boxes = det["boxes"][:, :g] * self.model.scale_factor  # back to input frame
        return dict(
            gt_boxes=jnp.where(conf[:, :g, None], boxes, 0.0),
            gt_labels=jnp.where(conf[:, :g], det["labels"][:, :g], 0).astype(jnp.int32),
            gt_valid=conf[:, :g],
        )

    def semi_loss(
        self,
        student_params,
        teacher_params,
        sup_batch: Dict[str, jnp.ndarray],
        unsup_img,
        cum_samples,
        unsup_weight: float = 1.0,
        rngs=None,
        unsup_img_teacher=None,
        weighter=None,
        step=None,
    ):
        """``unsup_img`` is the student (strong-aug) branch; pseudo labels
        come from ``unsup_img_teacher`` (weak aug) when given — the reference
        MultiBranch unsup_teacher/unsup_student split (configs/nuhtc/
        base.py:180-186). The two branches must be geometrically aligned
        (photometric-only divergence), which our MultiBranch pipeline
        guarantees by sharing the geometric ops across branches."""
        sup_losses, cum = self.model.apply(
            student_params, sup_batch["img"], sup_batch, cum_samples,
            method="compute_losses", rngs=rngs,
        )
        pseudo = self.pseudo_label(
            teacher_params, unsup_img if unsup_img_teacher is None else unsup_img_teacher
        )
        # pseudo batch reuses the supervised mask/semantic targets as empty
        b, g = pseudo["gt_labels"].shape
        patch = jnp.zeros((b, g, 64, 64), jnp.float32)
        sem = jnp.zeros((b, unsup_img.shape[1] // 4, unsup_img.shape[2] // 4), jnp.int32)
        unsup_batch = dict(pseudo, gt_patches=patch, gt_semantic=sem, img=unsup_img)
        unsup_losses, cum = self.model.apply(
            student_params, unsup_img, unsup_batch, cum,
            method="compute_losses", rngs=rngs,
        )
        if weighter is not None:
            # the Weighter hook must act on each branch BEFORE combination:
            # applied to the combined "sup."/"unsup."-prefixed dict it would
            # (a) never match user schedule keys like "s0.loss_cls" and
            # (b) recompute a total that double-counts both branch totals and
            # bypasses burn-in/unsup_weight gating (advisor finding, round 2)
            sup_losses = weighter(sup_losses, step)
            unsup_losses = weighter(unsup_losses, step)
        # unsupervised weighting covers the cls/bbox/RPN terms; key names
        # differ between NuHTC ("s0.loss_*") and MaskRCNN ("loss_*") — sum
        # whichever are present
        zero = sup_losses["total"] * 0.0
        # every cascade stage's cls/obj/bbox terms (NuHTC "sN.loss_*") plus
        # the single-stage ("loss_*") and RPN names — stages 1/2 must get
        # pseudo-label gradient too, not just stage 0
        unsup_keys = tuple(
            k for k in unsup_losses
            if (k.split(".")[-1].startswith("loss_")
                and "mask" not in k and "seg" not in k)
        )
        total = sup_losses["total"] + unsup_weight * sum(
            (unsup_losses.get(k, zero) for k in unsup_keys), zero
        )
        out = {f"sup.{k}": v for k, v in sup_losses.items()}
        out.update({f"unsup.{k}": v for k, v in unsup_losses.items()})
        out["total"] = total
        return out, cum


def partial_mask_loss(mask_probs, mask_targets, ismask, pos_weight):
    """Partial-supervision mask loss (reference RoIHead_Partial /
    PartialDiceLoss): instances flagged ``ismask==0`` (box-only annotations,
    NuCLS) contribute no mask loss."""
    from nuhtc_tpu.models.losses import dice_loss

    w = pos_weight * ismask.astype(jnp.float32)
    return dice_loss(mask_probs, mask_targets, weight=w)
