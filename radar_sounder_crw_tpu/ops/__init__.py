from .crw import (
    crw_affinity,
    crw_loss,
    palindrome_walk_loss,
    palindrome_walk_loss_unrolled,
)
from .labelprop import (
    LabelPropConfig,
    propagate_labels,
    propagate_labels_batched,
    radius_mask,
)
from .xent_metric import column_diffs, horizontality_xent
from .pelt import detect_change_point, pelt_rbf
from .metrics import classification_report, confusion_matrix, miou, per_class_stats

__all__ = [
    "crw_affinity",
    "crw_loss",
    "palindrome_walk_loss",
    "palindrome_walk_loss_unrolled",
    "LabelPropConfig",
    "propagate_labels",
    "propagate_labels_batched",
    "radius_mask",
    "horizontality_xent",
    "column_diffs",
    "detect_change_point",
    "pelt_rbf",
    "classification_report",
    "confusion_matrix",
    "miou",
    "per_class_stats",
]
