from .crw import (
    crw_affinity,
    crw_loss,
    palindrome_walk_loss,
    palindrome_walk_loss_unrolled,
)

__all__ = [
    "crw_affinity",
    "crw_loss",
    "palindrome_walk_loss",
    "palindrome_walk_loss_unrolled",
]
