from .propagate import PropagationPipeline, PropagateResult, encode_sequence
from .correction import correction_pixel_offset, splice_correction
from .integrate import integrate_bidirectional, reverse_unfold_flip

__all__ = [
    "PropagationPipeline",
    "PropagateResult",
    "encode_sequence",
    "correction_pixel_offset",
    "splice_correction",
    "integrate_bidirectional",
    "reverse_unfold_flip",
]
