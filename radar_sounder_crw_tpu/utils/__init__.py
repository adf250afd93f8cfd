from .pos_embed import maybe_pos_embed, pos_embed
from .resize import resize_bilinear_align_corners, resize_nearest

__all__ = [
    "pos_embed",
    "maybe_pos_embed",
    "resize_nearest",
    "resize_bilinear_align_corners",
]
