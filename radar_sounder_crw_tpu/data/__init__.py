from .patchify import GridGeometry, unfold2d, window_geometry
from .radargram import ConcatWindows, RGWindows, load_radargram, trim_miguel
from .synthetic import synthetic_radargram
from .registry import create_dataset, get_reference, load_raw_pair, DATASETS
from .torch_pt import load_pt, save_pt

__all__ = [
    "GridGeometry",
    "unfold2d",
    "window_geometry",
    "RGWindows",
    "ConcatWindows",
    "load_radargram",
    "trim_miguel",
    "synthetic_radargram",
    "create_dataset",
    "get_reference",
    "load_raw_pair",
    "DATASETS",
    "load_pt",
    "save_pt",
]
