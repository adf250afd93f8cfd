"""Orbax checkpointing: save AND resume (the reference only saves a final
state_dict, reference: scripts/train.py:89-92; mid-training resume is a
framework addition listed in SURVEY.md §5), plus torch-format export so
checkpoints stay interchangeable with the reference implementation.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax for TrainState trees + torch export."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any, wait: bool = True):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def close(self):
        self._mgr.close()


def save_encoder_torch(variables: dict, path: str):
    """Export encoder weights as a torch state_dict .pt file — the artifact
    format every reference test script loads (reference: scripts/train.py:92,
    scripts/test/test_all.py:54). Written by the TORCH-FREE .pt writer
    (data/torch_pt.py), so the interchange works on a torch-less TPU VM;
    real torch.load opens the result (round-trip tested)."""
    from ..data.torch_pt import save_pt
    from ..models.torch_import import export_state_dict

    host_vars = jax.tree.map(lambda x: np.asarray(x), variables)
    sd = {k: np.ascontiguousarray(v) for k, v in export_state_dict(host_vars).items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_pt(path, sd)
