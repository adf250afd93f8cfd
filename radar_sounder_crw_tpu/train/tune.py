"""Hyperparameter search: random sampling + ASHA-style successive halving.

Capability match of the reference's Ray Tune path
(reference: scripts/train.py:107-146 — tune.choice grids, ASHAScheduler with
max_t/grace_period/reduction_factor, num_samples, per-trial checkpoints and
a best-trial report) without the Ray dependency, which doesn't belong on TPU
hosts. Trials run sequentially in-process (each is a jitted SPMD program
that already saturates the chip; reference trials were likewise one GPU
each), with rung-based early stopping: all trials run `grace_period` epochs,
the top 1/reduction_factor advance per rung until max_t.

The reference's post-hoc metric swap (loss <-> time_this_iter_s,
scripts/train.py:142-143) is NOT reproduced: best trial is selected by loss.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Sequence

import numpy as np


@dataclasses.dataclass
class Trial:
    config: dict
    trainer: Any = None
    losses: list = dataclasses.field(default_factory=list)
    epoch_times: list = dataclasses.field(default_factory=list)
    epochs_done: int = 0
    alive: bool = True

    @property
    def last_loss(self) -> float:
        return self.losses[-1] if self.losses else float("inf")


def sample_configs(space: dict[str, Sequence], num_samples: int, seed: int = 0):
    """Random search over a {name: choices} space (tune.choice equivalent)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num_samples):
        out.append({k: v[rng.integers(len(v))] for k, v in space.items()})
    return out


def run_asha(
    make_trainer: Callable[[dict], Any],
    train_epoch: Callable[[Any], float],
    space: dict[str, Sequence],
    num_samples: int = 50,
    max_t: int = 3,
    grace_period: int = 1,
    reduction_factor: int = 2,
    seed: int = 0,
    log: Callable[[str], None] = print,
) -> Trial:
    """Run the search; returns the best Trial (min final loss).

    make_trainer(config) -> trainer object; train_epoch(trainer) -> loss.
    """
    trials = [Trial(config=c) for c in sample_configs(space, num_samples, seed)]

    # rung ladder: grace, grace*rf, grace*rf^2, ..., capped at (and always
    # including) max_t — survivors of the last promotion train to max_t,
    # matching ASHAScheduler's max_t semantics
    rungs: list[int] = []
    budget = grace_period
    while budget < max_t:
        rungs.append(budget)
        budget *= reduction_factor
    rungs.append(max_t)

    for rung_i, rung_budget in enumerate(rungs):
        if not any(t.alive for t in trials):
            break
        for i, t in enumerate(trials):
            if not t.alive:
                continue
            if t.trainer is None:
                t.trainer = make_trainer(t.config)
            while t.epochs_done < rung_budget:
                t0 = time.time()
                loss = float(train_epoch(t.trainer))
                t.epoch_times.append(time.time() - t0)
                t.losses.append(loss)
                t.epochs_done += 1
            log(
                f"[asha] trial {i} rung {rung_budget}: loss={t.last_loss:.5f} "
                f"config={t.config}"
            )
        if rung_i == len(rungs) - 1:
            break  # final rung: no further pruning
        # promote top 1/rf of alive trials
        alive = [t for t in trials if t.alive]
        alive.sort(key=lambda t: t.last_loss)
        keep = max(1, len(alive) // reduction_factor)
        for t in alive[keep:]:
            t.alive = False
            t.trainer = None  # free device memory

    finished = [t for t in trials if t.losses]
    best = min(finished, key=lambda t: t.last_loss)
    log(f"Best trial config: {best.config}")
    log(f"Best trial final validation loss: {best.last_loss}")
    return best
