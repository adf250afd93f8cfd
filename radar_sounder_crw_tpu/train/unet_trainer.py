"""Supervised UNet baseline trainer (SHARAD strips).

Capability match of the reference UNet experiment
(reference: scripts/test/test_unet.py): unfold the radargram into
full-height strips, one-hot the GT, 90/10 random split, Adam, train, then a
classification report on the held-out strips.

Reference quirk preserved behind a flag (default on for parity): the loss
soft-maxes the logits and then applies softmax cross-entropy on the
*probabilities* (reference: scripts/test/test_unet.py:64-65) — a double
softmax. `quirk_double_softmax=False` trains with standard CE instead.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.unet import UNet
from ..parallel.mesh import batch_sharding, make_mesh, pad_to_multiple, replicated


@dataclasses.dataclass
class UNetTrainConfig:
    patch_size: tuple[int, int] = (912, 64)
    split: float = 0.9
    batch_size: int = 64
    epochs: int = 100
    lr: float = 1e-4
    n_classes: int = 5
    seed: int = 11
    quirk_double_softmax: bool = True
    dtype: object = jnp.float32
    device_resident: bool | None = None  # gather each batch ON device from
    # once-uploaded strips + compact int labels (one-hot rebuilt in-step,
    # bit-identical when y is exactly one-hot — unfold_strips' output). The
    # host path uploads ~B*H*W*(1+n_classes) floats per step (dominated by
    # the one-hot, ~90 MB at the reference config); resident, only (B,)
    # int32 indices cross the link. None = auto (on when y is exactly
    # one-hot); False forces the host path; True raises on soft labels.


class UNetState(struct.PyTreeNode):
    step: jnp.ndarray
    params: object
    batch_stats: object
    opt_state: object


def unfold_strips(rg: np.ndarray, seg: np.ndarray, strip_w: int, n_classes: int):
    """Radargram + GT -> (samples (S, H, W, 1), one-hot (S, H, W, M))
    (reference: scripts/test/test_unet.py:34-40; width-strided unfold)."""
    H, W = rg.shape
    S = W // strip_w
    x = rg[:, : S * strip_w].reshape(H, S, strip_w).transpose(1, 0, 2)
    y = seg[:, : S * strip_w].reshape(H, S, strip_w).transpose(1, 0, 2)
    onehot = np.eye(n_classes, dtype=np.float32)[y.astype(np.int64)]
    return x[..., None].astype(np.float32), onehot


class UNetTrainer:
    def __init__(self, config: UNetTrainConfig, mesh=None):
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh()
        self.model = UNet(
            n_channels=1, n_classes=config.n_classes, bilinear=True, dtype=config.dtype
        )
        self.tx = optax.adam(config.lr)
        repl, bsh = replicated(self.mesh), batch_sharding(self.mesh)
        self._step = jax.jit(
            self._step_fn,
            in_shardings=(repl, bsh, bsh, bsh),
            out_shardings=(repl, None),
            donate_argnums=(0,),
        )
        # partial-batch step: the batch runs replicated instead of padded
        # with duplicated rows, so BatchNorm batch statistics (train mode)
        # stay exactly those of the unpadded batch — same policy as
        # CRWTrainer (crw_trainer.py:_stage)
        self._step_repl = jax.jit(
            self._step_fn,
            in_shardings=(repl, repl, repl, repl),
            out_shardings=(repl, None),
            donate_argnums=(0,),
        )
        self._infer = jax.jit(
            self._infer_fn, in_shardings=(repl, bsh), out_shardings=bsh
        )
        # resident variants: batch gathered from the once-uploaded strip
        # stack by a (B,) index vector — the only per-step host traffic
        self._step_res = jax.jit(
            self._step_res_fn,
            in_shardings=(repl, repl, repl, bsh, bsh),
            out_shardings=(repl, None),
            donate_argnums=(0,),
        )
        self._step_res_repl = jax.jit(
            self._step_res_fn,
            in_shardings=(repl, repl, repl, repl, repl),
            out_shardings=(repl, None),
            donate_argnums=(0,),
        )
        self.state: UNetState | None = None
        self._epoch_idx = 0  # global epoch counter driving shuffle order

    def _loss(self, logits, onehot, weights):
        if self.config.quirk_double_softmax:
            probs = jax.nn.softmax(logits, axis=-1)
            logp = jax.nn.log_softmax(probs, axis=-1)
        else:
            logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -(onehot * logp).sum(-1)  # (B, H, W)
        per_item = ce.mean(axis=(1, 2))
        return jnp.sum(per_item * weights) / jnp.sum(weights)

    def _step_fn(self, state: UNetState, x, y, weights):
        def loss_fn(params):
            logits, updates = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            return self._loss(logits, y, weights), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        return (
            UNetState(
                step=state.step + 1,
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            loss,
        )

    def _step_res_fn(self, state: UNetState, x_all, labels_all, idx, weights):
        x = jnp.take(x_all, idx, axis=0)
        y = jax.nn.one_hot(
            jnp.take(labels_all, idx, axis=0),
            self.config.n_classes,
            dtype=jnp.float32,
        )
        return self._step_fn(state, x, y, weights)

    def _infer_fn(self, state: UNetState, x):
        logits = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            train=False,
        )
        return jnp.argmax(logits, axis=-1)

    def init_state(self, sample_shape):
        # recorded so a checkpoint restore can rebuild the state template
        # before any fit() call (train/tune.py:_restore_trial_state)
        self._init_shape = tuple(int(d) for d in sample_shape)
        H, W = sample_shape[1], sample_shape[2]
        variables = self.model.init(
            jax.random.PRNGKey(self.config.seed),
            jnp.zeros((1, H, W, 1), self.config.dtype),
            train=False,
        )
        self.state = jax.device_put(
            UNetState(
                step=jnp.zeros((), jnp.int32),
                params=variables["params"],
                batch_stats=variables["batch_stats"],
                opt_state=self.tx.init(variables["params"]),
            ),
            replicated(self.mesh),
        )
        return self.state

    def fit(self, x, y, log: Callable[[str], None] = print):
        cfg = self.config
        if self.state is None:
            self.init_state(x.shape)
        # resumed run: continue the shuffle schedule from the restored
        # optimizer step (same policy as CRWTrainer.fit; assumes the same
        # dataset length and batch size as the original run)
        steps_per_epoch = max(1, -(-len(x) // cfg.batch_size))
        if self._epoch_idx == 0 and int(jax.device_get(self.state.step)) > 0:
            self._epoch_idx = (
                int(jax.device_get(self.state.step)) // steps_per_epoch
            )
        # Device-resident strips (auto unless disabled): upload the strip
        # stack and compact int labels once; each step gathers its batch and
        # rebuilds the one-hot on-device — bit-identical batches, and the
        # per-step upload drops from ~B*H*W*(1+n_classes) floats to B ints.
        resident = None
        if cfg.device_resident is not False:
            # identity-keyed cache first: epoch-per-fit drivers must not
            # re-pay the one-hot exactness scan (3 full label passes) or the
            # upload every call
            cached = getattr(self, "_resident_data", None)
            if cached is not None and cached[0] is x and cached[1] is y:
                resident = (cached[2], cached[3])
            else:
                y_arr = np.asarray(y)
                exact_onehot = (
                    y_arr.shape[-1] == cfg.n_classes
                    and ((y_arr == 0.0) | (y_arr == 1.0)).all()
                    and (y_arr.sum(axis=-1) == 1.0).all()
                )
                if not exact_onehot:
                    if cfg.device_resident is True:
                        raise ValueError(
                            "device_resident=True needs exactly one-hot "
                            "labels (soft labels cannot round-trip through "
                            "the compact int encoding)"
                        )
                else:
                    repl_sh = replicated(self.mesh)
                    x_dev = jax.device_put(
                        np.ascontiguousarray(x, dtype=np.float32), repl_sh
                    )
                    labels_dev = jax.device_put(
                        y_arr.argmax(axis=-1).astype(np.int32), repl_sh
                    )
                    self._resident_data = (x, y, x_dev, labels_dev)
                    resident = (x_dev, labels_dev)

        history = []
        for epoch in range(cfg.epochs):
            t0 = time.time()
            # shuffle keyed by (seed, global epoch index), counter persisted
            # on the trainer — same policy as CRWTrainer.fit: one-epoch-per-
            # fit callers get a fresh permutation each call
            order = np.random.default_rng(
                [cfg.seed, self._epoch_idx]
            ).permutation(len(x))
            self._epoch_idx += 1
            losses = []
            n_dev = self.mesh.devices.size
            bsh, repl = batch_sharding(self.mesh), replicated(self.mesh)
            for s in range(0, len(order), cfg.batch_size):
                idx = order[s : s + cfg.batch_size]
                w = np.ones(len(idx), np.float32)
                full = len(idx) % n_dev == 0
                sh = bsh if full else repl
                if resident is not None:
                    step = self._step_res if full else self._step_res_repl
                    self.state, loss = step(
                        self.state,
                        resident[0],
                        resident[1],
                        jax.device_put(idx.astype(np.int32), sh),
                        jax.device_put(w, sh),
                    )
                    losses.append(loss)
                    continue
                bx = np.ascontiguousarray(x[idx], dtype=np.float32)
                by = np.ascontiguousarray(y[idx], dtype=np.float32)
                # partial batch: replicate unpadded (exact BN statistics)
                # instead of padding with duplicated rows; device_put on the
                # HOST arrays uploads each shard once (no default-device
                # staging copy)
                step = self._step if full else self._step_repl
                self.state, loss = step(
                    self.state,
                    jax.device_put(bx, sh),
                    jax.device_put(by, sh),
                    jax.device_put(w, sh),
                )
                losses.append(loss)
            epoch_loss = float(np.mean(jax.device_get(losses)))
            history.append(epoch_loss)
            log(f"Epoch: {epoch + 1} Loss: {epoch_loss} Time: {time.time() - t0:.3f}")
        return history

    def predict(self, x) -> np.ndarray:
        n = self.mesh.devices.size
        padded, real = pad_to_multiple(np.asarray(x, np.float32), n)
        # stage straight into the batch sharding: jnp.asarray would commit
        # the whole array to device 0 first and reshard (2x H2D bytes + a
        # transient full-array HBM spike), the same pitfall _stage/fit avoid
        staged = jax.device_put(padded, batch_sharding(self.mesh))
        out = self._infer(self.state, staged)
        return np.asarray(jax.device_get(out))[:real]


def train_test_split(n: int, split: float, seed: int):
    """Index split mirroring the reference's random 90/10
    (reference: scripts/test/test_unet.py:43-46)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    n_train = int(split * n)
    return order[:n_train], order[n_train:]
