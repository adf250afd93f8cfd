"""CRW unsupervised trainer: optax Adam, jitted train step, data-parallel
over a device mesh.

Capability match of the reference training entry point
(reference: scripts/train.py:39-93): Adam, per-epoch mean loss + wall time,
shuffled batches, seed 11 default, encoder checkpoint at the end. TPU-first
differences: the whole step (encode -> normalize -> affinity -> palindrome
walk -> grads -> Adam) is one jitted SPMD program; batches are sharded over
the mesh's data axis (XLA inserts the gradient psum over ICI — the
DataParallel equivalent, reference: scripts/train.py:45-47).

Partial final batches: a batch whose size does not divide the mesh runs
REPLICATED (every device computes the whole small batch redundantly, once
per epoch) instead of padded — so BatchNorm batch statistics and the loss
are exactly those of the reference's unpadded partial batch, and
multi-device training matches single-device bit-for-bit up to float
reassociation (round-1 padded the batch with duplicates, which skewed BN
stats on the final batch; tested in tests/test_train.py).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models import create_model, param_count
from ..ops import crw_loss
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS, batch_sharding, make_mesh, replicated
from ..utils.pos_embed import maybe_pos_embed


@dataclasses.dataclass
class CRWTrainConfig:
    """Training hyperparameters (defaults = reference scripts/train.py:17-37)."""

    model: int = 1  # 0=CNN, 1=ResNet
    patch_size: tuple[int, int] = (16, 16)
    seq_length: int = 20
    overlap: tuple[int, int] = (8, 0)
    batch_size: int = 8
    epochs: int = 2
    lr: float = 1e-3
    tau: float = 0.01
    pos_embed: bool = False
    seed: int = 11
    dtype: Any = jnp.float32  # encoder compute dtype; bfloat16 for MXU speed
    remat: bool = False  # rematerialize encoder activations (large T*N)
    steps_per_dispatch: int = 1  # fuse k optimizer steps into one device
    # program (lax.scan) — amortizes per-dispatch host latency (v5e: 18.9 ->
    # 15.2 ms/step at the bench config); math is identical to k sequential
    # steps (tested). TPU-targeted: XLA:CPU compiles the scanned conv-grad
    # body pathologically slowly, so leave at 1 for CPU runs.
    device_resident: bool | None = None  # build batches ON device by
    # gathering windows from once-uploaded radargram(s) (kills the per-batch
    # host->device window upload — the ~8x epoch-wall overhead of round 2).
    # None = auto: on whenever the dataset serves windows of host radargrams
    # (RGWindows; ConcatWindows of RGWindows with one windowing geometry —
    # multi-radargram training gathers from a zero-padded (D, pxh, Wmax)
    # stack; SubsetWindows over either); False forces the host windowing
    # path (e.g. radargrams too large for HBM).
    s2d_stem: bool | None = None  # ResNet stem conv as space-to-depth
    # (models/resnet.py:StemConv); None = auto (on for TPU backends).
    fused_bn: bool | str | None = None  # BatchNorm impl: None = flax;
    # True/'fused' = hand-scheduled custom_vjp; 'lean' = bf16-read statistics
    # (models/fused_bn.py); None = OFF — a measured negative result on TPU
    # (17.7 vs 16.75 ms/step, see models/resnet.py:make_norm), kept opt-in
    # only. Unlike s2d_stem, never auto-enabled.


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def _encode(model, params, batch_stats, seq, use_pos_embed, train):
    """(B,T,N,h,w) -> (B,T,N,C) embeddings; one big batched conv forward
    (the dominant FLOPs — reference call stack: src/model.py:17-21)."""
    B, T, N, h, w = seq.shape
    x = seq.reshape(B * T * N, h, w, 1)
    x = maybe_pos_embed(x, use_pos_embed)
    out, updates = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x,
        train=train,
        mutable=["batch_stats"] if train else [],
    )
    emb = out.reshape(B, T, N, -1)
    new_stats = updates.get("batch_stats", batch_stats) if train else batch_stats
    return emb, new_stats


def make_crw_train_step(
    model, tx, tau: float, use_pos_embed: bool, remat: bool = False
) -> Callable:
    """Build the pure (state, seq, weights) -> (state, loss) step function."""

    encode = _encode
    if remat:
        encode = jax.checkpoint(
            _encode, static_argnums=(0, 4, 5), policy=jax.checkpoint_policies.nothing_saveable
        )

    def step_fn(state: TrainState, seq, weights):
        def loss_fn(params):
            emb, new_stats = encode(
                model, params, state.batch_stats, seq, use_pos_embed, True
            )
            per_item, _ = crw_loss(emb, tau, per_item=True)
            loss = jnp.sum(per_item * weights) / jnp.sum(weights)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            loss,
        )

    return step_fn


class CRWTrainer:
    """Owns model init, the jitted+sharded step, and the epoch loop."""

    def __init__(self, config: CRWTrainConfig, mesh=None):
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh()
        self.model = create_model(
            config.model,
            config.pos_embed,
            dtype=config.dtype,
            **(
                {"s2d_stem": config.s2d_stem, "fused_bn": config.fused_bn}
                if config.model == 1
                else {}
            ),
        )
        self.tx = optax.adam(config.lr)
        self._step_raw = make_crw_train_step(
            self.model, self.tx, config.tau, config.pos_embed, config.remat
        )
        repl = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)
        self._step = jax.jit(
            self._step_raw,
            in_shardings=(repl, bsh, bsh),
            out_shardings=(repl, None),
            donate_argnums=(0,),
        )
        # partial-batch step: batch replicated instead of padded (exact BN)
        self._step_repl = jax.jit(
            self._step_raw,
            in_shardings=(repl, repl, repl),
            out_shardings=(repl, None),
            donate_argnums=(0,),
        )

        # k-step fused program: scan of the SAME step function — one host
        # dispatch per k optimizer steps (the per-dispatch latency of a
        # remote/tunneled host otherwise costs ~20% of the step)
        def multi_step(state, seqs, weights):
            def body(st, xw):
                return self._step_raw(st, xw[0], xw[1])

            return jax.lax.scan(body, state, (seqs, weights))

        mbsh = NamedSharding(self.mesh, P(None, DATA_AXIS))
        self._multi_step = jax.jit(
            multi_step,
            in_shardings=(repl, mbsh, mbsh),
            out_shardings=(repl, None),
            donate_argnums=(0,),
        )
        self.state: TrainState | None = None
        self._epoch_idx = 0  # global epoch counter driving shuffle order
        self._resident: tuple | None = None  # (geo, step, step_repl, multi)

    def _resident_fns(self, geo):
        """Jitted step variants that gather their batch from a device-resident
        radargram: (state, rg, idx, weights) -> (state, loss). The only
        per-step upload is the (B,) int32 index array."""
        if self._resident is not None and self._resident[0] == geo:
            return self._resident[1:]
        from ..data.device_windows import gather_windows

        def step_res(state, rg, idx, weights):
            seq = gather_windows(rg, idx, geo)
            return self._step_raw(state, seq, weights)

        repl = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)
        step = jax.jit(
            step_res,
            in_shardings=(repl, repl, bsh, bsh),
            out_shardings=(repl, None),
            donate_argnums=(0,),
        )
        step_repl = jax.jit(
            step_res,
            in_shardings=(repl, repl, repl, repl),
            out_shardings=(repl, None),
            donate_argnums=(0,),
        )

        def multi_res(state, rg, idxs, weights):
            def body(st, xw):
                return step_res(st, rg, xw[0], xw[1])

            return jax.lax.scan(body, state, (idxs, weights))

        mbsh = NamedSharding(self.mesh, P(None, DATA_AXIS))
        multi = jax.jit(
            multi_res,
            in_shardings=(repl, repl, mbsh, mbsh),
            out_shardings=(repl, None),
            donate_argnums=(0,),
        )
        self._resident = (geo, step, step_repl, multi)
        return step, step_repl, multi

    # -- lifecycle -----------------------------------------------------------
    def init_state(self, example_item_shape) -> TrainState:
        # recorded so a checkpoint restore can rebuild the state template
        # before any fit() call (train/tune.py:_restore_trial_state)
        self._init_shape = tuple(int(d) for d in example_item_shape)
        T, N, h, w = example_item_shape
        in_ch = 2 if self.config.pos_embed else 1
        rng = jax.random.PRNGKey(self.config.seed)
        variables = self.model.init(
            rng, jnp.zeros((1, h, w, in_ch), self.config.dtype), train=False
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
        )
        self.state = jax.device_put(state, replicated(self.mesh))
        self.n_params = param_count(params)
        return self.state

    def _stage(self, batch: np.ndarray):
        """Start a host batch's async device transfer: sharded over the data
        axis when the size divides the mesh, replicated otherwise (the
        partial final batch — no padding, so BN statistics stay exact)."""
        batch = np.asarray(batch, np.float32)
        n_dev = self.mesh.devices.size
        weights = np.ones(batch.shape[0], np.float32)
        if batch.shape[0] % n_dev == 0:
            sh = batch_sharding(self.mesh)
            step = self._step
        else:
            sh = replicated(self.mesh)
            step = self._step_repl
        # device_put on the HOST array uploads each shard once, directly to
        # its device (jnp.asarray first would stage the whole batch on the
        # default device and then reshard — double the H2D traffic)
        return (
            jax.device_put(batch, sh),
            jax.device_put(weights, sh),
            step,
        )

    def train_step(self, batch: np.ndarray) -> float:
        """One optimizer step on a host batch (any size)."""
        seq, weights, step = self._stage(batch)
        self.state, loss = step(self.state, seq, weights)
        return loss

    def fit(self, dataset, log: Callable[[str], None] = print):
        """Epoch loop: shuffle, batch, step; per-epoch mean loss + wall time
        (reference: scripts/train.py:62-75). Input pipeline: the next batch's
        host->device transfer is started while the current step computes
        (device_put is async), hiding transfer latency behind the MXU."""
        cfg = self.config
        if self.state is None:
            self.init_state(dataset[0].shape)
        # shuffle order is keyed by (seed, global epoch index), with the
        # counter persisted on the trainer: callers that drive one epoch per
        # fit() call (the ASHA tuner) get a fresh permutation each epoch
        # instead of replaying epoch 0's order, and a resumed run continues
        # the schedule from where the restored optimizer step left off
        # (epoch inference divides the restored step by THIS run's
        # steps-per-epoch: resume assumes the same dataset length and batch
        # size as the original run)
        steps_per_epoch = max(
            1, -(-len(dataset) // cfg.batch_size)
        )
        if self._epoch_idx == 0 and int(jax.device_get(self.state.step)) > 0:
            self._epoch_idx = int(jax.device_get(self.state.step)) // steps_per_epoch

        # Device-resident windowing (auto unless disabled): upload the
        # radargram once, gather every batch on-device from (B,) index
        # arrays — the per-step host->device upload drops from ~B*T*N*h*w
        # floats to B ints. Batches are bit-identical to the host path.
        resident = None
        if cfg.device_resident is not False:
            from ..data.device_windows import resident_source

            resident = resident_source(dataset)
            if resident is None and cfg.device_resident is True:
                raise ValueError(
                    "device_resident=True needs a window dataset over host "
                    "radargrams (RGWindows, ConcatWindows of RGWindows with "
                    "one windowing geometry, or SubsetWindows over either)"
                )
        if resident is not None:
            rg_host, geo, index_map = resident
            # the upload survives fit() calls: epoch-per-fit drivers (the
            # ASHA tuner) would otherwise re-pay the full radargram transfer
            # every epoch — cache keyed on the host array's identity
            cached = getattr(self, "_resident_rg", None)
            if cached is not None and cached[0] is rg_host:
                rg_dev = cached[1]
            else:
                rg_dev = jax.device_put(
                    jnp.asarray(rg_host, jnp.float32), replicated(self.mesh)
                )
                self._resident_rg = (rg_host, rg_dev)
            step_res, step_res_repl, multi_res = self._resident_fns(geo)

        history = []
        n_dev = self.mesh.devices.size
        bsh = batch_sharding(self.mesh)
        repl = replicated(self.mesh)
        mbsh = NamedSharding(self.mesh, P(None, DATA_AXIS))
        for epoch in range(cfg.epochs):
            t0 = time.time()
            order = np.random.default_rng(
                [cfg.seed, self._epoch_idx]
            ).permutation(len(dataset))
            self._epoch_idx += 1
            starts = list(range(0, len(order), cfg.batch_size))

            def host_batch(si):
                idxs = order[starts[si] : starts[si] + cfg.batch_size]
                return np.stack([dataset[int(i)] for i in idxs])

            def window_ids(si):
                idxs = order[starts[si] : starts[si] + cfg.batch_size]
                return index_map[idxs].astype(np.int32)

            def stage_single(si):
                """(args, step) for one batch, resident or host path."""
                if resident is not None:
                    ids = window_ids(si)
                    full = len(ids) % n_dev == 0
                    sh = bsh if full else repl
                    w = jax.device_put(np.ones(len(ids), np.float32), sh)
                    return (
                        (rg_dev, jax.device_put(ids, sh), w),
                        step_res if full else step_res_repl,
                    )
                seq, w, step = self._stage(host_batch(si))
                return (seq, w), step

            losses = []
            k = max(1, int(cfg.steps_per_dispatch))
            if k > 1 and cfg.batch_size % n_dev == 0:
                si = 0
                while si < len(starts):
                    kk = min(k, len(starts) - si)
                    full_chunk = kk == k and all(
                        len(order[starts[si + j] : starts[si + j] + cfg.batch_size])
                        == cfg.batch_size
                        for j in range(kk)
                    )
                    if full_chunk:
                        w = jax.device_put(
                            np.ones((k, cfg.batch_size), np.float32), mbsh
                        )
                        if resident is not None:
                            idxs = np.stack([window_ids(si + j) for j in range(k)])
                            self.state, ls = multi_res(
                                self.state, rg_dev, jax.device_put(idxs, mbsh), w
                            )
                        else:
                            seqs = jax.device_put(
                                np.stack(
                                    [host_batch(si + j) for j in range(k)]
                                ).astype(np.float32),
                                mbsh,
                            )
                            self.state, ls = self._multi_step(self.state, seqs, w)
                        losses.extend([ls[j] for j in range(k)])
                        si += k
                    else:  # tail: plain per-batch steps
                        for j in range(kk):
                            args, step = stage_single(si + j)
                            self.state, loss = step(self.state, *args)
                            losses.append(loss)
                        si += kk
            else:
                staged = stage_single(0) if starts else None
                for si in range(len(starts)):
                    args, step = staged
                    if si + 1 < len(starts):
                        staged = stage_single(si + 1)  # prefetch
                    self.state, loss = step(self.state, *args)
                    losses.append(loss)
            epoch_loss = float(np.mean(jax.device_get(losses)))
            history.append(epoch_loss)
            log(
                f"Epoch: {epoch} Loss: {epoch_loss} Time: {time.time() - t0:.3f}"
            )
        return history

    # -- inference-side helpers ---------------------------------------------
    def variables(self) -> dict:
        v = {"params": self.state.params}
        if self.state.batch_stats:
            v["batch_stats"] = self.state.batch_stats
        return v
