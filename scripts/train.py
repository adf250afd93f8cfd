"""CRW unsupervised training CLI.

Flag-compatible with the reference trainer (reference: scripts/train.py:17-37
— same names and defaults), with fixes for its argparse quirks (--patch_size/
--overlap accept two ints; --pos_embed/--tune are store_true) and additions:
--bf16, --remat, --resume/--ckpt_dir (orbax), --tune_samples.

`--tune` runs the built-in ASHA successive-halving search over the same
config grid the reference sweeps with Ray (reference: scripts/train.py:108-128).
"""

from __future__ import annotations

import argparse
import os

from _common import ensure_dirs, normalize_pair

import jax
import jax.numpy as jnp


def get_args_parser():
    parser = argparse.ArgumentParser("CRW Train", add_help=True)
    # Meta
    parser.add_argument("--tune", action="store_true", help="run ASHA hyperparameter search")
    parser.add_argument("--model", default=1, type=int, help="0=CNN,1=ResNet18")
    parser.add_argument("--dataset", default=3, type=int, help="0=MCORDS1,1=Miguel,3=SHARAD")
    # Data
    parser.add_argument("--patch_size", default=(16, 16), nargs="+", type=int)
    parser.add_argument("--seq_length", default=20, type=int)
    parser.add_argument("--overlap", default=(8, 0), nargs="+", type=int)
    # Train
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--epochs", default=2, type=int)
    parser.add_argument("--lr", default=1e-3, type=float)
    parser.add_argument("--tau", default=0.01, type=float)
    # Dev
    parser.add_argument("--pos_embed", action="store_true")
    parser.add_argument("--dataset_full", default=True, type=lambda s: s not in ("0", "false", "False"))
    parser.add_argument("--output_folder", default="./resources/")
    parser.add_argument("--output_name", default="sharad16_3")
    # TPU-native additions
    parser.add_argument("--bf16", action="store_true", help="bfloat16 encoder compute")
    parser.add_argument("--remat", action="store_true", help="rematerialize encoder activations")
    parser.add_argument("--steps_per_dispatch", default=1, type=int,
                        help="fuse k optimizer steps into one device program "
                        "(TPU: +24%% throughput; avoid on CPU — slow compile)")
    parser.add_argument("--seed", default=11, type=int)
    parser.add_argument("--ckpt_dir", default=None, help="orbax checkpoint dir (enables resume)")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--profile_dir", default=None,
                        help="capture a jax.profiler trace of the run to this dir")
    parser.add_argument("--tune_samples", default=50, type=int)
    parser.add_argument("--tune_sequential", action="store_true",
                        help="disable the one-trial-per-device parallel sweep")
    parser.add_argument("--tune_ckpt_dir", default=None,
                        help="per-rung sweep checkpoints (resume after a kill)")
    parser.add_argument("--tune_dataset", default=0, type=int,
                        help="dataset id for --tune trials (reference hardcodes 0)")
    parser.add_argument("--tune_model", default=1, type=int)
    parser.add_argument("--tune_seq_length", default=8, type=int)
    return parser


def build(args):
    from radar_sounder_crw_tpu.data import create_dataset
    from radar_sounder_crw_tpu.train import CRWTrainConfig, CRWTrainer

    cfg = CRWTrainConfig(
        model=args.model,
        patch_size=normalize_pair(args.patch_size),
        seq_length=args.seq_length,
        overlap=normalize_pair(args.overlap),
        batch_size=args.batch_size,
        epochs=args.epochs,
        lr=args.lr,
        tau=args.tau,
        pos_embed=args.pos_embed,
        seed=args.seed,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        remat=args.remat,
        steps_per_dispatch=args.steps_per_dispatch,
    )
    dataset = create_dataset(
        id=args.dataset,
        length=cfg.seq_length,
        dim=cfg.patch_size,
        overlap=cfg.overlap,
        full=args.dataset_full,
    )
    return cfg, dataset


def main(args):
    print(args)
    from radar_sounder_crw_tpu.train import CRWTrainer
    from radar_sounder_crw_tpu.train.checkpoint import (
        CheckpointManager,
        save_encoder_torch,
    )
    from radar_sounder_crw_tpu.utils.plotting import plot_loss_curve
    from radar_sounder_crw_tpu.utils.profiling import profile_trace

    cfg, dataset = build(args)
    trainer = CRWTrainer(cfg)
    trainer.init_state(dataset[0].shape)
    print(f"Number of trainable parameters: {trainer.n_params}")

    mgr = None
    if args.ckpt_dir:
        mgr = CheckpointManager(args.ckpt_dir)
        if args.resume and mgr.latest_step() is not None:
            trainer.state = mgr.restore(jax.device_get(trainer.state))
            print(f"Resumed from step {mgr.latest_step()}")

    with profile_trace(args.profile_dir):
        history = trainer.fit(dataset)

    ensure_dirs(args.output_folder)
    plot_loss_curve(history, os.path.join(args.output_folder, "output", "_loss.png"))
    out_pt = os.path.join(args.output_folder, "models", args.output_name + ".pt")
    save_encoder_torch(trainer.variables(), out_pt)
    if mgr is not None:
        mgr.save(int(jax.device_get(trainer.state.step)), jax.device_get(trainer.state))
        mgr.close()
    print(f"Saved encoder to {out_pt}")
    print("Finished training.")


def tune_main(args, space=None):
    """ASHA search over the reference's config grid (scripts/train.py:108-128).
    `space` is injectable for tests/smokes; defaults to the reference grid.

    Trials run one-per-device in parallel (like the reference's Ray 1-GPU
    trials, scripts/train.py:130-139) unless --tune_sequential; with
    --tune_ckpt_dir the sweep checkpoints per rung and resumes after a kill.
    """
    import threading

    import jax

    from radar_sounder_crw_tpu.data import create_dataset
    from radar_sounder_crw_tpu.train import CRWTrainConfig, CRWTrainer
    from radar_sounder_crw_tpu.train.tune import run_asha

    space = space or {
        "batch_size": [16, 8],
        "lr": [1e-2, 1e-3, 1e-4, 1e-5],
        "tau": [1e-1, 1e-2, 1e-3, 1e-4],
        "patch_size": [(32, 32)],
        "overlap": [(24, 0), (16, 0)],
        "pos_embed": [False, True],
    }
    seq_length = args.tune_seq_length
    datasets: dict = {}
    ds_lock = threading.Lock()

    def make_trainer(config, mesh=None):
        key = (config["patch_size"], config["overlap"])
        with ds_lock:
            if key not in datasets:
                datasets[key] = create_dataset(
                    id=args.tune_dataset, length=seq_length, dim=config["patch_size"],
                    overlap=config["overlap"], full=True,
                )
        cfg = CRWTrainConfig(
            model=args.tune_model, patch_size=config["patch_size"], seq_length=seq_length,
            overlap=config["overlap"], batch_size=config["batch_size"],
            epochs=1, lr=config["lr"], tau=config["tau"],
            pos_embed=config["pos_embed"], seed=args.seed,
        )
        trainer = CRWTrainer(cfg, mesh=mesh)
        trainer.init_state(datasets[key][0].shape)
        trainer._tune_dataset = datasets[key]
        return trainer

    def train_epoch(trainer):
        return trainer.fit(trainer._tune_dataset, log=lambda s: None)[-1]

    devices = None if args.tune_sequential else jax.devices()
    best = run_asha(
        make_trainer, train_epoch, space,
        num_samples=args.tune_samples, max_t=3, grace_period=1, reduction_factor=2,
        seed=args.seed, devices=devices, checkpoint_dir=args.tune_ckpt_dir,
    )
    return best


if __name__ == "__main__":
    args = get_args_parser().parse_args()
    if args.tune:
        tune_main(args)
    else:
        main(args)
