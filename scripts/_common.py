"""Shared CLI plumbing for the entry-point scripts."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# Debug/CI escape hatch: the environment may pin JAX_PLATFORMS at interpreter
# start, so a CPU run must be forced via config, not env.
if os.environ.get("RSCRW_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from radar_sounder_crw_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def normalize_pair(v) -> tuple[int, int]:
    """Normalize (h, w)-style flags. The reference declares these flags
    type=int with tuple defaults, so only the defaults ever worked
    (reference: scripts/train.py:24-26); here `--patch_size 16 16`,
    `--patch_size 16`, and tuple defaults all parse."""
    if isinstance(v, int):
        return (v, v)
    t = tuple(int(x) for x in v)
    return (t[0], t[0]) if len(t) == 1 else (t[0], t[1])


def ensure_dirs(output_folder: str):
    for sub in ("", "models", "output"):
        os.makedirs(os.path.join(output_folder, sub), exist_ok=True)


def load_encoder(model_id: int, pos_embed: bool, model_path: str | None,
                 allow_untrained: bool = False, dtype=jnp.float32, seed: int = 11):
    """Build the encoder and load weights from a torch .pt state_dict or an
    orbax directory. With allow_untrained, missing weights fall back to a
    fresh init (smoke runs on synthetic data)."""
    from radar_sounder_crw_tpu.models import create_model, load_torch_checkpoint

    model = create_model(model_id, pos_embed, dtype=dtype)
    in_ch = 2 if pos_embed else 1
    init_vars = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, in_ch)), train=False
    )
    if model_path and os.path.exists(model_path):
        variables = load_torch_checkpoint(model_path)
        if "batch_stats" not in variables:
            variables["batch_stats"] = init_vars.get("batch_stats", {})
        print(f"Loaded encoder weights from {model_path}")
        return model, variables
    if allow_untrained:
        print(
            f"[warn] model weights not found at {model_path!r}; proceeding "
            "with a fresh initialization (--allow_untrained)"
        )
        return model, dict(init_vars)
    raise FileNotFoundError(
        f"encoder weights not found at {model_path!r} — run scripts/train.py "
        "first, or pass --allow_untrained for a smoke run"
    )
