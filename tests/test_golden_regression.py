"""Golden regression: pinned outputs for fixed inputs/weights.

This build evolves across rounds; these tests freeze the numeric behavior of
the core ops so refactors and kernel swaps can't silently change results.
The golden file is generated once (by this module's __main__) and committed;
regenerate ONLY when a semantic change is intended, and say why in the commit.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_sounder_crw_tpu.ops import (
    LabelPropConfig,
    crw_loss,
    horizontality_xent,
    propagate_labels,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "core_ops.npz")


def make_inputs():
    rng = np.random.default_rng(1234)
    emb_crw = rng.standard_normal((2, 7, 10, 16)).astype(np.float32)
    emb_lp = rng.standard_normal((6, 12, 16)).astype(np.float32)
    emb_lp /= np.linalg.norm(emb_lp, axis=-1, keepdims=True)
    seed = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 12)]
    return emb_crw, emb_lp, seed


def compute():
    emb_crw, emb_lp, seed = make_inputs()
    loss, A = crw_loss(jnp.asarray(emb_crw), tau=0.05)
    cfg = LabelPropConfig(cxt_size=4, radius=4, temperature=0.08, knn=3)
    soft, pred = propagate_labels(jnp.asarray(emb_lp), jnp.asarray(seed), cfg, None, "xla")
    xent = horizontality_xent(jnp.asarray(emb_lp), 0.1)
    return {
        "crw_loss": np.asarray(loss),
        "crw_A": np.asarray(A),
        "lp_soft": np.asarray(soft),
        "lp_pred": np.asarray(pred),
        "xent": np.asarray(xent),
    }


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden file not generated")
def test_core_ops_match_golden():
    got = compute()
    with np.load(GOLDEN) as golden:
        # a stale/partial golden file must FAIL, not silently shrink coverage
        assert set(golden.files) == set(got), (
            f"golden keys {sorted(golden.files)} != computed {sorted(got)}"
        )
        for key in golden.files:
            np.testing.assert_allclose(
                got[key], golden[key], rtol=1e-5, atol=1e-6,
                err_msg=f"golden mismatch for {key}",
            )


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(GOLDEN, **compute())
    print(f"wrote {GOLDEN}")
