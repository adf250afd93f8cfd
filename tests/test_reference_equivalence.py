"""Cross-implementation equivalence against the UPSTREAM label-propagation
code itself.

Imports the reference's `imported/labelprop.py` + `imported/maskedatt.py`
read-only from /root/reference (torch CPU; stubs and 'cuda' neutralization
via the shared tests/_reference_runtime harness) and runs its
LabelPropVOS_CRW.predict frame loop against our ring-buffer scan on the same
embeddings and seeds. For T <= CXT_SIZE+1 (no context trimming — the regime
of the reference's test.py/test_all.py defaults) the two implementations must
agree to float tolerance.

Skipped automatically when the reference tree is not present.
"""

import numpy as np
import pytest

from _reference_runtime import (
    cuda_neutralized,
    import_reference,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not available"
)


def run_reference_labelprop(emb, seed_onehot, cxt, radius, temp, knn):
    """Drive the upstream predict() loop on CPU torch (shared harness:
    _reference_runtime handles the stubs and cuda neutralization)."""
    import torch

    labelprop = import_reference("imported.labelprop")
    with cuda_neutralized():
        lp = labelprop.LabelPropVOS_CRW(
            {"CXT_SIZE": cxt, "RADIUS": radius, "TEMP": temp, "KNN": knn}
        )
        T, N, C = emb.shape
        # feats: [1, K, h=N, w=1]; masks: [1, M, N, 1]
        feats = [torch.tensor(emb[0].T[None, :, :, None])]
        masks = [torch.tensor(seed_onehot.T[None, :, :, None])]
        preds = [seed_onehot.copy()]
        for t in range(1, T):
            curr = torch.tensor(emb[t].T[None, :, :, None])
            mask = lp.predict(feats=feats, masks=masks, curr_feat=curr)
            feats.append(curr)
            masks.append(mask)
            preds.append(mask[0, :, :, 0].T.numpy())
        return np.stack(preds)


@pytest.mark.parametrize(
    "T,ctx,radius,temp,knn",
    [
        (8, 10, 5, 0.07, 4),  # no trimming
        (6, 12, 100, 0.01, 3),  # radius covers all, low temp
        (10, 9, 4, 0.1, 6),  # T == ctx+1 boundary
    ],
)
def test_ours_matches_upstream_labelprop(T, ctx, radius, temp, knn):
    import jax.numpy as jnp

    from radar_sounder_crw_tpu.ops.labelprop import (
        LabelPropConfig,
        propagate_labels,
    )

    rng = np.random.default_rng(5)
    N, C, M = 14, 24, 4
    emb = rng.standard_normal((T, N, C)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    seed = np.eye(M, dtype=np.float32)[rng.integers(0, M, N)]

    want = run_reference_labelprop(emb, seed, ctx, radius, temp, knn)
    cfg = LabelPropConfig(cxt_size=ctx, radius=radius, temperature=temp, knn=knn)
    soft, pred = propagate_labels(jnp.asarray(emb), jnp.asarray(seed), cfg, None, "xla")
    np.testing.assert_allclose(np.asarray(soft), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pred), want.argmax(-1))


def run_reference_labelprop_longmem(
    emb, seed_onehot, cxt, radius, temp, knn, long_mem
):
    """Upstream per-step math on OUR generalized context selection: drive the
    upstream predict() per frame, feeding it exactly the context set our
    pinned ring buffer selects (active pins + last-cxt recent frames, each
    frame once, chronological). CXT_SIZE is set beyond T so the upstream trim
    (which only supports one long-term frame, maskedatt.py:166-167) never
    fires — this isolates the affinity/topk/softmax/weighted-sum math."""
    import torch

    labelprop = import_reference("imported.labelprop")
    with cuda_neutralized():
        T, N, C = emb.shape
        lp = labelprop.LabelPropVOS_CRW(
            {"CXT_SIZE": T + cxt + 8, "RADIUS": radius, "TEMP": temp, "KNN": knn}
        )
        all_feats = [torch.tensor(emb[t].T[None, :, :, None]) for t in range(T)]
        all_masks = [torch.tensor(seed_onehot.T[None, :, :, None])]
        preds = [seed_onehot.copy()]
        for t in range(1, T):
            pins = [j for j in long_mem if j < t and t - j > cxt]
            recent = list(range(max(0, t - cxt), t))
            ctx_ids = pins + recent
            mask = lp.predict(
                feats=[all_feats[j] for j in ctx_ids],
                masks=[all_masks[j] for j in ctx_ids],
                curr_feat=all_feats[t],
            )
            all_masks.append(mask)
            preds.append(mask[0, :, :, 0].T.numpy())
        return np.stack(preds)


@pytest.mark.parametrize("long_mem", [(0, 2, 5), (1, 3), ()])
def test_long_mem_matches_upstream_math(long_mem):
    """Generalized long-term memory (VERDICT r2 #7): multi-frame pinned
    context agrees with the upstream per-step math on the same context set,
    through pin-activation transitions (T spans t <= cxt, the window edge,
    and t > max(long_mem)+cxt)."""
    import jax.numpy as jnp

    from radar_sounder_crw_tpu.ops.labelprop import (
        LabelPropConfig,
        propagate_labels,
    )

    T, N, C, M, cxt, radius, temp, knn = 16, 14, 24, 4, 4, 5, 0.07, 6
    rng = np.random.default_rng(9)
    emb = rng.standard_normal((T, N, C)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    seed = np.eye(M, dtype=np.float32)[rng.integers(0, M, N)]

    want = run_reference_labelprop_longmem(
        emb, seed, cxt, radius, temp, knn, long_mem
    )
    cfg = LabelPropConfig(
        cxt_size=cxt, radius=radius, temperature=temp, knn=knn, long_mem=long_mem
    )
    soft, pred = propagate_labels(jnp.asarray(emb), jnp.asarray(seed), cfg, None, "xla")
    np.testing.assert_allclose(np.asarray(soft), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pred), want.argmax(-1))
