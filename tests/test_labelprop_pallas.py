"""Fused Pallas label-propagation kernel vs the XLA reference path
(interpreter mode on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_sounder_crw_tpu.ops.labelprop import LabelPropConfig, propagate_labels
from radar_sounder_crw_tpu.ops.labelprop_pallas import fits_vmem


def make_inputs(T, N, C, M, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((T, N, C)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    onehot = np.eye(M, dtype=np.float32)[rng.integers(0, M, N)]
    return jnp.asarray(emb), jnp.asarray(onehot)


@pytest.mark.parametrize(
    "T,N,C,M,ctx,radius,knn",
    [
        (8, 16, 32, 4, 5, 5, 3),  # trimming active
        (6, 16, 32, 4, 10, 4, 3),  # no trimming
        (5, 12, 16, 5, 3, 100, 6),  # radius covers everything
    ],
)
def test_fused_kernel_matches_xla(T, N, C, M, ctx, radius, knn):
    emb, seed = make_inputs(T, N, C, M)
    cfg = LabelPropConfig(cxt_size=ctx, radius=radius, temperature=0.07, knn=knn)
    s_ref, p_ref = propagate_labels(emb, seed, cfg, None, "xla")
    s_pal, p_pal = propagate_labels(emb, seed, cfg, None, "pallas_interpret")
    np.testing.assert_allclose(
        np.asarray(s_pal), np.asarray(s_ref), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(p_pal), np.asarray(p_ref))


def test_fits_vmem_bounds():
    assert fits_vmem(101, 113, 128, 5)  # reference SHARAD config
    assert not fits_vmem(1001, 128, 128, 5)  # absurd context: fall back
