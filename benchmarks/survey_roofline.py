"""Per-stage accounting for the full-survey config (round-5 VERDICT #3).

Splits the Miguel full-survey product path (bench.py config 5 —
T=100, N=50, 16x16 patches, R=63 windows, one device program through
`PropagationPipeline.propagate_survey`, reference hook: the per-radargram
loop scripts/test/test_all.py:91-100) into its device stages and measures
each with the chained-dispatch slope protocol (k dispatches, ONE fetch —
the per-call link latency differences out, bench.py `_device_slope_ms`):

  gather   — on-device window gathering from the resident radargram
             (data/device_windows.gather_windows)
  encode   — the vmapped bf16 encoder forward + L2 norm over all R*T*N
             patches (the survey's MXU stage; XLA cost-analysis FLOPs and
             the bf16-peak ratio are printed next to it)
  propagate— the batched lane-packed whole-sequence kernel
             (ops/labelprop_pallas.propagate_all_pallas_v2_batched via
             propagate_labels_batched, kernel='pallas_seq' — what 'auto'
             resolves to at this shape)
  full     — the fused product program (_survey_encode_propagate): gather +
             encode + propagate in ONE dispatch, what propagate_survey runs

Run on the TPU:  python benchmarks/survey_roofline.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


from bench import _device_slope_ms as slope_ms  # noqa: E402 — one slope protocol, not two copies


def main():
    from radar_sounder_crw_tpu.data import create_dataset, get_reference
    from radar_sounder_crw_tpu.data.device_windows import gather_windows, resident_source
    from radar_sounder_crw_tpu.infer import PropagationPipeline
    from radar_sounder_crw_tpu.infer.propagate import encode_sequence, _resolve_batched_kernel
    from radar_sounder_crw_tpu.models import create_model
    from radar_sounder_crw_tpu.ops import LabelPropConfig
    from radar_sounder_crw_tpu.ops.labelprop import propagate_labels_batched
    from radar_sounder_crw_tpu.parallel.mesh import make_mesh
    from radar_sounder_crw_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    T, patch, overlap = 100, (16, 16), (8, 0)
    ds = create_dataset(id=1, length=T, dim=patch, overlap=overlap, full=True)
    geo = ds.geo
    N = geo.nh
    nclasses, seg = get_reference(id=1, h=N * patch[0], w=0, length=T, dim=patch)
    rg_len, rg_h = geo.rg_len(), geo.rg_h()
    tot_rg = seg.shape[-1] // rg_len
    idxs = np.asarray(list(range(0, len(ds), T))[:tot_rg], np.int32)
    R = len(idxs)

    model = create_model(1, False, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *patch, 1), jnp.bfloat16), train=False
    )
    cfg = LabelPropConfig(cxt_size=100, radius=10, temperature=0.1, knn=20)
    pipe = PropagationPipeline(model, dict(variables), cfg, nclasses=nclasses)
    seg_refs = [seg[:rg_h, rg_len * t : rg_len * t + patch[1]] for t in range(R)]

    # PER-CHIP accounting: pin a 1-device mesh so the stage programs and the
    # fused program resolve the same kernel at the same per-device R, and the
    # unpadded R=63 batch satisfies the programs' divisibility contract on
    # multi-chip hosts too (the product API pads; this harness measures one
    # chip's roofline)
    mesh = make_mesh(jax.devices()[:1])
    rg_host, geo_r, index_map = resident_source(ds)
    rg_dev = jax.device_put(jnp.asarray(rg_host))
    ids_dev = jax.device_put(jnp.asarray(index_map[idxs].astype(np.int32)))

    # --- stage programs -----------------------------------------------------
    @jax.jit
    def gather_prog(rg, ids):
        return gather_windows(rg, ids, geo_r, T).astype(jnp.float32)

    emodel = pipe.model  # eval-stem-pinned clone

    @jax.jit
    def encode_prog(rg, ids):
        # mirrors _batched_body's eval path: ONE flat (R*T, N) forward (the
        # window axis is inert at eval; vmap would break the batch-minor
        # encoder layout — see the comment there)
        seqs = gather_windows(rg, ids, geo_r, T).astype(jnp.float32)
        Rw, Tw, Nw = seqs.shape[:3]
        flat = seqs.reshape(Rw * Tw, Nw, *seqs.shape[3:])
        return encode_sequence(
            emodel, pipe.variables, flat, False, False
        ).reshape(Rw, Tw, Nw, -1)

    embs = encode_prog(rg_dev, ids_dev)
    embs = jax.device_put(embs)  # resident input for the propagate-only stage
    C = embs.shape[-1]
    from radar_sounder_crw_tpu.infer.propagate import seed_onehot_from_segmentation

    seeds = np.stack(
        [seed_onehot_from_segmentation(sr, N, nclasses)[0] for sr in seg_refs]
    )
    seeds_dev = jax.device_put(jnp.asarray(seeds))
    kern = _resolve_batched_kernel("auto", R, T, N, C, nclasses, cfg, backend="tpu")
    print(f"R={R}, T={T}, N={N}, C={C}, kernel='auto'->'{kern}'")

    @jax.jit
    def prop_prog(e, s):
        return propagate_labels_batched(e, s, cfg, None, kern)[1]

    # --- measurements -------------------------------------------------------
    g_ms = slope_ms(lambda: gather_prog(rg_dev, ids_dev), lambda o: o[0, 0, 0, 0, 0])
    e_ms = slope_ms(lambda: encode_prog(rg_dev, ids_dev), lambda o: o[0, 0, 0, 0])
    p_ms = slope_ms(lambda: prop_prog(embs, seeds_dev), lambda o: o[0, 0, 0])

    # full product program: time via the product API's own dispatch path —
    # propagate_survey fetches internally, so measure wall and subtract the
    # session fetch floor, AND time the underlying fused program with the
    # slope protocol for an apples-to-apples device number
    from radar_sounder_crw_tpu.infer.propagate import _survey_encode_propagate

    def full_dispatch():
        return _survey_encode_propagate(
            pipe.model, pipe.variables, rg_dev, ids_dev, seeds_dev, geo_r, T,
            False, cfg, False, False, pipe.kernel, pipe.xent_tau, False,
            compute_xent=False, return_xent=False, mesh=mesh,
        )[0]

    full_ms = slope_ms(full_dispatch, lambda o: o[0, 0, 0])

    # product wall (what bench.py reports): propagate_survey incl. fetch
    pipe.propagate_survey(ds, idxs, seg_refs)  # warm
    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        preds = pipe.propagate_survey(ds, idxs, seg_refs)
    wall_ms = (time.perf_counter() - t0) / iters * 1e3
    assert preds.shape == (R, N, T)

    # encoder FLOPs + bf16 peak ratio
    flops = None
    try:
        comp = encode_prog.lower(rg_dev, ids_dev).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as exc:
        print(f"cost_analysis unavailable: {exc}")

    print("\nstage slopes (ms/dispatch, k=8 chained, median of 3):")
    print(f"  gather-only          {g_ms:8.2f}")
    print(f"  gather+encode        {e_ms:8.2f}   (encode ~= {e_ms - g_ms:.2f})")
    print(f"  propagate-only       {p_ms:8.2f}")
    print(f"  fused full program   {full_ms:8.2f}   (stage sum {e_ms + p_ms:.2f})")
    print(f"  product wall/call    {wall_ms:8.2f}   ({R / (wall_ms / 1e3):.1f} rg/s)")
    if flops:
        peak = 197e12
        mxu_ms = flops / peak * 1e3
        print(
            f"\nencode program: {flops / 1e9:.1f} GFLOP -> {mxu_ms:.2f} ms at "
            f"bf16 peak; measured {e_ms - g_ms:.2f} ms = "
            f"{(e_ms - g_ms) / mxu_ms:.2f}x peak-floor "
            f"(MFU {mxu_ms / (e_ms - g_ms):.2f})"
        )
    print(
        f"\npropagation: {p_ms:.2f} ms / {R} rg / {T - 1} frames = "
        f"{p_ms / R / (T - 1) * 1e3:.1f} us per frame-radargram"
    )


if __name__ == "__main__":
    main()
