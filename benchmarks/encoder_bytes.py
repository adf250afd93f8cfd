"""Per-stage HBM byte accounting of the inference encoder (VERDICT r3 #6).

The MC3 pipeline's device share is encoder-bound: 941 GFLOP with ~21.9 GB
bytes-accessed by XLA cost analysis, ~25 ms at the 819 GB/s v5e roofline
(BASELINE.md r3 breakdown). This script decomposes where those bytes come
from: it compiles the full `encode_sequence` program AND each encoder stage
as its own XLA program at the MC3 batch shape, printing flops /
bytes-accessed / roofline-ms per stage, plus the analytic activation sizes
so convert/pad/transpose amplification is visible (stage bytes >> 2x its
activations = materialized copies).

Stages: fc0 stem (1x1 conv pad-1 + BN eval + relu, FULL 34x34 resolution),
conv1 (7x7/s2 or space-to-depth) + bn1 + relu + maxpool, layer1..layer4,
GAP + fc, and the L2 normalize. Per-stage programs see the previous stage's
output shape/dtype (captured via flax capture_intermediates).

Usage (TPU): python benchmarks/encoder_bytes.py [N_patches] [--profile DIR]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from radar_sounder_crw_tpu.models import create_model


def cost(fn, *args):
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def fmt(name, fl, by, act_bytes=None, bw=819e9):
    ms = by / bw * 1e3
    extra = ""
    if act_bytes:
        extra = f"  act(in+out) {act_bytes / 1e6:8.1f} MB  amplification {by / act_bytes:5.2f}x"
    print(
        f"{name:<22} {fl / 1e9:9.2f} GFLOP  {by / 1e9:7.3f} GB  "
        f"roofline {ms:6.2f} ms{extra}",
        flush=True,
    )


def main():
    n_patches = int(sys.argv[1]) if len(sys.argv) > 1 else 100 * 190  # MC3
    hw = (32, 32)
    dtype = jnp.bfloat16
    model = create_model(1, False, dtype=dtype)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 1), dtype), train=False
    )
    x = jnp.zeros((n_patches, *hw, 1), jnp.float32)
    print(f"batch: {n_patches} patches of {hw}, dtype {dtype.__name__}", flush=True)

    # whole encoder (the pipeline's per-call program, minus xent/propagate)
    def full(v, xx):
        out = model.apply(v, xx, train=False)
        return out / jnp.linalg.norm(out, axis=-1, keepdims=True).clip(1e-12)

    fl, by = cost(full, variables, x)
    fmt("FULL encode+l2norm", fl, by)

    # capture every stage boundary
    _, inter = model.apply(
        variables, x[:1], train=False,
        capture_intermediates=True, mutable=["intermediates"],
    )

    # stage programs: rebuild each as its own jitted fn on the real
    # intermediate shapes. Use module surgery via nn.apply on submodules.
    from flax.core import freeze

    params = variables["params"]
    bs = variables.get("batch_stats", {})

    import flax.linen as nn

    from radar_sounder_crw_tpu.models.resnet import (
        BasicBlock,
        StemConv,
        make_norm,
    )

    def stage_fc0(xx):
        y = nn.Conv(
            3, (1, 1), padding=1, dtype=dtype, name="fc0"
        ).apply({"params": params["fc0"]}, xx)
        y = make_norm(None, False, dtype, "bn0").apply(
            {"params": params["bn0"], "batch_stats": bs["bn0"]}, y
        )
        return nn.relu(y)

    y0 = jax.eval_shape(stage_fc0, x)
    fl, by = cost(stage_fc0, x)
    fmt("fc0+bn0+relu (34x34)", fl, by,
        x.size * x.dtype.itemsize + int(np.prod(y0.shape)) * 2)

    x0 = jnp.zeros(y0.shape, y0.dtype)
    mp = params["model"]
    mbs = bs["model"]

    def stage_conv1(xx):
        y = StemConv(width=64, dtype=dtype, name="conv1").apply(
            {"params": mp["conv1"]}, xx, train=False
        )
        y = make_norm(None, False, dtype, "bn1").apply(
            {"params": mp["bn1"], "batch_stats": mbs["bn1"]}, y
        )
        y = nn.relu(y)
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    y1 = jax.eval_shape(stage_conv1, x0)
    fl, by = cost(stage_conv1, x0)
    fmt("conv1+bn1+pool", fl, by,
        int(np.prod(x0.shape)) * 2 + int(np.prod(y1.shape)) * 2)

    xi = jnp.zeros(y1.shape, y1.dtype)
    planes = 64
    for stage in range(4):
        name = f"layer{stage + 1}_0"
        stride = 1 if stage == 0 else 2
        blk = BasicBlock(
            planes=planes, stride=stride, use_projection=stage > 0,
            dtype=dtype,
        )
        # the module is the ROOT of its own apply: its params subtree is
        # passed directly (no name nesting)
        sub = freeze(
            {"params": mp[name], "batch_stats": mbs.get(name, {})}
        )

        def stage_fn(xx, blk=blk, sub=sub):
            return blk.apply(sub, xx, train=False)

        yi = jax.eval_shape(stage_fn, xi)
        fl, by = cost(stage_fn, xi)
        fmt(f"{name} (s{stride})", fl, by,
            int(np.prod(xi.shape)) * 2 + int(np.prod(yi.shape)) * 2)
        xi = jnp.zeros(yi.shape, yi.dtype)
        planes *= 2

    def stage_head(xx):
        y = jnp.mean(xx, axis=(1, 2))
        y = nn.Dense(128, dtype=jnp.float32, name="fc").apply(
            {"params": mp["fc"]}, y
        )
        return y / jnp.linalg.norm(y, axis=-1, keepdims=True).clip(1e-12)

    fl, by = cost(stage_head, xi)
    fmt("GAP+fc+l2norm", fl, by)

    if "--profile" in sys.argv:
        pdir = sys.argv[sys.argv.index("--profile") + 1]
        xr = jnp.asarray(
            np.random.default_rng(0).standard_normal(x.shape), jnp.float32
        )
        jit_full = jax.jit(full)
        jit_full(variables, xr).block_until_ready()
        with jax.profiler.trace(pdir):
            for _ in range(3):
                out = jit_full(variables, xr)
            _ = float(jax.device_get(out[0, 0]))
        print(f"trace written to {pdir}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
