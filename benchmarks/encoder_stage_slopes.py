"""Per-stage slope timing of the eval ResNet encoder at survey batch size.

Measures, at the Miguel full-survey patch count (B = R*T*N = 315,000), the
stock NHWC flax forward against the batch-minor (HWCN) forward
(models/batch_minor.py), then prefix-times the batch-minor stages to show
where the milliseconds live. This is the receipt harness for the layout
argument in models/batch_minor.py — rerun it after touching the encoder
eval path.

Context (v5e, 2026-08-20 session):
  stock NHWC full fwd   51.9 ms
  batch-minor full fwd  45.0 ms
  stage deltas (batch-minor): fc0 ~2, conv1+pool 17.5, layer1 8.9,
  layer2 8.4, layer3 8.5, layer4 4.3
The stock path's early stages carry a (spatial, C) minor-dim layout that
pads C=3 -> 128 lanes (bf16 tiles pad C=3 -> 16 sublanes in HWCN too, but
only for the two small stem tensors): an XLA allocation report shows
bf16[315000,18,18,3] at 34.8 GB HBM footprint under NHWC, which is why the
stock prefix programs cannot even be timed standalone at this batch.

Run on the TPU:  python benchmarks/encoder_stage_slopes.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_slope_ms as slope_ms  # noqa: E402 — one slope protocol


def main(B: int = 315_000):
    from radar_sounder_crw_tpu.models import create_model
    from radar_sounder_crw_tpu.models.batch_minor import (
        _basic_block,
        _bn_eval,
        _conv,
        resnet_eval_batch_minor,
    )
    from radar_sounder_crw_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    bf16 = jnp.bfloat16
    model = create_model(1, False, dtype=bf16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1), bf16), train=False
    )
    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).normal(size=(B, 16, 16, 1)), jnp.float32)
    )

    stock = jax.jit(lambda x: model.apply(variables, x, train=False))
    bm = jax.jit(lambda x: resnet_eval_batch_minor(model, variables, x))

    d = np.abs(
        np.asarray(stock(x[:64]), np.float32) - np.asarray(bm(x[:64]), np.float32)
    ).max()
    print(f"B={B}  batch-minor vs stock maxdiff {d:.2e} (bf16 noise scale)")
    print(f"stock NHWC  full fwd: {slope_ms(lambda: stock(x), lambda o: o[0, 0]):7.2f} ms")
    print(f"batch-minor full fwd: {slope_ms(lambda: bm(x), lambda o: o[0, 0]):7.2f} ms")

    # ---- batch-minor prefix slopes -----------------------------------------
    P, S = variables["params"], variables["batch_stats"]
    core_p, core_s = P["model"], S["model"]

    def steps():
        def fc0(y):
            y = _conv(y, P["fc0"]["kernel"], 1, 1, bf16)
            y = y + jnp.asarray(P["fc0"]["bias"]).astype(bf16)[:, None]
            return jax.nn.relu(_bn_eval(y, P["bn0"], S["bn0"], bf16))

        def stem(y):
            y = _conv(y, core_p["conv1"]["kernel"], 2, 3, bf16)
            y = jax.nn.relu(_bn_eval(y, core_p["bn1"], core_s["bn1"], bf16))
            return jax.lax.reduce_window(
                y, jnp.asarray(-jnp.inf, y.dtype), jax.lax.max,
                (3, 3, 1, 1), (2, 2, 1, 1), ((1, 1), (1, 1), (0, 0), (0, 0)),
            )

        blocks = [
            (f"layer{s + 1}_0", 2 if s > 0 else 1)
            for s in range(len(model.stage_sizes))
        ]
        yield "fc0(+bn+relu)", fc0
        yield "conv7x7s2+bn+relu+pool", stem
        for name, stride in blocks:
            yield name, (
                lambda y, n=name, st=stride: _basic_block(
                    y, core_p[n], core_s[n], st, bf16
                )
            )

    stages = list(steps())
    prev = 0.0
    for n in range(1, len(stages) + 1):

        @jax.jit
        def prefix(x, n=n):
            y = jnp.transpose(x, (1, 2, 3, 0)).astype(bf16)
            for _, fn in stages[:n]:
                y = fn(y)
            return y

        ms = slope_ms(lambda: prefix(x), lambda o: o.ravel()[0])
        print(f"  prefix +{stages[n - 1][0]:24s} {ms:8.2f} ms  (delta {ms - prev:6.2f})")
        prev = ms


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 315_000)
