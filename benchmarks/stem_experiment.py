"""MFU experiments on the benched train step (round-2 VERDICT #5).

All variants run through CRWTrainer itself (identical jit/sharding/donation
setup to bench.py) so numbers are apples-to-apples:
  base      — current encoder (nn.max_pool / select_and_scatter backward)
  fastpool  — max-tree-of-strided-slices pooling [MEASURED SLOWER: 31.1 vs
              18.4 ms/step — the 9 materialized slice intermediates cost more
              than select_and_scatter's 0.78 ms; kept here as the record]
  stempadP  — stem activation channel-padded 3->P with a zero-padded conv1
              kernel (mathematically identical)
  base B=32 — batch amortization
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from radar_sounder_crw_tpu.data import RGWindows, synthetic_radargram
from radar_sounder_crw_tpu.models.initializers import (
    kaiming_normal_fan_out,
    torch_default_bias_init,
    torch_default_kernel_init,
)
from radar_sounder_crw_tpu.models.resnet import BasicBlock
from radar_sounder_crw_tpu.parallel.mesh import batch_sharding
from radar_sounder_crw_tpu.train import CRWTrainConfig, CRWTrainer
from radar_sounder_crw_tpu.train.crw_trainer import make_crw_train_step


class StemPadEncoder(nn.Module):
    """ResNetEncoder with the stem activation zero-padded to `pad_to`
    channels and conv1's (7,7,3,64) kernel zero-padded to match."""

    pad_to: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(3, (1, 1), padding=1,
                    kernel_init=torch_default_kernel_init(),
                    bias_init=torch_default_bias_init(1),
                    dtype=self.dtype, name="fc0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn0")(x)
        x = nn.relu(x)
        P = self.pad_to
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, P - 3)))
        k = self.param("conv1_kernel", kaiming_normal_fan_out, (7, 7, 3, 64),
                       jnp.float32)
        kpad = jnp.pad(k.astype(self.dtype), ((0, 0), (0, 0), (0, P - 3), (0, 0)))
        x = jax.lax.conv_general_dilated(
            x, kpad, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = 64
        for stage in range(4):
            stride = 2 if stage > 0 else 1
            x = BasicBlock(planes=planes, stride=stride,
                           use_projection=stage > 0, dtype=self.dtype,
                           name=f"layer{stage + 1}_0")(x, train=train)
            planes *= 2
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(128, dtype=jnp.float32,
                     kernel_init=torch_default_kernel_init(),
                     bias_init=torch_default_bias_init(512), name="fc")(x)
        return x


def run_variant(name, B, model_override=None, iters=8):
    rg, _ = synthetic_radargram(H=912, W=6000, nclasses=5, seed=13)
    ds = RGWindows(rg, length=20, dim=(16, 16), overlap=(8, 0))
    cfg = CRWTrainConfig(
        model=1, patch_size=(16, 16), seq_length=20, overlap=(8, 0),
        batch_size=B, lr=1e-3, tau=0.01, dtype=jnp.bfloat16,
    )
    tr = CRWTrainer(cfg)
    if model_override is not None:
        tr.model = model_override
        tr._step_raw = make_crw_train_step(
            tr.model, tr.tx, cfg.tau, cfg.pos_embed, cfg.remat
        )
        from radar_sounder_crw_tpu.parallel.mesh import replicated

        repl = replicated(tr.mesh)
        bsh = batch_sharding(tr.mesh)
        tr._step = jax.jit(
            tr._step_raw, in_shardings=(repl, bsh, bsh),
            out_shardings=(repl, None), donate_argnums=(0,),
        )
    tr.init_state(ds[0].shape)
    batch = np.stack([ds[i % len(ds)] for i in range(B)])
    bsh = batch_sharding(tr.mesh)
    seq = jax.device_put(jnp.asarray(batch), bsh)
    w = jax.device_put(jnp.ones((B,), jnp.float32), bsh)
    state = tr.state
    t0 = time.perf_counter()
    state, loss = tr._step(state, seq, w)
    print(f"[{name}] compile {time.perf_counter() - t0:.0f}s "
          f"loss {float(jax.device_get(loss)):.4f}", flush=True)
    for _ in range(2):
        state, loss = tr._step(state, seq, w)
    _ = float(jax.device_get(loss))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = tr._step(state, seq, w)
    _ = float(jax.device_get(loss))
    dt = (time.perf_counter() - t0) / iters
    print(f"[{name}] B={B}: {dt * 1e3:.2f} ms/step, {B / dt:.1f} items/s",
          flush=True)
    return dt


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run_variant("base", B=8)
    run_variant("stempad8", B=8, model_override=StemPadEncoder(pad_to=8))
    run_variant("stempad64", B=8, model_override=StemPadEncoder(pad_to=64))
    run_variant("base", B=32)
