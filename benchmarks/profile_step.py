"""Op-level profile of the benched train step on TPU.

Captures a jax.profiler trace of the exact bench.py step (ResNet-10, B=8,
T=20, N=113, 16x16, bf16), then parses the trace protobuf/json for the
top ops by self time — the data the MFU work (round-1 VERDICT weak #1 /
next-step #5) needs to decide where the 80% non-MXU time goes.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from radar_sounder_crw_tpu.data import RGWindows, synthetic_radargram
from radar_sounder_crw_tpu.parallel.mesh import batch_sharding
from radar_sounder_crw_tpu.train import CRWTrainConfig, CRWTrainer

TRACE_DIR = os.environ.get("RSCRW_TRACE_DIR", "/tmp/rscrw_trace")


def main():
    B, T, patch, overlap = 8, 20, (16, 16), (8, 0)
    rg, _ = synthetic_radargram(H=912, W=4096, nclasses=5, seed=13)
    ds = RGWindows(rg, length=T, dim=patch, overlap=overlap)
    cfg = CRWTrainConfig(
        model=1, patch_size=patch, seq_length=T, overlap=overlap,
        batch_size=B, lr=1e-3, tau=0.01, dtype=jnp.bfloat16,
    )
    tr = CRWTrainer(cfg)
    tr.init_state(ds[0].shape)
    batch = np.stack([ds[i] for i in range(B)])
    bsh = batch_sharding(tr.mesh)
    # device_put on the host array: one sharded upload, no default-device
    # staging copy polluting the trace this profiler captures
    seq = jax.device_put(batch.astype(np.float32), bsh)
    w = jax.device_put(np.ones((B,), np.float32), bsh)

    state = tr.state
    state, loss = tr._step(state, seq, w)
    print("compiled; loss", float(jax.device_get(loss)), flush=True)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(4):
            state, loss = tr._step(state, seq, w)
        _ = float(jax.device_get(loss))
    print("trace captured", flush=True)
    time.sleep(2)

    # parse the trace for TPU op self-times
    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        print("no trace.json.gz found; dirs:", os.listdir(TRACE_DIR))
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find TPU op track(s): pid/tid names containing "TensorFlow Op" or XLA
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    optime: dict[str, float] = defaultdict(float)
    opcount: dict[str, int] = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "xla" not in pname.lower():
            continue
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))
        # keep leaf op events (XLA op names like %fusion.123, %convolution...)
        optime[name] += dur
        opcount[name] += 1
        total += dur
    rows = sorted(optime.items(), key=lambda kv: -kv[1])[:40]
    print(f"\ntrace {os.path.basename(path)}; total op-time {total/1e3:.2f} ms over 4 steps")
    for name, us in rows:
        print(f"{us/4:10.1f} us/step  x{opcount[name]//4:<4} {name[:110]}")


if __name__ == "__main__":
    main()
