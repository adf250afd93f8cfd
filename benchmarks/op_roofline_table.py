"""Per-op roofline table for the benched train step (VERDICT r3 #5 fallback
deliverable): join the profiler trace's per-op device times with byte
estimates parsed from the compiled HLO, print (op, measured us, bytes MB,
bytes-roofline us @819 GB/s, ratio). MXU ops (convolutions / dots) are
flagged — their floor is compute, not bytes; the program-level MXU floor
comes from XLA cost analysis.

Usage (TPU): python benchmarks/op_roofline_table.py
"""

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

TRACE_DIR = os.environ.get("RSCRW_TRACE_DIR", "/tmp/rscrw_trace_roofline")
HBM_BW = 819e9  # v5e datasheet

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}
_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)\[([\d,]*)\]")


def _shape_bytes(text: str) -> int:
    """Total bytes of every shape literal in `text` (handles tuples)."""
    total = 0
    for m in _SHAPE_RE.finditer(text):
        dims = [int(d) for d in m.group(2).split(",") if d]
        n = int(np.prod(dims)) if dims else 1
        total += n * _DTYPE_BYTES[m.group(1)]
    return total


def parse_hlo_op_bytes(hlo: str):
    """{op_name: (total_bytes_touched, is_mxu)} from the ENTRY computation.

    Bytes = output shape(s) + each operand's declared shape — an estimate of
    HBM traffic assuming every operand is read once and the output written
    once (fusions may read less). MXU flag: the op is a convolution/dot or a
    fusion whose called computation contains one."""
    # shapes of every named op across the module (operand lookup)
    def_shape: dict[str, str] = {}
    for line in hlo.splitlines():
        ls = line.strip()
        m = re.match(r"(?:ROOT )?%?([\w.\-]+) = (.*)$", ls)
        if not m:
            continue
        name, rest = m.group(1), m.group(2)
        sm = re.match(r"(\([^)]*\)|\S+?)\s", rest)
        if sm:
            def_shape[name] = sm.group(1)

    # computations containing conv/dot (for fusion MXU flags)
    comp_mxu: set[str] = set()
    cur_comp = None
    for line in hlo.splitlines():
        ls = line.strip()
        cm = re.match(r"%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->.*{$", ls) or re.match(
            r"(?:ENTRY )?%?([\w.\-]+)\s*\(", ls
        )
        if ls.endswith("{") and cm:
            cur_comp = cm.group(1)
        if cur_comp and (" convolution(" in ls or " dot(" in ls):
            comp_mxu.add(cur_comp)

    # entry computation ops
    out: dict[str, tuple[int, bool]] = {}
    in_entry = False
    for line in hlo.splitlines():
        ls = line.strip()
        if ls.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and ls == "}":
            break
        if not in_entry:
            continue
        m = re.match(r"(?:ROOT )?%?([\w.\-]+) = (.*)$", ls)
        if not m:
            continue
        name, rest = m.group(1), m.group(2)
        out_bytes = 0
        sm = re.match(r"(\([^)]*\)|\S+?)\s", rest)
        if sm:
            out_bytes = _shape_bytes(sm.group(1))
        # operand shapes via the def table
        opnd_bytes = 0
        args_m = re.search(r"\(([^)]*(?:\([^)]*\))?[^)]*)\)", rest[rest.find("("):])
        arg_blob = rest[rest.find("(") + 1 :]
        for am in re.finditer(r"%([\w.\-]+)", arg_blob):
            opnd = am.group(1)
            if opnd in def_shape:
                opnd_bytes += _shape_bytes(def_shape[opnd])
        is_mxu = " convolution(" in ls or " dot(" in ls
        cm = re.search(r"calls=%?([\w.\-]+)", ls)
        if cm and cm.group(1) in comp_mxu:
            is_mxu = True
        out[name] = (out_bytes + opnd_bytes, is_mxu)
    return out


def main():
    import jax.numpy as jnp

    from radar_sounder_crw_tpu.data import RGWindows, synthetic_radargram
    from radar_sounder_crw_tpu.parallel.mesh import batch_sharding
    from radar_sounder_crw_tpu.train import CRWTrainConfig, CRWTrainer

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
    seq = jax.device_put(batch.astype(np.float32), bsh)
    w = jax.device_put(np.ones((B,), np.float32), bsh)

    comp = tr._step.lower(tr.state, seq, w).compile()
    hlo = comp.as_text()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    op_bytes = parse_hlo_op_bytes(hlo)
    print(f"step flops (cost analysis): {flops / 1e9:.1f} GFLOP", flush=True)

    state = tr.state
    state, loss = tr._step(state, seq, w)
    print("compiled; loss", float(jax.device_get(loss)), flush=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(4):
            state, loss = tr._step(state, seq, w)
        _ = float(jax.device_get(loss))
    time.sleep(2)

    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    optime = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pid_names.get(e.get("pid"), ""):
            continue
        optime[e.get("name", "")] += float(e.get("dur", 0.0))

    rows = []
    total_us = mem_us = mem_roof = mxu_us = other_us = 0.0
    for name, us4 in optime.items():
        us = us4 / 4
        if name not in op_bytes:
            continue  # module/step aggregates
        total_us += us
        nbytes, is_mxu = op_bytes[name]
        roof = nbytes / HBM_BW * 1e6
        rows.append((us, name, nbytes, roof, is_mxu))
        if is_mxu:
            mxu_us += us
        elif nbytes:
            mem_us += us
            mem_roof += roof
        else:
            other_us += us
    rows.sort(reverse=True)
    print(f"\n{'us/step':>9} {'op':<32} {'MB':>8} {'roof us':>8} {'ratio':>6} kind")
    for us, name, nbytes, roof, is_mxu in rows[:45]:
        kind = "MXU" if is_mxu else "mem"
        ratio = us / roof if roof > 0 else float("inf")
        print(f"{us:9.1f} {name[:32]:<32} {nbytes/1e6:8.1f} {roof:8.1f} "
              f"{ratio:6.2f} {kind}", flush=True)
    print(f"\nattributed op time: {total_us/1e3:.2f} ms/step")
    print(f"  MXU-flagged ops:   {mxu_us/1e3:.2f} ms (program MXU floor at "
          f"197 TF bf16: {flops/197e12*1e3:.2f} ms; at the r2 per-shape "
          f"ceiling ~50%: {flops/98.5e12*1e3:.2f} ms)")
    print(f"  memory-bound ops:  {mem_us/1e3:.2f} ms vs bytes roofline "
          f"{mem_roof/1e3:.2f} ms (ratio {mem_us/max(mem_roof,1e-9):.2f})")
    print(f"  other:             {other_us/1e3:.2f} ms")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
