"""Name the fusions behind the SAGAN arch step's roofline gap (VERDICT r3 #5).

sagan_arch_probe.py established by experiment that the arch step's sub-roof
bandwidth (451 GB/s vs the ~620-670 GB/s measured stream roof) is not the
sequential D forwards and not the power-iteration matvecs. This probe says
WHAT it is, at fusion granularity, and tries the one remaining lever:

1. FUSION TABLE: run the canonical arch step under jax.profiler.trace and
   aggregate device-op self-times from the trace; correlate each top fusion
   back to the compiled HLO (operand/result shapes -> bytes) to estimate
   per-fusion achieved GB/s. The fusions that sit far under the stream roof
   ARE the attribution.
2. bf16 LEVER: re-run the same jitted arch step with every f32 leaf of the
   net params/stats cast to bf16 (alphas + optimizer + spectral u/v stay
   f32). The arch step has NO parity constraint on its internal dtype (the
   f32 parity suites pin the f32 path; on TPU the step already feeds bf16
   activations) — if the gap is bandwidth on f32 weight/stat traffic, this
   halves it.

Run ALONE on the chip (CLAUDE.md: contention skews timing):
  python benchmarks/sagan_arch_fusions.py [--batch 256] [--steps 30]
Writes benchmarks/sagan_arch_fusions_result.json.

Reference scope: the arch step implements models/SAGAN.py:419-458.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "f64": 8, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8}


def _shape_bytes(sig: str) -> int:
    total = 0
    for dt, dims in re.findall(r"([a-z0-9]+)\[([0-9,]*)\]", sig):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def _hlo_fusion_bytes(hlo: str) -> dict:
    """fusion name -> approx bytes moved (result + operand shapes)."""
    out = {}
    for m in re.finditer(
            r"%?([a-zA-Z0-9_.-]+)\s*=\s*((?:\([^)]*\))|(?:[a-z0-9]+\["
            r"[^\]]*\](?:\{[^}]*\})?))\s+fusion\((.*?)\),", hlo):
        name, result, operands = m.group(1), m.group(2), m.group(3)
        out[name] = _shape_bytes(result) + _shape_bytes(operands)
    return out


def _trace_top_ops(trace_dir: str, top: int = 12) -> list:
    """Aggregate device-op durations from the profiler's trace.json.gz."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return []
    with gzip.open(sorted(paths)[-1], "rt") as f:
        doc = json.load(f)
    events = doc.get("traceEvents", [])
    # device lanes: pick pids whose process_name mentions TPU/device
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and (not dev_pids or e.get("pid") in dev_pids):
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    return [{"op": k, "total_us": round(v, 1), "count": cnt[k]}
            for k, v in rows]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "sagan_arch_fusions_result.json"))
    args = ap.parse_args()

    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.steps = 8, 2
    import jax.numpy as jnp
    from benchmarks.perf_families import build_family

    eng, batch_d, val_d = build_family("sagan", args.batch)
    beta, alr = jnp.float32(0.9), jnp.float32(eng.cfg.arch_lr)

    def timed(state, label):
        state, l = eng._jit_arch(state, val_d, beta, alr)
        _ = float(jax.tree_util.tree_leaves(l)[0])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, l = eng._jit_arch(state, val_d, beta, alr)
            _ = float(jax.tree_util.tree_leaves(l)[0])
            times.append(time.perf_counter() - t0)
        ms = min(times) / args.steps * 1e3
        try:
            ca = eng._jit_arch.lower(state, val_d, beta, alr)\
                .compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            nbytes = float(ca.get("bytes accessed", 0)) or None
        except Exception:
            nbytes = None
        row = {"variant": label, "ms_per_step": round(ms, 3)}
        if nbytes:
            row["cost_model_gb"] = round(nbytes / 1e9, 3)
            row["achieved_gbps"] = round(nbytes / (ms / 1e3) / 1e9, 1)
        print(json.dumps(row), flush=True)
        return state, row

    # ---- canonical timing + fusion table -------------------------------
    state = eng.init_state(jax.random.PRNGKey(0))
    state, base = timed(state, "canonical_f32_params")

    hlo = eng._jit_arch.lower(state, val_d, beta, alr).compile().as_text()
    fusion_bytes = _hlo_fusion_bytes(hlo)

    trace_rows = []
    with tempfile.TemporaryDirectory() as td:
        try:
            jax.profiler.start_trace(td)
            for _ in range(max(4, args.steps // 3)):
                state, l = eng._jit_arch(state, val_d, beta, alr)
            _ = float(jax.tree_util.tree_leaves(l)[0])
            jax.profiler.stop_trace()
            trace_rows = _trace_top_ops(td)
        except Exception as e:  # tunnel backends may refuse tracing
            print(f"profiler unavailable: {e}", flush=True)
    n_prof = max(4, args.steps // 3)
    for r in trace_rows:
        r["us_per_step"] = round(r["total_us"] / n_prof, 1)
        r["pct_of_step"] = round(100 * (r["total_us"] / n_prof)
                                 / (base["ms_per_step"] * 1e3), 1)
        fb = fusion_bytes.get(r["op"].lstrip("%"))
        if fb:
            r["hlo_bytes"] = fb
            if r["us_per_step"]:
                r["gbps"] = round(fb / (r["us_per_step"] * 1e-6) / 1e9, 1)

    # ---- bf16 lever -----------------------------------------------------
    def cast_nets(nets):
        def rec(tree, in_arch):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out[k] = rec(v, in_arch or k == "arch")
                elif (not in_arch and k != "arch"
                      and hasattr(v, "dtype") and v.dtype == jnp.float32
                      and getattr(v, "ndim", 0) > 0):
                    out[k] = v.astype(jnp.bfloat16)
                else:
                    out[k] = v
            return out
        return {n: (rec(t, False) if isinstance(t, dict) else t)
                for n, t in nets.items()}

    lever = {"variant": "bf16_params"}
    try:
        st16 = state.replace(nets=cast_nets(state.nets))
        st16, lever = timed(st16, "bf16_params")
        lever["speedup_vs_canonical"] = round(
            base["ms_per_step"] / lever["ms_per_step"], 3)
    except Exception as e:
        lever = {"variant": "bf16_params", "error": str(e)[:400]}
        print(json.dumps(lever), flush=True)

    result = {
        "probe": "sagan_arch_fusion_attribution",
        "batch": args.batch,
        "canonical": base,
        "top_fusions_by_device_time": trace_rows,
        "bf16_lever": lever,
        "note": ("fusion table: device self-time per op aggregated from a "
                 "jax.profiler trace over the canonical arch step; "
                 "hlo_bytes/gbps from the fusion's operand+result shapes "
                 "in the compiled HLO. bf16 lever: net params/stats cast "
                 "to bf16, alphas/opt/spectral state f32 (probe-only "
                 "retrace of the SAME engine jit — no parity constraint "
                 "on the arch step's internal dtype)."),
    }
    if not args.smoke:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
