"""Summarize the TPU measurement queue's outputs into one table.

The round-4/5 queue (scripts/tpu_queue_r4.sh, supervised by
tpu_queue_supervisor.sh) drops validated stage outputs under /tmp; this
host-only script (no jax import — safe while the tunnel is down) parses
them into the single current-kernel-vintage table VERDICT r4 item 7 asks
for, ready to paste into BASELINE.md.

Usage: python scripts/collect_queue_results.py
"""
import json
import os
import re
import sys

STATE = "/tmp/r4_stages"

BENCH_FILES = [
    ("bench_main", "/tmp/bench_r4_main.json", "default (dy-fold, kfold9 off)"),
    ("bench_kfold9", "/tmp/bench_r4_kfold9.json", "UNETSULC_KFOLD9=1 A/B"),
    ("bench_b2", "/tmp/bench_r4_b2.json", "batch 2 (scan per-volume)"),
    ("bench_lat", "/tmp/bench_r4_lat.json", "label latency (p50 + sweep)"),
    ("bench_fc", "/tmp/bench_r4_fc.json", "transfer: final_conv-only"),
    ("bench_dec", "/tmp/bench_r4_dec.json", "transfer: head+decoders"),
    ("bench_kfold9_r5", "/tmp/r5_kfold9.json",
     "UNETSULC_KFOLD9=1 A/B (crash-shape excluded) — LOST, default off"),
    ("bench_nmerge_r5", "/tmp/r5_nmerge.json",
     "UNETSULC_NMERGE=1 A/B — LOST, default off"),
]

LOG_FILES = [
    ("mxu", "/tmp/r4_mxu.log", r"roofline.*", "MXU K-scaling probe"),
    ("sp_memory", "/tmp/r4_sp_memory.log",
     r"(PER_DEVICE_PEAK .*|RATIO .*)", "sp per-device peak bytes"),
    ("flagship_p100", "/tmp/flagship_p100.log", r".*mean val acc.*",
     "100-epoch Pallas arm"),
    ("flagship_x100", "/tmp/flagship_x100.log", r".*mean val acc.*",
     "100-epoch XLA arm"),
    ("transfer100", "/tmp/transfer100.log", r".*mean val acc.*",
     "transfer from the 100-epoch trunk"),
    ("mxu_r5", "/tmp/r5_mxu.log", r"K=\s*\d+.*eff.*",
     "MXU K-scaling probe (fixed, round 5)"),
    ("sp_memory_r5", "/tmp/r5_sp_memory.log",
     r"(PER_DEVICE_PEAK .*|BREAKDOWN .*|RATIO .*)",
     "sp per-device peak bytes + breakdown (round 5)"),
    ("census_r5", "/tmp/r5_census.log", r"== .*",
     "sp2 vs single HLO shape census (round 5)"),
]


def ok(name: str) -> str:
    return "done" if os.path.exists(os.path.join(STATE, f"{name}.ok")) else "PENDING"


def main() -> int:
    done = 0
    print("| stage | status | result |")
    print("|---|---|---|")
    for name, path, desc in BENCH_FILES:
        status = ok(name)
        done += status == "done"
        result = ""
        if os.path.exists(path):
            lines = [
                json.loads(ln)
                for ln in open(path)
                if ln.strip().startswith("{")
            ]
            result = "; ".join(
                f"{o.get('metric')}={o.get('value')} {o.get('unit', '')}"
                f" (vs_baseline {o.get('vs_baseline')})"
                for o in lines
                if "error" not in o
            ) or "error JSON"
        print(f"| {desc} ({name}) | {status} | {result} |")
    for name, path, pat, desc in LOG_FILES:
        status = ok(name)
        done += status == "done"
        result = ""
        if os.path.exists(path):
            hits = [
                ln.strip()
                for ln in open(path, errors="replace")
                if re.match(pat, ln.strip())
            ]
            result = " / ".join(hits[-4:])
        print(f"| {desc} ({name}) | {status} | {result} |")
    total = len(BENCH_FILES) + len(LOG_FILES) + 1  # + prof stage
    prof = ok("prof")
    done += prof == "done"
    print(f"| xplane step profile (prof) | {prof} | see /tmp/r4_prof.txt |")
    print(f"\n{done}/{total} stages verified-complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
