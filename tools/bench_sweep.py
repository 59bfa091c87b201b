"""Sweep bench.py over (batch, pad, dtype) on the real chip and emit a
markdown table + JSON (VERDICT r1 item: publish the reference-protocol point
AND the throughput-optimal point with MFU accounting).

Usage:  python tools/bench_sweep.py [--out BENCH_SWEEP.json]
Each point runs bench.py in-process sequentially (one TPU client).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

POINTS = [
    # (batch, pad, dtype) — batch 100 x pad 32 is the reference protocol
    (100, 32, "float32"),
    (256, 32, "float32"),
    (512, 32, "float32"),
    (1024, 32, "float32"),
    (2048, 32, "float32"),
    (1024, 24, "float32"),
    (1024, 48, "float32"),
    (100, 32, "bfloat16"),
    (1024, 32, "bfloat16"),
    (2048, 32, "bfloat16"),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(REPO, "BENCH_SWEEP.json"))
    args = p.parse_args()

    results = []
    for batch, pad, dtype in POINTS:
        pypath = os.environ.get("PYTHONPATH", "")
        env = dict(os.environ, BENCH_BATCH=str(batch), BENCH_ATOMS=str(pad),
                   BENCH_DTYPE=dtype,
                   PYTHONPATH=f"{REPO}:{pypath}" if pypath else REPO)
        print(f"--- batch={batch} pad={pad} dtype={dtype}", flush=True)
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           env=env, capture_output=True, text=True,
                           timeout=3600)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except Exception:
            print(f"FAILED: {r.stderr[-2000:]}", flush=True)
            continue
        rec.update(batch=batch, pad=pad, dtype=dtype)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)

    # markdown table
    print("\n| batch | pad | dtype | mol/s/chip | ms/step | TFLOP/s | MFU |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        ms = ""
        if "per-step" in r.get("unit", ""):
            ms = r["unit"].split("per-step")[1].strip(" )").split(" ")[0]
        print(f"| {r['batch']} | {r['pad']} | {r['dtype']} | {r['value']} | "
              f"{ms} | {r.get('tflops', '-')} | {r.get('mfu', '-')} |")


if __name__ == "__main__":
    main()
