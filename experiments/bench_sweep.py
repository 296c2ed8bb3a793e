"""Bench A/B sweep: batch x bucket-count for the MatterGen-class sampler.

VERDICT r2 #4: the 3-bucket headline traded MFU (0.45 -> 0.27) for only
+13% structs/s at batch 64. This driver measures the full grid so bench.py's
default operating point is chosen from data, not habit:

    python experiments/bench_sweep.py [batches=64,256] [buckets=1,2,3]

Each cell re-invokes bench.py in a FRESH process (the compilation cache
carries compiled programs across cells where shapes repeat) and archives one
JSON line per cell into experiments/results/bench_sweep.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str]) -> None:
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    batches = [int(x) for x in kv.get("batches", "64,256").split(",")]
    buckets = [int(x) for x in kv.get("buckets", "1,2,3").split(",")]
    out_path = kv.get("out", "experiments/results/bench_sweep.json")

    rows = []
    for b in batches:
        for nb in buckets:
            env = dict(os.environ, BENCH_BATCH=str(b), BENCH_BUCKETS=str(nb))
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                capture_output=True, text=True, env=env, cwd=REPO,
                timeout=1800,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                rec = {"error": proc.stderr.strip()[-500:]}
            rec.update(batch=b, buckets=nb)
            rows.append(rec)
            print(f"[sweep] batch={b} buckets={nb}: "
                  f"{rec.get('value')} structs/s MFU {rec.get('mfu')}",
                  flush=True)

    with open(out_path, "w") as fh:
        json.dump(rows, fh, indent=2)
        fh.write("\n")
    best = max((r for r in rows if "value" in r), key=lambda r: r["value"])
    print(f"[sweep] best: batch={best['batch']} buckets={best['buckets']} "
          f"{best['value']} structs/s MFU {best['mfu']} -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1:])
