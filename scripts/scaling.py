"""Scaling-efficiency evidence (north_rule: throughput scaling efficiency
>= 0.8 from N to 4N executors, evidenced in-sandbox by running the SAME job
at two parallelism levels on the same input).

Runs bench.py in fresh subprocesses (clean JVM each) at local[8] and
local[32] with a replication factor that gives the job enough work to
measure parallel efficiency, then writes BENCH.md.

Usage: python scripts/scaling.py [replicate] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_bench(cpus: int, replicate: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_REPLICATE=str(replicate),
        SPARK_GRAFT_SF_DIR=sf_dir,
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
    levels = tuple(
        int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "8,32").split(",")
    )
    results = {}
    for cpus in levels:
        runs = [run_bench(cpus, replicate, sf_dir) for _ in range(repeats)]
        r = min(runs, key=lambda x: x["value"])  # best-of-N: GC/IO variance
        results[cpus] = r
        print(f"local[{cpus}]: {[x['value'] for x in runs]}s wall (best {r['value']}), "
              f"{r['triples_per_sec']} triples/s, {r['triples_emitted']} triples")

    lo, hi = levels
    t8, t32 = results[lo]["value"], results[hi]["value"]
    tp8, tp32 = results[lo]["triples_per_sec"], results[hi]["triples_per_sec"]
    speedup = t8 / t32
    efficiency = speedup / (hi / lo)
    print(f"speedup {lo}->{hi}: {speedup:.2f}x, scaling efficiency: {efficiency:.2f}")

    ck8 = results[lo]["queries"].get("kg_pipeline_checkpointed")
    ck32 = results[hi]["queries"].get("kg_pipeline_checkpointed")
    md = f"""# BENCH — measured throughput and scaling efficiency

Job: end-to-end KG-construction pipeline (pages -> HTML-extract ->
R2RML-compile -> mentions -> MinHash-LSH -> connected components ->
bucketed triple write), identical input ({sf_dir}, documents fanned out
x{replicate} deterministically inside the job), identical code, two
parallelism levels — the sandbox stand-in for N vs 4N executors
(BASELINE.md scaling row). Throughput mode = fused DAG (only the final
bucketed triple table + lineage written); the checkpointed resumable mode
is timed alongside — its per-stage parquet round-trips serialize on this
host's ONE local disk (~0.6 GB/s shared), which on a real cluster is
distributed storage bandwidth that scales with executors.

| config | wall fused (s) | wall checkpointed (s) | triples emitted | triples/sec (fused) |
|---|---|---|---|---|
| local[{lo}]  (N)  | {t8} | {ck8} | {results[lo]['triples_emitted']} | {tp8} |
| local[{hi}] (4N) | {t32} | {ck32} | {results[hi]['triples_emitted']} | {tp32} |

**Speedup {lo}->{hi}: {speedup:.2f}x — scaling efficiency {efficiency:.2f}**
(target >= 0.8).

Per-query seconds at local[{hi}] (sf={results[hi]['sf']}):

```json
{json.dumps(results[hi]['queries'], indent=2)}
```
"""
    (REPO / "BENCH.md").write_text(md)
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
