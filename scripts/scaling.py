"""Scaling-efficiency evidence (north_rule: throughput scaling efficiency
>= 0.8 from N to 4N executors, evidenced in-sandbox by running the SAME job
at two parallelism levels on the same input).

Round-3 protocol (falsifiable round over round):

- the PIPELINE runs at each parallelism level in a fresh subprocess JVM
  (bench.py, SPARK_GRAFT_SKIP_QUERIES=1), best-of-N;
- the PINNED host-ceiling probe (scripts/probe.py, PROBE_VERSION frozen)
  runs at the same levels — it measures what any job with the pipeline's
  work shape can attain on this host (one shared memory subsystem);
- TWO operating-point pairs are reported (default 4->16 and 8->32), each
  with raw efficiency, probe-ceiling efficiency, and normalized =
  raw / ceiling;
- results replace only the marker-delimited scaling section of BENCH.md.

Usage: python scripts/scaling.py [replicate] [sf_dir]
Env:   SPARK_GRAFT_SCALE_PAIRS="4:16,8:32"  SPARK_GRAFT_SCALING_REPEATS=2
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

BEGIN = "<!-- scaling:begin -->"
END = "<!-- scaling:end -->"


def _subproc_json(args: list[str], env_extra: dict[str, str], timeout: int = 3600,
                  cpus: int | None = None) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    if cpus is not None and os.path.exists("/usr/bin/taskset"):
        # pin the WHOLE subprocess (JVM + Python) to exactly `cpus` cores:
        # an unpinned local[8] JVM still runs GC/netty/shuffle threads on
        # all 32 cores, silently inflating the low-core baseline and
        # DEFLATING measured scaling efficiency.  A real N-core executor
        # host bounds everything at N — taskset is the honest emulation.
        # Applied identically to pipeline and probe runs so the
        # normalization stays apples-to-apples.
        args = ["taskset", "-c", f"0-{cpus - 1}"] + args
    out = subprocess.run(args, env=env, capture_output=True, text=True, timeout=timeout)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"no JSON from {args}: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def run_bench(cpus: int, replicate: int, sf_dir: str) -> dict:
    return _subproc_json(
        [sys.executable, str(REPO / "bench.py")],
        {
            "SPARK_GRAFT_CPUS": str(cpus),
            "SPARK_GRAFT_REPLICATE": str(replicate),
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "SPARK_GRAFT_SKIP_QUERIES": "1",
            "SPARK_GRAFT_SKIP_CKPT": "1",
        },
        cpus=cpus,
    )


def loadavg() -> list[float]:
    """External-tenant noise indicator: this sandbox shares its host, and
    measured walls vary ~2x with co-tenant load. Recording /proc/loadavg
    around the sweep makes every number auditable for that."""
    return [float(x) for x in Path("/proc/loadavg").read_text().split()[:3]]


QUIET_LOAD = float(os.environ.get("SPARK_GRAFT_QUIET_LOAD", "4.0"))
QUIET_WAIT_S = int(os.environ.get("SPARK_GRAFT_QUIET_WAIT", "2700"))


def wait_for_quiet() -> list[float]:
    """Block until the host's 1-minute loadavg drops below QUIET_LOAD (or
    QUIET_WAIT_S elapses).  Co-tenant storms on this shared host move
    measured walls by 2x+; gating every run on a quiet window is the
    declared protocol, and the load at launch is recorded per run so the
    gate itself is auditable."""
    t0 = time.time()
    while True:
        la = loadavg()
        if la[0] < QUIET_LOAD or time.time() - t0 > QUIET_WAIT_S:
            return la
        time.sleep(30)


def run_probe(cpus: int) -> dict:
    return _subproc_json(
        [sys.executable, str(REPO / "scripts" / "probe.py")],
        {"SPARK_GRAFT_CPUS": str(cpus)},
        cpus=cpus,
    )


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))
    pairs = [
        tuple(int(x) for x in p.split(":"))
        for p in os.environ.get("SPARK_GRAFT_SCALE_PAIRS", "4:16,8:32").split(",")
    ]
    levels = sorted({c for p in pairs for c in p})
    if os.environ.get("SPARK_GRAFT_LEVEL_ORDER", "asc") == "desc":
        # measurement order doesn't enter the math (each level is gated and
        # probe-annotated independently); descending runs the fast,
        # spike-sensitive 16/32 levels inside a fresh quiet window instead
        # of spending it on the slow 4-core baseline first
        levels = levels[::-1]

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    load_start = loadavg()
    bench: dict[int, dict] = {}
    probe: dict[int, dict] = {}
    for cpus in levels:
        runs = []
        loads = []
        probes = []

        def one_run():
            # interleave pipeline + probe inside the SAME quiet window so a
            # storm starting mid-sweep poisons both equally (normalization
            # stays meaningful); each run records load at launch AND finish
            la = wait_for_quiet()
            r = run_bench(cpus, replicate, sf_dir)
            r["load_at_finish"] = loadavg()
            loads.append(la)
            runs.append(r)
            probes.append(run_probe(cpus))

        for _ in range(repeats):
            one_run()
        # storm recovery: the gate checks load at LAUNCH, but a co-tenant
        # storm can start mid-run and blow a wall up 2x.  If the spread of
        # the pipeline walls OR of the (30s, interleaved) probe walls
        # exceeds 15%, take up to 3 extra gated runs — the median over all
        # runs then sits in the clean cluster.  The probe spread is the
        # sharper storm detector: its clean run-to-run variance is a few
        # percent, so 15%+ means a dirty window even when the pipeline
        # walls happen to agree.  All walls are recorded; none discarded.
        def _dirty() -> bool:
            for vals in ([x["value"] for x in runs], [p["wall"] for p in probes]):
                vs = sorted(vals)
                if (vs[-1] - vs[0]) / vs[len(vs) // 2] > 0.15:
                    return True
            return False

        for _ in range(3):
            if not _dirty():
                break
            print(f"local[{cpus}]: wall/probe spread > 15% of median — "
                  "extra gated run")
            one_run()
        walls = [x["value"] for x in runs]
        med = median(walls)
        bench[cpus] = min(runs, key=lambda x: abs(x["value"] - med))
        bench[cpus]["value"] = round(med, 3)
        bench[cpus]["all_walls"] = walls
        bench[cpus]["spread"] = round(max(walls) - min(walls), 3)
        bench[cpus]["launch_loadavg"] = loads
        pwalls = [p["wall"] for p in probes]
        probe[cpus] = probes[0]
        probe[cpus]["wall"] = round(median(pwalls), 3)
        probe[cpus]["all_walls"] = pwalls
        print(
            f"local[{cpus}]: pipeline {walls}s "
            f"(median {bench[cpus]['value']}, spread {bench[cpus]['spread']}), "
            f"probe {pwalls} (median {probe[cpus]['wall']}), "
            f"launch load {[round(l[0], 1) for l in loads]}"
        )

    rows = []
    summary = {}
    for lo, hi in pairs:
        raw = bench[lo]["value"] / bench[hi]["value"] / (hi / lo)
        ceil = probe[lo]["wall"] / probe[hi]["wall"] / (hi / lo)
        norm = raw / ceil if ceil > 0 else float("nan")
        rows.append((lo, hi, raw, ceil, norm))
        summary[f"{lo}->{hi}"] = {
            "raw_eff": round(raw, 3),
            "probe_ceiling_eff": round(ceil, 3),
            "normalized": round(norm, 3),
        }
        print(f"{lo}->{hi}: raw eff {raw:.2f}, probe ceiling {ceil:.2f}, "
              f"normalized {norm:.2f}")

    probe_ver = probe[levels[0]]["probe"]
    table_levels = "\n".join(
        f"| local[{c}] | {bench[c]['value']} | {bench[c]['triples_per_sec']} "
        f"| {probe[c]['wall']} |"
        for c in levels
    )
    table_pairs = "\n".join(
        f"| {lo}->{hi} (N->4N) | {raw:.2f} | {ceil:.2f} | **{norm:.2f}** |"
        for lo, hi, raw, ceil, norm in rows
    )
    section = f"""{BEGIN}
## Scaling efficiency — two operating points, pinned ceiling probe

Job: fused KG pipeline at {sf_dir}, documents fanned out x{replicate}
deterministically in-job; fresh subprocess JVM per run, median-of-{repeats}
(all walls + spread in scaling_results.json); every run (pipeline AND
probe) is taskset-pinned to exactly its core budget, because an unpinned
local[N] JVM runs GC/netty threads on all 32 cores and inflates the
low-core baseline;
per-query timings skipped (SPARK_GRAFT_SKIP_QUERIES=1) so nothing else
touches the session. Every run is gated on a quiet co-tenant window
(1-min loadavg < {QUIET_LOAD} at launch, recorded per run in
scaling_results.json) — this sandbox shares its host and storms move
walls 2x+. Probe = scripts/probe.py `{probe_ver}` (definition
frozen in-repo; measures this host's attainable speedup for the pipeline's
work shape: string split/lower + crc32 + numeric array transforms, no disk,
no shuffle, no Python). One 32-core box shares one memory subsystem — the
probe quantifies that ceiling so the normalization is falsifiable.

| config | pipeline wall (s) | triples/sec | probe wall (s) |
|---|---|---|---|
{table_levels}

| pair | raw efficiency | probe ceiling | normalized (raw/ceiling) |
|---|---|---|---|
{table_pairs}

On a real cluster, 4N executors bring 4N memory subsystems and 4N disks —
the probe-measured host terms scale with the fleet, while the plan-structural
terms (shuffle count, barrier count, broadcast placement) are what this repo
controls and are audited in the stage decomposition below.

```json
{json.dumps({"probe": probe_ver, "replicate": replicate,
             "repeats": repeats, "pairs": summary,
             "host_loadavg_start": load_start,
             "host_loadavg_end": loadavg()}, indent=1)}
```

(host_loadavg is /proc/loadavg [1m,5m,15m] around the sweep: this sandbox
shares its host with other tenants and measured walls vary up to 2x with
their load — the probe runs interleaved at each level, so the NORMALIZED
column is the noise-robust number.)
{END}"""

    bench_md = (REPO / "BENCH.md").read_text()
    if BEGIN in bench_md and END in bench_md:
        pre = bench_md.split(BEGIN)[0]
        post = bench_md.split(END)[1]
        bench_md = pre + section + post
    else:
        bench_md = section + "\n\n" + bench_md
    (REPO / "BENCH.md").write_text(bench_md)
    stamp = {"ts": time.time(), "bench": {str(k): v for k, v in bench.items()},
             "probe": {str(k): v for k, v in probe.items()}, "pairs": summary,
             "host_loadavg": {"start": load_start, "end": loadavg()}}
    (REPO / "scaling_results.json").write_text(json.dumps(stamp, indent=1))
    print("wrote BENCH.md + scaling_results.json")


if __name__ == "__main__":
    main()
