"""Two-parallelism scaling benchmark (the north_rule's N vs 4N evidence).

A real 2-cluster-size run is impossible in this sandbox, so per the
driver instruction we run the IDENTICAL job on the IDENTICAL input at
two local parallelism levels and report throughput at both plus

    efficiency = (throughput_hi / throughput_lo) / (cores_hi / cores_lo)

Phases:
  1. parent: synthesize the files table once to parquet (deterministic,
     seed-pinned) — input bytes identical for both runs;
  2. one subprocess per core count (local[N] is process-global): warm up
     the JVM with a small slice, then time the FULL validation suite
     (stats + uniqueness + referential + drift) end-to-end, twice,
     keeping the best;
  3. parent: compute files/sec at each level + efficiency, print JSON.

Usage: python tools/scaling_bench.py [rows] [lo_cores] [hi_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, "%(repo)s")
cores = int(sys.argv[1]); path = sys.argv[2]
suite_name = sys.argv[3] if len(sys.argv) > 3 else "default"
from anomaly_detector_spark.session import get_spark
from anomaly_detector_spark.plans.suite import constraint_suite, default_suite, extended_suite, run_suite
mk = {"default": default_suite, "extended": extended_suite, "constraint": constraint_suite}[suite_name]
spark = get_spark(app_name=f"scale{cores}", cores=cores)

def one_pass(df):
    spark.catalog.clearCache()         # drift's internal caches are plan-keyed;
    t0 = time.perf_counter()           # clear so every pass does the real work
    res = run_suite(df, suite=mk(), cache=False)
    n_verd = res.verdicts.count()
    n_viol = res.violations.count()
    return time.perf_counter() - t0, n_verd, n_viol

files = spark.read.parquet(path)
one_pass(files)                        # full warmup: JIT, codegen, python workers
times = []
for _ in range(5):
    sec, n_verd, n_viol = one_pass(files)
    times.append(sec)
med = sorted(times)[len(times) // 2]
n_rows = files.count()
print("RESULT " + json.dumps({
    "cores": cores, "sec": round(med, 2), "times": [round(t, 2) for t in times],
    "rows": n_rows, "files_per_sec": round(n_rows / med, 1),
    "verdicts": n_verd, "violations": n_viol,
}))
"""

GEN = r"""
import sys
sys.path.insert(0, "%(repo)s")
from anomaly_detector_spark.session import get_spark
from anomaly_detector_spark.synth import synth_files
spark = get_spark(app_name="gen", cores=32)
df = synth_files(spark, int(sys.argv[1]), seed=42, partitions=64)
df.write.mode("overwrite").parquet(sys.argv[2])
print("GENERATED", spark.read.parquet(sys.argv[2]).count())
"""


def run_py(code: str, *args: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code % {"repo": REPO}, *args],
        capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit(f"child failed: {args}")
    return out.stdout


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    suite_name = sys.argv[4] if len(sys.argv) > 4 else "default"
    path = os.environ.get("SCALING_INPUT", f"/tmp/scaling_files_{rows}")

    if not os.path.isdir(path):
        print(run_py(GEN, str(rows), path).strip(), file=sys.stderr)

    results = {}
    for cores in (lo, hi):
        out = run_py(CHILD, str(cores), path, suite_name)
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        results[cores] = json.loads(line[len("RESULT "):])
        print(f"  local[{cores}]: {results[cores]}", file=sys.stderr)

    r_lo, r_hi = results[lo], results[hi]
    assert (r_lo["verdicts"], r_lo["violations"]) == (r_hi["verdicts"], r_hi["violations"]), (
        "verdicts must be invariant to parallelism"
    )
    eff = (r_hi["files_per_sec"] / r_lo["files_per_sec"]) / (hi / lo)
    print(json.dumps({
        "metric": "validation-suite (%s) throughput scaling, local[%d] vs local[%d]" % (suite_name, lo, hi),
        "rows": rows,
        "lo": r_lo, "hi": r_hi,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
