"""End-to-end product-path benchmark: ``run_with_manifest`` wall time.

Round-2 moved uniqueness-violation attribution INTO the check (the
envelope carries partition_key at emission) so the manifest's
violations-per-partition accounting became a tiny groupBy instead of a
wide re-join of violation rows against the raw pending table. That
traded ~27% standalone-suite throughput for a claimed larger win on the
product path — this tool publishes the end-to-end number that proves
(or refutes) it: the FULL ``run_with_manifest`` cold run (manifest
scan, pending anti-join, suite, per-partition accounting, manifest
append) on the identical 32M-row parquet input, round-1 code vs
current code, at one or two parallelism levels.

Method: one subprocess per (code tree, core count) — local[N] is
process-global — each doing one warmup pass on a 50k-row slice with a
throwaway manifest dir (JIT/codegen), then ``passes`` timed passes,
each against a FRESH manifest dir (cold resume state, nothing
committed), median reported. Verdict counts are asserted identical
across variants.

Usage:
  python tools/manifest_bench.py [rows] [r1_tree] [cores...]
  # e.g. python tools/manifest_bench.py 32000000 /tmp/r1code 8 32
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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

CHILD = r"""
import json, shutil, sys, tempfile, time
repo = sys.argv[1]; cores = int(sys.argv[2]); path = sys.argv[3]; passes = int(sys.argv[4])
sys.path.insert(0, repo)
from anomaly_detector_spark.session import get_spark
from anomaly_detector_spark.plans.manifest import run_with_manifest
spark = get_spark(app_name=f"mbench{cores}", cores=cores)
files = spark.read.parquet(path)

def one_pass(df):
    mdir = tempfile.mkdtemp(prefix="mbench_manifest_")
    shutil.rmtree(mdir)  # run_with_manifest handles a missing dir (fresh state)
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    run = run_with_manifest(df, mdir)
    sec = time.perf_counter() - t0
    verd = sorted(
        (r["verdict"], r["n"]) for r in
        spark.read.parquet(mdir).groupBy("verdict").count().withColumnRenamed("count", "n").collect()
    )
    shutil.rmtree(mdir, ignore_errors=True)
    return sec, run.pending_partitions, verd

one_pass(files.limit(50000))   # warmup: JIT, codegen, python workers
times, verd = [], None
for _ in range(passes):
    sec, n_parts, v = one_pass(files)
    times.append(sec)
    verd = v
med = sorted(times)[len(times) // 2]
n_rows = files.count()
print("RESULT " + json.dumps({
    "cores": cores, "sec": round(med, 2), "times": [round(t, 2) for t in times],
    "rows": n_rows, "files_per_sec": round(n_rows / med, 1),
    "n_partitions": n_parts, "verdicts": verd,
}))
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
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    r1_tree = sys.argv[2] if len(sys.argv) > 2 else ""
    cores_list = [int(c) for c in sys.argv[3:]] or [8]
    passes = int(os.environ.get("MBENCH_PASSES", "3"))
    path = os.environ.get("SCALING_INPUT", f"/tmp/scaling_files_{rows}")

    if not os.path.isdir(path):
        print(run_py(GEN, str(rows), path).strip(), file=sys.stderr)

    trees = {"current": REPO}
    if r1_tree:
        trees["r1"] = r1_tree

    results: dict[str, dict[int, dict]] = {}
    for name, tree in trees.items():
        results[name] = {}
        # r1 only needs the comparison level (the first); current runs all
        for cores in cores_list if name == "current" else cores_list[:1]:
            out = run_py(CHILD, tree, str(cores), path, str(passes))
            line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
            results[name][cores] = json.loads(line[len("RESULT "):])
            print(f"  {name} local[{cores}]: {results[name][cores]}", file=sys.stderr)

    if "r1" in results:
        c0 = cores_list[0]
        assert results["r1"][c0]["verdicts"] == results["current"][c0]["verdicts"], (
            "variants must commit identical verdict counts"
        )
    out = {"metric": "run_with_manifest end-to-end wall time (cold manifest)", "rows": rows,
           "results": results}
    if len(cores_list) >= 2 and all(c in results["current"] for c in cores_list[:2]):
        lo, hi = cores_list[0], cores_list[1]
        eff = (
            results["current"][hi]["files_per_sec"] / results["current"][lo]["files_per_sec"]
        ) / (hi / lo)
        out["scaling_efficiency_current"] = round(eff, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
