"""End-to-end `spark-submit --py-files <zip>` packaging test.

The north rule requires the engine to ship as a --py-files zip on a
multi-executor cluster (reference deploys as a docker'd consumer,
/root/reference/main.py:1-53; our deployment surface is spark-submit).
This test proves the WHOLE product path — CLI arg parsing, manifest
resume, fused suite, Arrow-UDF drift kernels, violations sink, atomic
manifest commit — runs in a FRESH spark-submit JVM whose only route to
the package is the zip:

* the repo is stripped from PYTHONPATH and cwd is a scratch dir, so a
  driver-side `import anomaly_detector_spark` can only resolve via the
  --py-files entry spark-submit prepends;
* executors unpickle the applyInPandas/mapInPandas kernels (drift's
  PSI/KS, quantile digests) — closures by design, but here they also
  exercise the zip distribution path end-to-end;
* a second identical submit must be a no-op resume (manifest pruning
  across JVMs, not just across sessions).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile
from pathlib import Path

import pyspark
import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = Path(pyspark.__file__).parent / "bin" / "spark-submit"

LAUNCHER = "import sys\nfrom anomaly_detector_spark.cli import main\nsys.exit(main())\n"


def _build_zip(dest: Path) -> Path:
    zpath = dest / "anomaly_detector_spark.zip"
    pkg = REPO / "anomaly_detector_spark"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(pkg.rglob("*.py")):
            if "__pycache__" in p.parts:
                continue
            zf.write(p, p.relative_to(REPO))
    return zpath


def _submit(zpath: Path, script: Path, cwd: Path, *cli_args: str):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    out = subprocess.run(
        [
            str(SPARK_SUBMIT),
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", str(zpath),
            str(script), *cli_args,
        ],
        capture_output=True, text=True, timeout=600, cwd=str(cwd), env=env,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    summaries = [l for l in out.stdout.splitlines() if l.startswith('{"run_id"')]
    assert len(summaries) == 1, out.stdout[-2000:]
    return json.loads(summaries[0])


@pytest.mark.skipif(not SPARK_SUBMIT.exists(), reason="spark-submit not installed")
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    from anomaly_detector_spark.synth import synth_files

    input_dir = tmp_path / "files"
    synth_files(spark, 6000, seed=7).write.parquet(str(input_dir))

    zpath = _build_zip(tmp_path)
    script = tmp_path / "launch.py"
    script.write_text(LAUNCHER)
    manifest = tmp_path / "manifest"
    violations = tmp_path / "violations"

    summary = _submit(
        zpath, script, tmp_path,
        "--input", str(input_dir), "--manifest", str(manifest),
        "--violations", str(violations), "--run-id", "submit-1",
    )
    assert summary["run_id"] == "submit-1"
    assert summary["pending_partitions"] > 0
    assert not summary["noop_resume"]
    assert summary["verdicts"].get("PASS", 0) > 0
    # planted violations (dups + unknown langs) must reach the sink
    viol = spark.read.parquet(str(violations))
    assert viol.count() > 0
    committed = spark.read.parquet(str(manifest))
    assert committed.where("status = 'committed'").count() > 0

    # identical re-submit in another fresh JVM: resume prunes everything
    summary2 = _submit(
        zpath, script, tmp_path,
        "--input", str(input_dir), "--manifest", str(manifest),
        "--violations", str(violations), "--run-id", "submit-2",
    )
    assert summary2["noop_resume"]
    assert summary2["pending_partitions"] == 0
