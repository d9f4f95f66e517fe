"""Deployment-surface test: the BASELINE north rule requires the engine
to run via ``spark-submit --py-files`` on a MULTI-EXECUTOR cluster.
local[*] cannot prove that (driver and executor share one JVM and one
sys.path, which masks missing-module and closure-shipping bugs), so
this test submits the flagship job to ``local-cluster[2,4,2048]`` —
two REAL separate executor JVMs that only see the code via the shipped
zip — and then re-submits with the same workdir to prove checkpoint
resume skips committed stages."""

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(workdir: str, rows: int = 100_000) -> dict:
    env = dict(os.environ)
    env.pop("PYSPARK_DRIVER_PYTHON", None)
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local-cluster[2,4,2048]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", os.path.join(ROOT, "dist", "geodesk_spark.zip"),
            os.path.join(ROOT, "jobs", "flagship_job.py"),
            "--rows", str(rows),
            "--workdir", workdir,
            "--partitions", "8",
        ],
        capture_output=True, text=True, timeout=420, env=env, cwd=ROOT,
    )
    assert out.returncode == 0, f"spark-submit failed:\n{out.stdout[-3000:]}\n{out.stderr[-3000:]}"
    metrics = [l for l in out.stdout.splitlines() if l.startswith('{"job": "flagship"')]
    assert metrics, f"no metrics line in stdout:\n{out.stdout[-2000:]}"
    return json.loads(metrics[-1])


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="spark-submit not on PATH")
def test_spark_submit_multi_executor(tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "make_pyfiles.py")],
        check=True, capture_output=True,
    )
    workdir = str(tmp_path / "run")

    m1 = _submit(workdir)
    assert m1["executors"] == 2  # two real executor JVMs, not local[*]
    assert m1["input_rows"] == 100_000
    assert m1["matches"] and sum(m1["matches"].values()) > 0
    for s in ("ingest", "encode", "joined", "rollup"):
        assert m1["stages"][s]["n_rows"] > 0

    # Resume: every stage is already committed — the second submit must
    # reuse the snapshots (identical results, no recompute of ingest).
    m2 = _submit(workdir)
    assert m2["matches"] == m1["matches"]
    assert m2["stages"]["ingest"]["n_rows"] == m1["stages"]["ingest"]["n_rows"]
    assert m2["elapsed_sec"] < m1["elapsed_sec"]


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="spark-submit not on PATH")
def test_spark_submit_curation_job(tmp_path):
    """The curation pipeline (scrub → LSH pairs → CC canon → pack) ships
    the same way: two real executor JVMs seeing the code only via the
    zip, every stage committed, dedup conservation law holding."""
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "make_pyfiles.py")],
        check=True, capture_output=True,
    )
    env = dict(os.environ)
    env.pop("PYSPARK_DRIVER_PYTHON", None)
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local-cluster[2,4,2048]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", os.path.join(ROOT, "dist", "geodesk_spark.zip"),
            os.path.join(ROOT, "jobs", "curation_job.py"),
            "--rows", "20000",
            "--workdir", str(tmp_path / "cur"),
            "--partitions", "8",
            "--budget", "256",
        ],
        capture_output=True, text=True, timeout=420, env=env, cwd=ROOT,
    )
    assert out.returncode == 0, f"spark-submit failed:\n{out.stdout[-3000:]}\n{out.stderr[-3000:]}"
    lines = [l for l in out.stdout.splitlines() if l.startswith('{"job": "curation"')]
    assert lines, f"no metrics line in stdout:\n{out.stdout[-2000:]}"
    m = json.loads(lines[-1])
    assert m["executors"] == 2
    assert m["input_rows"] == 20_000
    assert m["docs_kept"] + m["dup_docs_removed"] == m["input_rows"]
    assert 0 < m["docs_kept"] <= m["input_rows"]
    assert m["n_bins"] > 0 and m["n_tokens_packed"] > 0
    for s in ("ingest", "scrub", "pairs", "canon", "pack"):
        assert m["stages"][s]["n_rows"] >= 0


def test_spark_submit_zonal_job(tmp_path):
    """The zonal-overlay pipeline ships the same way: two real executor
    JVMs seeing the code only via the zip, every stage committed, the
    general (non-convex) overlay running end-to-end on image footprints."""
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "make_pyfiles.py")],
        check=True, capture_output=True,
    )
    env = dict(os.environ)
    env.pop("PYSPARK_DRIVER_PYTHON", None)
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local-cluster[2,4,2048]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", os.path.join(ROOT, "dist", "geodesk_spark.zip"),
            os.path.join(ROOT, "jobs", "zonal_job.py"),
            "--rows", "20000",
            "--zones", "48",
            "--workdir", str(tmp_path / "zon"),
            "--partitions", "8",
        ],
        capture_output=True, text=True, timeout=420, env=env, cwd=ROOT,
    )
    assert out.returncode == 0, f"spark-submit failed:\n{out.stdout[-3000:]}\n{out.stderr[-3000:]}"
    lines = [l for l in out.stdout.splitlines() if l.startswith('{"job": "zonal"')]
    assert lines, f"no metrics line in stdout:\n{out.stdout[-2000:]}"
    m = json.loads(lines[-1])
    assert m["executors"] == 2
    assert m["input_images"] == 20000 and m["districts"] == 48
    assert m["overlay_pairs"] > 0 and m["zones_hit"] > 0
    assert m["zones_hit"] <= 48


@pytest.mark.slow
@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="spark-submit not on PATH")
def test_deploy_smoke_tool_bench_scale():
    """The r4 verdict's ask #7: the bench-scale deploy smoke
    (tools/deploy_smoke.py, 200k rows via spark-submit --py-files) runs
    as part of the suite instead of manually, so the deployment surface
    is exercised every round.  Asserts the tool's own PASS verdict."""
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "deploy_smoke.py"),
         "--rows", "200000", "--master", "local[8]"],
        capture_output=True, text=True, timeout=900, cwd=ROOT,
    )
    assert out.returncode == 0, f"deploy_smoke failed:\n{out.stdout[-3000:]}\n{out.stderr[-2000:]}"
    assert "PASS " in out.stdout, out.stdout[-2000:]
