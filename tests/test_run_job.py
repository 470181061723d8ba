"""End-to-end test of the spark-submit deployment entry
(scripts/run_job.py) — the north_rule's cluster protocol artifact.

Runs the CLI in subprocesses (it owns and stops its SparkSession):
fresh run writes profile + verdicts + violations + manifest; a
``--resume`` run over the same output skips every COMPLETE partition
(no duplicate manifest entries, identical verdicts).
"""

from __future__ import annotations

import subprocess
import sys

REPO = "/root/repo"


def _run(args: list[str]) -> str:
    out = subprocess.run(
        [sys.executable, f"{REPO}/scripts/run_job.py", *args],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_run_job_generate_and_resume(tmp_path, spark):
    outdir = str(tmp_path / "job_out")
    stdout = _run(
        ["--generate", "300", "--output", outdir, "--batch-size", "4",
         "--master", "local[8]"]
    )
    assert "profiled+validated" in stdout

    prof = spark.read.parquet(f"{outdir}/profile")
    assert prof.count() >= 6  # conv_id/turn_idx/role/text/tool/ts
    scalars = spark.read.parquet(f"{outdir}/profile_scalars")
    assert "cardinality_breakdown" not in scalars.columns
    verdicts = spark.read.parquet(f"{outdir}/verdicts")
    manifest = spark.read.parquet(f"{outdir}/manifest")
    n_manifest = manifest.count()
    assert n_manifest == 16  # one COMPLETE row per hash partition
    v_before = sorted(map(str, verdicts.collect()))

    # resume over the same output: everything already COMPLETE -> no
    # new manifest rows, verdicts unchanged
    _run(
        ["--generate", "300", "--output", outdir, "--batch-size", "4",
         "--master", "local[8]", "--resume"]
    )
    assert spark.read.parquet(f"{outdir}/manifest").count() == n_manifest
    v_after = sorted(map(str, spark.read.parquet(f"{outdir}/verdicts").collect()))
    assert v_after == v_before


def test_run_job_segment_size(tmp_path):
    """The spark-submit entry accepts --segment-size and produces the
    same verdict set as the unsegmented run."""
    import subprocess
    import sys

    outs = []
    for extra in ([], ["--segment-size", "8"]):
        out = str(tmp_path / ("seg" if extra else "plain"))
        r = subprocess.run(
            [sys.executable, "scripts/run_job.py", "--generate", "150",
             "--output", out, "--master", "local[4]"] + extra,
            capture_output=True, text=True, cwd="/root/repo", timeout=600,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        import duckdb
        rows = duckdb.sql(
            f"SELECT partition, check_name, passed, violation_count "
            f"FROM '{out}/verdicts/*.parquet' ORDER BY 1, 2"
        ).fetchall()
        outs.append(rows)
    assert outs[0] == outs[1] and len(outs[0]) > 0
