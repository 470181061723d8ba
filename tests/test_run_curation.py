"""End-to-end test of the curation job surface
(scripts/run_curation.py): gates + cross-batch incremental dedup +
manifest resume, driven as the CLI subprocess it ships as."""

from __future__ import annotations

import subprocess
import sys

REPO = "/root/repo"


def _run(args: list[str]) -> str:
    out = subprocess.run(
        [sys.executable, f"{REPO}/scripts/run_curation.py", *args],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_run_curation_dedups_across_batches_and_resumes(tmp_path, spark):
    # corpus with cross-partition duplicates: 60 unique texts, each
    # repeated under 3 different doc_ids (hash partitioning scatters
    # the copies across batches)
    rows = []
    for u in range(60):
        for c in range(3):
            rows.append((u * 100 + c, f"unique document text number {u} "
                                      f"with enough words to pass"))
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    outdir = str(tmp_path / "cur_out")
    stdout = _run(
        ["--docs", src, "--output", outdir, "--partitions", "8",
         "--batch-size", "4", "--master", "local[8]"]
    )
    assert "curated 180 docs -> kept 60" in stdout

    data = spark.read.parquet(f"{outdir}/data")
    kept = [r["text"] for r in data.collect()]
    assert len(kept) == 60 and len(set(kept)) == 60  # one survivor per text
    manifest = spark.read.parquet(f"{outdir}/manifest")
    assert manifest.count() == 8

    # resume: everything COMPLETE -> no new manifest rows, data same
    stdout2 = _run(
        ["--docs", src, "--output", outdir, "--partitions", "8",
         "--batch-size", "4", "--master", "local[8]", "--resume"]
    )
    assert "curated 0 docs" in stdout2
    assert spark.read.parquet(f"{outdir}/manifest").count() == 8
    assert spark.read.parquet(f"{outdir}/data").count() == 60
