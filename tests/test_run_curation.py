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


def test_run_curation_minhash_near_dups_and_resume(tmp_path, spark):
    """--dedup minhash: NEAR-duplicates (one word changed out of 30)
    dedup across batches via the signature store; resume is a no-op;
    resuming with different partitioning fails fast instead of
    remapping hash partitions under COMPLETE manifest rows."""
    rows = []
    for u in range(40):
        words = [f"w{u}word{k}" for k in range(30)]
        rows.append((u * 100, " ".join(words)))
        for c in (1, 2):  # near-copies: one word differs
            near = words[:-1] + [f"changed{c}"]
            rows.append((u * 100 + c, " ".join(near)))
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    outdir = str(tmp_path / "mh_out")
    args = ["--docs", src, "--output", outdir, "--partitions", "8",
            "--batch-size", "4", "--master", "local[8]",
            "--dedup", "minhash", "--minhash-threshold", "0.8"]
    stdout = _run(args)
    assert "curated 120 docs -> kept 40" in stdout
    data = spark.read.parquet(f"{outdir}/data")
    assert data.count() == 40
    # exactly one survivor per near-dup group
    import pyspark.sql.functions as F

    groups = data.select((F.col("doc_id") / 100).cast("long").alias("g"))
    assert groups.distinct().count() == 40
    # signature store holds 64 longs per SURVIVOR only
    sigs = spark.read.parquet(f"{outdir}/sigs")
    assert sigs.count() == 40
    assert sum(c.startswith("m") for c in sigs.columns) == 64

    # resume: all partitions COMPLETE -> nothing reprocessed
    stdout2 = _run([*args, "--resume"])
    assert "curated 0 docs" in stdout2

    # resume with a different P: fail fast (partition remap would
    # silently skip/double-process documents)
    import subprocess
    import sys as _sys

    bad = subprocess.run(
        [_sys.executable, f"{REPO}/scripts/run_curation.py",
         "--docs", src, "--output", outdir, "--partitions", "16",
         "--batch-size", "4", "--master", "local[8]",
         "--dedup", "minhash", "--minhash-threshold", "0.8", "--resume"],
        capture_output=True, text=True, timeout=420,
    )
    assert bad.returncode != 0
    assert "refusing to --resume" in (bad.stderr + bad.stdout)

    # a NON-resume run into the same output with different params is
    # just as wrong (it would inherit the old sigs store + data
    # partitions): refuse without --overwrite...
    bad2 = subprocess.run(
        [_sys.executable, f"{REPO}/scripts/run_curation.py",
         "--docs", src, "--output", outdir, "--partitions", "16",
         "--batch-size", "4", "--master", "local[8]",
         "--dedup", "minhash", "--minhash-threshold", "0.8"],
        capture_output=True, text=True, timeout=420,
    )
    assert bad2.returncode != 0
    assert "refusing to run into this --output" in (bad2.stderr + bad2.stdout)
    # ...and with --overwrite the old store/data/manifest are cleared,
    # so the reparameterized run produces a fresh, correct result
    stdout3 = _run(
        ["--docs", src, "--output", outdir, "--partitions", "16",
         "--batch-size", "4", "--master", "local[8]",
         "--dedup", "minhash", "--minhash-threshold", "0.8", "--overwrite"]
    )
    assert "curated 120 docs -> kept 40" in stdout3
    assert spark.read.parquet(f"{outdir}/data").count() == 40
    assert spark.read.parquet(f"{outdir}/manifest").count() == 16
