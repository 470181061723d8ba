"""CSV source (SURVEY.md §2.1 S2) and HTML report emitter (S6)."""

import os

from datapatterns_spark.operators.profile import profile
from datapatterns_spark.report import render_profile_html, write_profile_report
from datapatterns_spark.sources.tables import read_csv, read_table, write_table


def test_read_csv_with_schema(spark, tmp_path):
    p = tmp_path / "people.csv"
    p.write_text("name|age\nDan|42\nMia|7\n")
    df = read_csv(spark, str(p), sep="|", header=True, schema="name string, age int")
    rows = {r["name"]: r["age"] for r in df.collect()}
    assert rows == {"Dan": 42, "Mia": 7}
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "int"]


def test_read_csv_infer(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = read_csv(spark, str(p))
    assert df.count() == 2 and df.schema["a"].dataType.simpleString() in ("int", "bigint")


def test_write_then_read_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    out = str(tmp_path / "t.parquet")
    write_table(df, out)
    back = read_table(spark, out)
    assert sorted(r["k"] for r in back.collect()) == [1, 2]


def test_profile_html_report(spark, tmp_path):
    df = spark.createDataFrame(
        [("Dan", 100), ("Dan", 200), ("Mia", 300), ("", 0)],
        "name string, amount int",
    )
    prof = profile(df)
    html_text = render_profile_html(prof, title="unit test profile")
    assert "unit test profile" in html_text
    assert "name" in html_text and "amount" in html_text
    assert "Dan" in html_text  # mode renders
    assert "<script" not in html_text  # dependency-free static HTML

    out = write_profile_report(prof, str(tmp_path / "r.html"))
    assert os.path.getsize(out) > 1000

    # chart parity with the reference report bundle (statChart.ts):
    # the numeric attribute gets an SVG quartile box-plot, the low-
    # cardinality one an SVG donut breakdown — still zero JS
    assert "<svg" in html_text
    assert "stroke-dasharray" in html_text  # donut segments
    assert "<rect" in html_text  # box-plot quartile box


def test_verdicts_html_report(spark, tmp_path):
    """Constraint verdicts render as a standalone pass/fail page:
    failing checks get FAIL chips with counts, passing ones PASS,
    per-partition rows present, still zero JS."""
    from datapatterns_spark.operators import constraints as C
    from datapatterns_spark.report import write_verdicts_report

    df = spark.createDataFrame(
        [("p0", 1, 10.0), ("p0", 2, -5.0), ("p1", 3, 7.0)],
        "part string, id int, value double",
    )
    checks = [
        C.row_rule("value_not_negative", "value >= 0"),
        C.row_rule("id_positive", "id > 0"),
    ]
    verdicts, _ = C.run_checks(
        df, checks, partition_col="part", key_cols=["id"]
    )
    out = write_verdicts_report(verdicts, str(tmp_path / "v.html"))
    html_text = open(out).read()
    assert "value_not_negative" in html_text and "FAIL (1)" in html_text
    assert "id_positive" in html_text and "PASS" in html_text
    assert "p0" in html_text and "p1" in html_text
    assert "<script" not in html_text


def test_report_escapes_html(spark, tmp_path):
    df = spark.createDataFrame([("<b>x</b>",), ("<b>x</b>",)], "v string")
    html_text = render_profile_html(profile(df))
    assert "<b>x</b>" not in html_text
    assert "&lt;b&gt;x&lt;/b&gt;" in html_text


def test_balance_scan_splits_single_row_group(spark, tmp_path):
    """A big single-row-group file cannot split below one task; the
    guard must repartition it to cluster width."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datapatterns_spark.sources.tables import balance_scan

    n = 30000
    tbl = pa.table({"k": list(range(n)), "v": [f"value-{i:020d}-{i * 7919}" for i in range(n)]})
    p = str(tmp_path / "one_rg.parquet")
    pq.write_table(tbl, p, row_group_size=n, compression="none")
    assert os.path.getsize(p) > 256 * 1024  # above the guard's floor
    df = balance_scan(spark.read.parquet(p))
    assert df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert df.count() == n


def test_balance_scan_leaves_splittable_inputs_alone(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datapatterns_spark.sources.tables import balance_scan

    # tiny file: single task is fine, no repartition
    tiny = str(tmp_path / "tiny.parquet")
    spark.range(10).coalesce(1).write.parquet(tiny)
    df = balance_scan(spark.read.parquet(tiny))
    assert df.count() == 10
    assert "Repartition" not in df._jdf.queryExecution().logical().toString()

    # many row groups: Spark can split by byte range, no repartition
    n = 30000
    tbl = pa.table({"k": list(range(n)), "v": [f"value-{i:020d}-{i * 7919}" for i in range(n)]})
    p = str(tmp_path / "many_rg.parquet")
    pq.write_table(tbl, p, row_group_size=n // 8, compression="none")
    df2 = balance_scan(spark.read.parquet(p))
    assert "Repartition" not in df2._jdf.queryExecution().logical().toString()
    assert df2.count() == n


def test_read_json_lines(spark, tmp_path):
    from datapatterns_spark.sources.tables import read_json

    p = tmp_path / "t.jsonl"
    p.write_text('{"name": "Dan", "age": 42}\n{"name": "Mia", "age": 7}\n')
    df = read_json(spark, str(p), schema="name string, age int")
    rows = {r["name"]: r["age"] for r in df.collect()}
    assert rows == {"Dan": 42, "Mia": 7}
    # inferred variant agrees on values
    df2 = read_json(spark, str(p))
    assert {r["name"]: r["age"] for r in df2.collect()} == rows


def test_read_orc_roundtrip(spark, tmp_path):
    from datapatterns_spark.sources.tables import read_orc

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    out = str(tmp_path / "t.orc")
    df.write.orc(out)
    back = read_orc(spark, out)
    assert sorted((r["k"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_report_cards_are_collapsible(spark):
    """Round-3: each attribute card is a native <details open> block —
    fold/unfold interactivity with zero JS (the static answer to the
    reference report's interactive widget)."""
    df = spark.createDataFrame(
        [("Dan", 100), ("Mia", 300)], "name string, amount int"
    )
    html_text = render_profile_html(profile(df))
    assert html_text.count("<details class='card' open>") == 2
    assert html_text.count("</details>") == 2
    assert html_text.count("<summary>") == 2
    assert "<script" not in html_text  # still dependency-free
