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


def test_report_escapes_html(spark, tmp_path):
    df = spark.createDataFrame([("<b>x</b>",), ("<b>x</b>",)], "v string")
    html_text = render_profile_html(profile(df))
    assert "<b>x</b>" not in html_text
    assert "&lt;b&gt;x&lt;/b&gt;" in html_text
