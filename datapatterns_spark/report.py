"""Standalone HTML report emitter for Profile results.

Analogue of the reference's ECL Watch visualization bundle
(/root/reference/report/src/index.ts:1-??, statChart.ts) and the
manifest that ships it (/root/reference/Profile.manifest:1-5): the
reference renders each profiled attribute as a card with its type,
fill rate, cardinality, mode/pattern charts and numeric stats.  Here
the (tiny — one row per attribute) profile result is collected to the
driver and rendered as a dependency-free static HTML file with inline
CSS bar charts — no JS framework, so it opens anywhere.

This is presentation only; it never feeds back into the engine.
"""

from __future__ import annotations

import html as _html

from pyspark.sql import DataFrame

_CSS = """
body{font-family:system-ui,sans-serif;margin:24px;background:#fafafa;color:#222}
h1{font-size:20px} .card{background:#fff;border:1px solid #ddd;border-radius:6px;
padding:12px 16px;margin:12px 0;box-shadow:0 1px 2px rgba(0,0,0,.04)}
.card h2{font-size:15px;margin:0 0 6px 0;font-family:monospace}
.meta{color:#666;font-size:12px;margin-bottom:8px}
table.stats{border-collapse:collapse;font-size:12px;margin:4px 0}
table.stats td{padding:1px 10px 1px 0}
.bar{display:inline-block;height:10px;background:#4a90d9;vertical-align:middle}
.barrow{font-size:11px;font-family:monospace;white-space:nowrap}
.fillwrap{background:#eee;width:160px;display:inline-block;height:10px}
.section{font-size:11px;color:#888;text-transform:uppercase;margin-top:8px}
"""


def _esc(v) -> str:
    return _html.escape("" if v is None else str(v))


def _bar_list(items, total: int) -> str:
    """Rows of `value  count  ▇▇▇` with width ∝ count."""
    if not items:
        return "<div class='barrow'>&mdash;</div>"
    mx = max(int(i["rec_count"]) for i in items) or 1
    rows = []
    for i in items:
        cnt = int(i["rec_count"])
        w = max(2, int(120 * cnt / mx))
        label = i.get("value", i.get("data_pattern", ""))
        ex = i.get("example")
        ex_s = f" <span style='color:#aaa'>e.g. {_esc(ex)}</span>" if ex else ""
        rows.append(
            f"<div class='barrow'>{_esc(label)} &times;{cnt} "
            f"<span class='bar' style='width:{w}px'></span>{ex_s}</div>"
        )
    return "".join(rows)


def _num_stats(row: dict) -> str:
    keys = [
        ("numeric_min", "min"), ("numeric_max", "max"), ("numeric_mean", "mean"),
        ("numeric_std_dev", "std dev"), ("numeric_lower_quartile", "q1"),
        ("numeric_median", "median"), ("numeric_upper_quartile", "q3"),
    ]
    cells = [
        f"<td>{lbl}</td><td><b>{_esc(row[k])}</b></td>"
        for k, lbl in keys if k in row and row.get(k) is not None
    ]
    if not cells:
        return ""
    return (
        "<div class='section'>numeric</div><table class='stats'>"
        + "".join(f"<tr>{c}</tr>" for c in cells)
        + "</table>"
    )


def render_profile_html(profile_df: DataFrame, title: str = "Data Profile") -> str:
    """Render a collected Profile result to a standalone HTML string."""
    rows = [r.asDict(recursive=True) for r in profile_df.collect()]
    cards = []
    for row in rows:
        rec = int(row.get("rec_count") or 0)
        fill = row.get("fill_rate")
        fill_html = ""
        if fill is not None:
            pct = max(0.0, min(100.0, float(fill)))
            fill_html = (
                f"<div class='barrow'>fill {pct:.2f}% "
                f"<span class='fillwrap'><span class='bar' "
                f"style='width:{int(1.6 * pct)}px'></span></span></div>"
            )
        meta_bits = [f"type {_esc(row.get('given_attribute_type'))}"]
        if row.get("best_attribute_type"):
            meta_bits.append(f"best {_esc(row['best_attribute_type'])}")
        if row.get("cardinality") is not None:
            meta_bits.append(f"cardinality {row['cardinality']}")
        meta_bits.append(f"rows {rec}")
        parts = [
            f"<div class='card'><h2>{_esc(row['attribute'])}</h2>",
            f"<div class='meta'>{' &middot; '.join(meta_bits)}</div>",
            fill_html,
        ]
        lengths = [row.get(k) for k in ("min_length", "max_length", "ave_length")]
        if all(v is not None for v in lengths):
            parts.append(
                "<div class='section'>lengths</div><table class='stats'><tr>"
                f"<td>min</td><td><b>{lengths[0]}</b></td>"
                f"<td>max</td><td><b>{lengths[1]}</b></td>"
                f"<td>ave</td><td><b>{lengths[2]}</b></td></tr></table>"
            )
        if row.get("modes"):
            parts.append("<div class='section'>modes</div>" + _bar_list(row["modes"], rec))
        if row.get("cardinality_breakdown"):
            parts.append(
                "<div class='section'>cardinality breakdown</div>"
                + _bar_list(row["cardinality_breakdown"], rec)
            )
        if row.get("popular_patterns"):
            parts.append(
                "<div class='section'>popular patterns</div>"
                + _bar_list(row["popular_patterns"], rec)
            )
        if row.get("rare_patterns"):
            parts.append(
                "<div class='section'>rare patterns</div>"
                + _bar_list(row["rare_patterns"], rec)
            )
        parts.append(_num_stats(row))
        if row.get("correlations"):
            corr_rows = "".join(
                f"<tr><td>{_esc(c['attribute'])}</td><td><b>{c['corr']}</b></td></tr>"
                for c in row["correlations"]
            )
            parts.append(
                "<div class='section'>correlations</div>"
                f"<table class='stats'>{corr_rows}</table>"
            )
        parts.append("</div>")
        cards.append("".join(parts))
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_esc(title)}</title><style>{_CSS}</style></head>"
        f"<body><h1>{_esc(title)}</h1>"
        f"<div class='meta'>{len(rows)} attributes</div>"
        + "".join(cards)
        + "</body></html>"
    )


def write_profile_report(profile_df: DataFrame, path: str, title: str = "Data Profile") -> str:
    """Write the HTML report to ``path`` and return the path."""
    html_text = render_profile_html(profile_df, title=title)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(html_text)
    return path
