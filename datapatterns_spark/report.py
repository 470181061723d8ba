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
details.card>summary{cursor:pointer;list-style:none;display:flex;
align-items:baseline;gap:12px}
details.card>summary::before{content:'\25BE';color:#999;font-size:11px}
details.card[open]>summary{margin-bottom:6px}
details.card:not([open])>summary::before{content:'\25B8'}
details.card>summary h2{display:inline;margin:0}
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


_DONUT_COLORS = [
    "#4a90d9", "#e8883a", "#56a35a", "#c75b5b", "#8a6fc9",
    "#b4a03c", "#4aa8a0", "#c267a8", "#7c8b52", "#737f8c",
]


def _donut(items, rec: int) -> str:
    """Inline-SVG donut of the low-cardinality value breakdown — the
    static analogue of the reference report's per-attribute pie
    (report/src/index.ts Pie over cardinality_breakdown).  Segments are
    proportional to rec_count; values beyond the palette fold into an
    'other' slice."""
    if not items:
        return ""
    counts = [(str(i.get("value", "")), int(i["rec_count"])) for i in items]
    shown = counts[: len(_DONUT_COLORS) - 1]
    rest = sum(c for _, c in counts[len(shown):])
    if rest:
        shown.append(("(other)", rest))
    total = sum(c for _, c in shown) or 1
    r, cx, cy, sw = 32.0, 40, 40, 14
    circ = 2 * 3.141592653589793 * r
    segs, legend, offset = [], [], 0.0
    for idx, (label, cnt) in enumerate(shown):
        frac = cnt / total
        color = _DONUT_COLORS[idx % len(_DONUT_COLORS)]
        segs.append(
            f"<circle r='{r}' cx='{cx}' cy='{cy}' fill='none' "
            f"stroke='{color}' stroke-width='{sw}' "
            f"stroke-dasharray='{frac * circ:.2f} {circ:.2f}' "
            f"stroke-dashoffset='{-offset * circ:.2f}' "
            f"transform='rotate(-90 {cx} {cy})'/>"
        )
        legend.append(
            f"<div class='barrow'><span style='display:inline-block;width:9px;"
            f"height:9px;background:{color}'></span> {_esc(label)} "
            f"&times;{cnt} ({100 * frac:.1f}%)</div>"
        )
        offset += frac
    return (
        "<div style='display:flex;align-items:center;gap:12px'>"
        f"<svg width='80' height='80' viewBox='0 0 80 80'>{''.join(segs)}</svg>"
        f"<div>{''.join(legend)}</div></div>"
    )


def _boxplot(row: dict) -> str:
    """Inline-SVG quartile box-plot (min, q1, median, q3, max) — the
    static analogue of the reference report's QuartileCandlestick
    (report/src/statChart.ts:71-139)."""
    keys = (
        "numeric_min", "numeric_lower_quartile", "numeric_median",
        "numeric_upper_quartile", "numeric_max",
    )
    try:
        q = [float(row[k]) for k in keys if row.get(k) is not None]
    except (TypeError, ValueError):
        return ""
    if len(q) != 5:
        return ""
    lo, hi = q[0], q[4]
    span = (hi - lo) or 1.0
    w, pad = 360, 12

    def x(v: float) -> float:
        return pad + (v - lo) / span * (w - 2 * pad)

    x0, x1, x2, x3, x4 = (x(v) for v in q)
    mid, half = 26, 9
    parts = [
        f"<line x1='{x0:.1f}' y1='{mid}' x2='{x1:.1f}' y2='{mid}' stroke='#888'/>",
        f"<line x1='{x3:.1f}' y1='{mid}' x2='{x4:.1f}' y2='{mid}' stroke='#888'/>",
        f"<line x1='{x0:.1f}' y1='{mid - half}' x2='{x0:.1f}' y2='{mid + half}' stroke='#888'/>",
        f"<line x1='{x4:.1f}' y1='{mid - half}' x2='{x4:.1f}' y2='{mid + half}' stroke='#888'/>",
        f"<rect x='{x1:.1f}' y='{mid - half}' width='{max(x3 - x1, 1):.1f}' "
        f"height='{2 * half}' fill='#cfe2f5' stroke='#4a90d9'/>",
        f"<line x1='{x2:.1f}' y1='{mid - half}' x2='{x2:.1f}' y2='{mid + half}' "
        f"stroke='#1c5a9e' stroke-width='2'/>",
        f"<text x='{x0:.1f}' y='{mid + half + 12}' font-size='9' "
        f"text-anchor='middle' fill='#666'>{q[0]:g}</text>",
        f"<text x='{x4:.1f}' y='{mid + half + 12}' font-size='9' "
        f"text-anchor='middle' fill='#666'>{q[4]:g}</text>",
        f"<text x='{x2:.1f}' y='{mid - half - 3}' font-size='9' "
        f"text-anchor='middle' fill='#1c5a9e'>{q[2]:g}</text>",
    ]
    return (
        f"<svg width='{w}' height='62' viewBox='0 0 {w} 62'>"
        + "".join(parts)
        + "</svg>"
    )


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
        # <details open>: each attribute card folds/unfolds natively —
        # the zero-JS answer to the reference report's interactive
        # ECL-Watch widget (index.ts); default-open keeps the printed
        # / fully-expanded reading identical to previous rounds
        parts = [
            f"<details class='card' open><summary><h2>{_esc(row['attribute'])}</h2>",
            f"<span class='meta'>{' &middot; '.join(meta_bits)}</span></summary>",
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
                + _donut(row["cardinality_breakdown"], rec)
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
        box = _boxplot(row)
        if box:
            parts.append("<div class='section'>distribution</div>" + box)
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
        parts.append("</details>")
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


def render_verdicts_html(
    verdicts_df: DataFrame, title: str = "Validation Verdicts"
) -> str:
    """Render a constraint-suite verdict frame
    (``operators.constraints.run_checks`` output: one row per
    (partition, check) with passed / violation_count / metric /
    sample_violations) as a standalone HTML page: per-check summary
    with pass/fail chips, then the per-partition grid.  The verdict
    frame is bounded (partitions x checks rows), so the collect is
    driver-safe at any data scale."""
    rows = [r.asDict(recursive=True) for r in verdicts_df.collect()]
    by_check: dict[str, list[dict]] = {}
    for r in rows:
        by_check.setdefault(str(r.get("check_name")), []).append(r)
    chips, sections = [], []
    for check, rs in sorted(by_check.items()):
        failed = [r for r in rs if not r.get("passed")]
        total_viol = sum(int(r.get("violation_count") or 0) for r in rs)
        ok = not failed
        color = "#2d8a3e" if ok else "#c0392b"
        chips.append(
            f"<span style='display:inline-block;margin:2px 6px 2px 0;"
            f"padding:2px 10px;border-radius:10px;background:{color};"
            f"color:#fff;font-size:12px'>{_esc(check)}"
            f" {'PASS' if ok else f'FAIL ({total_viol})'}</span>"
        )
        body = []
        for r in sorted(rs, key=lambda x: str(x.get("partition"))):
            mark = "✓" if r.get("passed") else "✗"
            mcolor = "#2d8a3e" if r.get("passed") else "#c0392b"
            samples = r.get("sample_violations")
            sample_s = (
                f" <span style='color:#aaa'>e.g. {_esc(samples[:3] if isinstance(samples, list) else samples)}</span>"
                if samples and not r.get("passed")
                else ""
            )
            body.append(
                f"<tr><td>{_esc(r.get('partition'))}</td>"
                f"<td style='color:{mcolor}'><b>{mark}</b></td>"
                f"<td>{int(r.get('violation_count') or 0)}</td>"
                f"<td>{_esc(r.get('metric'))}{sample_s}</td></tr>"
            )
        sections.append(
            f"<div class='card'><h2>{_esc(check)}</h2>"
            "<table class='stats'><tr><td><b>partition</b></td>"
            "<td><b>ok</b></td><td><b>violations</b></td>"
            "<td><b>metric</b></td></tr>"
            + "".join(body)
            + "</table></div>"
        )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_esc(title)}</title><style>{_CSS}</style></head>"
        f"<body><h1>{_esc(title)}</h1>"
        f"<div class='meta'>{len(by_check)} checks &middot; "
        f"{len(rows)} (partition, check) verdicts</div>"
        f"<div>{''.join(chips)}</div>"
        + "".join(sections)
        + "</body></html>"
    )


def write_verdicts_report(
    verdicts_df: DataFrame, path: str, title: str = "Validation Verdicts"
) -> str:
    """Write the verdict report to ``path`` and return the path."""
    html_text = render_verdicts_html(verdicts_df, title=title)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(html_text)
    return path
