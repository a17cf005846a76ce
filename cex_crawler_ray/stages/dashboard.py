"""Static HTML dashboard renderer — the report-serving layer.

Reference analog: ``generate_html.py:5-218`` renders
``announcements.csv`` into a static page (grouped by exchange, sorted
by time desc then exchange asc — ``generate_html.py:21-35,135-137``),
served by a FastAPI backend (``backend.py:11-41``).

Here the render is a driver-side function over the (small) report
table — the heavy lifting (filter/sort/group) happened in the Dataset
report layer; rendering 10^2-10^3 rows is not cluster work.  No web
framework dependency: the output is a self-contained HTML file.
"""

from __future__ import annotations

import html as _html
import os


def render_dashboard(report_df, title: str = "Announcements") -> str:
    """report rows (release_time, time, exchange, symbol, type, action,
    title, url, comments) -> self-contained HTML string."""
    df = report_df.sort_values(
        ["time", "exchange"], ascending=[False, True]
    )
    groups = []
    for exchange, g in df.groupby("exchange", sort=True):
        rows = "\n".join(
            "<tr>"
            f"<td>{_html.escape(str(r.time))}</td>"
            f"<td>{_html.escape(str(r.symbol))}</td>"
            f"<td>{_html.escape(str(r.action))}</td>"
            f"<td>{_html.escape(str(r.type))}</td>"
            f'<td><a href="{_html.escape(str(r.url))}">'
            f"{_html.escape(str(r.title))}</a></td>"
            "</tr>"
            for r in g.itertuples()
        )
        groups.append(
            f"<section><h2>{_html.escape(str(exchange))}</h2>"
            "<table><thead><tr><th>time</th><th>symbol</th><th>action</th>"
            "<th>type</th><th>announcement</th></tr></thead>"
            f"<tbody>{rows}</tbody></table></section>"
        )
    body = "\n".join(groups)
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title>"
        "<style>body{font-family:sans-serif;margin:2em}"
        "table{border-collapse:collapse}td,th{border:1px solid #ccc;"
        "padding:4px 8px}section{margin-bottom:2em}</style>"
        f"</head><body><h1>{_html.escape(title)}</h1>\n{body}\n</body></html>"
    )


def write_dashboard(report_df, out_path: str, title: str = "Announcements") -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    html_text = render_dashboard(report_df, title)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(html_text)
    return out_path


def write_report_csvs(report: dict, out_dir: str) -> dict:
    """K4: the reference's three CSVs (``main.py:67,85,94``) —
    ``announcements.csv`` + spot/futures pivots."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    full_df = report["full"].to_pandas()
    paths["full"] = os.path.join(out_dir, "announcements.csv")
    full_df.to_csv(paths["full"], index=False)
    for market in ("spot", "futures"):
        pv = report[market]()
        paths[market] = os.path.join(out_dir, f"announcements_{market}.csv")
        pv.to_csv(paths[market], index=True)
    return paths
