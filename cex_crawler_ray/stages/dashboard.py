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
import json as _json
import os

import pandas as pd

_CSS = (
    "body{font-family:system-ui,sans-serif;margin:0;background:#f8fafc;"
    "color:#0f172a}"
    ".wrap{max-width:1100px;margin:0 auto;padding:16px}"
    ".bar{display:flex;gap:12px;align-items:center;padding:10px 16px;"
    "border-bottom:1px solid #e5e7eb;background:#fff;position:sticky;top:0}"
    ".bar .n{font-size:12px;color:#475569;margin-left:auto}"
    "details{margin:12px 0;border:1px solid #e5e7eb;border-radius:10px;"
    "background:#fff;overflow:hidden}"
    "summary{cursor:pointer;padding:10px 14px;display:flex;gap:10px;"
    "align-items:center}"
    "summary h2{display:inline;font-size:15px;margin:0}"
    ".pill{font-size:11px;padding:2px 8px;border-radius:999px;"
    "border:1px solid #e5e7eb;color:#475569;background:#f8fafc}"
    "table{width:100%;border-collapse:collapse}"
    "th{font-size:11px;text-align:left;color:#475569;padding:8px 10px;"
    "border-top:1px solid #e5e7eb}"
    "td{font-size:13px;padding:8px 10px;border-top:1px solid #e5e7eb}"
    "tr.r:hover{background:#f1f5f9;cursor:pointer}"
    ".tag{font-size:11px;padding:1px 6px;border-radius:6px;"
    "border:1px solid #e5e7eb}"
    ".tag.spot{color:#065f46;background:#d1fae5}"
    ".tag.fut{color:#7c2d12;background:#ffedd5}"
    "a{color:#2563eb;text-decoration:none}"
    "#viewer{white-space:pre-wrap;background:#fff;border:1px solid #e5e7eb;"
    "border-radius:10px;padding:12px;margin:12px 0;min-height:60px;"
    "color:#334155;font-size:13px}"
)

# Original, minimal client-side behavior matching the reference
# dashboard's FEATURE SET (generate_html.py:135-218: date-range filter
# over release_time/time, group-by-exchange render, per-group counts,
# row click shows the full announcement content) — not its markup.
_JS = """
function rowsIn(s,e){var out=[];for(var i=0;i<DATA.length;i++){
 var r=DATA[i];var t=Date.parse(r.release_time||r.time||'');
 if(isNaN(t)){out.push(i);continue;}
 if((!s||t>=s)&&(!e||t<=e+86399999))out.push(i);}return out;}
function draw(){
 var s=Date.parse(document.getElementById('s').value||'');
 var e=Date.parse(document.getElementById('e').value||'');
 var keep={};rowsIn(s,e).forEach(function(i){keep[i]=1;});
 var n=0;
 document.querySelectorAll('tr.r').forEach(function(tr){
  var on=keep[tr.dataset.i]===1;tr.style.display=on?'':'none';
  if(on)n++;});
 document.querySelectorAll('details').forEach(function(d){
  var c=d.querySelectorAll('tr.r:not([style*="none"])').length;
  d.querySelector('.pill').textContent=c+' rows';});
 document.getElementById('count').textContent=n+' announcements';}
document.addEventListener('click',function(ev){
 var tr=ev.target.closest('tr.r');if(!tr)return;
 var r=DATA[tr.dataset.i];
 document.getElementById('viewer').textContent=
  (r.title||'')+'\\n\\n'+(r.content||'');});
window.addEventListener('load',draw);
"""


def render_dashboard(report_df, title: str = "Announcements") -> str:
    """report rows (release_time, time, exchange, symbol, type, action,
    title, url, content, comments) -> self-contained HTML string with
    the reference dashboard's behavior (``generate_html.py:21-218``):
    rows sorted by PARSED time desc then exchange asc, grouped into
    collapsible per-exchange sections with row counts, spot/futures
    type tags, a date-range filter over release_time/time, and a
    click-to-view pane showing the full announcement content.  Markup,
    styling and script are original; only the data contract and
    feature set mirror the reference."""
    df = report_df.copy()
    if "content" not in df.columns:
        df["content"] = ""
    st = pd.to_datetime(df["time"], errors="coerce")
    df = (
        df.assign(_st=st)
        .sort_values(["_st", "exchange"], ascending=[False, True])
        .drop(columns=["_st"])
        .reset_index(drop=True)
    )
    records = df.to_dict(orient="records")
    groups = []
    for exchange, g in df.groupby("exchange", sort=True):
        rows = "\n".join(
            f'<tr class="r" data-i="{i}">'
            f"<td>{_html.escape(str(r.time))}</td>"
            f"<td>{_html.escape(str(r.symbol))}</td>"
            f"<td>{_html.escape(str(r.action))}</td>"
            f'<td><span class="tag '
            f'{"fut" if str(r.type) == "合约" else "spot"}">'
            f"{_html.escape(str(r.type))}</span></td>"
            f'<td><a href="{_html.escape(str(r.url))}">'
            f"{_html.escape(str(r.title))}</a></td>"
            "</tr>"
            for i, r in zip(g.index, g.itertuples())
        )
        groups.append(
            f"<details open><summary><h2>{_html.escape(str(exchange))}"
            f'</h2><span class="pill">{len(g)} rows</span></summary>'
            "<table><thead><tr><th>time</th><th>symbol</th><th>action</th>"
            "<th>type</th><th>announcement</th></tr></thead>"
            f"<tbody>{rows}</tbody></table></details>"
        )
    body = "\n".join(groups)
    data = _json.dumps(records, ensure_ascii=False, default=str).replace(
        "</", "<\\/"
    )
    return (
        "<!DOCTYPE html><html lang='zh-CN'><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title>"
        f"<style>{_CSS}</style></head><body>"
        f'<div class="bar"><strong>{_html.escape(title)}</strong>'
        ' <label>start <input type="date" id="s" onchange="draw()"></label>'
        ' <label>end <input type="date" id="e" onchange="draw()"></label>'
        ' <span class="n" id="count"></span></div>'
        f'<div class="wrap"><div id="viewer">'
        "Select a row to view full content</div>\n"
        f"{body}\n</div>"
        f"<script>const DATA = {data};{_JS}</script>"
        "</body></html>"
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
