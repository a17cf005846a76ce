"""CLI entry points — the ``python main.py`` / ``python -m
exchange.<name>`` analog (reference ``main.py:188-194``,
``exchange/binance.py:297-304``), submitted to a cluster with
``ray job submit -- python -m cex_crawler_ray.cli crawl ...``.

Owns its Ray session (guarded init), unlike the library modules.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address="local", **kwargs)


def cmd_crawl(args) -> int:
    _ensure_ray(args.num_cpus)
    from .pipelines.flagship import run_flagship_crawl

    run = run_flagship_crawl(
        args.sf_dir,
        replicate=args.replicate,
        checkpoint_dir=args.checkpoint,
        max_rounds=args.max_rounds,
    )
    print(
        json.dumps(
            {
                "rounds": run.rounds_done,
                "fetched": run.fetched_table().num_rows,
                "seen": run.seen_set_size(),
                "metrics": [m.__dict__ for m in run.metrics],
                "lineage": run.lineage,
            }
        )
    )
    return 0


def cmd_report(args) -> int:
    _ensure_ray(args.num_cpus)
    from .pipelines.flagship import (
        AS_OF_DATE,
        futures_cex_for,
        records_for,
        spot_cex_for,
    )
    from .stages.dashboard import write_dashboard, write_report_csvs
    from .stages.report import build_report

    report = build_report(
        records_for(args.sf_dir),
        AS_OF_DATE,
        spot_cex_for(args.sf_dir),
        futures_cex_for(args.sf_dir),
    )
    paths = write_report_csvs(report, args.out)
    paths["dashboard"] = write_dashboard(
        report["full"].to_pandas(), f"{args.out}/announcements.html"
    )
    print(json.dumps(paths))
    return 0


def cmd_compact(args) -> int:
    """GC consumed frontier state from a crawl checkpoint (keeps the
    manifest's live paths + the union output partitions)."""
    from .pipelines.crawl import compact_checkpoint

    report = compact_checkpoint(args.checkpoint)
    print(json.dumps(report))
    return 0


def cmd_serve(args) -> int:
    """Serve the dashboard (reference backend.py:14-41): /health and /,
    regenerating the HTML from the consolidated CSV when missing.
    Needs no Ray session — serving is driver-side by design."""
    from .serve import DashboardServer

    srv = DashboardServer(
        csv_path=args.csv, html_path=args.html, port=args.port
    )
    print(json.dumps({"port": srv.port, "csv": args.csv, "html": args.html}))
    srv.serve_forever()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="cex_crawler_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the flagship crawl")
    c.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    c.add_argument("--replicate", type=int, default=1)
    c.add_argument("--checkpoint", default=None)
    c.add_argument("--max-rounds", type=int, default=60)
    c.set_defaults(fn=cmd_crawl)

    r = sub.add_parser("report", help="crawl + analyze + report CSVs/HTML")
    r.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    r.add_argument("--out", default="/tmp/cex_crawler_ray_report")
    r.set_defaults(fn=cmd_report)

    g = sub.add_parser("compact", help="GC consumed frontier checkpoint state")
    g.add_argument("--checkpoint", required=True)
    g.set_defaults(fn=cmd_compact)

    s = sub.add_parser("serve", help="serve the dashboard (/, /health)")
    s.add_argument("--csv", default="/tmp/cex_crawler_ray_report/announcements.csv")
    s.add_argument("--html", default="/tmp/cex_crawler_ray_report/announcements.html")
    s.add_argument("--port", type=int, default=8888)
    s.set_defaults(fn=cmd_serve, needs_ray=False)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
