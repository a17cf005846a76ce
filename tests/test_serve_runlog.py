"""Serving layer (reference backend.py contract) + structured run
logging with retention (reference utils.py contract)."""

import datetime
import json
import os
import urllib.request

import pandas as pd
import pytest

from cex_crawler_ray.serve import DashboardServer, ensure_html_exists
from cex_crawler_ray.state.runlog import RunLogger

_HK = datetime.timezone(datetime.timedelta(hours=8))


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}"
    ) as resp:
        return resp.status, resp.read()


def _report_csv(path):
    pd.DataFrame(
        {
            "release_time": ["2024-03-05 10:00:00"],
            "time": ["2024-03-15"],
            "exchange": ["src0"],
            "symbol": ["BTC/USDT"],
            "type": ["现货"],
            "action": ["上架"],
            "title": ["Doc 1 en"],
            "url": ["https://src0.test/articles/1"],
            "content": ["x"],
            "comments": [""],
        }
    ).to_csv(path, index=False)


def test_health_and_root_with_regeneration(tmp_path):
    csv = str(tmp_path / "announcements.csv")
    html = str(tmp_path / "announcements.html")
    _report_csv(csv)
    with DashboardServer(csv_path=csv, html_path=html) as srv:
        status, body = _get(srv.port, "/health")
        assert status == 200 and json.loads(body) == {"status": "ok"}
        assert not os.path.exists(html)
        status, body = _get(srv.port, "/")  # regenerate-if-missing
        assert status == 200
        assert b"BTC/USDT" in body and b"src0" in body
        assert os.path.exists(html)
        # second hit serves the cached file
        status2, body2 = _get(srv.port, "/")
        assert (status2, body2) == (status, body)


def test_root_404_when_csv_missing(tmp_path):
    csv = str(tmp_path / "missing.csv")
    html = str(tmp_path / "missing.html")
    with DashboardServer(csv_path=csv, html_path=html) as srv:
        try:
            _get(srv.port, "/")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
            assert "Generate CSV first" in json.loads(e.read())["detail"]


def test_ensure_html_idempotent(tmp_path):
    csv = str(tmp_path / "a.csv")
    html = str(tmp_path / "a.html")
    _report_csv(csv)
    ensure_html_exists(csv, html)
    first = open(html).read()
    ensure_html_exists(csv, html)  # no rewrite when present
    assert open(html).read() == first


def test_runlog_structure_and_retention(tmp_path):
    logs = str(tmp_path / "logs")
    t0 = datetime.datetime(2024, 3, 8, 9, 0, 0, tzinfo=_HK)
    # seed an old log beyond the 14-day window and a recent one
    os.makedirs(logs)
    old = os.path.join(logs, "2024-02-01_00-00-00.log")
    recent = os.path.join(logs, "2024-03-01_00-00-00.log")
    open(old, "w").write("{}\n")
    open(recent, "w").write("{}\n")

    rl = RunLogger(logs, now=t0)
    rl.info("round", round_no=0, fetched_ok=20)
    rl.close()
    assert not os.path.exists(old)  # pruned (> 14 days)
    assert os.path.exists(recent)  # kept
    assert os.path.basename(rl.path) == "2024-03-08_09-00-00.log"
    recs = [json.loads(l) for l in open(rl.path)]
    assert recs[0]["event"] == "round" and recs[0]["fetched_ok"] == 20
    assert recs[0]["level"] == "INFO"


def test_crawl_writes_runlog(ray_session, sf_tiny, tmp_path):
    from cex_crawler_ray.pipelines.flagship import run_flagship_crawl

    ckpt = str(tmp_path / "ck")
    run = run_flagship_crawl(sf_tiny, checkpoint_dir=ckpt, max_rounds=6)
    logdir = os.path.join(ckpt, "logs")
    files = os.listdir(logdir)
    assert len(files) == 1
    recs = [json.loads(l) for l in open(os.path.join(logdir, files[0]))]
    events = [r["event"] for r in recs]
    assert events[0] == "run_start" and events[-1] == "run_end"
    rounds = [r for r in recs if r["event"] == "round"]
    assert len(rounds) == run.rounds_done
    assert recs[-1]["seen_total"] == run.seen_set_size()
