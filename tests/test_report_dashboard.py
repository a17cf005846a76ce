"""Report pivots, CSV sinks, dashboard render, LLM analyzer stage."""

import os

import pandas as pd
import pytest

import ray


@pytest.fixture(scope="module")
def report(ray_session, sf_tiny):
    from cex_crawler_ray.pipelines.flagship import (
        AS_OF_DATE,
        futures_cex_for,
        records_for,
        spot_cex_for,
    )
    from cex_crawler_ray.stages.report import build_report

    return build_report(
        records_for(sf_tiny),
        AS_OF_DATE,
        spot_cex_for(sf_tiny),
        futures_cex_for(sf_tiny),
        offset_days=14,
    )


def test_pivot_shape(report, sf_tiny):
    from cex_crawler_ray.pipelines.flagship import spot_cex_for

    pv = report["spot"]()
    # every spot exchange appears as a column (missing ones filled "")
    for ex in spot_cex_for(sf_tiny):
        assert ex in pv.columns
    assert pv.index.name == "time"
    # cell content: space-joined descriptions ending with newline
    non_empty = [
        v for v in pv.to_numpy().ravel() if isinstance(v, str) and v
    ]
    assert non_empty and all(v.endswith("\n") for v in non_empty)


def test_csv_sinks(report, tmp_path):
    from cex_crawler_ray.stages.dashboard import write_report_csvs

    paths = write_report_csvs(report, str(tmp_path))
    assert set(paths) == {"full", "spot", "futures"}
    full = pd.read_csv(paths["full"])
    assert {"release_time", "time", "exchange", "symbol"} <= set(full.columns)
    assert len(full) > 0
    assert os.path.getsize(paths["spot"]) > 0


def test_dashboard_render(report, tmp_path):
    from cex_crawler_ray.stages.dashboard import write_dashboard

    df = report["full"].to_pandas()
    out = write_dashboard(df, str(tmp_path / "dash.html"))
    html = open(out, encoding="utf-8").read()
    assert html.startswith("<!DOCTYPE html>")
    # grouped by exchange, one section per exchange present
    for ex in sorted(df["exchange"].unique())[:3]:
        assert f"<h2>{ex}</h2>" in html
    # a known symbol appears
    assert "BTC/USDT" in html


def test_llm_analyzer_stage_with_fake_client(ray_session, sf_tiny):
    import json

    from cex_crawler_ray.pipelines.flagship import article_rows, run_flagship_crawl
    from cex_crawler_ray.stages.analyze import LLMAnalyzerStage

    def factory():
        def client(text):
            return json.dumps(
                {
                    "listings": [
                        {"symbol": "FAKE/USDT", "action": "上架",
                         "type": "现货", "time": "2024-01-01"}
                    ],
                    "delistings": [],
                }
            )

        return client

    run = run_flagship_crawl(sf_tiny)
    extracted = article_rows(run.extracted_dataset()).limit(20)
    out = extracted.map_batches(
        LLMAnalyzerStage,
        fn_constructor_kwargs={"client_factory": factory},
        batch_size=8,
        concurrency=1,
        batch_format="pyarrow",
    ).to_pandas()
    ok_rows = out[out["symbol"].notna()]
    assert (ok_rows["symbol"] == "FAKE/USDT").all()
    assert len(ok_rows) > 0


def test_llm_analyzer_falls_back_on_error(ray_session):
    import pyarrow as pa

    from cex_crawler_ray.stages.analyze import LLMAnalyzerStage

    def bad_factory():
        def client(text):
            raise RuntimeError("api down")

        return client

    stage = LLMAnalyzerStage(client_factory=bad_factory)
    batch = pa.table(
        {
            "url": ["u"],
            "exchange": ["e"],
            "title": ["t"],
            "release_time": ["2024-01-01 00:00:00"],
            "text": ["上架 BTC/USDT"],
            "status": ["ok"],
        }
    )
    out = stage(batch)
    assert out["symbol"].to_pylist() == ["BTC/USDT"]
    assert out["action"].to_pylist() == ["上架"]
