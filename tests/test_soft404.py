"""Soft-404 content classifier: reason priority, status gating,
binary-column input, vectorized kernel edge cases."""

import pyarrow as pa

import ray
from cex_crawler_ray.stages.soft404 import classify_soft404

LONG_OK = (
    "<html><title>Quarterly Report</title><body>"
    + "All systems operating within expected parameters. " * 3
    + "</body></html>"
)


def _run(rows, **kw):
    tbl = pa.table(
        {
            "status": pa.array([r[0] for r in rows], pa.int64()),
            "html": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    out = classify_soft404(ray.data.from_arrow(tbl), **kw).to_pandas()
    return list(out["soft404_reason"]), list(out["is_soft404"])


def test_reason_priority_and_branches(ray_session):
    reasons, flags = _run(
        [
            (200, "<html><title>404 Not Found</title><body>"
                  "this page was not found on the server ok then"
                  "</body></html>"),  # title wins over phrase
            (200, "<html><title>Oops</title><body>Sorry, this page"
                  " does not exist anymore, try searching instead."
                  "</body></html>"),  # phrase
            (200, "<html><body>hi</body></html>"),  # tiny
            (200, LONG_OK),  # clean
        ]
    )
    assert reasons == ["title_404", "phrase", "tiny", ""]
    assert flags == [True, True, True, False]


def test_hard_404_not_reflagged(ray_session):
    reasons, flags = _run(
        [(404, "<html><title>404 Not Found</title></html>"), (200, LONG_OK)]
    )
    assert reasons == ["", ""]
    assert flags == [False, False]


def test_no_status_column_mode(ray_session):
    tbl = pa.table(
        {"html": pa.array(["<html><body>x</body></html>", LONG_OK])}
    )
    out = classify_soft404(
        ray.data.from_arrow(tbl), status_col=None
    ).to_pandas()
    assert list(out["soft404_reason"]) == ["tiny", ""]


def test_binary_payload_and_nulls(ray_session):
    tbl = pa.table(
        {
            "status": pa.array([200, 200], pa.int64()),
            "html": pa.array(
                [LONG_OK.encode("utf-8"), None], pa.binary()
            ),
        }
    )
    out = classify_soft404(ray.data.from_arrow(tbl)).to_pandas()
    assert list(out["soft404_reason"]) == ["", "tiny"]  # null -> empty


def test_title_error_word(ray_session):
    reasons, _ = _run(
        [(200, "<html><title>Server Error</title><body>"
               + "y" * 100 + "</body></html>")]
    )
    assert reasons == ["title_404"]
