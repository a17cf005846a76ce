"""WARC revisit records (IIPC identical-payload-digest profile):
plan classification, sink/parser header contract, re-hydration, and
broadcast-vs-co-partition path equality."""

import datetime as dt
import glob
import gzip

import pyarrow as pa
import pytest

import ray
from cex_crawler_ray.sources.warc import (
    read_warc,
    resolve_revisits,
    revisit_plan,
    write_warc_deduped,
)


def _captures():
    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(20):
        u = f"https://rv.test/doc/{i}"
        body = b"text-%d" % (i % 7)  # cross-doc duplicate payloads
        rows.append((u, base + dt.timedelta(seconds=i), body))
        body2 = body + b" v2" if i % 3 == 0 else body
        rows.append((u, base + dt.timedelta(days=1, seconds=i), body2))
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "html": pa.array([r[2] for r in rows], pa.binary()),
        }
    )


def _plan_df(bmax):
    planned = revisit_plan(
        ray.data.from_arrow(_captures()), broadcast_max_digests=bmax
    )
    return (
        planned.to_pandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )


def test_plan_first_capture_semantics(ray_session):
    df = _plan_df(10**6)
    # every digest has exactly one response row, and it is the
    # (ts, url)-minimal capture of that digest
    for dg, g in df.groupby("payload_digest"):
        g = g.sort_values(["warc_ts", "url"])
        assert list(g["warc_type"])[0] == "response"
        assert all(t == "revisit" for t in list(g["warc_type"])[1:])
        first = g.iloc[0]
        for _, r in g.iloc[1:].iterrows():
            assert r["refers_url"] == first["url"]
            assert r["refers_ts"] == first["warc_ts"].strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            )
    # response rows carry no pointer
    resp = df[df["warc_type"] == "response"]
    assert (resp["refers_url"] == "").all()


def test_broadcast_and_copartition_paths_equal(ray_session):
    cols = ["url", "warc_ts", "warc_type", "refers_url", "refers_ts"]
    a = _plan_df(10**6)[cols]
    b = _plan_df(0)[cols]  # force the digest-hash co-partition join
    assert a.equals(b)


@pytest.mark.parametrize("compress", [None, "gzip"])
def test_sink_and_parser_roundtrip(ray_session, tmp_path, compress):
    out = str(tmp_path / f"rv-{compress}")
    planned = revisit_plan(ray.data.from_arrow(_captures()))
    write_warc_deduped(planned, out, compress=compress)
    back = read_warc(out, full=True).to_pandas()
    assert len(back) == 40
    rv = back[back["warc_type"] == "revisit"]
    assert len(rv) == 26  # 40 captures - 14 distinct payloads
    # revisit records store NO payload but keep the digest header
    assert (rv["payload"].map(len) == 0).all()
    assert (rv["payload_digest"].map(len) == 64).all()
    assert (rv["refers_url"] != "").all()
    # responses carry their digest too (CC convention)
    resp = back[back["warc_type"] == "response"]
    assert (resp["payload_digest"].map(len) == 64).all()
    assert (resp["payload"].map(len) > 0).all()


def test_revisit_profile_header_on_wire(ray_session, tmp_path):
    out = str(tmp_path / "wire")
    planned = revisit_plan(ray.data.from_arrow(_captures()))
    write_warc_deduped(planned, out, compress="gzip")
    raw = b"".join(
        gzip.decompress(open(p, "rb").read())
        for p in sorted(glob.glob(out + "/*.warc.gz"))
    )
    assert (
        b"WARC-Profile: http://netpreserve.org/warc/1.0/revisit/"
        b"identical-payload-digest" in raw
    )
    assert b"WARC-Payload-Digest: sha256:" in raw
    assert b"WARC-Refers-To-Target-URI: " in raw
    assert b"WARC-Refers-To-Date: " in raw


def test_prior_index_cross_crawl_dedup(ray_session, tmp_path):
    from cex_crawler_ray.sources.cdx import build_cdxj
    from cex_crawler_ray.sources.warc import prior_from_cdxj, write_warc

    base1 = dt.datetime(2024, 3, 1)
    base2 = dt.datetime(2024, 3, 11)

    def snap(base, change):
        rows = []
        for i in range(12):
            body = b"body-%d" % i
            if change and i % 3 == 0:
                body += b" v2"
            rows.append(
                (f"https://ic.test/d/{i}", base + dt.timedelta(seconds=i), body)
            )
        return ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([r[0] for r in rows], pa.string()),
                    "warc_ts": pa.array(
                        [r[1] for r in rows], pa.timestamp("us")
                    ),
                    "lang": pa.array(["en"] * len(rows), pa.string()),
                    "html": pa.array([r[2] for r in rows], pa.binary()),
                }
            )
        )

    dir1 = str(tmp_path / "c1")
    cdx1 = str(tmp_path / "x1")
    dir2 = str(tmp_path / "c2")
    write_warc(snap(base1, False), dir1, compress="gzip")
    build_cdxj(dir1, cdx1)

    planned = revisit_plan(snap(base2, True), prior=prior_from_cdxj(cdx1))
    write_warc_deduped(planned, dir2, compress="gzip")
    back = read_warc(dir2, full=True).to_pandas()
    assert len(back) == 12
    rv = back[back["warc_type"] == "revisit"]
    resp = back[back["warc_type"] == "response"]
    # unchanged pages (i % 3 != 0 -> 8 of 12) dedup against crawl 1
    assert len(rv) == 8 and len(resp) == 4
    # every revisit points INTO crawl 1 (same url, the older ts)
    assert (rv["refers_url"] == rv["url"]).all()
    assert (rv["refers_ts"].str.startswith("2024-03-01")).all()
    # crawl 2 stored only the changed payloads
    assert (resp["payload"].map(len) > 0).all()
    assert (rv["payload"].map(len) == 0).all()


def test_resolve_revisits_rehydrates_corpus(ray_session, tmp_path):
    out = str(tmp_path / "resolve")
    tbl = _captures()
    planned = revisit_plan(ray.data.from_arrow(tbl))
    write_warc_deduped(planned, out)
    res = resolve_revisits(read_warc(out, full=True)).to_pandas()
    orig = tbl.to_pandas()
    a = sorted(zip(orig["url"], orig["warc_ts"], orig["html"]))
    b = sorted(zip(res["url"], res["warc_ts"], res["payload"]))
    assert a == b
    # a self-contained archive has every referent in-archive
    assert not res["missing_referent"].any()


def test_resolve_revisits_flags_missing_referent(ray_session, tmp_path):
    """A crawl-2-only archive (revisit_plan against a prior index)
    holds revisits whose response referents live in crawl 1 — those
    rows must come back FLAGGED, never as silent empty payloads."""
    from cex_crawler_ray.sources.cdx import build_cdxj
    from cex_crawler_ray.sources.warc import prior_from_cdxj, write_warc

    def snap(base, change):
        rows = []
        for i in range(12):
            body = b"mbody-%d" % i
            if change and i % 3 == 0:
                body += b" v2"
            rows.append(
                (f"https://mr.test/d/{i}", base + dt.timedelta(seconds=i), body)
            )
        return ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([r[0] for r in rows], pa.string()),
                    "warc_ts": pa.array(
                        [r[1] for r in rows], pa.timestamp("us")
                    ),
                    "lang": pa.array(["en"] * len(rows), pa.string()),
                    "html": pa.array([r[2] for r in rows], pa.binary()),
                }
            )
        )

    dir1 = str(tmp_path / "m1")
    cdx1 = str(tmp_path / "mx1")
    dir2 = str(tmp_path / "m2")
    write_warc(snap(dt.datetime(2024, 3, 1), False), dir1)
    build_cdxj(dir1, cdx1)
    planned = revisit_plan(
        snap(dt.datetime(2024, 3, 11), True), prior=prior_from_cdxj(cdx1)
    )
    write_warc_deduped(planned, dir2)
    res = resolve_revisits(read_warc(dir2, full=True)).to_pandas()
    flagged = res[res["missing_referent"]]
    # every prior-crawl revisit is flagged with an empty payload...
    assert len(flagged) > 0
    assert (flagged["payload"].map(len) == 0).all()
    # ...and every unflagged row carries a real payload
    ok = res[~res["missing_referent"]]
    assert (ok["payload"].map(len) > 0).all()
