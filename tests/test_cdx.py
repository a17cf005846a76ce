"""CDXJ index over WARC shards: SURT keys, offset correctness (plain
and per-record-gzip), two-level cluster.idx lookup, random-access
record fetch."""

import gzip
import hashlib
import os

import numpy as np
import pyarrow as pa
import pytest

from cex_crawler_ray.sources.cdx import (
    build_cdxj,
    cdx_lookup,
    fetch_record,
    index_warc_bytes,
    read_cdxj,
    surt_key,
    surt_key_batch,
)
from cex_crawler_ray.sources.warc import write_warc


def test_surt_scalar():
    assert (
        surt_key("https://www.sub.example.com/a?b=2&a=1")
        == "com,example,sub)/a?a=1&b=2"
    )
    assert surt_key("http://Example.COM") == "com,example)/"
    assert surt_key("http://example.com:80/x") == "com,example)/x"
    assert surt_key("https://example.com:443/x") == "com,example)/x"
    assert surt_key("https://example.com:8443/x") == "com,example:8443)/x"
    assert surt_key("http://a.b/p#frag") == "b,a)/p"
    # whitespace percent-encodes: CDXJ lines are space-delimited, so a
    # dirty key must never break line framing
    assert surt_key("not a url") == "not%20a%20url"
    assert surt_key("https://a.b/p q") == "b,a)/p%20q"
    assert surt_key("https://a.b/p%20q") == "b,a)/p%2520q"


def test_surt_batch_matches_scalar():
    urls = [
        "https://www.sub.example.com/a?b=2&a=1",
        "http://Example.COM",
        "http://example.com:8080/x",
        "https://plain.host/just/path",
        "http://a.b/p#frag",
        "not a url",
        "https://a.b/p q",
        "https://x.y.z/deep/path/page.html",
    ]
    assert surt_key_batch(urls) == [surt_key(u) for u in urls]


def _pages(n=60, hosts=3):
    base = np.datetime64("2024-03-01T00:00:00")
    return pa.table(
        {
            "url": pa.array(
                [
                    f"https://h{i % hosts}.cdx.test/doc/{i}"
                    for i in range(n)
                ],
                pa.string(),
            ),
            "warc_ts": pa.array(
                [(base + np.timedelta64(i, "s")).item() for i in range(n)],
                pa.timestamp("us"),
            ),
            "lang": pa.array(["en"] * n, pa.string()),
            "html": pa.array(
                [f"payload-{i:04d}-".encode() * (i % 7 + 1) for i in range(n)],
                pa.binary(),
            ),
        }
    )


@pytest.mark.parametrize("compress", [None, "gzip"])
def test_index_offsets_address_records(ray_session, tmp_path, compress):
    import ray

    pages = _pages()
    warc_dir = str(tmp_path / ("warc_gz" if compress else "warc"))
    write_warc(
        ray.data.from_arrow(pages).repartition(4),
        warc_dir,
        compress=compress,
    )
    # index every shard by hand and fetch every record back via
    # (offset, length)
    want = {
        u: p
        for u, p in zip(
            pages["url"].to_pylist(), pages["html"].to_pylist()
        )
    }
    seen = 0
    for fn in sorted(os.listdir(warc_dir)):
        path = os.path.join(warc_dir, fn)
        with open(path, "rb") as f:
            data = f.read()
        cols = index_warc_bytes(data, fn)
        for url, off, ln, dig, plen in zip(
            cols["url"],
            cols["offset"],
            cols["length"],
            cols["digest"],
            cols["payload_len"],
        ):
            rec = fetch_record(
                {"filename": fn, "offset": off, "length": ln}, warc_dir
            )
            assert rec["url"] == url
            assert rec["payload"] == want[url]
            assert plen == len(want[url])
            assert dig == hashlib.sha256(want[url]).hexdigest()
            seen += 1
    assert seen == pages.num_rows


def test_build_lookup_fetch_end_to_end(ray_session, tmp_path):
    import ray

    pages = _pages(n=120, hosts=5)
    warc_dir = str(tmp_path / "warc")
    cdx_dir = str(tmp_path / "cdx")
    write_warc(
        ray.data.from_arrow(pages).repartition(6), warc_dir, compress="gzip"
    )
    build_cdxj(warc_dir, cdx_dir)

    assert os.path.exists(os.path.join(cdx_dir, "cluster.idx"))
    # index shards are globally sorted and cluster.idx ranges are
    # ordered and disjoint
    with open(os.path.join(cdx_dir, "cluster.idx")) as f:
        rows = [line.split("\t") for line in f.read().splitlines()]
    assert sum(int(r[3]) for r in rows) == pages.num_rows
    for a, b in zip(rows, rows[1:]):
        assert a[1] <= b[0]  # last(prev) <= first(next)

    back = read_cdxj(cdx_dir).to_pandas()
    assert len(back) == pages.num_rows
    assert sorted(back["url"]) == sorted(pages["url"].to_pylist())
    # the Dataset read returns rows sorted within + across shards
    by_name = back.sort_values(["surt", "ts"]).reset_index(drop=True)
    assert list(by_name["surt"]) == sorted(back["surt"])

    want = {
        u: p
        for u, p in zip(pages["url"].to_pylist(), pages["html"].to_pylist())
    }
    for i in (0, 7, 63, 119):
        url = pages["url"][i].as_py()
        hits = cdx_lookup(cdx_dir, url)
        assert len(hits) == 1
        rec = fetch_record(hits[0], warc_dir)
        assert rec["payload"] == want[url]
    assert cdx_lookup(cdx_dir, "https://nowhere.test/none") == []


def test_duplicate_captures_sorted_by_ts(ray_session, tmp_path):
    """Two captures of the same URL at different times: both indexed,
    lookup returns them timestamp-ordered."""
    import ray

    base = np.datetime64("2024-03-01T00:00:00")
    t = pa.table(
        {
            "url": pa.array(
                ["https://dup.cdx.test/page"] * 2 + ["https://dup.cdx.test/z"],
                pa.string(),
            ),
            "warc_ts": pa.array(
                [
                    (base + np.timedelta64(k, "h")).item()
                    for k in (5, 1, 2)
                ],
                pa.timestamp("us"),
            ),
            "lang": pa.array(["en"] * 3, pa.string()),
            "html": pa.array([b"v2", b"v1", b"zz"], pa.binary()),
        }
    )
    warc_dir = str(tmp_path / "warc")
    cdx_dir = str(tmp_path / "cdx")
    write_warc(ray.data.from_arrow(t), warc_dir)
    build_cdxj(warc_dir, cdx_dir)
    hits = cdx_lookup(cdx_dir, "https://dup.cdx.test/page")
    assert [h["ts"] for h in hits] == sorted(h["ts"] for h in hits)
    assert len(hits) == 2
    payloads = [fetch_record(h, warc_dir)["payload"] for h in hits]
    assert payloads == [b"v1", b"v2"]


def test_cdx_diff_latest_capture_wins(ray_session, tmp_path):
    """A snapshot holding two captures of one URL diffs on the LATEST
    capture's digest."""
    import ray

    from cex_crawler_ray.sources.cdx import build_cdxj, cdx_diff

    base = np.datetime64("2024-03-01T00:00:00")

    def snap(rows):
        return pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array(
                    [
                        (base + np.timedelta64(r[1], "h")).item()
                        for r in rows
                    ],
                    pa.timestamp("us"),
                ),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "html": pa.array([r[2] for r in rows], pa.binary()),
            }
        )

    u = "https://d.test/p"
    a_rows = [(u, 1, b"old"), (u, 2, b"new")]  # latest digest: "new"
    b_rows = [(u, 3, b"new")]
    dirs = {}
    for name, rows in (("a", a_rows), ("b", b_rows)):
        wd, cd = str(tmp_path / f"w{name}"), str(tmp_path / f"c{name}")
        write_warc(ray.data.from_arrow(snap(rows)), wd)
        build_cdxj(wd, cd)
        dirs[name] = cd
    out = cdx_diff(dirs["a"], dirs["b"]).to_pandas()
    assert out.to_dict("records") == [{"url": u, "change": "same"}]


def test_bulk_lookup_and_fetch(ray_session, tmp_path):
    """Dataset-of-urls resolution + grouped selective fetch: hits
    resolve to exact payloads, misses drop."""
    import ray

    from cex_crawler_ray.sources.cdx import (
        build_cdxj,
        cdx_bulk_lookup,
        fetch_resolved,
    )

    pages = _pages(n=90, hosts=4)
    warc_dir = str(tmp_path / "warc")
    cdx_dir = str(tmp_path / "cdx")
    write_warc(
        ray.data.from_arrow(pages).repartition(5), warc_dir, compress="gzip"
    )
    build_cdxj(warc_dir, cdx_dir)
    want = {
        u: p
        for u, p in zip(pages["url"].to_pylist(), pages["html"].to_pylist())
    }
    qs = [u for i, u in enumerate(pages["url"].to_pylist()) if i % 4 == 2]
    queries = ray.data.from_arrow(
        pa.table({"url": pa.array(qs + ["https://miss.test/x"], pa.string())})
    )
    got = fetch_resolved(
        cdx_bulk_lookup(cdx_dir, queries), warc_dir
    ).to_pandas()
    assert sorted(got["url"]) == sorted(qs)  # miss dropped
    for u, p in zip(got["url"], got["payload"]):
        assert bytes(p) == want[u]


def test_dirty_url_survives_index_roundtrip(ray_session, tmp_path):
    """A capture whose Target-URI contains spaces must not corrupt the
    space-delimited CDXJ line framing for its whole shard."""
    import ray

    base = np.datetime64("2024-03-01T00:00:00")
    t = pa.table(
        {
            "url": pa.array(
                ["https://d.test/p q", "https://d.test/clean"], pa.string()
            ),
            "warc_ts": pa.array(
                [(base + np.timedelta64(k, "s")).item() for k in (1, 2)],
                pa.timestamp("us"),
            ),
            "lang": pa.array(["en", "en"], pa.string()),
            "html": pa.array([b"dirty", b"clean"], pa.binary()),
        }
    )
    warc_dir, cdx_dir = str(tmp_path / "w"), str(tmp_path / "c")
    write_warc(ray.data.from_arrow(t), warc_dir, compress="gzip")
    build_cdxj(warc_dir, cdx_dir)
    back = read_cdxj(cdx_dir).to_pandas()
    assert sorted(back["url"]) == sorted(t["url"].to_pylist())
    hits = cdx_lookup(cdx_dir, "https://d.test/p q")
    assert len(hits) == 1
    assert fetch_record(hits[0], warc_dir)["payload"] == b"dirty"


def test_rebuild_replaces_index(ray_session, tmp_path):
    """A second build into the same out_dir purges the first
    generation's shards: read_cdxj and cluster.idx agree."""
    import ray

    warc_dir, cdx_dir = str(tmp_path / "w"), str(tmp_path / "c")
    write_warc(ray.data.from_arrow(_pages(n=20)), warc_dir)
    build_cdxj(warc_dir, cdx_dir)
    # grow the corpus, rebuild
    write_warc(
        ray.data.from_arrow(_pages(n=40)), str(tmp_path / "w2")
    )
    build_cdxj(str(tmp_path / "w2"), cdx_dir)
    back = read_cdxj(cdx_dir).to_pandas()
    assert len(back) == 40  # no stale first-generation rows


def test_prefix_scan_bounds_shards(ray_session, tmp_path):
    """Prefix scan touches only shards whose cluster.idx range
    intersects the prefix and returns exactly the prefix rows."""
    import ray

    from cex_crawler_ray.sources.cdx import cdx_prefix_scan

    pages = _pages(n=120, hosts=6)
    warc_dir, cdx_dir = str(tmp_path / "w"), str(tmp_path / "c")
    write_warc(
        ray.data.from_arrow(pages).repartition(6), warc_dir, compress="gzip"
    )
    build_cdxj(warc_dir, cdx_dir)
    hit = cdx_prefix_scan(cdx_dir, "test,cdx,h2)").to_pandas()
    want = sorted(
        u for u in pages["url"].to_pylist() if "//h2." in u
    )
    assert sorted(hit["url"]) == want
    assert cdx_prefix_scan(cdx_dir, "zzz,nope)").to_pandas().empty
