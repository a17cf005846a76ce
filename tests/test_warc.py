"""WARC source/sink: record-level roundtrip fidelity (payloads
containing CRLF and header-like bytes), timestamp parsing, shard
idempotency."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _pages():
    ts = [
        np.datetime64("2024-03-01T00:00:05"),
        np.datetime64("2024-03-02T12:30:00"),
        np.datetime64("2024-03-03T23:59:59"),
    ]
    payloads = [
        b"plain body",
        b"body with \r\n\r\n record separator inside and WARC/1.0 text",
        "unicode 中文 payload".encode("utf-8"),
    ]
    return pd.DataFrame(
        {
            "url": [f"https://w.test/{i}" for i in range(3)],
            "warc_ts": ts,
            "lang": ["en", "zh", "en"],
            "html": payloads,
        }
    )


def test_warc_roundtrip_record_fidelity(ray_session, tmp_path):
    from cex_crawler_ray.sources.warc import read_warc, write_warc

    df = _pages()
    out = str(tmp_path / "warc")
    write_warc(ray.data.from_pandas(df), out)
    back = read_warc(out).to_pandas().sort_values("url").reset_index(drop=True)

    assert back["url"].tolist() == df["url"].tolist()
    assert [bytes(p) for p in back["payload"]] == [
        bytes(p) for p in df["html"]
    ]
    assert back["lang"].tolist() == df["lang"].tolist()
    got_ts = back["warc_ts"].to_numpy("datetime64[s]")
    want_ts = df["warc_ts"].to_numpy("datetime64[s]")
    assert (got_ts == want_ts).all()


def test_warc_write_idempotent_per_block(ray_session, tmp_path):
    from cex_crawler_ray.sources.warc import write_warc

    df = _pages()
    out = str(tmp_path / "warc2")
    ds = ray.data.from_pandas(df)
    write_warc(ds, out)
    files1 = sorted(os.listdir(out))
    write_warc(ds, out)  # re-execution writes nothing new
    assert sorted(os.listdir(out)) == files1


def test_warc_parser_handles_concatenated_records():
    from cex_crawler_ray.sources.warc import (
        _format_record,
        parse_warc_bytes,
    )

    data = _format_record(
        "https://a.test/1", "2024-01-01T00:00:00Z", "en", b"abc"
    ) + _format_record(
        "https://a.test/2", "2024-01-02T00:00:00Z", "ko", b""
    )
    rec = parse_warc_bytes(data)
    assert rec["url"] == ["https://a.test/1", "https://a.test/2"]
    assert rec["payload"] == [b"abc", b""]
    assert rec["lang"] == ["en", "ko"]


def test_warc_identical_blocks_do_not_collapse(ray_session, tmp_path):
    """Two distinct blocks with identical bytes (replicated corpus)
    must land in distinct shards — multiset, not set, semantics."""
    from cex_crawler_ray.sources.warc import read_warc, write_warc

    df = _pages()
    out = str(tmp_path / "warc_dup")
    # two single-block datasets with the same rows, unioned: the union
    # keeps both blocks, and each serializes to identical bytes
    a = ray.data.from_pandas(df)
    b = ray.data.from_pandas(df)
    write_warc(a.union(b), out)
    back = read_warc(out)
    assert back.count() == 2 * len(df)
    urls = sorted(r["url"] for r in back.take_all())
    assert urls == sorted(list(df["url"]) * 2)


def test_wet_conversion_records(ray_session, tmp_path):
    """WET sink writes ISO 28500 conversion records: text payloads,
    WARC-Type: conversion, WARC-Refers-To linking to the response
    record's deterministic id; read_warc parses them identically."""
    import glob
    import os

    import pandas as pd
    import pyarrow as pa

    import ray
    from cex_crawler_ray.sources.warc import (
        parse_warc_bytes,
        read_warc,
        write_wet,
    )

    ts = pd.Timestamp("2024-03-01 12:00:00")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(
                    ["https://a.test/1", "https://a.test/2"], pa.string()
                ),
                "warc_ts": pa.array([ts, ts]),
                "lang": pa.array(["en", "zh"], pa.string()),
                "text": pa.array(
                    ["extracted text one", "正文テキスト"], pa.string()
                ),
            }
        )
    )
    out = str(tmp_path / "wet")
    write_wet(ds, out)
    shards = glob.glob(os.path.join(out, "*.warc.wet"))
    assert shards, "WET shards use the .warc.wet extension"
    rec = parse_warc_bytes(open(shards[0], "rb").read())
    assert set(rec["warc_type"]) == {"conversion"}
    # refers-to carries the deterministic (url, ts) id
    assert all(r.startswith("<urn:md5:") for r in rec["refers_to"])
    back = (
        read_warc(out)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert back["url"].tolist() == ["https://a.test/1", "https://a.test/2"]
    assert back["payload"].tolist() == [
        b"extracted text one",
        "正文テキスト".encode("utf-8"),
    ]


def test_wet_refers_to_matches_warc_record_id(tmp_path):
    """The WET conversion record's Refers-To equals the id the WARC
    response record for the same (url, ts) gets — the two corpora link
    with no lookup table."""
    from cex_crawler_ray.sources.warc import _format_record, parse_warc_bytes

    resp = parse_warc_bytes(
        _format_record("https://a.test/x", "2024-03-01T12:00:00Z", "en", b"<html>")
    )
    conv = parse_warc_bytes(
        _format_record(
            "https://a.test/x", "2024-03-01T12:00:00Z", "en", b"text",
            record_type="conversion",
        )
    )
    assert resp["warc_type"] == ["response"] and resp["refers_to"] == [""]
    # recover the response record id from its raw bytes
    raw = _format_record(
        "https://a.test/x", "2024-03-01T12:00:00Z", "en", b"<html>"
    ).decode()
    rid = [l for l in raw.splitlines() if l.startswith("WARC-Record-ID")][0]
    rid = rid.split(": ", 1)[1]
    assert conv["refers_to"] == [rid]


def test_warc_gz_roundtrip(ray_session, tmp_path):
    """.warc.gz (the CC wire format): write with per-record gzip
    members, read back through the magic-sniffing parser."""
    from cex_crawler_ray.sources.warc import read_warc, write_warc

    df = _pages()
    out = str(tmp_path / "warcgz")
    write_warc(ray.data.from_pandas(df), out, compress="gzip")
    assert all(f.endswith(".warc.gz") for f in os.listdir(out))
    back = read_warc(out).to_pandas().sort_values("url").reset_index(drop=True)
    assert back["url"].tolist() == df["url"].tolist()
    assert [bytes(p) for p in back["payload"]] == [
        bytes(p) for p in df["html"]
    ]


def test_warc_gz_per_record_members_random_access(ray_session, tmp_path):
    """Each record is its OWN gzip member: any single member inflates
    alone into exactly one parseable record — the property that makes
    (offset, length)-indexed range requests work against a shard."""
    from cex_crawler_ray.sources.warc import (
        iter_gz_members,
        parse_warc_bytes,
        write_warc,
    )

    df = _pages()
    out = str(tmp_path / "warcgz2")
    write_warc(ray.data.from_pandas(df), out, compress="gzip")
    total = 0
    for f in os.listdir(out):
        with open(os.path.join(out, f), "rb") as fh:
            data = fh.read()
        for member in iter_gz_members(data):
            rec = parse_warc_bytes(member)
            assert len(rec["url"]) == 1  # one record per member
            total += 1
    assert total == len(df)


def test_warc_gz_idempotent_and_mixed_dir(ray_session, tmp_path):
    """Deterministic members (mtime=0) keep shard names stable across
    re-execution; a directory mixing .warc and .warc.gz reads as one
    dataset."""
    from cex_crawler_ray.sources.warc import read_warc, write_warc

    df = _pages()
    out = str(tmp_path / "warcmix")
    ds = ray.data.from_pandas(df)
    write_warc(ds, out, compress="gzip")
    files1 = sorted(os.listdir(out))
    write_warc(ds, out, compress="gzip")
    assert sorted(os.listdir(out)) == files1

    df2 = df.copy()
    df2["url"] = ["https://w.test/plain/" + str(i) for i in range(3)]
    write_warc(ray.data.from_pandas(df2), out)  # uncompressed alongside
    back = read_warc(out).to_pandas()
    assert len(back) == 6
    assert set(back["url"]) == set(df["url"]) | set(df2["url"])


def test_wet_gz_conversion_records(ray_session, tmp_path):
    from cex_crawler_ray.sources.warc import (
        iter_gz_members,
        parse_warc_bytes,
        write_wet,
    )

    df = _pages().rename(columns={"html": "text"})
    df["text"] = [p.decode("utf-8") for p in df["text"]]
    out = str(tmp_path / "wetgz")
    write_wet(ray.data.from_pandas(df), out, compress="gzip")
    assert all(f.endswith(".warc.wet.gz") for f in os.listdir(out))
    types = []
    for f in os.listdir(out):
        with open(os.path.join(out, f), "rb") as fh:
            for member in iter_gz_members(fh.read()):
                types += parse_warc_bytes(member)["warc_type"]
    assert types and all(t == "conversion" for t in types)
