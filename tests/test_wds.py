"""WebDataset tar-shard source/sink: sample grouping, binary
fidelity, deterministic shard bytes, idempotent re-write."""

import os
import tarfile

import pandas as pd

import ray


def _docs():
    return pd.DataFrame(
        {
            "doc_id": [7, 3, 11],
            "text": ["hello world", "unicode 中文", "tabs\tand\nnewlines"],
            "meta": ['{"lang":"en"}', '{"lang":"zh"}', '{"lang":"en"}'],
            "blob": [b"\x00\x01\xff", b"", b"WARC/1.0 lookalike \r\n\r\n"],
        }
    )


def test_wds_roundtrip_multifield(ray_session, tmp_path):
    from cex_crawler_ray.sources.wds import read_wds, write_wds

    df = _docs()
    out = str(tmp_path / "wds")
    write_wds(
        ray.data.from_pandas(df),
        out,
        key_col="doc_id",
        fields={"txt": "text", "json": "meta", "bin": "blob"},
    )
    assert all(f.endswith(".tar") for f in os.listdir(out))
    back = (
        read_wds(out, exts=("txt", "json", "bin"))
        .to_pandas()
        .sort_values("key", key=lambda s: s.astype(int))
        .reset_index(drop=True)
    )
    want = df.sort_values("doc_id").reset_index(drop=True)
    assert back["key"].astype(int).tolist() == want["doc_id"].tolist()
    assert [bytes(b).decode("utf-8") for b in back["txt"]] == want[
        "text"
    ].tolist()
    assert [bytes(b).decode("utf-8") for b in back["json"]] == want[
        "meta"
    ].tolist()
    assert [bytes(b) for b in back["bin"]] == want["blob"].tolist()


def test_wds_sample_entries_are_consecutive(ray_session, tmp_path):
    """The WebDataset contract: all entries of a sample are adjacent
    in the tar, keys sorted — a sequential reader never buffers more
    than one sample."""
    from cex_crawler_ray.sources.wds import write_wds

    out = str(tmp_path / "wds2")
    write_wds(
        ray.data.from_pandas(_docs()),
        out,
        key_col="doc_id",
        fields={"txt": "text", "json": "meta"},
    )
    names = []
    for f in sorted(os.listdir(out)):
        with tarfile.open(os.path.join(out, f)) as tf:
            names += [m.name for m in tf if m.isfile()]
    bases = [n.rpartition(".")[0] for n in names]
    # adjacency: each key's entries form one contiguous run
    seen, prev = set(), None
    for b in bases:
        if b != prev:
            assert b not in seen
            seen.add(b)
            prev = b
    # within a shard keys ascend (string order of the key column)
    assert bases == sorted(bases, key=lambda b: (bases.index(b), b))


def test_wds_idempotent_and_deterministic(ray_session, tmp_path):
    from cex_crawler_ray.sources.wds import write_wds

    df = _docs()
    out = str(tmp_path / "wds3")
    ds = ray.data.from_pandas(df)
    write_wds(ds, out, key_col="doc_id", fields={"txt": "text"})
    files1 = sorted(os.listdir(out))
    bytes1 = [
        open(os.path.join(out, f), "rb").read() for f in files1
    ]
    write_wds(ds, out, key_col="doc_id", fields={"txt": "text"})
    assert sorted(os.listdir(out)) == files1
    assert [
        open(os.path.join(out, f), "rb").read() for f in files1
    ] == bytes1


def test_wds_missing_field_is_empty_bytes():
    from cex_crawler_ray.sources.wds import build_tar_shard, parse_tar_shard

    shard = build_tar_shard(["a"], {"txt": ["x"]})
    rec = parse_tar_shard(shard, ("txt", "json"))
    assert rec["key"] == ["a"]
    assert rec["txt"] == [b"x"]
    assert rec["json"] == [b""]
