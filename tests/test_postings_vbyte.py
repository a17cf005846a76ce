"""Variable-byte posting compression: codec roundtrip across all byte
widths, hand-computed sizes, and partition invariance.  Catalog oracle
parity runs in the whole-catalog sweep."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cex_crawler_ray.stages.tfidf import _vbyte_decode, _vbyte_encode


@pytest.mark.parametrize(
    "v,nbytes",
    [
        (0, 1),
        (127, 1),
        (128, 2),
        (16383, 2),
        (16384, 3),
        (2097151, 3),
        (2097152, 4),
        (268435455, 4),
        (268435456, 5),
        (2**34, 5),
    ],
)
def test_vbyte_widths(v, nbytes):
    buf = _vbyte_encode(np.array([v], dtype=np.int64))
    assert len(buf) == nbytes
    assert _vbyte_decode(buf).tolist() == [v]


def test_vbyte_roundtrip_random():
    rng = np.random.RandomState(11)
    vals = rng.randint(0, 2**33, 500).astype(np.int64)
    assert (_vbyte_decode(_vbyte_encode(vals)) == vals).all()


def test_postings_vbyte_hand_case(ray_session):
    import ray

    from cex_crawler_ray.stages.tfidf import postings_vbyte

    # token "a" in docs 0, 5, 200 -> gaps (0, 5, 195) -> 1+1+2 bytes
    docs = ["a", "b", "", "", "", "a b", *[""] * 194, "a"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        )
    )
    got = (
        postings_vbyte(ds)
        .to_pandas()
        .set_index("token")
        .sort_index()
    )
    assert got.loc["a", "n_docs"] == 3
    assert got.loc["a", "raw_bytes"] == 24
    assert got.loc["a", "vbyte_bytes"] == 1 + 1 + 2
    assert got.loc["b", "n_docs"] == 2
    assert got.loc["b", "vbyte_bytes"] == 1 + 1


def test_postings_vbyte_partition_invariant(ray_session):
    import ray

    from cex_crawler_ray.stages.tfidf import postings_vbyte

    rng = np.random.RandomState(3)
    vocab = [f"t{i}" for i in range(25)]
    docs = [
        " ".join(vocab[j] for j in rng.randint(0, 25, 10))
        for _ in range(80)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    canon = lambda d: d.sort_values("token").reset_index(drop=True)
    a = canon(postings_vbyte(ray.data.from_arrow(tbl)).to_pandas())
    b = canon(
        postings_vbyte(
            ray.data.from_arrow(tbl).repartition(13), num_parts=8
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize(
    "v,bits",
    [(0, 1), (1, 3), (2, 3), (3, 5), (6, 5), (7, 7), (126, 13), (127, 15)],
)
def test_gamma_widths(v, bits):
    from cex_crawler_ray.stages.tfidf import _gamma_decode, _gamma_encode

    buf, nbits = _gamma_encode(np.array([v], dtype=np.int64))
    assert nbits == bits
    assert _gamma_decode(buf, 1).tolist() == [v]


def test_gamma_roundtrip_random():
    from cex_crawler_ray.stages.tfidf import _gamma_decode, _gamma_encode

    rng = np.random.RandomState(17)
    vals = rng.randint(0, 2**30, 300).astype(np.int64)
    buf, nbits = _gamma_encode(vals)
    assert len(buf) == (nbits + 7) // 8
    assert (_gamma_decode(buf, len(vals)) == vals).all()


def test_postings_gamma_hand_case(ray_session):
    import ray

    from cex_crawler_ray.stages.tfidf import postings_gamma

    # token "a" in docs 0, 5, 200: gaps (0, 5, 195) -> x = (1, 6, 196)
    # -> bits (1, 5, 15) = 21 bits -> 3 bytes
    docs = ["a", "b", "", "", "", "a b", *[""] * 194, "a"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        )
    )
    got = postings_gamma(ds).to_pandas().set_index("token").sort_index()
    assert got.loc["a", "n_docs"] == 3
    assert got.loc["a", "gamma_bits"] == 1 + 5 + 15
    assert got.loc["a", "gamma_bytes"] == 3


def test_front_code_hand_case(ray_session):
    import ray

    from cex_crawler_ray.stages.tfidf import dict_front_code

    # one bucket 's': ship, shipment, shipping, shop | stop  (block=4)
    docs = ["ship shipment", "shipping shop stop"]
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(docs, pa.string())})
    )
    got = (
        dict_front_code(ds, block=4)
        .to_pandas()
        .sort_values(["bucket", "block_id"])
        .reset_index(drop=True)
    )
    b0 = got[(got["bucket"] == "s") & (got["block_id"] == 0)].iloc[0]
    # ship(4) + (4,"ment")=5 + (4,"ping")=5 + (2,"op")=3 -> 17
    assert b0["n_terms"] == 4
    assert b0["raw_bytes"] == 4 + 8 + 8 + 4
    assert b0["fc_bytes"] == 4 + 5 + 5 + 3
    b1 = got[(got["bucket"] == "s") & (got["block_id"] == 1)].iloc[0]
    assert b1["n_terms"] == 1 and b1["fc_bytes"] == 4


def test_front_code_partition_invariant(ray_session):
    import ray

    from cex_crawler_ray.stages.tfidf import dict_front_code

    rng = np.random.RandomState(13)
    vocab = [f"pre{i:03d}fix" for i in range(60)] + [
        f"q{i}" for i in range(17)
    ]
    docs = [
        " ".join(vocab[j] for j in rng.randint(0, len(vocab), 12))
        for _ in range(70)
    ]
    tbl = pa.table({"text": pa.array(docs, pa.string())})
    canon = lambda d: d.sort_values(
        ["bucket", "block_id"]
    ).reset_index(drop=True)
    a = canon(dict_front_code(ray.data.from_arrow(tbl)).to_pandas())
    b = canon(
        dict_front_code(
            ray.data.from_arrow(tbl).repartition(11), num_parts=8
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)
