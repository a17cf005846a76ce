"""C4 three-sentence-span dedup: keep-first semantics, overlap
removal, short-doc passthrough, partition invariance, brute-force."""

import pyarrow as pa
import pytest

import ray
from cex_crawler_ray.stages.dedup import span_dedup


def _ds(rows, nparts=None):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    return ds.repartition(nparts) if nparts else ds


def _brute(rows, span=3, sep=". "):
    """Reference: global keep-first over all span windows."""
    seen = {}
    removed = {i: set() for i, _ in rows}
    for i, t in sorted(rows):
        sents = [s for s in t.split(sep) if s]
        for k in range(len(sents) - span + 1):
            w = sep.join(sents[k : k + span])
            if w in seen:
                removed[i].update(range(k, k + span))
            else:
                seen[w] = (i, k)
    out = {}
    for i, t in rows:
        sents = [s for s in t.split(sep) if s]
        kept = [s for k, s in enumerate(sents) if k not in removed[i]]
        out[i] = (sep.join(kept), len(sents), len(kept))
    return out


ROWS = [
    (0, "opener 0. shared a. shared b. shared c. closer 0"),
    (1, "opener 1. shared a. shared b. shared c. closer 1"),
    (2, "opener 2. shared a. shared b. shared c. closer 2"),
    (3, "totally unique. nothing repeats. in this one. at all"),
    (4, "too. short"),  # < 3 sentences: passthrough
]


@pytest.mark.parametrize("nparts", [None, 5])
def test_matches_brute_force(ray_session, nparts):
    out = (
        span_dedup(_ds(ROWS, nparts))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    ref = _brute(ROWS)
    for i, (clean, n_sent, n_kept) in ref.items():
        assert out.loc[i, "clean_text"] == clean, i
        assert out.loc[i, "n_sentences"] == n_sent
        assert out.loc[i, "n_kept"] == n_kept
        assert out.loc[i, "n_removed"] == n_sent - n_kept


def test_first_occurrence_kept_later_stripped(ray_session):
    out = (
        span_dedup(_ds(ROWS)).to_pandas().set_index("doc_id")
    )
    assert out.loc[0, "n_removed"] == 0  # first in class keeps all
    assert out.loc[1, "n_removed"] == 3
    assert out.loc[1, "clean_text"] == "opener 1. closer 1"
    assert out.loc[3, "n_removed"] == 0
    assert out.loc[4, "clean_text"] == "too. short"


def test_overlapping_repeats_union_removal(ray_session):
    # doc 11 repeats doc 10's sentences shifted by one: windows
    # (b,c,d) and (c,d,e) both repeat -> union removes b..e
    rows = [
        (10, "a x. b x. c x. d x. e x. f x"),
        (11, "q x. b x. c x. d x. e x. r x"),
    ]
    out = span_dedup(_ds(rows)).to_pandas().set_index("doc_id")
    ref = _brute(rows)
    assert out.loc[11, "clean_text"] == ref[11][0]
    assert out.loc[10, "n_removed"] == 0


def test_extra_columns_ride_through(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "lang": pa.array(["en", "de"], pa.string()),
            "text": pa.array(
                [ROWS[0][1], ROWS[1][1]], pa.string()
            ),
        }
    )
    out = (
        span_dedup(ray.data.from_arrow(tbl))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out["lang"]) == ["en", "de"]
