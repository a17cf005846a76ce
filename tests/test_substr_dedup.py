"""Exact substring-level dedup (Lee et al. 2021 style)."""

import numpy as np
import pyarrow as pa
import pytest

import ray


def _corpus(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(3)


def _reference_spans(rows, k):
    """Brute-force: mark every non-first k-gram occurrence, merge."""
    import re

    word = re.compile(r"[A-Za-z0-9_]+")
    occ = {}
    for d, t in sorted(rows):
        toks = [w.lower() for w in word.findall(t)]
        for i in range(len(toks) - k + 1):
            g = " ".join(toks[i : i + k])
            occ.setdefault(g, []).append((d, i + 1))
    marked = {}
    for g, lst in occ.items():
        for d, p in sorted(lst)[1:]:
            marked.setdefault(d, set()).add(p)
    spans = set()
    for d, ps in marked.items():
        ps = sorted(ps)
        start = prev = ps[0]
        for p in ps[1:]:
            if p > prev + k:
                spans.add((d, start, prev + k - 1))
                start = p
            prev = p
        spans.add((d, start, prev + k - 1))
    return spans


ROWS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    # doc 2 repeats doc 1's first 8 tokens then diverges
    (2, "alpha beta gamma delta epsilon zeta eta theta NEW words here"),
    # doc 3 is a full copy of doc 1
    (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    # doc 4 shares nothing
    (4, "one two three four five six seven eight nine ten eleven"),
    # doc 5 repeats doc 4's window twice internally
    (5, "one two three four five six seven eight one two three four"
        " five six seven eight"),
]


@pytest.mark.parametrize("k", [4, 8])
def test_dup_spans_matches_bruteforce(ray_session, k):
    from cex_crawler_ray.stages.substr_dedup import dup_spans

    got = dup_spans(_corpus(ROWS), k=k).to_pandas()
    got_set = set(
        zip(got["doc_id"], got["span_start"], got["span_end"])
    )
    assert got_set == _reference_spans(ROWS, k)


def test_dup_spans_no_dups_empty(ray_session):
    from cex_crawler_ray.stages.substr_dedup import dup_spans

    rows = [(1, "a b c d e f g h"), (2, "p q r s t u v w")]
    got = dup_spans(_corpus(rows), k=8).to_pandas()
    assert len(got) == 0


def test_first_occurrence_kept_smallest_doc(ray_session):
    """The (smallest doc_id, pos) copy is never marked."""
    from cex_crawler_ray.stages.substr_dedup import dup_spans

    rows = [(10, "x1 x2 x3 x4 x5 x6 x7 x8"), (2, "x1 x2 x3 x4 x5 x6 x7 x8")]
    got = dup_spans(_corpus(rows), k=8).to_pandas()
    assert got["doc_id"].tolist() == [10]
    assert got["span_start"].tolist() == [1]
    assert got["span_end"].tolist() == [8]


def test_strip_dup_spans_removes_marked_tokens(ray_session):
    from cex_crawler_ray.stages.substr_dedup import dup_spans, strip_dup_spans

    k = 8
    got = (
        strip_dup_spans(_corpus(ROWS), k=k)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    spans = _reference_spans(ROWS, k)
    import re

    word = re.compile(r"[A-Za-z0-9_]+")
    for d, t in ROWS:
        toks = [w.lower() for w in word.findall(t)]
        mask = [True] * len(toks)
        for sd, s, e in spans:
            if sd == d:
                for i in range(s - 1, e):
                    mask[i] = False
        want = " ".join(tok for tok, m in zip(toks, mask) if m)
        assert got.loc[d, "text_deduped"] == want, d
        assert got.loc[d, "n_removed"] == mask.count(False)
    # doc 3 (full copy of doc 1) must be emptied entirely
    assert got.loc[3, "text_deduped"] == ""


@pytest.mark.parametrize("k", [4, 8])
def test_hash_and_string_carry_modes_equal(ray_session, k):
    """The vectorized 128-bit rolling-hash carry (scale default) and
    the gram-string carry (zero-collision oracle mode) must produce
    identical span sets — on the crafted corpus AND a randomized one
    with heavy cross-document repetition."""
    import random

    from cex_crawler_ray.stages.substr_dedup import dup_spans

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = list(ROWS)
    base = " ".join(rng.choice(vocab) for _ in range(40))
    for d in range(100, 140):
        prefix = " ".join(rng.choice(vocab) for _ in range(rng.randrange(12)))
        cut = rng.randrange(0, 30)
        rows.append((d, (prefix + " " + base[cut * 3 :]).strip()))

    for corpus_rows in (ROWS, rows):
        a = dup_spans(_corpus(corpus_rows), k=k, carry="hash").to_pandas()
        b = dup_spans(_corpus(corpus_rows), k=k, carry="string").to_pandas()
        key = ["doc_id", "span_start", "span_end"]
        assert set(map(tuple, a[key].values.tolist())) == set(
            map(tuple, b[key].values.tolist())
        )


def test_strip_noop_corpus_passthrough(ray_session):
    from cex_crawler_ray.stages.substr_dedup import strip_dup_spans

    rows = [(1, "Alpha beta GAMMA delta e f g h"), (2, "p q r s t u v w")]
    got = strip_dup_spans(_corpus(rows), k=8).to_pandas()
    assert sorted(got["text_deduped"]) == [
        "alpha beta gamma delta e f g h",
        "p q r s t u v w",
    ]
    assert (got["n_removed"] == 0).all()


def test_sorted_neighborhood_exact_window(ray_session):
    """Candidate set == all pairs within `window` rank positions,
    including pairs that cross rank-bucket boundaries."""
    import numpy as np
    import pandas as pd

    import ray
    from cex_crawler_ray.stages.dedup import sorted_neighborhood_pairs

    rng = np.random.default_rng(23)
    n = 300
    keys = rng.integers(0, 2**50, n, dtype=np.int64)
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": keys,
            "a": (np.arange(n) % 5).astype(str),
        }
    )
    window, B = 4, 16  # tiny buckets force many boundary crossings
    out = (
        sorted_neighborhood_pairs(
            ray.data.from_pandas(df).repartition(5),
            id_col="id",
            key_col="k",
            attr_col="a",
            window=window,
            rows_per_bucket=B,
            bucket_shift=44,
            num_parts=8,
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    # reference: full sort, pairs within window
    ref = df.sort_values(["k", "id"]).reset_index(drop=True)
    exp = []
    for d in range(1, window):
        a = ref.iloc[:-d].reset_index(drop=True)
        b = ref.iloc[d:].reset_index(drop=True)
        exp.append(
            pd.DataFrame(
                {
                    "id_a": a["id"].to_numpy(),
                    "id_b": b["id"].to_numpy(),
                    "attr_a": a["a"].to_numpy(),
                    "attr_b": b["a"].to_numpy(),
                }
            )
        )
    expect = (
        pd.concat(exp, ignore_index=True)
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["id_a", "id_b", "attr_a", "attr_b"]], expect
    )
