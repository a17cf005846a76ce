"""Corpus DF / top-k vocabulary / rarest-token operators."""

import pyarrow as pa

import ray


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in rows], pa.int64()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        )
    )


def test_corpus_df_counts_docs_not_occurrences(ray_session):
    from cex_crawler_ray.stages.tfidf import corpus_df

    ds = _docs([(1, "a a a b"), (2, "a c"), (3, "B b")])
    out = corpus_df(ds).to_pandas().set_index("token")["df"].to_dict()
    assert out == {"a": 2, "b": 2, "c": 1}


def test_top_df_ties_break_lexicographically(ray_session):
    from cex_crawler_ray.stages.tfidf import top_df_tokens

    ds = _docs([(1, "zz aa"), (2, "zz aa"), (3, "mm")])
    out = top_df_tokens(ds, k=2).to_pandas()
    assert out["token"].tolist() == ["aa", "zz"]
    assert out["df"].tolist() == [2, 2]


def test_inverted_index_postings_sorted(ray_session):
    from cex_crawler_ray.stages.tfidf import inverted_index

    ds = _docs([(3, "b a"), (1, "a a b"), (2, "c A")])
    out = (
        inverted_index(ds, num_parts=4)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    assert out["token"].tolist() == ["a", "b", "c"]
    assert out["df"].tolist() == [3, 2, 1]
    assert out["postings"].tolist() == ["1,2,3", "1,3", "2"]


def test_rarest_token_drops_empty_docs(ray_session):
    from cex_crawler_ray.stages.tfidf import (
        corpus_df,
        rarest_token_per_doc,
    )

    ds = _docs([(1, "common common rare"), (2, "common"), (3, "!!!")])
    out = (
        rarest_token_per_doc(ds, corpus_df(ds))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["doc_id"].tolist() == [1, 2]
    assert out["rarest_token"].tolist() == ["rare", "common"]
    assert out["rarest_df"].tolist() == [1, 2]


def test_tfidf_cosine_pairs_hand_case(ray_session):
    """Two near-identical docs must pair with high cosine; an unrelated
    doc must not appear; exact values match a numpy reference."""
    import numpy as np
    import pandas as pd

    from cex_crawler_ray.stages.tfidf import tfidf_cosine_pairs

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha beta gamma delta epsilon common",
                "alpha beta gamma delta zeta common",
                "totally different words entirely here common",
                "alpha beta gamma delta epsilon common",
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(2)
    out = (
        tfidf_cosine_pairs(ds, tau_e4=3000, max_df_frac=0.9)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (1, 2) in pairs and (1, 4) in pairs and (2, 4) in pairs
    assert not any(3 in p for p in pairs)
    # identical docs (1, 4) must be exactly cosine 1
    row = out[(out["doc_a"] == 1) & (out["doc_b"] == 4)]
    assert row["cos_e4"].iloc[0] == 10000


def test_tfidf_cosine_paths_equal(ray_session):
    """Broadcast-norm fast path and the co-partition join path must
    produce identical pairs (threshold forced both ways)."""
    import pandas as pd

    from cex_crawler_ray.stages.tfidf import tfidf_cosine_pairs

    docs = pd.DataFrame(
        {
            "doc_id": list(range(12)),
            "text": [
                f"shared tokens alpha beta {'x' * (i % 3)} tail{i % 4}"
                for i in range(12)
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(3)

    def run(bmax):
        return (
            tfidf_cosine_pairs(
                ds, tau_e4=1000, max_df_frac=0.9, broadcast_max_norms=bmax
            )
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )

    a, b = run(10**9), run(0)
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert len(a) > 0
