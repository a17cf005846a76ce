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
