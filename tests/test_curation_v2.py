"""Curation composition: stage interactions."""

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


FOOTER = "(c) Example Corp."
EVAL = "the quick brown fox jumps over the lazy dog"


def test_curate_composition(ray_session):
    from cex_crawler_ray.pipelines.curation import curate

    base = "many distinct words fill this clean document body today"
    corpus = _docs(
        [
            # survives: footer stripped, email redacted
            (1, f"{base} one mail a@b.co x\n{FOOTER}"),
            # dropped by repetition (one word dominates)
            (2, f"spam spam spam spam spam spam\n{FOOTER}"),
            # dropped by decontamination (contains the eval 5-gram)
            (3, f"{base} and {EVAL} tail\n{FOOTER}"),
            # all-boilerplate -> dropped at the strip stage
            (4, FOOTER),
            # survives untouched
            (5, f"{base} two"),
        ]
    )
    out = (
        curate(corpus, _docs([(100, EVAL)]), min_docs=3, ngram_n=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 5]
    assert out["text"].tolist()[0] == f"{base} one mail <EMAIL> x"
    assert out["n_emails"].tolist() == [1, 0]
