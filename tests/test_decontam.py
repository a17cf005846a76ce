"""Eval-set n-gram decontamination."""

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


EVAL = "the quick brown fox jumps over the lazy dog"


def test_flag_contaminated_exact_ngram(ray_session):
    from cex_crawler_ray.stages.decontam import (
        eval_ngram_set,
        flag_contaminated,
    )

    corpus = _docs(
        [
            (1, f"intro text then {EVAL} and more"),  # contains a 5-gram
            (2, "quick brown fox jumps loud"),  # only 4 shared in a row
            (3, "totally unrelated words here indeed now"),
            (4, "THE QUICK BROWN FOX JUMPS high"),  # case-folded hit
        ]
    )
    grams = eval_ngram_set(_docs([(100, EVAL)]), n=5)
    out = (
        flag_contaminated(corpus, grams, n=5)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["contaminated"].tolist() == [True, False, False, True]


def test_decontaminate_drops_rows(ray_session):
    from cex_crawler_ray.stages.decontam import decontaminate

    corpus = _docs(
        [(1, f"xx {EVAL} yy"), (2, "clean words all over this doc")]
    )
    out = decontaminate(corpus, _docs([(100, EVAL)]), n=5).to_pandas()
    assert out["doc_id"].tolist() == [2]


def test_short_docs_never_contaminated(ray_session):
    from cex_crawler_ray.stages.decontam import (
        eval_ngram_set,
        flag_contaminated,
    )

    corpus = _docs([(1, "the quick brown fox")])  # < 5 tokens
    grams = eval_ngram_set(_docs([(100, EVAL)]), n=5)
    out = flag_contaminated(corpus, grams, n=5).to_pandas()
    assert out["contaminated"].tolist() == [False]
