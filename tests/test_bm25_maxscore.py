"""MaxScore-pruned BM25 must EQUAL the exhaustive scorer on any
corpus (pruning is a pure optimization), and must actually prune."""

import numpy as np
import pyarrow as pa
import pytest


def _corpus(seed, n_docs=150):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(50)] + [
        "spark", "hash", "window", "stream",
    ]
    docs = []
    for _ in range(n_docs):
        k = rng.randint(5, 40)
        docs.append(" ".join(vocab[j] for j in rng.randint(0, len(vocab), k)))
    return docs


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_maxscore_equals_exhaustive(ray_session, seed):
    import ray

    from cex_crawler_ray.stages.tfidf import bm25_topk, bm25_topk_maxscore

    docs = _corpus(seed)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        )
    )
    q = ["spark", "hash", "window", "stream"]
    a = bm25_topk(ds, q, topk=10).to_pandas()
    b = bm25_topk_maxscore(ds, q, topk=10).to_pandas()
    assert a.equals(b), (a, b)


def test_maxscore_prunes_low_impact_docs(ray_session):
    import ray

    from cex_crawler_ray.stages.tfidf import bm25_topk, bm25_topk_maxscore

    # "rare" is high-idf (few docs); "common" is low-idf (every doc).
    # Docs containing ONLY "common" have a bound below the k-th score
    # of the rare-matching docs, so phase 2 skips them — equality with
    # the exhaustive scorer is the proof the skip is sound.
    docs = [f"rare filler{i}" for i in range(12)] + [
        f"common pad{i} pad{i}" for i in range(200)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        )
    )
    q = ["rare", "common"]
    a = bm25_topk(ds, q, topk=10).to_pandas()
    b = bm25_topk_maxscore(ds, q, topk=10).to_pandas()
    assert a.equals(b)
    # the top-10 is all rare docs (higher idf), pruning had material work
    assert set(a["doc_id"]) <= set(range(12))
