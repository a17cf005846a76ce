"""BM25 top-k: ranking sanity + partitioning invariance."""

import pandas as pd

import ray


def _corpus():
    rows = [
        (0, "spark spark spark hash filler filler"),          # heavy hit
        (1, "spark hash " + "filler " * 50),                  # long, diluted
        (2, "spark"),                                          # short, 1 term
        (3, "window stream window stream"),                    # other terms
        (4, "nothing relevant here at all"),                   # no match
    ] + [(i, "filler text only") for i in range(5, 25)]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_bm25_ranking_and_partition_invariance(ray_session):
    from cex_crawler_ray.stages.tfidf import bm25_topk

    df = _corpus()
    outs = []
    for parts in (1, 3, 8):
        t = bm25_topk(
            ray.data.from_pandas(df).repartition(parts),
            ["spark", "hash", "window", "stream"],
            topk=4,
        )
        outs.append(
            list(
                zip(
                    t["rank"].to_pylist(),
                    t["doc_id"].to_pylist(),
                    t["score_e4"].to_pylist(),
                )
            )
        )
    assert outs[0] == outs[1] == outs[2]
    ranked_ids = [d for _, d, _ in outs[0]]
    # doc 4 and filler docs never appear; matched docs all rank
    assert set(ranked_ids) == {0, 1, 2, 3}
    # repetition beats dilution: doc 0 above doc 1
    assert ranked_ids.index(0) < ranked_ids.index(1)
    # all scores positive and strictly ordered with id tie-break
    scores = [s for _, _, s in outs[0]]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
