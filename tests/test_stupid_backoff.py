"""Stupid Backoff trigram scoring: hand-case brute-force equality
(every branch of the backoff cascade exercised), partition invariance,
and train/score-subset semantics.  Catalog oracle parity runs in the
whole-catalog sweep."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

WORD_RE = re.compile(r"[A-Za-z0-9_]+")
S = 10**6


def _brute(docs, train_mask):
    toks = [
        [w.lower() for w in WORD_RE.findall(t)] for t in docs
    ]
    c3: Counter = Counter()
    c2: Counter = Counter()
    c1: Counter = Counter()
    for ts, is_tr in zip(toks, train_mask):
        if not is_tr:
            continue
        c3.update(zip(ts[:-2], ts[1:-1], ts[2:]))
        c2.update(zip(ts[:-1], ts[1:]))
        c1.update(ts)
    n = sum(c1.values())
    out = {}
    for i, ts in enumerate(toks):
        if len(ts) < 3:
            continue
        tot = 0
        for u, v, w in zip(ts[:-2], ts[1:-1], ts[2:]):
            if c3[(u, v, w)] > 0:
                s = (S * c3[(u, v, w)]) // c2[(u, v)]
            elif c2[(v, w)] > 0:
                s = (2 * ((S * c2[(v, w)]) // c1[v])) // 5
            elif c1[w] > 0:
                s = (2 * ((2 * ((S * c1[w]) // max(n, 1))) // 5)) // 5
            else:
                s = 0
            tot += s
        out[i] = (len(ts) - 2, tot)
    return out


def _corpus():
    # train docs establish counts; eval docs hit every backoff branch:
    # seen trigram, unseen trigram/seen bigram, unseen bigram/seen
    # unigram, fully unseen word
    train = [
        "the cat sat on the mat",
        "the cat ate the fish",
        "a dog sat on a log",
    ]
    evals = [
        "the cat sat on a log today",
        "fish ate the dog quickly",
        "zz yy xx the cat unknownword",
        "completely novel tokens here",
        "on the mat the cat sat",
    ]
    docs = train + evals
    mask = [True] * len(train) + [False] * len(evals)
    return docs, mask


def _run(ray, docs, mask, **kw):
    from cex_crawler_ray.stages.tfidf import stupid_backoff_scores

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
                "lang": pa.array(
                    ["en" if m else "xx" for m in mask], pa.string()
                ),
            }
        )
    )
    return (
        stupid_backoff_scores(ds, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_backoff_matches_reference(ray_session):
    import ray

    docs, mask = _corpus()
    got = _run(ray, docs, mask)
    exp = _brute(docs, mask)
    assert dict(
        zip(got["doc_id"], zip(got["n_trigrams"], got["sb_score"]))
    ) == {k: (v[0], v[1]) for k, v in exp.items()}


def test_backoff_branches_hit(ray_session):
    import ray

    docs, mask = _corpus()
    got = _run(ray, docs, mask)
    sc = dict(zip(got["doc_id"], got["sb_score"]))
    # doc 6 ("completely novel tokens here") scores exactly 0
    assert sc[6] == 0
    # doc 3 (mostly-seen) scores strictly above doc 5 (mostly-unseen)
    assert sc[3] > sc[5] > 0


def test_backoff_partition_invariant(ray_session):
    import ray

    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        " ".join(vocab[j] for j in rng.randint(0, 30, 15))
        for _ in range(60)
    ]
    mask = [i % 2 == 0 for i in range(60)]
    a = _run(ray, docs, mask)
    from cex_crawler_ray.stages.tfidf import stupid_backoff_scores

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
                "lang": pa.array(
                    ["en" if m else "xx" for m in mask], pa.string()
                ),
            }
        )
    ).repartition(17)
    b = (
        stupid_backoff_scores(ds, num_parts=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_backoff_short_docs_absent(ray_session):
    import ray

    docs = ["one two", "a b c"]
    mask = [True, True]
    got = _run(ray, docs, mask)
    assert set(got["doc_id"]) == {1}


def test_backoff_unigram_fallback_equals_broadcast(ray_session):
    """broadcast_max_vocab=0 forces the exact co-partition unigram
    path; results must equal the replicated-unigram default."""
    import ray

    docs, mask = _corpus()
    a = _run(ray, docs, mask)
    b = _run(ray, docs, mask, broadcast_max_vocab=0, num_parts=8)
    pd.testing.assert_frame_equal(a, b)
