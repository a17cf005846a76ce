"""DSIR fixed-point importance scores vs a brute-force reference."""

import hashlib

import numpy as np
import pyarrow as pa

import ray

N_BUCKETS = 64
SCALE = 10**6


def _bkt(tok):
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % N_BUCKETS


def _reference(rows, target_value="en", keep_top=None):
    c_raw = np.zeros(N_BUCKETS, np.int64)
    c_tgt = np.zeros(N_BUCKETS, np.int64)
    for _, text, lang in rows:
        for tok in text.split():
            b = _bkt(tok)
            c_raw[b] += 1
            if lang == target_value:
                c_tgt[b] += 1
    w = (SCALE * (c_tgt + 1)) // (c_raw + 1)
    scores = {
        did: int(sum(w[_bkt(t)] for t in text.split()))
        for did, text, lang in rows
    }
    if keep_top is None:
        return scores
    order = sorted(scores, key=lambda d: (-scores[d], d))
    kept = set(order[:keep_top])
    return {d: (s, d in kept) for d, s in scores.items()}


def _dataset(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


ROWS = [
    (1, "the cat sat on the mat", "en"),
    (2, "le chat est sur le tapis", "fr"),
    (3, "the dog ate the cat food", "en"),
    (4, "der hund und die katze", "de"),
    (5, "cat dog the mat food", "fr"),
    (6, "", "en"),  # zero tokens -> score 0
]


def test_dsir_scores_match_reference(ray_session):
    from cex_crawler_ray.stages.dsir import dsir_scores

    out = dsir_scores(_dataset(ROWS)).to_pandas()
    got = dict(zip(out["doc_id"], out["score"]))
    assert got == _reference(ROWS)


def test_dsir_english_doc_outscores_foreign(ray_session):
    from cex_crawler_ray.stages.dsir import dsir_scores

    out = dsir_scores(_dataset(ROWS)).to_pandas()
    s = dict(zip(out["doc_id"], out["score"]))
    # per-token average: English docs carry higher target-likeness
    assert s[1] / 6 > s[2] / 6
    assert s[6] == 0


def test_dsir_keep_top_flags_global_topk(ray_session):
    from cex_crawler_ray.stages.dsir import dsir_scores

    out = dsir_scores(_dataset(ROWS), keep_top=3).to_pandas()
    got = {r.doc_id: (r.score, bool(r.keep)) for r in out.itertuples()}
    assert got == _reference(ROWS, keep_top=3)
    assert sum(v[1] for v in got.values()) == 3


def test_dsir_keep_top_larger_than_corpus_keeps_all(ray_session):
    from cex_crawler_ray.stages.dsir import dsir_scores

    out = dsir_scores(_dataset(ROWS), keep_top=50).to_pandas()
    assert out["keep"].all()
