"""BPE pair counts: brute-force reference + partition invariance."""

from collections import Counter

import pandas as pd

import ray


def _brute(texts, k=20):
    import re

    word_re = re.compile(r"[a-z0-9_]+")
    c = Counter()
    for t in texts:
        for w in word_re.findall(t.lower()):
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += 1
    rows = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame(rows, columns=["pair", "cnt"])


def test_bpe_pair_counts_matches_brute_force(ray_session):
    from cex_crawler_ray.stages.textstats import bpe_pair_counts

    texts = [
        "the lower the newer the newest",
        "low lower lowest newer new",
        "wide wider widest low low low",
        "",
        "a ab abc abcd x7_z x7_z",
    ]
    df = pd.DataFrame({"text": texts})
    expected = _brute(texts)

    for parts in (1, 3, 5):
        out = bpe_pair_counts(
            ray.data.from_pandas(df).repartition(parts), k=20
        )
        assert out["cnt"].tolist() == expected["cnt"].tolist()
        assert out["pair"].tolist() == expected["pair"].tolist()


def test_bpe_pair_counts_single_char_words_only(ray_session):
    from cex_crawler_ray.stages.textstats import bpe_pair_counts

    df = pd.DataFrame({"text": ["a b c", "x y z"]})
    out = bpe_pair_counts(ray.data.from_pandas(df), k=20)
    assert len(out) == 0
