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


def _brute_bpe_train(texts, n_merges):
    import re

    word_re = re.compile(r"[a-z0-9_]+")
    vocab = Counter()
    for t in texts:
        for w in word_re.findall(t.lower()):
            vocab[tuple(w)] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = Counter()
        for syms, n in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    res.append(best[0] + best[1])
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] += n
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference(ray_session):
    from cex_crawler_ray.stages.textstats import bpe_train

    texts = [
        "the lower the newer the newest newest newest",
        "low lower lowest newer new new new",
        "wide wider widest low low low lowest",
        "newest newest wider the the the",
    ]
    expected = _brute_bpe_train(texts, 8)
    assert len(expected) == 8

    df = pd.DataFrame({"text": texts})
    for parts in (1, 3):
        got = bpe_train(
            ray.data.from_pandas(df).repartition(parts), n_merges=8
        )
        assert got == expected


def test_bpe_encode_counts_match_reference(ray_session):
    """Train merges, encode the corpus: per-doc sub-word counts equal a
    pure-Python greedy-merge reference; more merges never increase a
    count; zero merges = character count."""
    from cex_crawler_ray.stages.textstats import bpe_encode, bpe_train

    texts = [
        "the lower the newer the newest newest newest",
        "low lower lowest newer new new new",
        "wide wider widest low low low lowest",
    ]
    df = pd.DataFrame({"text": texts})
    ds = ray.data.from_pandas(df)
    merges = bpe_train(ds, n_merges=6)

    def ref_encode(t, merges):
        import re

        ranks = {tuple(m): i for i, m in enumerate(merges)}
        total = 0
        for w in re.findall(r"[a-z0-9_]+", t.lower()):
            syms = list(w)
            while len(syms) > 1:
                cand = [
                    (ranks[(a, b)], i)
                    for i, (a, b) in enumerate(zip(syms, syms[1:]))
                    if (a, b) in ranks
                ]
                if not cand:
                    break
                _, i = min(cand)
                syms[i : i + 2] = [syms[i] + syms[i + 1]]
            total += len(syms)
        return total

    out = bpe_encode(ds, merges).to_pandas()
    got = dict(zip(out["text"], out["n_bpe_tokens"]))
    for t in texts:
        assert got[t] == ref_encode(t, merges)

    none = bpe_encode(ds, []).to_pandas()
    chars = {
        t: sum(len(w) for w in __import__("re").findall(r"[a-z0-9_]+", t))
        for t in texts
    }
    for t in texts:
        assert dict(zip(none["text"], none["n_bpe_tokens"]))[t] == chars[t]
        assert got[t] <= chars[t]
