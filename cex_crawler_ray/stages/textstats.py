r"""Text-analysis stages for large-scale corpus curation.

Beyond-reference operators (the reference crawls announcements; a 100 TB
training-data pipeline additionally needs per-document text metrics).
All stages are stateless vectorized ``map_batches`` over Arrow batches.

Every metric here is deliberately SQL-expressible so the DuckDB oracle
can recompute it exactly (driver correctness gate).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

# BPE-ish token split: word runs | single non-word-non-space chars
_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]")
_WS_RE = re.compile(r"\s+")
_CJK_RE = re.compile(r"[一-鿿]")
_HANGUL_RE = re.compile(r"[가-힯]")
_CYRILLIC_RE = re.compile(r"[Ѐ-ӿ]")
_EN_THE_RE = re.compile(r"(^|[^A-Za-z])the([^A-Za-z]|$)")

STOPWORDS_EN = frozenset(
    "the a an and or of to in is are was for on with as at by".split()
)


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(id cols) + n_chars, n_ws_tokens (whitespace split), n_tokens
    (BPE-ish regex)."""
    texts = batch[text_col].to_pylist()
    n_chars = pa.array([len(t) for t in texts], pa.int64())
    n_ws = pa.array(
        [len([w for w in _WS_RE.split(t) if w]) for t in texts], pa.int64()
    )
    n_tok = pa.array([len(_TOKEN_RE.findall(t)) for t in texts], pa.int64())
    out = batch.drop_columns([text_col])
    out = out.append_column("n_chars", n_chars)
    out = out.append_column("n_ws_tokens", n_ws)
    return out.append_column("n_tokens", n_tok)


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features: char/word counts, mean word length,
    stopword ratio, alpha ratio, and a keep/drop flag."""
    texts = batch[text_col].to_pylist()
    rows = {
        "n_chars": [],
        "n_words": [],
        "mean_word_len": [],
        "stopword_ratio": [],
        "alpha_ratio": [],
        "quality_keep": [],
    }
    for t in texts:
        words = [w for w in t.split(" ") if w]
        n_words = len(words)
        n_chars = len(t)
        mean_wl = (sum(len(w) for w in words) / n_words) if n_words else 0.0
        sw = (
            sum(1 for w in words if w.lower() in STOPWORDS_EN) / n_words
            if n_words
            else 0.0
        )
        alpha = (
            sum(1 for c in t if c.isalpha()) / n_chars if n_chars else 0.0
        )
        keep = n_words >= 10 and 2.0 <= mean_wl <= 12.0
        # no rounding: int/int division is one IEEE op, so the DuckDB
        # oracle reproduces these doubles bit-for-bit
        rows["n_chars"].append(n_chars)
        rows["n_words"].append(n_words)
        rows["mean_word_len"].append(mean_wl)
        rows["stopword_ratio"].append(sw)
        rows["alpha_ratio"].append(alpha)
        rows["quality_keep"].append(keep)
    out = batch.drop_columns([text_col])
    for k, v in rows.items():
        typ = (
            pa.int64()
            if k in ("n_chars", "n_words")
            else pa.bool_()
            if k == "quality_keep"
            else pa.float64()
        )
        out = out.append_column(k, pa.array(v, typ))
    return out


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Character-class + marker-word language heuristic: CJK -> zh,
    Hangul -> ko, Cyrillic -> ru, 'the' as a standalone word -> en,
    else 'unknown'."""
    texts = batch[text_col].to_pylist()
    preds = []
    for t in texts:
        if _CJK_RE.search(t):
            preds.append("zh")
        elif _HANGUL_RE.search(t):
            preds.append("ko")
        elif _CYRILLIC_RE.search(t):
            preds.append("ru")
        elif _EN_THE_RE.search(t):
            preds.append("en")
        else:
            preds.append("unknown")
    out = batch.drop_columns([text_col])
    return out.append_column("lang_pred", pa.array(preds, pa.string()))


def content_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whole-document fingerprints: md5 + sha256 hex of utf-8 bytes."""
    texts = batch[text_col].to_pylist()
    md5s, shas = [], []
    for t in texts:
        b = t.encode("utf-8")
        md5s.append(hashlib.md5(b).hexdigest())
        shas.append(hashlib.sha256(b).hexdigest())
    out = batch.drop_columns([text_col])
    out = out.append_column("md5", pa.array(md5s, pa.string()))
    return out.append_column("sha256", pa.array(shas, pa.string()))


_WORD_RE = re.compile(r"[A-Za-z0-9_]+")

# Repetition thresholds after Gopher (Rae et al. 2021, table A1):
# documents dominated by one word or one bigram are dropped.
REP_TOP_WORD_MAX = 0.20
REP_TOP_BIGRAM_MAX = 0.18


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition metrics per document: total word tokens,
    the most-frequent word's count fraction, the most-frequent bigram's
    count fraction, and a keep flag.  Docs with no word tokens are
    dropped (no denominator).  Fractions are single IEEE divisions so
    the DuckDB oracle reproduces them bit-for-bit."""
    from collections import Counter

    texts = batch[text_col].to_pylist()
    keep_rows, n_words_c, top_w_c, top_b_c, keep_c = [], [], [], [], []
    for i, t in enumerate(texts):
        toks = [w.lower() for w in _WORD_RE.findall(t)]
        if not toks:
            continue
        n = len(toks)
        top_w = max(Counter(toks).values()) / n
        if n >= 2:
            bigrams = Counter(zip(toks, toks[1:]))
            top_b = max(bigrams.values()) / (n - 1)
        else:
            top_b = 0.0
        keep_rows.append(i)
        n_words_c.append(n)
        top_w_c.append(top_w)
        top_b_c.append(top_b)
        keep_c.append(
            top_w <= REP_TOP_WORD_MAX and top_b <= REP_TOP_BIGRAM_MAX
        )
    out = batch.drop_columns([text_col]).take(pa.array(keep_rows))
    out = out.append_column("n_words", pa.array(n_words_c, pa.int64()))
    out = out.append_column(
        "top_word_frac", pa.array(top_w_c, pa.float64())
    )
    out = out.append_column(
        "top_bigram_frac", pa.array(top_b_c, pa.float64())
    )
    return out.append_column("rep_keep", pa.array(keep_c, pa.bool_()))


# explicit ASCII whitespace class (RE2 and Python agree on it, unlike
# Python's unicode-aware \s)
_ASCII_WS_RE = re.compile(r"[ \t\r\n\f\v]+")


def normalize_text(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """C4-style normalization: lowercase, collapse ASCII whitespace
    runs to single spaces, strip outer spaces."""
    texts = batch[text_col].to_pylist()
    out_t = [
        _ASCII_WS_RE.sub(" ", t.lower()).strip(" ") for t in texts
    ]
    out = batch.drop_columns([text_col])
    return out.append_column(text_col, pa.array(out_t, pa.string()))


# PII patterns: RE2-compatible (DuckDB regexp_replace twin uses the
# identical pattern strings — keep them subset-syntax: no lookaround)
PII_EMAIL_PAT = r"[A-Za-z0-9_.]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+"
PII_PHONE_PAT = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
_PII_EMAIL_RE = re.compile(PII_EMAIL_PAT)
_PII_PHONE_RE = re.compile(PII_PHONE_PAT)


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Replace email addresses and phone numbers with typed placeholders
    and count the replacements (C4/CCNet-style PII scrubbing).  Order
    matters: emails first (a phone-like digit run inside a local part
    must not be re-matched)."""
    texts = batch[text_col].to_pylist()
    red, n_em, n_ph = [], [], []
    for t in texts:
        t1, ne = _PII_EMAIL_RE.subn("<EMAIL>", t)
        t2, np_ = _PII_PHONE_RE.subn("<PHONE>", t1)
        red.append(t2)
        n_em.append(ne)
        n_ph.append(np_)
    out = batch.drop_columns([text_col])
    out = out.append_column("text", pa.array(red, pa.string()))
    out = out.append_column("n_emails", pa.array(n_em, pa.int64()))
    return out.append_column("n_phones", pa.array(n_ph, pa.int64()))


def winnow_fingerprints(
    text: str, k: int = 8, window: int = 4
) -> list:
    """Winnowing (Schleimer et al., SIGMOD'03): rolling k-gram hashes,
    per-window minima — a robust document fingerprint for near-dup
    detection.  Fully vectorized: polynomial rolling hashes over
    sliding char-code windows (natural uint64 wraparound, same scheme
    as dedup.shingle_hashes_vec), then window minima + consecutive-
    dedup via numpy.  The chosen min index per window is non-decreasing
    in w, so 'same index as previously kept' reduces to 'same index as
    the previous window' — a plain diff."""
    import numpy as np

    if len(text) < k:
        return []
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    base = np.uint64(1099511628211)
    powers = base ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        grams = np.lib.stride_tricks.sliding_window_view(codes, k)
        hashes = (grams * powers[None, :]).sum(axis=1, dtype=np.uint64)
    n = len(hashes)
    if n <= window:
        return [int(hashes.min())]
    wins = np.lib.stride_tricks.sliding_window_view(hashes, window)
    amin = wins.argmin(axis=1)
    idx = np.arange(len(wins)) + amin
    keep = np.empty(len(idx), dtype=bool)
    keep[0] = True
    keep[1:] = idx[1:] != idx[:-1]
    return hashes[idx[keep]].tolist()


def winnow_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    fps = [winnow_fingerprints(t) for t in texts]
    out = batch.drop_columns([text_col])
    return out.append_column(
        "fingerprints", pa.array(fps, pa.list_(pa.uint64()))
    )


_PHRASE_WORD_RE = re.compile(r"[A-Za-z0-9_]+")


def banned_phrase_counts(
    batch: pa.Table,
    phrases: tuple,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """(id, n_banned): how many of the given literal phrases occur in
    each document (substring semantics, case-sensitive — the policy
    filter every curation pipeline runs before training).  Vectorized:
    one ``pyarrow.compute.match_substring`` kernel pass per phrase,
    summed as int8 columns — no per-row Python."""
    import numpy as np
    import pyarrow.compute as pc

    n = batch.num_rows
    total = np.zeros(n, dtype=np.int64)
    col = batch[text_col]
    for p in phrases:
        m = pc.match_substring(col, p)
        total += (
            m.combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    return pa.table(
        {
            id_col: batch[id_col].combine_chunks().cast(pa.int64()),
            "n_banned": pa.array(total, pa.int64()),
        }
    )


def token_entropy_e4(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Per-doc Shannon entropy of the token distribution, 1e-4 fixed
    point: H = ln(T) - sum(c*ln c)/T over token counts c (nats).
    The natural "repetitiveness" quality signal — a doc that repeats
    one token has H=0, a uniform vocabulary maximizes H."""
    import numpy as np
    from collections import Counter

    ids = batch[id_col].to_pylist()
    out_ids, ents, ntoks = [], [], []
    for did, t in zip(ids, batch[text_col].to_pylist()):
        toks = [w.lower() for w in _PHRASE_WORD_RE.findall(t)]
        T = len(toks)
        out_ids.append(did)
        ntoks.append(T)
        if T == 0:
            ents.append(0)
            continue
        c = np.array(list(Counter(toks).values()), dtype=np.float64)
        h = np.log(float(T)) - float((c * np.log(c)).sum()) / float(T)
        ents.append(int(np.round(h * 1e4)))
    return pa.table(
        {
            id_col: pa.array(out_ids, pa.int64()),
            "n_tok": pa.array(ntoks, pa.int64()),
            "entropy_e4": pa.array(ents, pa.int64()),
        }
    )


def kl_divergence_by_source(
    ds,
    text_col: str = "text",
    group_col: str = "source",
    num_parts: int = 64,
):
    """Per-source KL divergence D(p_source || p_corpus) over word-token
    distributions — the distribution-drift quality signal for training
    mixes (which sources' vocabularies diverge from the pool).

    Determinism contract: one double expression per (source, token) —
    ``c/ns * ln((c*n)/(ns*ct))`` in the oracle's literal order —
    rounded half-away to 1e-9 fixed point, so per-source sums are
    order-free int64 and hash-match SQL exactly.

    Scale shape: per-batch (source, token-hash, count) combiner rows
    are the ONLY corpus-sized exchange (one coarse token-hash
    partition computes each token's corpus count locally and reduces
    to one partial sum per (partition, source)); per-source token
    totals are a tiny driver-merged broadcast.  Counts multiply as
    int64 (c*n), exact while corpus token count < 2^63 / max token
    count — beyond that, pre-divide into the double domain on both
    sides.
    """
    from collections import Counter as _Counter

    import numpy as np
    import ray

    from .dedup import _coarse_group_apply, _hash64

    def tf_partial(batch: pa.Table) -> pa.Table:
        srcs = batch[group_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_s: list[str] = []
        out_h: list[int] = []
        out_c: list[int] = []
        agg: dict = {}
        for s, t in zip(srcs, texts):
            for w, c in _Counter(
                w.lower() for w in _WORD_RE.findall(t)
            ).items():
                k = (s, w)
                agg[k] = agg.get(k, 0) + c
        for (s, w), c in agg.items():
            out_s.append(s)
            out_h.append(_hash64(w) & 0x7FFFFFFFFFFFFFFF)
            out_c.append(c)
        return pa.table(
            {
                group_col: pa.array(out_s, pa.string()),
                "tok_h": pa.array(out_h, pa.int64()),
                "c": pa.array(out_c, pa.int64()),
            }
        )

    tf = ds.map_batches(tf_partial, batch_format="pyarrow").materialize()

    # per-source token totals: one row per (batch, source) partial,
    # driver-merged (source count is tiny by construction)
    def ns_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        g = df.groupby(group_col, as_index=False)["c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = pa.concat_tables(
        ray.get(
            tf.map_batches(ns_partial, batch_format="pyarrow")
            .to_arrow_refs()
        ),
        promote_options="default",
    ).to_pandas()
    ns_map = parts.groupby(group_col)["c"].sum().to_dict()
    n_corpus = int(sum(ns_map.values()))
    ns_ref = ray.put(ns_map)

    def kl_part(part: pa.Table) -> pa.Table:
        import pandas as pd

        nsm = ray.get(ns_ref)
        df = part.to_pandas()
        # the partition holds EVERY source's counts for its tokens, so
        # the per-token corpus count is exact here
        df = df.groupby([group_col, "tok_h"], as_index=False)["c"].sum()
        ct = df.groupby("tok_h")["c"].transform("sum").to_numpy(np.int64)
        c = df["c"].to_numpy(np.int64)
        ns = df[group_col].map(nsm).to_numpy(np.int64)
        x = (
            c.astype(np.float64)
            / ns
            * np.log((c * n_corpus).astype(np.float64) / (ns * ct))
            * 1000000000.0
        )
        e9 = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        out = pd.DataFrame({group_col: df[group_col], "e9": e9})
        g = out.groupby(group_col, as_index=False)["e9"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = _coarse_group_apply(tf, "tok_h", kl_part, num_parts)
    merged = partials.groupby(group_col).sum("e9")

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.rename_columns([group_col, "kl_e9"])
        return pa.table(
            {
                group_col: t[group_col],
                "kl_e9": t["kl_e9"].combine_chunks().cast(pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


_BPE_WORD_RE = re.compile(r"[a-z0-9_]+")


def bpe_pair_counts(ds, text_col: str = "text", k: int = 20, num_parts: int = 32):
    """Weighted adjacent character-pair counts — the BPE tokenizer-
    training primitive (Sennrich et al. 2016: each merge step picks the
    globally most frequent symbol pair).

    Pair totals are LINEAR in word counts (sum over occurrences of
    per-word pair multisets), so no global word-count aggregation is
    needed: each batch tokenizes its documents (compiled regex, the
    repo's per-text convention), collapses to local (word, n) counts,
    expands those to (pair, n) partials with a vectorized
    ``str.slice`` sweep over word positions (loop bound = max word
    length, not corpus size), and pre-sums per pair.  The only
    exchange is a groupby over the tiny pair alphabet (<= ~1.4k rows);
    top-k ordering (count desc, pair asc) happens on that small table.

    At 100 TB this is one pass over the corpus with combiner-sized
    partials per block — the shape a real BPE trainer repeats per
    merge, with the merged symbol re-entering the alphabet.
    """
    import numpy as np
    import pandas as pd

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        words: list = []
        for t in df[text_col]:
            words.extend(_BPE_WORD_RE.findall(t.lower()))
        if not words:
            return pd.DataFrame(
                {
                    "pair": pd.Series([], dtype=object),
                    "cnt": pd.Series([], dtype="int64"),
                }
            )
        wc = pd.Series(words).value_counts()
        w = wc.index.to_series().reset_index(drop=True)
        n = wc.to_numpy(np.int64)
        frames = []
        max_len = int(w.str.len().max())
        for i in range(max_len - 1):
            p = w.str.slice(i, i + 2)
            ok = p.str.len().to_numpy() == 2
            if ok.any():
                frames.append(
                    pd.DataFrame({"pair": p.to_numpy()[ok], "cnt": n[ok]})
                )
        if not frames:
            return pd.DataFrame(
                {
                    "pair": pd.Series([], dtype=object),
                    "cnt": pd.Series([], dtype="int64"),
                }
            )
        out = pd.concat(frames, ignore_index=True)
        return out.groupby("pair", as_index=False)["cnt"].sum()

    from .dedup import driver_merge_sum

    partials = ds.map_batches(partial, batch_format="pandas")
    # vocab-bounded integer partials, driver-bound result: merge on
    # the driver, no shuffle round
    merged = driver_merge_sum(partials, ["pair"], ["cnt"])
    if len(merged) == 0:  # corpus had no 2+-char words
        return pd.DataFrame(
            {
                "pair": pd.Series([], dtype=object),
                "cnt": pd.Series([], dtype="int64"),
            }
        )
    merged["cnt"] = merged["cnt"].astype("int64")
    merged = merged.sort_values(
        ["cnt", "pair"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return merged[["pair", "cnt"]].reset_index(drop=True)


def bpe_train(ds, text_col: str = "text", n_merges: int = 10):
    """Full BPE training loop (Sennrich et al. 2016): learn ``n_merges``
    merge rules from a corpus Dataset.

    Distributed shape: the corpus collapses ONCE to a (word, n)
    vocabulary — per-batch local counts, one word groupby — and every
    merge step then iterates over the *vocabulary* Dataset, which is
    orders of magnitude smaller than the corpus (the corpus is never
    re-read).  Each step is (a) per-batch adjacent-pair counts over the
    current symbol sequences, (b) a pair-alphabet groupby + driver
    argmax (count desc, pair lexicographic — deterministic), (c) a
    per-batch rewrite applying the merge.  The vocabulary is
    materialized per step (it is vocab-sized, not corpus-sized) so a
    step's lineage doesn't replay all prior steps.

    Per-row loops here run over VOCABULARY rows — the same cost shape
    as reference BPE trainers, which all iterate word-by-word over the
    vocab; the corpus-sized pass (tokenize + count) is the only hot
    path and it is batch-local.

    Returns the ordered list of (left, right) merge rules.
    """
    import numpy as np
    import pandas as pd

    def count_words(df: "pd.DataFrame") -> "pd.DataFrame":
        words: list = []
        for t in df[text_col]:
            words.extend(_BPE_WORD_RE.findall(t.lower()))
        if not words:
            return pd.DataFrame(
                {
                    "word": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        wc = pd.Series(words).value_counts()
        return pd.DataFrame(
            {"word": wc.index, "n": wc.to_numpy(np.int64)}
        )

    vocab = (
        ds.map_batches(count_words, batch_format="pandas")
        .groupby("word")
        .sum("n")
    )

    def to_syms(df: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "syms": [list(w) for w in df["word"]],
                "n": df["sum(n)"].to_numpy(np.int64),
            }
        )

    vocab = vocab.map_batches(to_syms, batch_format="pandas").materialize()

    merges: list = []
    for _ in range(n_merges):

        def pair_partial(df: "pd.DataFrame") -> "pd.DataFrame":
            counts: dict = {}
            for syms, n in zip(df["syms"], df["n"]):
                for i in range(len(syms) - 1):
                    k = (syms[i], syms[i + 1])
                    counts[k] = counts.get(k, 0) + int(n)
            if not counts:
                return pd.DataFrame(
                    {
                        "left": pd.Series([], dtype=object),
                        "right": pd.Series([], dtype=object),
                        "cnt": pd.Series([], dtype="int64"),
                    }
                )
            ks = list(counts.keys())
            return pd.DataFrame(
                {
                    "left": [k[0] for k in ks],
                    "right": [k[1] for k in ks],
                    "cnt": np.fromiter(
                        (counts[k] for k in ks), np.int64, len(ks)
                    ),
                }
            )

        # pair-alphabet-bounded integer partials with a driver-bound
        # argmax: merge on the driver (driver_merge_sum) instead of
        # paying a shuffle round per merge step
        from .dedup import driver_merge_sum

        pairs = driver_merge_sum(
            vocab.map_batches(pair_partial, batch_format="pandas"),
            ["left", "right"],
            ["cnt"],
        )
        if len(pairs) == 0:
            break
        pairs = pairs.sort_values(
            ["cnt", "left", "right"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        left, right = pairs.iloc[0]["left"], pairs.iloc[0]["right"]
        merges.append((left, right))
        new_sym = left + right

        def apply_merge(
            df: "pd.DataFrame", left=left, right=right, new_sym=new_sym
        ) -> "pd.DataFrame":
            out = []
            for syms in df["syms"]:
                syms = list(syms)
                i, res = 0, []
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        res.append(new_sym)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            return pd.DataFrame(
                {"syms": out, "n": df["n"].to_numpy(np.int64)}
            )

        vocab = vocab.map_batches(
            apply_merge, batch_format="pandas"
        ).materialize()

    return merges


def bpe_encode(ds, merges, text_col: str = "text"):
    """Apply learned BPE merges (from ``bpe_train``) to a corpus:
    returns the input with ``n_bpe_tokens`` appended (sub-word token
    count per document — the number a training-data pipeline budgets
    shards and packing by).

    The merge table broadcasts as a rank dict; each batch tokenizes,
    encodes each DISTINCT word once (greedy lowest-rank adjacent pair,
    the reference BPE apply algorithm), and maps counts back to rows —
    per-word work is vocabulary-bounded per batch, the corpus pass is
    batch-local, and nothing shuffles.
    """
    import numpy as np
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def encode_word(w: str) -> int:
        syms = list(w)
        while len(syms) > 1:
            best, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, best_i = r, i
            if best is None:
                break
            syms[best_i : best_i + 2] = [
                syms[best_i] + syms[best_i + 1]
            ]
        return len(syms)

    def per_batch(df: "pd.DataFrame") -> "pd.DataFrame":
        cache: dict = {}
        counts = np.zeros(len(df), dtype=np.int64)
        for i, t in enumerate(df[text_col]):
            n = 0
            for w in _BPE_WORD_RE.findall(t.lower()):
                k = cache.get(w)
                if k is None:
                    k = encode_word(w)
                    cache[w] = k
                n += k
            counts[i] = n
        out = df.copy()
        out["n_bpe_tokens"] = counts
        return out

    return ds.map_batches(per_batch, batch_format="pandas")
