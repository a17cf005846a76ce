"""Corpus-level term statistics: document frequency, top-k vocabulary,
rarest-token (max-IDF) per document.

Reference parity: the reference has no corpus-level text statistics
(its analyzer is per-announcement, reference ``analyzer.py``); these are
the training-data-pipeline operators a 100-TB curation run needs on top.

Scale design:

* ``corpus_df`` — the document-frequency table is computed with the
  combiner pattern: each ``map_batches`` task counts per-doc DISTINCT
  tokens into a partial (token, df) table, so the groupby shuffle
  carries one row per (batch, token), never one per occurrence.
* ``top_df_tokens`` — distributed sort on (df desc, token asc) + limit;
  only k rows reach the driver.
* ``rarest_token_per_doc`` — the vocabulary (small side) is broadcast
  once via ``ray.put`` as a SORTED numpy token array + aligned df
  array — zero-copy to read in every task, probed with searchsorted
  (a pickled dict would re-deserialize per batch).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

# ASCII word runs, lowercased per token AFTER extraction — full-text
# lower() diverges between Python and SQL engines on exotic unicode,
# per-token ASCII lower is identical everywhere.  SQL twin:
# list_transform(regexp_extract_all(text, '[A-Za-z0-9_]+'), t -> lower(t))
_WORD_RE = re.compile(r"[A-Za-z0-9_]+")


def _doc_tokens(text: str) -> set:
    return {w.lower() for w in _WORD_RE.findall(text)}


def corpus_df(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """(token, df): number of documents containing each token."""

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(_doc_tokens(t))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "df": pa.array(list(c.values()), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("df")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "token": batch["token"],
                "df": batch["sum(df)"].combine_chunks().cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def top_df_tokens(
    ds: "ray.data.Dataset", k: int = 100, text_col: str = "text"
) -> "ray.data.Dataset":
    """Top-k corpus vocabulary by document frequency (ties to the
    lexicographically smaller token, so the cut is deterministic)."""
    return (
        corpus_df(ds, text_col=text_col)
        .sort(["df", "token"], descending=[True, False])
        .limit(k)
    )


def inverted_index(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """(token, df, postings): sorted doc-id posting list per token,
    comma-joined.

    The shuffle carries per-doc DISTINCT (token, doc_id) pairs,
    partitioned by a STABLE token hash (crc32 — ``hash()`` is
    per-process-seeded and would split a token across partitions).
    Posting-list assembly is partition-local.  At 100-TB scale the
    posting column for stop-words is unbounded — a production sink
    would write list<int64> postings partitioned by token hash and cap
    or tier hot tokens; the joined-string form here is the exact
    oracle-comparable shape.
    """
    import zlib

    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_tok, out_id, out_part = [], [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            for tok in _doc_tokens(t):
                out_tok.append(tok)
                out_id.append(ids[i])
                out_part.append(
                    zlib.crc32(tok.encode("utf-8")) % num_parts
                )
        return pa.table(
            {
                "token": pa.array(out_tok, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "_part": pa.array(out_part, pa.int64()),
            }
        )

    def assemble(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = (
            tbl.select(["token", "doc_id"])
            .to_pandas()
            .sort_values(["token", "doc_id"])
        )
        g = df.groupby("token", sort=True)["doc_id"]
        out = pd.DataFrame(
            {
                "df": g.size().astype("int64"),
                "postings": g.agg(
                    lambda s: ",".join(str(v) for v in s)
                ),
            }
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda t: assemble(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


class _Vocab:
    """Broadcast vocabulary: sorted token array + aligned df column."""

    def __init__(self, tokens: np.ndarray, dfs: np.ndarray):
        order = np.argsort(tokens)
        self.tokens = tokens[order]
        self.dfs = dfs[order]


def rarest_token_per_doc(
    ds: "ray.data.Dataset",
    df_ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Per document, its token with the smallest document frequency
    (ties to the lexicographically smaller token) — the max-IDF term, a
    cheap integer-exact stand-in for a full TF-IDF ranking.

    Documents with no word tokens are dropped (they have no terms).
    """
    df_tbl = pa.concat_tables(
        ray.get(df_ds.to_arrow_refs()), promote_options="default"
    )
    vocab_ref = ray.put(
        _Vocab(
            np.asarray(df_tbl["token"].to_pylist(), dtype=object),
            df_tbl["df"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
    )

    def pick(batch: pa.Table) -> pa.Table:
        vocab: _Vocab = ray.get(vocab_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_id, out_tok, out_df = [], [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            toks = np.asarray(sorted(_doc_tokens(t)), dtype=object)
            if len(toks) == 0:
                continue
            pos = np.searchsorted(vocab.tokens, toks)
            dfs = vocab.dfs[pos]
            best = np.lexsort((toks, dfs))[0]
            out_id.append(ids[i])
            out_tok.append(toks[best])
            out_df.append(dfs[best])
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "rarest_token": pa.array(out_tok, pa.string()),
                "rarest_df": pa.array(out_df, pa.int64()),
            }
        )

    return ds.map_batches(pick, batch_format="pyarrow")


def ngram_counts(
    ds: "ray.data.Dataset",
    n: int = 2,
    min_count: int = 2,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Corpus word n-gram OCCURRENCE counts with count pruning — the
    KenLM-style LM-prep table.

    Combiner pattern: each batch counts its n-grams locally (a Counter
    over the batch's token stream, one row per DISTINCT gram per batch
    through the shuffle), then a groupby-sum and a count filter.  The
    pruned table is the output; nothing reaches the driver.
    """

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            toks = [w.lower() for w in _WORD_RE.findall(t)]
            for i in range(len(toks) - n + 1):
                c[" ".join(toks[i : i + n])] += 1
        return pa.table(
            {
                "gram": pa.array(list(c.keys()), pa.string()),
                "n_occurrences": pa.array(
                    list(c.values()), pa.int64()
                ),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("gram")
        .sum("n_occurrences")
    )

    def prune(batch: pa.Table) -> pa.Table:
        t = batch.rename_columns(["gram", "n_occurrences"])
        keep = pc.greater_equal(
            t["n_occurrences"], pa.scalar(min_count, t["n_occurrences"].type)
        )
        out = t.filter(keep)
        return pa.table(
            {
                "gram": out["gram"],
                "n_occurrences": out["n_occurrences"]
                .combine_chunks()
                .cast(pa.int64()),
            }
        )

    return merged.map_batches(prune, batch_format="pyarrow")


def ngram_counts_multi(
    ds: "ray.data.Dataset",
    ns: tuple = (1, 2, 3),
    text_col: str = "text",
) -> dict:
    """Corpus n-gram counts for SEVERAL orders in ONE tokenize pass and
    ONE shuffle: each batch tokenizes once and emits tagged
    (order, gram, n) partials; a single (order, gram) groupby merges
    them, and the result splits per order by a vectorized filter.
    Equivalent to one ``ngram_counts(min_count=1)`` per order at a
    third of the corpus passes — the shape a Brants-style distributed
    LM count job uses (count all orders while the tokens are hot)."""

    def partial(batch: pa.Table) -> pa.Table:
        cs = {n: Counter() for n in ns}
        for t in batch[text_col].to_pylist():
            toks = [w.lower() for w in _WORD_RE.findall(t)]
            for n in ns:
                c = cs[n]
                for i in range(len(toks) - n + 1):
                    c[" ".join(toks[i : i + n])] += 1
        orders: list = []
        grams: list = []
        counts: list = []
        for n in ns:
            c = cs[n]
            orders.extend([n] * len(c))
            grams.extend(c.keys())
            counts.extend(c.values())
        return pa.table(
            {
                "order": pa.array(orders, pa.int64()),
                "gram": pa.array(grams, pa.string()),
                "n_occurrences": pa.array(counts, pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["order", "gram"])
        .sum("n_occurrences")
        .materialize()
    )

    def split(order: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.rename_columns(["order", "gram", "n_occurrences"])
            out = t.filter(pc.equal(t["order"], order))
            return pa.table(
                {
                    "gram": out["gram"],
                    "n_occurrences": out["n_occurrences"]
                    .combine_chunks()
                    .cast(pa.int64()),
                }
            )

        return fn

    return {
        n: merged.map_batches(split(n), batch_format="pyarrow")
        for n in ns
    }


def pmi_bigrams(
    ds: "ray.data.Dataset",
    min_count: int = 5,
    top_k: int = 20,
    text_col: str = "text",
    num_parts: int = 64,
) -> pa.Table:
    """Top-k collocations by pointwise mutual information (Church &
    Hanks 1990): PMI(x,y) = ln( p(xy) / (p(x)p(y)) ) over word bigrams
    occurring at least ``min_count`` times.

    Everything is combiner-shaped:

    1. bigram and unigram count tables via ``ngram_counts`` (one row
       per distinct gram per batch through each shuffle);
    2. corpus totals (T1 tokens, T2 bigram windows) via a 2-int
       combiner;
    3. unigram counts attach to each surviving bigram's two halves by
       a CO-PARTITIONED string-hash join (bigram half-rows and
       unigram rows bucketed by word hash — no vocabulary broadcast,
       no driver dict);
    4. per-partition PMI + partial top-k; only ``num_parts * k``
       candidate rows reach the driver for the final cut.

    Returned as (gram, n_occurrences, pmi_e4) ordered by
    (pmi_e4 desc, gram) — fixed-point 1e-4 so an SQL oracle
    hash-matches the float math.
    """
    from .dedup import _coarse_group_apply, _hash64

    big = ngram_counts(ds, n=2, min_count=min_count, text_col=text_col)
    uni = ngram_counts(ds, n=1, min_count=1, text_col=text_col)

    def totals_partial(batch: pa.Table) -> pa.Table:
        n_tok = 0
        n_big = 0
        for t in batch[text_col].to_pylist():
            k = len(_WORD_RE.findall(t))
            n_tok += k
            n_big += max(k - 1, 0)
        return pa.table(
            {
                "n_tok": pa.array([n_tok], pa.int64()),
                "n_big": pa.array([n_big], pa.int64()),
            }
        )

    tot = (
        ds.map_batches(totals_partial, batch_format="pyarrow")
        .sum(["n_tok", "n_big"])
    )
    t1 = float(tot["sum(n_tok)"])
    t2 = float(tot["sum(n_big)"])

    # ---- half-rows: one row per (bigram, position) keyed by the word
    def halves(batch: pa.Table) -> pa.Table:
        grams = batch["gram"].to_pylist()
        cxy = batch["n_occurrences"].to_pylist()
        words: list[str] = []
        out_gram: list[str] = []
        out_pos: list[int] = []
        out_cxy: list[int] = []
        for g, c in zip(grams, cxy):
            w1, w2 = g.split(" ", 1)
            words.extend((w1, w2))
            out_gram.extend((g, g))
            out_pos.extend((1, 2))
            out_cxy.extend((c, c))
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "word_hash": pa.array(
                    [_hash64(w) for w in words], pa.uint64()
                ),
                "gram": pa.array(out_gram, pa.string()),
                "pos": pa.array(out_pos, pa.int64()),
                "c_xy": pa.array(out_cxy, pa.int64()),
                "c_w": pa.array([None] * len(words), pa.int64()),
            }
        )

    def uni_rows(batch: pa.Table) -> pa.Table:
        t = batch.rename_columns(["word", "c"])
        words = t["word"].to_pylist()
        n = len(words)
        return pa.table(
            {
                "word": t["word"],
                "word_hash": pa.array(
                    [_hash64(w) for w in words], pa.uint64()
                ),
                "gram": pa.array([None] * n, pa.string()),
                "pos": pa.array([None] * n, pa.int64()),
                "c_xy": pa.array([None] * n, pa.int64()),
                "c_w": t["c"].combine_chunks().cast(pa.int64()),
            }
        )

    unioned = big.map_batches(halves, batch_format="pyarrow").union(
        uni.map_batches(uni_rows, batch_format="pyarrow")
    )

    def attach(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        is_uni = df["gram"].isna()
        wmap = dict(
            zip(df.loc[is_uni, "word"], df.loc[is_uni, "c_w"])
        )
        h = df.loc[~is_uni].copy()
        # every bigram half exists in the unigram table by construction
        h["c_w"] = h["word"].map(wmap).astype("int64")
        h["pos"] = h["pos"].astype("int64")
        h["c_xy"] = h["c_xy"].astype("int64")
        return pa.Table.from_pandas(
            h[["gram", "pos", "c_xy", "c_w"]], preserve_index=False
        )

    attached = _coarse_group_apply(unioned, "word_hash", attach, num_parts)

    # ---- regroup by gram: combine the two halves, PMI, partial top-k
    def add_gram_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "gram_hash",
            pa.array(
                [_hash64(g) for g in batch["gram"].to_pylist()],
                pa.uint64(),
            ),
        )

    def pmi_part(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        p1 = df[df["pos"] == 1].set_index("gram")
        p2 = df[df["pos"] == 2].set_index("gram")
        m = p1.join(p2, lsuffix="_1", rsuffix="_2", how="inner")
        cxy = m["c_xy_1"].to_numpy(dtype=np.float64)
        cx = m["c_w_1"].to_numpy(dtype=np.float64)
        cy = m["c_w_2"].to_numpy(dtype=np.float64)
        pmi = np.log((cxy * t1 * t1) / (t2 * cx * cy))
        x = pmi * 10_000.0
        e4 = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        out = pa.table(
            {
                "gram": pa.array(m.index.to_list(), pa.string()),
                "n_occurrences": pa.array(
                    m["c_xy_1"].astype("int64"), pa.int64()
                ),
                "pmi_e4": pa.array(e4, pa.int64()),
            }
        )
        # partial top-k: at most k rows leave each partition
        idx = sorted(
            range(out.num_rows),
            key=lambda i: (-e4[i], out["gram"][i].as_py()),
        )[:top_k]
        return out.take(pa.array(idx, pa.int64()))

    cand = _coarse_group_apply(
        attached.map_batches(add_gram_hash, batch_format="pyarrow"),
        "gram_hash",
        pmi_part,
        num_parts,
    )
    blocks = [
        t
        if isinstance(t, pa.Table)
        else pa.Table.from_pandas(t, preserve_index=False)
        for t in ray.get(cand.to_arrow_refs())
    ]
    final = pa.concat_tables(
        [t for t in blocks if t.num_rows]
        or [
            pa.table(
                {
                    "gram": pa.array([], pa.string()),
                    "n_occurrences": pa.array([], pa.int64()),
                    "pmi_e4": pa.array([], pa.int64()),
                }
            )
        ]
    )
    df = final.to_pandas().sort_values(
        ["pmi_e4", "gram"], ascending=[False, True], kind="mergesort"
    )[:top_k]
    return pa.Table.from_pandas(df, preserve_index=False)


def bigram_logprob_scores(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Per-document mean bigram log-probability — the CCNet-style
    LM-perplexity quality filter (Wenzek et al. 2020), with the corpus
    itself as the language model: score(doc) = mean over bigram
    positions of ln( c(w1 w2) / c(w1) ), unsmoothed MLE (every doc's
    bigrams are in the corpus counts, so probabilities are never 0).

    Scale shape — three combiner shuffles and two CO-PARTITIONED
    string-hash joins, no vocabulary broadcast, no driver dict:

    1. corpus bigram / unigram count tables (``ngram_counts``: one row
       per distinct gram per batch through each shuffle);
    2. per-doc DISTINCT bigram rows (doc_id, w1, gram, m) — m is the
       within-doc multiplicity, so a 100-copy bigram in one doc is ONE
       row;
    3. bigram counts attach by gram-hash co-partition; first-word
       counts attach by word-hash co-partition;
    4. per-doc partial sums (sum m*ln(c2/c1), sum m) through one tiny
       keyed shuffle; fixed-point 1e-4 output so a SQL oracle
       hash-matches.

    Returns (doc_id, n_bigrams, logprob_e4); docs with < 2 tokens have
    no bigrams and are absent (JOIN semantics, matching the oracle).
    """
    from .dedup import _coarse_group_apply, _hash64

    cb = ngram_counts(ds, n=2, min_count=1, text_col=text_col)
    cu = ngram_counts(ds, n=1, min_count=1, text_col=text_col)

    # ---- per-doc bigram multiplicity rows
    def doc_bigrams(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        w1s: list[str] = []
        grams: list[str] = []
        ms: list[int] = []
        for did, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            toks = [w.lower() for w in _WORD_RE.findall(t)]
            c: Counter = Counter(
                zip(toks[:-1], toks[1:])
            )
            for (a, b), m in c.items():
                ids.append(did)
                w1s.append(a)
                grams.append(a + " " + b)
                ms.append(m)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "w1": pa.array(w1s, pa.string()),
                "gram": pa.array(grams, pa.string()),
                "m": pa.array(ms, pa.int64()),
            }
        )

    doc_rows = ds.map_batches(doc_bigrams, batch_format="pyarrow")

    # ---- join 1: attach c2 by gram hash (union + co-partition apply)
    def doc_side1(batch: pa.Table) -> pa.Table:
        grams = batch["gram"].to_pylist()
        return pa.table(
            {
                "key_hash": pa.array(
                    [_hash64(g) for g in grams], pa.uint64()
                ),
                id_col: batch[id_col],
                "w1": batch["w1"],
                "gram": batch["gram"],
                "m": batch["m"],
                "c": pa.array([None] * len(grams), pa.int64()),
            }
        )

    def count_side1(batch: pa.Table) -> pa.Table:
        t = batch
        grams = t["gram"].to_pylist()
        n = len(grams)
        return pa.table(
            {
                "key_hash": pa.array(
                    [_hash64(g) for g in grams], pa.uint64()
                ),
                id_col: pa.array([None] * n, pa.int64()),
                "w1": pa.array([None] * n, pa.string()),
                "gram": t["gram"],
                "m": pa.array([None] * n, pa.int64()),
                "c": t["n_occurrences"],
            }
        )

    def attach1(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        is_count = df[id_col].isna()
        cmap = dict(zip(df.loc[is_count, "gram"], df.loc[is_count, "c"]))
        h = df.loc[~is_count].copy()
        h["c2"] = h["gram"].map(cmap).astype("int64")
        h[id_col] = h[id_col].astype("int64")
        h["m"] = h["m"].astype("int64")
        return pa.Table.from_pandas(
            h[[id_col, "w1", "m", "c2"]], preserve_index=False
        )

    u1 = doc_rows.map_batches(doc_side1, batch_format="pyarrow").union(
        cb.map_batches(count_side1, batch_format="pyarrow")
    )
    with_c2 = _coarse_group_apply(u1, "key_hash", attach1, num_parts)

    # ---- join 2: attach c1 by first-word hash
    def doc_side2(batch: pa.Table) -> pa.Table:
        words = batch["w1"].to_pylist()
        return pa.table(
            {
                "key_hash": pa.array(
                    [_hash64(w) for w in words], pa.uint64()
                ),
                id_col: batch[id_col],
                "w1": batch["w1"],
                "m": batch["m"],
                "c2": batch["c2"],
                "c": pa.array([None] * len(words), pa.int64()),
            }
        )

    def count_side2(batch: pa.Table) -> pa.Table:
        t = batch
        words = t["gram"].to_pylist()
        n = len(words)
        return pa.table(
            {
                "key_hash": pa.array(
                    [_hash64(w) for w in words], pa.uint64()
                ),
                id_col: pa.array([None] * n, pa.int64()),
                "w1": t["gram"],
                "m": pa.array([None] * n, pa.int64()),
                "c2": pa.array([None] * n, pa.int64()),
                "c": t["n_occurrences"],
            }
        )

    def attach2(part: pa.Table) -> pa.Table:
        import pandas as pd

        df = part.to_pandas()
        is_count = df[id_col].isna()
        cmap = dict(zip(df.loc[is_count, "w1"], df.loc[is_count, "c"]))
        h = df.loc[~is_count]
        if not len(h):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                    "nb": pa.array([], pa.int64()),
                }
            )
        c1 = h["w1"].map(cmap).to_numpy(np.float64)
        c2 = h["c2"].to_numpy(np.float64)
        m = h["m"].to_numpy(np.float64)
        lp = m * np.log(c2 / c1)
        out = pd.DataFrame(
            {id_col: h[id_col].astype("int64"), "s": lp, "nb": h["m"].astype("int64")}
        ).groupby(id_col, as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    u2 = with_c2.map_batches(doc_side2, batch_format="pyarrow").union(
        cu.map_batches(count_side2, batch_format="pyarrow")
    )
    partials = _coarse_group_apply(u2, "key_hash", attach2, num_parts)

    merged = partials.groupby(id_col).sum(["s", "nb"])

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.rename_columns([id_col, "s", "nb"])
        s = np.asarray(t["s"].to_pandas(), np.float64)
        nb = np.asarray(t["nb"].to_pandas(), np.float64)
        x = s / nb * 10_000.0
        e4 = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col].combine_chunks().cast(pa.int64()),
                "n_bigrams": t["nb"].combine_chunks().cast(pa.int64()),
                "logprob_e4": pa.array(e4, pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def tfidf_cosine_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    tau_e4: int = 3000,
    max_df_frac: float = 0.2,
    max_df_abs: int | None = None,
    num_parts: int = 64,
    broadcast_max_norms: int = 2_000_000,
) -> "ray.data.Dataset":
    """Sparse TF-IDF cosine similarity join: all document pairs with
    cosine >= tau over tf*ln(N/df) vectors — the classic IR-side
    near-dup/similarity operator complementing MinHash (token-set) and
    embedding-cosine (dense) dedup.

    Determinism contract: weights quantize to 1e-4 fixed point FIRST,
    so every dot product and norm is exact int64 arithmetic — sums are
    order-free and a SQL oracle hash-matches bit for bit.  The only
    floats are one ln() per (token, df) and the final divide; both are
    single IEEE ops on identical inputs.

    Scale shape (no vocabulary broadcast, no driver dict):
    1. tf rows (doc, token, tf) — one row per distinct token per doc;
    2. df table by token-hash combiner; tokens with df < 2 can't form
       pairs and df > max_df_frac*N are stopwords — both pruned (this
       bounds every posting list by max_df);
    3. weights attach by token-hash co-partition (union trick);
    4. posting-list pair expansion per token inside each partition
       (triu, <= max_df^2/2 per token), partial pair-dot sums per
       partition, then ONE keyed shuffle on the packed pair key;
    5. norms attach via two co-partition int hash joins.

    Returns (doc_a, doc_b, cos_e4) with doc_a < doc_b.
    """
    from .dedup import _coarse_group_apply, _hash64
    from .join import hash_join

    ds = ds.materialize()  # consumed by count + tf pass
    n_docs = ds.count()
    max_df = int(max_df_frac * n_docs)
    if max_df_abs is not None:
        # absolute posting-list cap: pair expansion is O(df^2) per
        # token, so an uncapped frac bound explodes quadratically with
        # corpus size — the standard prefix-filtering stopword prune
        max_df = min(max_df, max_df_abs)

    def tf_partial(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        toks: list[str] = []
        tfs: list[int] = []
        for did, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            c: Counter = Counter(
                w.lower() for w in _WORD_RE.findall(t)
            )
            ids.extend([did] * len(c))
            toks.extend(c.keys())
            tfs.extend(c.values())
        # 63-bit mask: Ray groupby keys must be int64 (uint64 keys
        # fall back to pickled-object columns)
        h = [_hash64(t) & 0x7FFFFFFFFFFFFFFF for t in toks]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "tok_h": pa.array(h, pa.int64()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    tf_rows = ds.map_batches(
        tf_partial, batch_format="pyarrow"
    ).materialize()  # consumed by df pass + weight join

    # ---- df by token hash (tf rows are distinct per (doc, token))
    def df_partial(batch: pa.Table) -> pa.Table:
        h = batch["tok_h"].to_numpy(zero_copy_only=False)
        u, c = np.unique(h, return_counts=True)
        return pa.table(
            {
                "tok_h": pa.array(u, pa.int64()),
                "df": pa.array(c, pa.int64()),
            }
        )

    df_tbl = (
        tf_rows.map_batches(df_partial, batch_format="pyarrow")
        .groupby("tok_h")
        .sum("df")
    )

    # ---- attach df by token-hash co-partition; quantized weights
    def doc_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "tok_h": batch["tok_h"],
                id_col: batch[id_col],
                "tf": batch["tf"],
                "df": pa.array([None] * n, pa.int64()),
            }
        )

    def count_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "tok_h": batch["tok_h"],
                id_col: pa.array([None] * n, pa.int64()),
                "tf": pa.array([None] * n, pa.int64()),
                "df": batch["sum(df)"],
            }
        )

    def attach_w(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        is_cnt = df[id_col].isna()
        dmap = df.loc[is_cnt].set_index("tok_h")["df"]
        h = df.loc[~is_cnt].copy()
        dfv = h["tok_h"].map(dmap).to_numpy(dtype=np.float64)
        keep = (dfv >= 2) & (dfv <= max_df)
        h = h.loc[keep]
        dfv = dfv[keep]
        w4 = np.round(
            h["tf"].to_numpy(dtype=np.float64)
            * np.log(float(n_docs) / dfv)
            * 1e4
        ).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(
                    h[id_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                "tok_h": pa.array(
                    h["tok_h"].to_numpy(dtype=np.int64), pa.int64()
                ),
                "w4": pa.array(w4, pa.int64()),
            }
        )

    w_rows = _coarse_group_apply(
        tf_rows.map_batches(doc_side, batch_format="pyarrow").union(
            df_tbl.map_batches(count_side, batch_format="pyarrow")
        ),
        "tok_h",
        attach_w,
        num_parts,
    ).materialize()  # consumed by norms + pair expansion

    # ---- norms (exact int sums)
    def norm_partial(batch: pa.Table) -> pa.Table:
        d = batch[id_col].to_numpy(zero_copy_only=False)
        w = batch["w4"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(d, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, w * w)
        return pa.table(
            {
                id_col: pa.array(u, pa.int64()),
                "n2": pa.array(s, pa.int64()),
            }
        )

    norms = (
        w_rows.map_batches(norm_partial, batch_format="pyarrow")
        .groupby(id_col)
        .sum("n2")
    )

    # ---- pair-dot partials per token inside each token-hash partition
    def pair_dots(part: pa.Table) -> pa.Table:
        h = part["tok_h"].to_numpy(zero_copy_only=False)
        d = part[id_col].to_numpy(zero_copy_only=False)
        w = part["w4"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        h, d, w = h[order], d[order], w[order]
        starts = np.flatnonzero(
            np.concatenate(([True], h[1:] != h[:-1]))
        )
        ends = np.concatenate((starts[1:], [len(h)]))
        keys, dots = [], []
        for s, e in zip(starts, ends):
            L = e - s
            if L < 2:
                continue
            ai, bj = np.triu_indices(L, k=1)
            da, db = d[s + ai], d[s + bj]
            keys.append(
                (da.astype(np.uint64) << np.uint64(32))
                | db.astype(np.uint64)
            )
            dots.append(w[s + ai] * w[s + bj])
        if not keys:
            return pa.table(
                {
                    "pk": pa.array([], pa.uint64()),
                    "dot": pa.array([], pa.int64()),
                }
            )
        pk = np.concatenate(keys)
        dot = np.concatenate(dots)
        # partition-local combine shrinks the pair shuffle
        u, inv = np.unique(pk, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, dot)
        return pa.table(
            {
                "pk": pa.array(u, pa.uint64()),
                "dot": pa.array(s, pa.int64()),
            }
        )

    pair_dot = (
        _coarse_group_apply(w_rows, "tok_h", pair_dots, num_parts)
        .groupby("pk")
        .sum("dot")
    )

    def unpack(batch: pa.Table) -> pa.Table:
        pk = batch["pk"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "doc_a": pa.array(
                    (pk >> np.uint64(32)).astype(np.int64), pa.int64()
                ),
                "doc_b": pa.array(
                    (pk & np.uint64(0xFFFFFFFF)).astype(np.int64),
                    pa.int64(),
                ),
                "dot": batch["sum(dot)"].combine_chunks().cast(pa.int64()),
            }
        )

    pairs = pair_dot.map_batches(unpack, batch_format="pyarrow")

    if n_docs <= broadcast_max_norms:
        # norm table is doc-count-sized; below the threshold broadcast
        # it once (sorted id + n2 arrays, searchsorted probe) instead
        # of paying two shuffle joins — same switch pattern as the
        # dedup pair-verify path
        nt = norms.to_pandas()
        ids = nt[id_col].to_numpy(dtype=np.int64)
        n2 = nt["sum(n2)"].to_numpy(dtype=np.int64)
        o = np.argsort(ids)
        norm_ref = ray.put((ids[o], n2[o]))

        def finish_bcast(batch: pa.Table) -> pa.Table:
            sids, sn2 = ray.get(norm_ref)
            da = batch["doc_a"].to_numpy(zero_copy_only=False)
            db = batch["doc_b"].to_numpy(zero_copy_only=False)
            dot = batch["dot"].to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            na = sn2[np.searchsorted(sids, da)].astype(np.float64)
            nb = sn2[np.searchsorted(sids, db)].astype(np.float64)
            cos4 = np.round(
                dot / (np.sqrt(na) * np.sqrt(nb)) * 1e4
            ).astype(np.int64)
            out = pa.table(
                {
                    "doc_a": pa.array(da, pa.int64()),
                    "doc_b": pa.array(db, pa.int64()),
                    "cos_e4": pa.array(cos4, pa.int64()),
                }
            )
            return out.filter(pa.array(cos4 >= tau_e4))

        return pairs.map_batches(finish_bcast, batch_format="pyarrow")

    # join path: checkpoint resolves the schema for hash_join (lazy
    # chains off a groupby can report schema=None when the probe block
    # is empty); the pair table is candidate-bounded anyway
    pairs = pairs.materialize()

    def norm_a(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_a": batch[id_col].combine_chunks().cast(pa.int64()),
                "n2_a": batch["sum(n2)"].combine_chunks().cast(pa.int64()),
            }
        )

    def norm_b(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_b": batch[id_col].combine_chunks().cast(pa.int64()),
                "n2_b": batch["sum(n2)"].combine_chunks().cast(pa.int64()),
            }
        )

    norms = norms.materialize()  # joined twice
    with_a = hash_join(
        pairs,
        norms.map_batches(norm_a, batch_format="pyarrow"),
        "doc_a",
        "doc_a",
        num_parts=min(num_parts, 16),
    ).materialize()  # schema checkpoint for the second join (see above)
    with_ab = hash_join(
        with_a,
        norms.map_batches(norm_b, batch_format="pyarrow"),
        "doc_b",
        "doc_b",
        num_parts=min(num_parts, 16),
    )

    def finish(batch: pa.Table) -> pa.Table:
        dot = batch["dot"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch["n2_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch["n2_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        cos4 = np.round(dot / (np.sqrt(na) * np.sqrt(nb)) * 1e4).astype(
            np.int64
        )
        out = pa.table(
            {
                "doc_a": batch["doc_a"].combine_chunks().cast(pa.int64()),
                "doc_b": batch["doc_b"].combine_chunks().cast(pa.int64()),
                "cos_e4": pa.array(cos4, pa.int64()),
            }
        )
        return out.filter(pa.array(cos4 >= tau_e4))

    return with_ab.map_batches(finish, batch_format="pyarrow")


def bm25_topk(
    ds: "ray.data.Dataset",
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    topk: int = 10,
) -> pa.Table:
    """BM25 ranked retrieval (Robertson-Sparck Jones / Okapi, Lucene
    +1-idf form): top-k documents for a fixed term query, k1 = 1.2,
    b = 0.75.

    Determinism contract (the tfidf fixed-point recipe): every
    per-(doc, term) score is ONE double expression — written with the
    exact literal/associativity order the SQL oracle uses — rounded
    half-away to 1e-4 fixed point, so the per-doc sum is order-free
    int64 arithmetic and hash-matches SQL bit for bit.

    Scale shape: the query is the broadcast side (a handful of terms),
    so the corpus NEVER shuffles — pass A tokenizes each batch into a
    compact (doc_id, dl, tf_j, nz_j) row per doc; pass B is Ray's
    native tree-reduce ``sum`` (N, total dl, per-term df — no
    exchange); pass C scores vectorized per batch and keeps a partial
    top-k per block, so only k x blocks candidate rows reach the
    driver.
    """
    from collections import Counter as _Counter

    m = len(query_terms)
    q_index = {t: j for j, t in enumerate(query_terms)}

    def compact(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        n = len(ids)
        dl = np.zeros(n, np.int64)
        tf = np.zeros((n, m), np.int64)
        for i, t in enumerate(texts):
            toks = _WORD_RE.findall(t)
            dl[i] = len(toks)
            c = _Counter(w.lower() for w in toks)
            for term, j in q_index.items():
                tf[i, j] = c.get(term, 0)
        cols = {
            id_col: pa.array(np.asarray(ids, np.int64), pa.int64()),
            "dl": pa.array(dl, pa.int64()),
        }
        for j in range(m):
            cols[f"tf_{j}"] = pa.array(tf[:, j], pa.int64())
            cols[f"nz_{j}"] = pa.array(
                (tf[:, j] > 0).astype(np.int64), pa.int64()
            )
        return pa.table(cols)

    stats_ds = ds.map_batches(compact, batch_format="pyarrow").materialize()
    n_docs = stats_ds.count()
    sums = stats_ds.sum(["dl"] + [f"nz_{j}" for j in range(m)])
    avgdl = float(sums["sum(dl)"]) / float(n_docs)
    df = np.array(
        [int(sums[f"sum(nz_{j})"]) for j in range(m)], np.int64
    )
    # one ln per term, same expression shape as the SQL oracle:
    # ln((n - df + 0.5) / (df + 0.5) + 1)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score(batch: pa.Table) -> pa.Table:
        dl = batch["dl"].to_numpy(zero_copy_only=False)
        total = np.zeros(batch.num_rows, np.int64)
        den_base = 1.2 * (0.25 + 0.75 * dl / avgdl)
        for j in range(m):
            tf_j = batch[f"tf_{j}"].to_numpy(zero_copy_only=False)
            s = idf[j] * (tf_j * 2.2) / (tf_j + den_base) * 10000.0
            e4 = np.floor(s + 0.5).astype(np.int64)
            total += np.where(tf_j > 0, e4, 0)
        keep = total > 0
        ids = batch[id_col].to_numpy(zero_copy_only=False)[keep]
        total = total[keep]
        # block-local partial top-k: only k rows leave any block
        if len(ids) > topk:
            order = np.lexsort((ids, -total))[:topk]
            ids, total = ids[order], total[order]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "score_e4": pa.array(total, pa.int64()),
            }
        )

    cand = pa.concat_tables(
        ray.get(
            stats_ds.map_batches(score, batch_format="pyarrow")
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    ids = cand[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    sc = cand["score_e4"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, -sc))[:topk]
    return pa.table(
        {
            "rank": pa.array(
                np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()
            ),
            id_col: pa.array(ids[order], pa.int64()),
            "score_e4": pa.array(sc[order], pa.int64()),
        }
    )


def _attach_count(
    rows: "ray.data.Dataset",
    counts: "ray.data.Dataset",
    key_col: str,
    out_col: str,
    carry: list,
    num_parts: int = 64,
):
    """Attach a corpus count column to ``rows`` by EXACT string key via
    the union + hash co-partition trick (the ``bigram_logprob_scores``
    join shape, parameterized): both sides ship to the partition of
    ``_hash64(key)``, and inside each partition a dict keyed by the
    ACTUAL string resolves the count — hash collisions cannot corrupt
    the join, the count table is never broadcast, and no driver dict
    exists.  ``carry`` is the [(name, pa_type)] row columns to keep
    (must include ``key_col``); keys absent from ``counts`` get 0."""
    from .dedup import _coarse_group_apply, _hash64

    def doc_side(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        cols = {
            "__kh": pa.array([_hash64(k) for k in keys], pa.uint64())
        }
        for name, _typ in carry:
            cols[name] = batch[name]
        cols["__c"] = pa.nulls(len(keys), pa.int64())
        cols["__doc"] = pa.array([True] * len(keys), pa.bool_())
        return pa.table(cols)

    def count_side(batch: pa.Table) -> pa.Table:
        keys = batch["gram"].to_pylist()
        n = len(keys)
        cols = {
            "__kh": pa.array([_hash64(k) for k in keys], pa.uint64())
        }
        for name, typ in carry:
            if name == key_col:
                cols[name] = batch["gram"]
            else:
                cols[name] = pa.nulls(n, typ)
        cols["__c"] = (
            batch["n_occurrences"].combine_chunks().cast(pa.int64())
        )
        cols["__doc"] = pa.array([False] * n, pa.bool_())
        return pa.table(cols)

    def attach(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        is_doc = df["__doc"].astype(bool)
        cmap = dict(
            zip(df.loc[~is_doc, key_col], df.loc[~is_doc, "__c"])
        )
        h = df.loc[is_doc]
        cols = {}
        for name, typ in carry:
            cols[name] = pa.array(h[name].tolist(), typ)
        cols[out_col] = pa.array(
            [int(cmap.get(k, 0)) for k in h[key_col]], pa.int64()
        )
        return pa.table(cols)

    u = rows.map_batches(doc_side, batch_format="pyarrow").union(
        counts.map_batches(count_side, batch_format="pyarrow")
    )
    return _coarse_group_apply(u, "__kh", attach, num_parts)


def stupid_backoff_scores(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    train_col: str = "lang",
    train_value: str = "en",
    scale: int = 10**6,
    num_parts: int = 64,
    broadcast_max_vocab: int = 2_000_000,
) -> "ray.data.Dataset":
    """Stupid Backoff trigram LM scoring (Brants et al., EMNLP 2007
    "Large Language Models in Machine Translation") — the backoff
    scheme DESIGNED for distributed web-scale LM estimation: no
    discounting, no normalization, just relative frequencies with a
    fixed 0.4 backoff factor, because those are the statistics a
    MapReduce/Ray-style counting pipeline can produce exactly.

    The model is trained on the ``train_col == train_value`` subset
    (so scored docs genuinely exercise the backoff chain on unseen
    n-grams) and every doc is scored:

        S(w | u, v) = c3(uvw) / c2(uv)            if c3(uvw) > 0
                      0.4 * S(w | v)              otherwise
        S(w | v)    = c2(vw) / c1(v)              if c2(vw) > 0
                      0.4 * S(w)                  otherwise
        S(w)        = c1(w) / N                   (0 if unseen)

    Fixed-point integers end to end — each ratio is
    ``(scale * num) // den`` and the 0.4 factors are ``(2 * s) // 5``
    — so scores are bit-reproducible at any partition count and an
    exact SQL twin hash-matches (the ``pagerank``/``dsir`` trick).

    Scale shape follows the PAPER's sharding: higher-order n-grams are
    co-sharded with their denominators by shared word prefix —
    c3(u v w) ships to the shard of hash(u + ' ' + v), where c2(u v)
    also lives, so the trigram ratio resolves in ONE co-partition
    round; the backoff bigram attaches in a second round keyed by
    (v, w); and the unigram table is REPLICATED (Brants et al. keep
    unigrams on every shard) — driver-merged and broadcast while its
    vocabulary fits ``broadcast_max_vocab``, with an exact co-partition
    fallback above that.  Two all-to-all rounds over the doc rows
    instead of five, chained in ONE streaming plan (Ray pipelines a
    short all-to-all chain fine; it was the five-round chain that
    re-executed lineage) — nothing corpus-sized is pinned.  Count dicts
    resolve by the ACTUAL gram string inside each partition, so hash
    collisions cannot corrupt a lookup.  Returns
    ``(doc_id, n_trigrams, sb_score)``; docs with < 3 tokens have no
    trigram positions and are absent.
    """
    import pyarrow.compute as pc

    from .dedup import _coarse_group_apply, _hash64

    ds = ds.materialize()

    def only_train(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(batch[train_col], train_value)
        )

    train = ds.map_batches(only_train, batch_format="pyarrow")
    # one tokenize pass + one shuffle for all three orders (the train
    # corpus was previously re-tokenized once per order)
    counts = ngram_counts_multi(train, ns=(1, 2, 3), text_col=text_col)
    c1, c2, c3 = counts[1], counts[2], counts[3]

    # unigram replication (the paper's design): driver-merge while the
    # vocabulary is driver-sized, exact co-partition fallback above
    c1_tbl = pa.concat_tables(
        ray.get(c1.to_arrow_refs()), promote_options="default"
    )
    broadcast_uni = c1_tbl.num_rows <= broadcast_max_vocab
    if broadcast_uni:
        uni = dict(
            zip(
                c1_tbl["gram"].to_pylist(),
                c1_tbl["n_occurrences"].to_pylist(),
            )
        )
        n_total = int(sum(uni.values()))
        uni_ref = ray.put(uni)
    else:  # pragma: no cover - exercised via explicit small threshold
        c1 = ray.data.from_arrow(c1_tbl)
        n_total = int(
            pa.compute.sum(c1_tbl["n_occurrences"]).as_py() or 0
        )

    def doc_tris(batch: pa.Table) -> pa.Table:
        # ONE string column (the full trigram) rides the exchanges;
        # every other gram is a substring derived where needed, so the
        # two all-to-all rounds ship ~60% fewer bytes per row
        ids: list = []
        g3: list = []
        ms: list = []
        for did, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            toks = [w.lower() for w in _WORD_RE.findall(t)]
            c: Counter = Counter(
                zip(toks[:-2], toks[1:-1], toks[2:])
            )
            for (u, v, w), m in c.items():
                ids.append(did)
                g3.append(u + " " + v + " " + w)
                ms.append(m)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "g3": pa.array(g3, pa.string()),
                "m": pa.array(ms, pa.int64()),
            }
        )

    rows = ds.map_batches(doc_tris, batch_format="pyarrow")

    # ---- round 1 (paper sharding): shard by (u, v); c3 ships to the
    # shard of its FIRST TWO words, where its denominator c2(u v)
    # already lives - both attach in one co-partition
    def doc_side1(batch: pa.Table) -> pa.Table:
        g3s = batch["g3"].to_pylist()
        keys = [g.rsplit(" ", 1)[0] for g in g3s]
        return pa.table(
            {
                "__kh": pa.array(
                    [_hash64(k) for k in keys], pa.uint64()
                ),
                id_col: batch[id_col],
                "g3": batch["g3"],
                "m": batch["m"],
                "__c": pa.nulls(len(keys), pa.int64()),
                "__kind": pa.array([0] * len(keys), pa.int8()),
            }
        )

    def count3_side(batch: pa.Table) -> pa.Table:
        grams = batch["gram"].to_pylist()
        n = len(grams)
        prefixes = [g.rsplit(" ", 1)[0] for g in grams]
        return pa.table(
            {
                "__kh": pa.array(
                    [_hash64(k) for k in prefixes], pa.uint64()
                ),
                id_col: pa.nulls(n, pa.int64()),
                "g3": batch["gram"],
                "m": pa.nulls(n, pa.int64()),
                "__c": batch["n_occurrences"]
                .combine_chunks()
                .cast(pa.int64()),
                "__kind": pa.array([3] * n, pa.int8()),
            }
        )

    def count2_side(batch: pa.Table) -> pa.Table:
        grams = batch["gram"].to_pylist()
        n = len(grams)
        return pa.table(
            {
                "__kh": pa.array(
                    [_hash64(k) for k in grams], pa.uint64()
                ),
                id_col: pa.nulls(n, pa.int64()),
                "g3": batch["gram"],
                "m": pa.nulls(n, pa.int64()),
                "__c": batch["n_occurrences"]
                .combine_chunks()
                .cast(pa.int64()),
                "__kind": pa.array([2] * n, pa.int8()),
            }
        )

    def attach1(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        kind = df["__kind"].to_numpy()
        m3 = dict(
            zip(df.loc[kind == 3, "g3"], df.loc[kind == 3, "__c"])
        )
        m2 = dict(
            zip(df.loc[kind == 2, "g3"], df.loc[kind == 2, "__c"])
        )
        h = df.loc[kind == 0]
        g3s = h["g3"].tolist()
        return pa.table(
            {
                id_col: pa.array(h[id_col].tolist(), pa.int64()),
                # the backoff bigram (v w) is g3 minus its first word
                "g2b": pa.array(
                    [g.split(" ", 1)[1] for g in g3s], pa.string()
                ),
                "m": pa.array(h["m"].tolist(), pa.int64()),
                "c3": pa.array(
                    [int(m3.get(g, 0)) for g in g3s], pa.int64()
                ),
                "c2p": pa.array(
                    [
                        int(m2.get(g.rsplit(" ", 1)[0], 0))
                        for g in g3s
                    ],
                    pa.int64(),
                ),
            }
        )

    u1 = (
        rows.map_batches(doc_side1, batch_format="pyarrow")
        .union(c3.map_batches(count3_side, batch_format="pyarrow"))
        .union(c2.map_batches(count2_side, batch_format="pyarrow"))
    )
    # round 1's output is NOT materialized: round 2's exchange
    # consumes it in the same streaming plan (one plan = two chained
    # all-to-alls, which Ray pipelines fine; it was chaining FIVE that
    # re-executed lineage), and skipping the pin halves the shuffle
    # output the driver retains
    rows = _coarse_group_apply(u1, "__kh", attach1, num_parts)

    # ---- round 2: backoff bigram c2(v w) by its own gram key
    S, I = pa.string(), pa.int64()
    carry = [
        (id_col, I), ("g2b", S), ("m", I), ("c3", I), ("c2p", I),
    ]
    rows = _attach_count(rows, c2, "g2b", "c2b", carry, num_parts)
    if not broadcast_uni:  # pragma: no cover - fallback path
        # unigram keys (v, w) derive from the backoff bigram
        def add_uni_keys(batch: pa.Table) -> pa.Table:
            g2bs = batch["g2b"].to_pylist()
            vs, ws = zip(*(g.split(" ", 1) for g in g2bs)) if g2bs else ((), ())
            return batch.append_column(
                "wv", pa.array(list(vs), pa.string())
            ).append_column("ww", pa.array(list(ws), pa.string()))

        rows = rows.map_batches(add_uni_keys, batch_format="pyarrow")
        carry = [c for c in carry if c[0] != "g2b"] + [
            ("c2b", I), ("wv", S), ("ww", S),
        ]
        rows = _attach_count(
            rows, c1, "wv", "c1v", carry, num_parts
        ).materialize()
        carry = [c for c in carry if c[0] != "wv"] + [("c1v", I)]
        rows = _attach_count(
            rows, c1, "ww", "c1w", carry, num_parts
        ).materialize()

    def score_partial(batch: pa.Table) -> pa.Table:
        m = batch["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        c3_ = batch["c3"].to_numpy(zero_copy_only=False).astype(np.int64)
        c2p = batch["c2p"].to_numpy(zero_copy_only=False).astype(np.int64)
        c2b = batch["c2b"].to_numpy(zero_copy_only=False).astype(np.int64)
        if broadcast_uni:
            u = ray.get(uni_ref)
            g2bs = batch["g2b"].to_pylist()
            c1v = np.fromiter(
                (u.get(g.split(" ", 1)[0], 0) for g in g2bs),
                np.int64,
                batch.num_rows,
            )
            c1w = np.fromiter(
                (u.get(g.split(" ", 1)[1], 0) for g in g2bs),
                np.int64,
                batch.num_rows,
            )
        else:  # pragma: no cover - fallback path
            c1v = (
                batch["c1v"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            c1w = (
                batch["c1w"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
        s3 = (scale * c3_) // np.maximum(c2p, 1)
        s2 = (2 * ((scale * c2b) // np.maximum(c1v, 1))) // 5
        s1 = (2 * ((2 * ((scale * c1w) // max(n_total, 1))) // 5)) // 5
        s = np.where(
            c3_ > 0, s3, np.where(c2b > 0, s2, np.where(c1w > 0, s1, 0))
        ).astype(np.int64)
        did = (
            batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        # in-batch pre-sum per doc (integer, order-free)
        uq, inv = np.unique(did, return_inverse=True)
        sb = np.zeros(len(uq), dtype=np.int64)
        nt = np.zeros(len(uq), dtype=np.int64)
        np.add.at(sb, inv, m * s)
        np.add.at(nt, inv, m)
        return pa.table(
            {
                id_col: pa.array(uq, pa.int64()),
                "sb_score": pa.array(sb, pa.int64()),
                "n_trigrams": pa.array(nt, pa.int64()),
            }
        )

    merged = (
        rows.map_batches(score_partial, batch_format="pyarrow")
        .groupby(id_col)
        .sum(["sb_score", "n_trigrams"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.rename_columns([id_col, "sb_score", "n_trigrams"])
        return pa.table(
            {
                id_col: t[id_col].combine_chunks().cast(pa.int64()),
                "n_trigrams": t["n_trigrams"]
                .combine_chunks()
                .cast(pa.int64()),
                "sb_score": t["sb_score"].combine_chunks().cast(pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


_VBYTE_THRESHOLDS = np.array(
    [1 << 7, 1 << 14, 1 << 21, 1 << 28], dtype=np.int64
)


def _vbyte_encode(gaps: np.ndarray) -> bytes:
    """Actual variable-byte encoding (7 data bits per byte, high bit
    marks the LAST byte of each value — the classic inverted-index
    layout, e.g. Scholer et al. SIGIR'02)."""
    out = bytearray()
    for v in gaps.tolist():
        while True:
            b = v & 0x7F
            v >>= 7
            if v == 0:
                out.append(b | 0x80)
                break
            out.append(b)
    return bytes(out)


def _vbyte_decode(buf: bytes) -> np.ndarray:
    vals = []
    cur = 0
    shift = 0
    for b in buf:
        if b & 0x80:
            vals.append(cur | ((b & 0x7F) << shift))
            cur = 0
            shift = 0
        else:
            cur |= b << shift
            shift += 7
    return np.array(vals, dtype=np.int64)


def postings_vbyte(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Variable-byte posting-list compression stats — the standard
    index-size lever of a web-scale inverted index (d-gap the sorted
    doc ids, then 7-bits-per-byte varints; Scholer et al. SIGIR'02,
    Manning et al. IIR ch.5).  Per token this returns
    ``(token, n_docs, raw_bytes, vbyte_bytes)`` where ``raw_bytes``
    is the uncompressed 8-byte-per-id cost — the ratio is what an
    index-tiering policy budgets storage by.

    Shape: the shuffle carries per-doc DISTINCT (token, doc_id)
    pairs co-partitioned by a stable token hash (the
    ``inverted_index`` exchange); each partition d-gaps its sorted
    posting lists VECTORIZED and — the honesty check — actually
    round-trips every list through the real encoder
    (encode → decode → exact id equality) before reporting sizes, so
    the size table cannot drift from a working codec.  Byte counts
    are computed with a vectorized ``searchsorted`` over the varint
    thresholds; the encode/decode pass is the per-list Python loop a
    real codec would do in C, bounded per partition by its token
    slice, never corpus-global.
    """
    import zlib

    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_tok, out_id = [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            for tok in _doc_tokens(t):
                out_tok.append(tok)
                out_id.append(ids[i])
        return pa.table(
            {
                "token": pa.array(out_tok, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "_part": pa.array(
                    [
                        zlib.crc32(tok.encode("utf-8")) % num_parts
                        for tok in out_tok
                    ],
                    pa.int64(),
                ),
            }
        )

    def compress(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = (
            tbl.select(["token", "doc_id"])
            .to_pandas()
            .sort_values(["token", "doc_id"], kind="mergesort")
        )
        toks = df["token"].to_numpy()
        ids = df["doc_id"].to_numpy(np.int64)
        new = np.ones(len(df), dtype=bool)
        new[1:] = toks[1:] != toks[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(df))
        # gaps: first element is the doc id itself, then deltas
        gaps = ids.copy()
        gaps[1:] -= ids[:-1]
        gaps[starts] = ids[starts]
        nbytes = (
            np.searchsorted(
                _VBYTE_THRESHOLDS, gaps, side="right"
            )
            + 1
        )
        out_tok, out_n, out_raw, out_vb = [], [], [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            g = gaps[s:e]
            buf = _vbyte_encode(g)
            dec = _vbyte_decode(buf)
            assert len(buf) == int(nbytes[s:e].sum())
            assert (np.cumsum(dec) == ids[s:e]).all(), toks[s]
            out_tok.append(toks[s])
            out_n.append(e - s)
            out_raw.append(8 * (e - s))
            out_vb.append(len(buf))
        return pa.table(
            {
                "token": pa.array(out_tok, pa.string()),
                "n_docs": pa.array(out_n, pa.int64()),
                "raw_bytes": pa.array(out_raw, pa.int64()),
                "vbyte_bytes": pa.array(out_vb, pa.int64()),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: compress(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def bm25_topk_maxscore(
    ds: "ray.data.Dataset",
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    topk: int = 10,
) -> pa.Table:
    """BM25 top-k with MaxScore pruning (Turtle & Flood 1995), batch
    form — EXACTLY the ``bm25_topk`` result (same fixed-point scores,
    same (score DESC, id ASC) tie-break; the SQL oracle is shared),
    but most documents are never scored:

    1. per-term score UPPER BOUNDS: the BM25 term score is strictly
       below ``idf_j * (k1 + 1)`` for any tf/dl, so
       ``UB_j = round_e4(idf_j * 2.2)`` dominates every realized
       1e-4-fixed-point term score;
    2. phase 1 scores only the docs containing the single highest-UB
       term and takes the k-th best as the threshold theta — a valid
       lower bound on the final k-th score;
    3. phase 2 computes each remaining doc's bound
       ``sum of UB_j over its matched terms`` vectorized and SKIPS
       every doc with bound < theta — by construction such a doc
       cannot enter the top-k (ties at theta are kept: an equal score
       can still win on the id tie-break);
    4. survivors are scored exactly and merged with phase 1.

    Pruning is a pure optimization: correctness never depends on how
    good theta is.  Scale shape matches ``bm25_topk`` (query
    broadcast, corpus never shuffles, block-local partial top-k);
    the skip test is two vectorized comparisons per block.
    """
    from collections import Counter as _Counter

    m = len(query_terms)
    q_index = {t: j for j, t in enumerate(query_terms)}

    def compact(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        n = len(ids)
        dl = np.zeros(n, np.int64)
        tf = np.zeros((n, m), np.int64)
        for i, t in enumerate(texts):
            toks = _WORD_RE.findall(t)
            dl[i] = len(toks)
            c = _Counter(w.lower() for w in toks)
            for term, j in q_index.items():
                tf[i, j] = c.get(term, 0)
        cols = {
            id_col: pa.array(np.asarray(ids, np.int64), pa.int64()),
            "dl": pa.array(dl, pa.int64()),
        }
        for j in range(m):
            cols[f"tf_{j}"] = pa.array(tf[:, j], pa.int64())
            cols[f"nz_{j}"] = pa.array(
                (tf[:, j] > 0).astype(np.int64), pa.int64()
            )
        return pa.table(cols)

    stats_ds = ds.map_batches(compact, batch_format="pyarrow").materialize()
    n_docs = stats_ds.count()
    sums = stats_ds.sum(["dl"] + [f"nz_{j}" for j in range(m)])
    avgdl = float(sums["sum(dl)"]) / float(n_docs)
    df = np.array(
        [int(sums[f"sum(nz_{j})"]) for j in range(m)], np.int64
    )
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    # e4 upper bound per term: tf*2.2/(tf+den) < 2.2 for any tf, den>0
    ub = np.floor(idf * 2.2 * 10000.0 + 0.5).astype(np.int64)
    j_top = int(np.argmax(ub))

    def exact_scores(batch: pa.Table, mask: np.ndarray):
        """(ids, scores) of masked rows, exact bm25_topk arithmetic."""
        dl = batch["dl"].to_numpy(zero_copy_only=False)[mask]
        total = np.zeros(int(mask.sum()), np.int64)
        den_base = 1.2 * (0.25 + 0.75 * dl / avgdl)
        for j in range(m):
            tf_j = batch[f"tf_{j}"].to_numpy(zero_copy_only=False)[mask]
            s = idf[j] * (tf_j * 2.2) / (tf_j + den_base) * 10000.0
            e4 = np.floor(s + 0.5).astype(np.int64)
            total += np.where(tf_j > 0, e4, 0)
        ids = batch[id_col].to_numpy(zero_copy_only=False)[mask]
        keep = total > 0
        return ids[keep], total[keep]

    def topk_table(ids, sc, k):
        order = np.lexsort((ids, -sc))[:k]
        return ids[order], sc[order]

    # ---- phase 1: exact scores of docs matching the top-UB term
    def phase1(batch: pa.Table) -> pa.Table:
        mask = (
            batch[f"tf_{j_top}"].to_numpy(zero_copy_only=False) > 0
        )
        ids, sc = exact_scores(batch, mask)
        if len(ids) > topk:
            ids, sc = topk_table(ids, sc, topk)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "score_e4": pa.array(sc, pa.int64()),
            }
        )

    p1 = pa.concat_tables(
        ray.get(
            stats_ds.map_batches(phase1, batch_format="pyarrow")
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    ids1 = p1[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    sc1 = p1["score_e4"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids1, sc1 = topk_table(ids1, sc1, topk)
    theta = int(sc1[topk - 1]) if len(sc1) >= topk else 0

    # ---- phase 2: bound-skip everything else
    def phase2(batch: pa.Table, _theta=theta) -> pa.Table:
        nz = np.stack(
            [
                batch[f"tf_{j}"].to_numpy(zero_copy_only=False) > 0
                for j in range(m)
            ],
            axis=1,
        )
        bound = nz @ ub
        # docs already scored in phase 1 are excluded; a bound BELOW
        # theta cannot reach the top-k (equal bounds stay: an equal
        # final score can still win the id tie-break)
        mask = (~nz[:, j_top]) & (bound >= _theta) & (bound > 0)
        ids, sc = exact_scores(batch, mask)
        if len(ids) > topk:
            ids, sc = topk_table(ids, sc, topk)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "score_e4": pa.array(sc, pa.int64()),
            }
        )

    p2 = pa.concat_tables(
        ray.get(
            stats_ds.map_batches(phase2, batch_format="pyarrow")
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    ids2 = p2[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    sc2 = p2["score_e4"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = np.concatenate([ids1, ids2])
    sc = np.concatenate([sc1, sc2])
    ids, sc = topk_table(ids, sc, topk)
    return pa.table(
        {
            "rank": pa.array(
                np.arange(1, len(ids) + 1, dtype=np.int64), pa.int64()
            ),
            id_col: pa.array(ids, pa.int64()),
            "score_e4": pa.array(sc, pa.int64()),
        }
    )


_POW2 = (np.int64(1) << np.arange(63, dtype=np.int64)).astype(np.int64)


def _gamma_encode(gaps: np.ndarray) -> tuple:
    """Elias gamma (Elias 1975) over d-gaps: each value encodes as
    x = gap + 1 -> floor(log2 x) zero bits, then x's binary digits.
    Returns (packed bytes, total bit count)."""
    bits = []
    for v in gaps.tolist():
        x = v + 1
        n = x.bit_length() - 1
        bits.extend([0] * n)
        for i in range(n, -1, -1):
            bits.append((x >> i) & 1)
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            out[i >> 3] |= 0x80 >> (i & 7)
    return bytes(out), len(bits)


def _gamma_decode(buf: bytes, count: int) -> np.ndarray:
    vals = []
    pos = 0
    total = len(buf) * 8

    def bit(i):
        return (buf[i >> 3] >> (7 - (i & 7))) & 1

    while len(vals) < count and pos < total:
        n = 0
        while bit(pos) == 0:
            n += 1
            pos += 1
        x = 0
        for _ in range(n + 1):
            x = (x << 1) | bit(pos)
            pos += 1
        vals.append(x - 1)
    return np.array(vals, dtype=np.int64)


def postings_gamma(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Elias-gamma posting-list compression stats — the bit-level
    sibling of ``postings_vbyte`` (Elias 1975; Witten/Moffat/Bell,
    Managing Gigabytes): d-gap the sorted doc ids, encode ``gap + 1``
    as unary-length-prefixed binary.  Gamma beats vbyte on small gaps
    (frequent tokens) at the cost of bit addressing.  Returns
    ``(token, n_docs, gamma_bits, gamma_bytes)``; same exchange shape
    as ``postings_vbyte`` and the same honesty bar — every list
    round-trips through the real bit-packing codec before its size is
    reported.  Bit counts are vectorized
    (``2 * floor(log2(gap + 1)) + 1`` via an exact power-of-two
    ``searchsorted``)."""
    import zlib

    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_tok, out_id = [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            for tok in _doc_tokens(t):
                out_tok.append(tok)
                out_id.append(ids[i])
        return pa.table(
            {
                "token": pa.array(out_tok, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "_part": pa.array(
                    [
                        zlib.crc32(tok.encode("utf-8")) % num_parts
                        for tok in out_tok
                    ],
                    pa.int64(),
                ),
            }
        )

    def compress(tbl: pa.Table) -> pa.Table:
        df = (
            tbl.select(["token", "doc_id"])
            .to_pandas()
            .sort_values(["token", "doc_id"], kind="mergesort")
        )
        toks = df["token"].to_numpy()
        ids = df["doc_id"].to_numpy(np.int64)
        new = np.ones(len(df), dtype=bool)
        new[1:] = toks[1:] != toks[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(df))
        gaps = ids.copy()
        gaps[1:] -= ids[:-1]
        gaps[starts] = ids[starts]
        # bits = 2*floor(log2(gap+1)) + 1, exact integer log2
        lg = np.searchsorted(_POW2, gaps + 1, side="right") - 1
        nbits = 2 * lg + 1
        out_tok, out_n, out_bits, out_bytes = [], [], [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            g = gaps[s:e]
            buf, total_bits = _gamma_encode(g)
            dec = _gamma_decode(buf, e - s)
            assert total_bits == int(nbits[s:e].sum())
            assert (np.cumsum(dec) == ids[s:e]).all(), toks[s]
            out_tok.append(toks[s])
            out_n.append(e - s)
            out_bits.append(total_bits)
            out_bytes.append(len(buf))
        return pa.table(
            {
                "token": pa.array(out_tok, pa.string()),
                "n_docs": pa.array(out_n, pa.int64()),
                "gamma_bits": pa.array(out_bits, pa.int64()),
                "gamma_bytes": pa.array(out_bytes, pa.int64()),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: compress(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def dict_front_code(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    block: int = 4,
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Front-coded term dictionary stats (Witten/Moffat/Bell, Managing
    Gigabytes ch.4) — the vocabulary-side companion of the posting
    codecs: sorted terms share prefixes, so blocks of ``block`` terms
    store the first term whole and every other as
    ``(lcp_byte, suffix)``.  Restart points align to the term's
    first-character bucket (exactly a real dictionary's block
    restarts), which makes the layout embarrassingly parallel: ONE
    co-partition exchange of per-batch-distinct tokens keyed by
    bucket, then each bucket sorts, blocks, front-codes and — the
    honesty bar — RECONSTRUCTS every term from its (lcp, suffix)
    chain before sizes are reported.  Returns
    ``(bucket, block_id, n_terms, raw_bytes, fc_bytes)``."""
    import zlib

    def toks(batch: pa.Table) -> pa.Table:
        seen = set()
        for t in batch[text_col].to_pylist():
            seen.update(_doc_tokens(t))
        out = sorted(seen)
        return pa.table(
            {
                "token": pa.array(out, pa.string()),
                "_part": pa.array(
                    [
                        zlib.crc32(t[:1].encode("utf-8")) % num_parts
                        for t in out
                    ],
                    pa.int64(),
                ),
            }
        )

    def encode(tbl: pa.Table) -> pa.Table:
        terms = sorted(set(tbl["token"].to_pylist()))
        out = {
            "bucket": [], "block_id": [], "n_terms": [],
            "raw_bytes": [], "fc_bytes": [],
        }
        # group contiguous same-first-char runs (buckets)
        i = 0
        while i < len(terms):
            b = terms[i][:1]
            j = i
            while j < len(terms) and terms[j][:1] == b:
                j += 1
            bucket_terms = terms[i:j]
            for s in range(0, len(bucket_terms), block):
                blk = bucket_terms[s : s + block]
                raw = sum(len(t) for t in blk)
                fc = len(blk[0])
                rebuilt = [blk[0]]
                prev = blk[0]
                for t in blk[1:]:
                    lcp = 0
                    for a, c in zip(prev, t):
                        if a != c:
                            break
                        lcp += 1
                    suffix = t[lcp:]
                    fc += 1 + len(suffix)
                    # decode strictly from stored (lcp, suffix) + the
                    # previously DECODED term
                    rebuilt.append(rebuilt[-1][:lcp] + suffix)
                    prev = t
                assert rebuilt == blk, blk  # codec round-trip
                out["bucket"].append(b)
                out["block_id"].append(s // block)
                out["n_terms"].append(len(blk))
                out["raw_bytes"].append(raw)
                out["fc_bytes"].append(fc)
            i = j
        return pa.table(
            {
                "bucket": pa.array(out["bucket"], pa.string()),
                "block_id": pa.array(out["block_id"], pa.int64()),
                "n_terms": pa.array(out["n_terms"], pa.int64()),
                "raw_bytes": pa.array(out["raw_bytes"], pa.int64()),
                "fc_bytes": pa.array(out["fc_bytes"], pa.int64()),
            }
        )

    return (
        ds.map_batches(toks, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: encode(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )
