"""DUST — Different URLs with Similar Text (Bar-Yossef, Keidar &
Schonfeld, WWW'07 "Do Not Crawl in the DUST").

A crawler that fetches ``?sessionid=...`` / ``?ref=...`` variants of
the same page wastes fetch budget and pollutes the seen set.  DUST
mines URL-rewrite rules from evidence the crawl already produced —
(url, payload-digest) pairs — and applies them as frontier
normalization, the same slot ``redirect_resolve`` and
``canonicalize`` occupy (reference parity: the reference engine
hardcodes per-exchange URL templates, e.g. its announcement listing
URLs in `exchange/*.py`; rule MINING is the scale-native replacement
for that hand-curation).

This module implements the parameter-irrelevance subset of DUST:

* ``mine_param_rules(captures)`` — for every query parameter ``p`` of
  every captured url, form the candidate url with ``p`` removed; ONE
  url-hash co-partition joins candidates against the capture set; a
  (host, param) rule is emitted iff every matched pair has EQUAL
  digests (zero violations) with support >= ``min_support``.  The
  exchange carries only (url, host, param, digest) rows — never page
  bytes — so mining cost is O(captures x params-per-url), independent
  of payload size.
* ``apply_rules(ds, rules)`` — broadcast the (host -> ruled params)
  map via ``ray.put`` and strip ruled params per batch: pure string
  kernel, zero shuffle.

Rules are per-HOST: a param can be tracking noise on one site and
load-bearing on another (the WWW'07 paper's central observation), so
evidence never crosses hosts.
"""

from __future__ import annotations

import pyarrow as pa

import ray
from cex_crawler_ray.stages.dedup import _coarse_group_apply, _hash64


def _host_of(url: str) -> str:
    rest = url.split("://", 1)[-1]
    return rest.split("/", 1)[0].split(":", 1)[0].lower()


def _split_query(url: str):
    """Split into (base, params, fragment).  The fragment (with its
    leading ``#``) is partitioned off FIRST so it never rides inside
    the last param's value — stripping a param must not delete the
    fragment or desync mined evidence keys from their targets."""
    head, fsep, frag = url.partition("#")
    frag = fsep + frag if fsep else ""
    base, sep, query = head.partition("?")
    if not sep or not query:
        return base, [], frag
    return base, query.split("&"), frag


def _join_query(base: str, params: list, frag: str) -> str:
    return (base + "?" + "&".join(params) if params else base) + frag


def strip_param(url: str, name: str) -> str:
    """Remove every ``name=...`` pair from the url's query string,
    preserving the order of the remaining params and any ``#fragment``
    (mirrors the SQL twin's two-step regexp strip)."""
    base, params, frag = _split_query(url)
    kept = [p for p in params if p.partition("=")[0] != name]
    return _join_query(base, kept, frag)


def mine_param_rules(
    captures,
    url_col: str = "url",
    digest_col: str = "payload_digest",
    min_support: int = 2,
    num_parts: int = 64,
):
    """Mine per-(host, param) irrelevance rules from (url, digest)
    capture evidence.  Returns a Dataset of (host, param, support)
    rows — only rules with ZERO digest violations survive; a candidate
    whose stripped url was never captured contributes nothing (its
    content is unknown, per the paper's support definition)."""

    def expand(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].to_pylist()
        digs = batch[digest_col].to_pylist()
        host_l, param_l, tgt_l, dig_l = [], [], [], []
        for u, d in zip(urls, digs):
            h = _host_of(u)
            _, params, _ = _split_query(u)
            seen = set()
            for p in params:
                name = p.partition("=")[0]
                if not name or name in seen:
                    continue  # repeated param: one candidate per name
                seen.add(name)
                host_l.append(h)
                param_l.append(name)
                tgt_l.append(strip_param(u, name))
                dig_l.append(d)
        return pa.table(
            {
                "key": pa.array(tgt_l, pa.string()),
                "host": pa.array(host_l, pa.string()),
                "param": pa.array(param_l, pa.string()),
                "src_digest": pa.array(dig_l, pa.string()),
                "tgt_digest": pa.nulls(len(tgt_l), type=pa.string()),
                "side": pa.array([0] * len(tgt_l), pa.int64()),
            }
        )

    def targets(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch[url_col],
                "host": pa.nulls(n, type=pa.string()),
                "param": pa.nulls(n, type=pa.string()),
                "src_digest": pa.nulls(n, type=pa.string()),
                "tgt_digest": batch[digest_col],
                "side": pa.array([1] * n, pa.int64()),
            }
        )

    cand = captures.map_batches(expand, batch_format="pyarrow")
    tgt = captures.map_batches(targets, batch_format="pyarrow")

    def add_kh(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_kh",
            pa.array(
                [_hash64(k) for k in batch["key"].to_pylist()],
                pa.uint64(),
            ),
        )

    both = cand.union(tgt).map_batches(add_kh, batch_format="pyarrow")

    def count_pairs(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        c = df[df["side"] == 0][["key", "host", "param", "src_digest"]]
        t = df[df["side"] == 1][["key", "tgt_digest"]].drop_duplicates()
        m = c.merge(t, on="key", how="inner")
        if len(m) == 0:
            return pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "param": pa.array([], pa.string()),
                    "n_same": pa.array([], pa.int64()),
                    "n_diff": pa.array([], pa.int64()),
                }
            )
        m["same"] = (m["src_digest"] == m["tgt_digest"]).astype("int64")
        g = m.groupby(["host", "param"], as_index=False).agg(
            n_same=("same", "sum"), n=("same", "size")
        )
        g["n_diff"] = g["n"] - g["n_same"]
        return pa.Table.from_pandas(
            g[["host", "param", "n_same", "n_diff"]],
            preserve_index=False,
        )

    partials = _coarse_group_apply(
        both, "_kh", count_pairs, num_parts=num_parts
    )
    finals = (
        partials.groupby(["host", "param"])
        .sum(["n_same", "n_diff"])
        .filter(
            lambda r: r["sum(n_diff)"] == 0
            and r["sum(n_same)"] >= min_support
        )
    )

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": batch["host"],
                "param": batch["param"],
                "support": batch["sum(n_same)"].cast(pa.int64()),
            }
        )

    return finals.map_batches(shape, batch_format="pyarrow")


def apply_rules(ds, rules, url_col: str = "url"):
    """Canonicalize urls by the mined rules: strip every ruled param
    for the url's host.  ``rules`` is the ``mine_param_rules`` output
    (Dataset or pandas).  The rule map broadcasts once via ``ray.put``;
    the strip is a per-batch string kernel with zero shuffle."""
    if isinstance(rules, ray.data.Dataset):
        rules = rules.to_pandas()
    rmap: dict[str, frozenset] = {
        h: frozenset(g["param"])
        for h, g in rules.groupby("host")
    }
    rmap_ref = ray.put(rmap)

    def canon(batch: pa.Table) -> pa.Table:
        m = ray.get(rmap_ref)
        urls = batch[url_col].to_pylist()
        out = []
        for u in urls:
            ruled = m.get(_host_of(u))
            if not ruled:
                out.append(u)
                continue
            base, params, frag = _split_query(u)
            kept = [
                p for p in params
                if p.partition("=")[0] not in ruled
            ]
            out.append(_join_query(base, kept, frag))
        idx = batch.column_names.index(url_col)
        return batch.set_column(
            idx, url_col, pa.array(out, pa.string())
        )

    return ds.map_batches(canon, batch_format="pyarrow")
