"""Distributed integer perceptron: the quality-classifier training
shape every large-scale web-text pipeline runs between cleaning and
selection (fastText-style quality filters in CCNet/LLaMA-class
pipelines; the reference engine, a per-site announcement scraper, has
no learned filtering at all — this is a beyond-reference operator).

Full-batch perceptron (Rosenblatt's rule in the batched/distributed
form of McDonald et al., NAACL 2010 "Distributed Training Strategies
for the Structured Perceptron"):

    w_{k+1} = w_k + sum over misclassified docs of y_i * x_i
    b_{k+1} = b_k + sum over misclassified docs of y_i
    (misclassified: y_i * (w_k . x_i + b_k) <= 0)

Everything is int64 — features are hashed token counts, labels are
+/-1, updates are exact integer sums — so training is bit-reproducible
at ANY partition count and a SQL twin can hash-match the learned
weights exactly (the fixed-point trick of ``stages/dsir.py``, without
even needing fixed-point: the perceptron is already integer-native,
which is precisely why it is the classifier a distributed
exact-correctness pipeline trains; SGD variants are order-dependent by
construction).

Scale shape per iteration (corpus never shuffles, nothing
corpus-sized ever reaches the driver):

1. the (w, b) vector (n_buckets + 1 int64s) broadcasts via ``ray.put``;
2. each batch builds its doc x bucket count matrix (md5 bucket hashing
   memoized per worker process via ``dsir._doc_buckets``), computes
   activations with one matmul, and folds its misclassified docs into
   ONE (n_buckets + 1)-row gradient partial;
3. partials merge on the driver (``driver_merge_sum`` — the gradient
   is bucket-bounded and becomes the next broadcast anyway).

Token -> bucket hashing is the repo-wide md5 convention
(``dsir._bucket_of``), byte-identical in DuckDB:
``CAST(('0x' || substr(md5(tok),1,8)) AS BIGINT) % n_buckets``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .dedup import driver_merge_sum
from .dsir import _doc_buckets


def _doc_matrix(texts: list[str], n_buckets: int) -> np.ndarray:
    """Doc x bucket int64 count matrix for one batch."""
    X = np.zeros((len(texts), n_buckets), dtype=np.int64)
    for i, bkts in enumerate(_doc_buckets(texts, n_buckets)):
        np.add.at(X[i], bkts, 1)
    return X


def perceptron_train(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    label_col: str = "y",
    n_buckets: int = 64,
    iters: int = 3,
) -> pd.DataFrame:
    """Learn (w, b) over hashed token-count features; labels are +/-1.

    Returns the weight table as a DataFrame with one row per bucket
    plus the bias at ``bkt = -1`` — driver-sized by construction
    (n_buckets + 1 rows), like ``bpe_train``'s merge list.
    """
    docs = docs.materialize()  # consumed once per iteration
    w = np.zeros(n_buckets, dtype=np.int64)
    b = np.int64(0)
    for _ in range(iters):
        ref = ray.put((w.copy(), int(b)))

        def grad_partial(batch: pa.Table, _ref=ref) -> pa.Table:
            w_, b_ = ray.get(_ref)
            texts = batch[text_col].to_pylist()
            ys = (
                batch[label_col]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            X = _doc_matrix(texts, n_buckets)
            act = X @ w_ + b_
            mis = (ys * act) <= 0
            g = np.zeros(n_buckets + 1, dtype=np.int64)
            if mis.any():
                g[:n_buckets] = (ys[mis, None] * X[mis]).sum(axis=0)
                g[n_buckets] = ys[mis].sum()
            return pa.table(
                {
                    "bkt": pa.array(
                        np.concatenate(
                            [np.arange(n_buckets), [-1]]
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                    "g": pa.array(
                        np.concatenate([g[:n_buckets], g[-1:]]),
                        pa.int64(),
                    ),
                }
            )

        merged = driver_merge_sum(
            docs.map_batches(grad_partial, batch_format="pyarrow"),
            ["bkt"],
            ["g"],
        )
        if len(merged):
            gm = dict(zip(merged["bkt"], merged["g"]))
            for k in range(n_buckets):
                w[k] += int(gm.get(k, 0))
            b += np.int64(gm.get(-1, 0))
    out = pd.DataFrame(
        {
            "bkt": np.concatenate([[-1], np.arange(n_buckets)]).astype(
                np.int64
            ),
            "w": np.concatenate([[int(b)], w]).astype(np.int64),
        }
    )
    return out.reset_index(drop=True)


def perceptron_scores(
    docs: "ray.data.Dataset",
    weights: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Apply a learned (w, b) to a corpus: one broadcast + one matmul
    per batch.  Returns ``(id_col, act, pred)`` — the activation and
    the +/-1 decision — fully streaming."""
    wt = weights.set_index("bkt")["w"]
    w = wt.reindex(range(n_buckets), fill_value=0).to_numpy(np.int64)
    b = int(wt.get(-1, 0))
    ref = ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        w_ = ray.get(ref)
        X = _doc_matrix(batch[text_col].to_pylist(), n_buckets)
        act = X @ w_ + b
        pred = np.where(act > 0, 1, -1).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "act": pa.array(act.astype(np.int64), pa.int64()),
                "pred": pa.array(pred, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")
