"""End-to-end corpus curation v2: the composition a 100-TB
training-data run actually executes, every stage streaming.

    strip boilerplate -> redact PII -> repetition filter ->
    eval-set decontamination

Each stage is the already-tested operator; the composition itself is
oracle-gated (``q_curation_v2``) because stage INTERACTIONS are where
pipelines break (e.g. redaction placeholders becoming tokens that
shift repetition fractions — both engines must agree on the composed
semantics, not just per-stage).

Scale notes: the only non-streaming structures are the boilerplate
set and the eval n-gram set, both broadcast once (small by
construction); documents themselves never shuffle in any stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from cex_crawler_ray.stages.boilerplate import (
    boilerplate_paragraphs,
    strip_boilerplate,
)
from cex_crawler_ray.stages.decontam import decontaminate
from cex_crawler_ray.stages.textstats import redact_pii, repetition_stats


def curate(
    ds: "ray.data.Dataset",
    eval_ds: "ray.data.Dataset",
    min_docs: int = 3,
    ngram_n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Returns the surviving documents with redacted text and PII
    counts: (doc_id, text, n_emails, n_phones)."""
    boiler = boilerplate_paragraphs(ds, min_docs=min_docs, text_col=text_col)
    stripped = strip_boilerplate(
        ds, boiler, text_col=text_col, id_col=id_col
    )
    red = stripped.map_batches(redact_pii, batch_format="pyarrow")

    def rep_filter(batch: pa.Table) -> pa.Table:
        stats = repetition_stats(
            batch.select([id_col, text_col]), text_col=text_col
        )
        keep_ids = stats.filter(stats["rep_keep"])[id_col].to_numpy(
            zero_copy_only=False
        )
        mask = np.isin(
            batch[id_col].to_numpy(zero_copy_only=False), keep_ids
        )
        return batch.filter(pa.array(mask))

    repd = red.map_batches(rep_filter, batch_format="pyarrow")
    return decontaminate(
        repd, eval_ds, n=ngram_n, text_col=text_col, id_col=id_col
    )
