"""C4-style page cleaning (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning…", §2.2 — the filter stack behind the C4 corpus,
still the backbone of most webtext curation recipes).

Rules implemented (the deterministic, SQL-twinnable core):

* LINE keep: ends in terminal punctuation (``. ! ? "``), has at least
  ``min_words`` whitespace-split tokens, and does not mention
  ``javascript`` (case-insensitive).
* PAGE drop: any line containing a ``PAGE_BANS`` token (``{`` for
  leaked code, the phrase ``lorem ipsum``) bans the whole page.
* PAGE keep: at least ``min_kept_lines`` surviving lines.

Thresholds are C4-STYLE, not the paper's exact values: Raffel et al.
keep lines with >=3 words and pages with >=5 sentences; the defaults
here (``MIN_WORDS=5``, ``MIN_KEPT_LINES=3``) are this engine's
conformance constants — pass ``min_words=3, min_kept_lines=5`` for
paper-faithful filtering.

The kernel is a per-batch pure function over the text column — one
pass per line, zero shuffle; the corpus never moves.  Word counting
uses ``split(' ')`` INCLUDING empty tokens so the SQL twin
(``len(string_split(l, ' '))``) is exactly equal on any spacing.
"""

from __future__ import annotations

import pyarrow as pa

TERMINAL = (".", "!", "?", '"')
MIN_WORDS = 5
MIN_KEPT_LINES = 3
LINE_BAN = "javascript"
PAGE_BANS = ("{", "lorem ipsum")


def clean_page(
    text: str,
    min_words: int = MIN_WORDS,
    min_kept_lines: int = MIN_KEPT_LINES,
):
    """Apply the C4 rules to one page.  Returns (kept: bool,
    clean_text: str, n_lines_kept: int, n_lines_in: int)."""
    lines = text.split("\n")
    kept_lines = []
    banned = False
    for l in lines:
        low = l.lower()
        # PAGE_BANS tokens are matched case-insensitively; caseless
        # tokens like "{" are unaffected by the lowering.
        if any(b in low for b in PAGE_BANS):
            banned = True
        if (
            l.endswith(TERMINAL)
            and len(l.split(" ")) >= min_words
            and LINE_BAN not in low
        ):
            kept_lines.append(l)
    kept = (not banned) and len(kept_lines) >= min_kept_lines
    return (
        kept,
        "\n".join(kept_lines) if kept else "",
        len(kept_lines) if kept else 0,
        len(lines),
    )


def c4_clean(
    pages,
    text_col: str = "text",
    min_words: int = MIN_WORDS,
    min_kept_lines: int = MIN_KEPT_LINES,
):
    """Dataset wrapper: append (c4_kept: bool, c4_text: string,
    c4_lines_kept: int64, c4_lines_in: int64)."""

    def kernel(batch: pa.Table) -> pa.Table:
        keeps, cleans, nk, ni = [], [], [], []
        for t in batch[text_col].to_pylist():
            k, c, a, b = clean_page(
                t or "", min_words=min_words,
                min_kept_lines=min_kept_lines,
            )
            keeps.append(k)
            cleans.append(c)
            nk.append(a)
            ni.append(b)
        return (
            batch.append_column("c4_kept", pa.array(keeps, pa.bool_()))
            .append_column("c4_text", pa.array(cleans, pa.string()))
            .append_column(
                "c4_lines_kept", pa.array(nk, pa.int64())
            )
            .append_column("c4_lines_in", pa.array(ni, pa.int64()))
        )

    return pages.map_batches(kernel, batch_format="pyarrow")
