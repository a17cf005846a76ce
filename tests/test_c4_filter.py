"""C4 cleaning rules (Raffel et al. 2020 §2.2): line keep predicate,
page bans, kept-line threshold, spacing-exact word counts."""

import pyarrow as pa

import ray
from cex_crawler_ray.stages.c4_filter import c4_clean, clean_page

GOOD = "this line has plenty of words in it."
GOOD2 = "a second line that also clearly qualifies fine."
GOOD3 = "the third keeper line rounds out the page."


def test_line_predicates():
    page = "\n".join(
        [
            GOOD,
            "too short line.",  # 3 words
            "no terminal punctuation in this line at all",
            "enable JavaScript to continue reading this page.",  # banned word
            GOOD2,
            GOOD3,
        ]
    )
    kept, clean, nk, ni = clean_page(page)
    assert kept and nk == 3 and ni == 6
    assert clean == "\n".join([GOOD, GOOD2, GOOD3])


def test_terminal_punctuation_variants():
    for p in (".", "!", "?", '"'):
        line = "five words are here now" + p
        kept, clean, nk, _ = clean_page("\n".join([line, GOOD, GOOD2]))
        assert nk == 3, p
    # semicolon is not terminal: the line drops, 3 keepers remain
    kept, clean, nk, _ = clean_page(
        "\n".join(["five words are here now;", GOOD, GOOD2, GOOD3])
    )
    assert kept and nk == 3 and "now;" not in clean


def test_page_bans_override():
    base = [GOOD, GOOD2, GOOD3]
    kept, clean, nk, _ = clean_page(
        "\n".join(base + ["var x = { a: 1 };"])
    )
    assert not kept and clean == "" and nk == 0
    kept, _, _, _ = clean_page(
        "\n".join(base + ["Lorem Ipsum dolor sit amet."])
    )
    assert not kept


def test_min_kept_lines_threshold():
    kept, _, _, _ = clean_page("\n".join([GOOD, GOOD2]))
    assert not kept  # only 2 kept lines
    kept, _, _, _ = clean_page(
        "\n".join([GOOD, GOOD2]), min_kept_lines=2
    )
    assert kept


def test_word_count_includes_empty_tokens():
    # double space -> split(' ') yields an empty token, matching the
    # SQL twin's string_split semantics: 'a b  c d.' counts 5
    kept, _, nk, _ = clean_page("\n".join(["a b  c d.", GOOD, GOOD2]))
    assert nk == 3


def test_dataset_wrapper(ray_session):
    tbl = pa.table(
        {
            "text": pa.array(
                ["\n".join([GOOD, GOOD2, GOOD3]), "junk"], pa.string()
            )
        }
    )
    out = c4_clean(ray.data.from_arrow(tbl)).to_pandas()
    assert list(out["c4_kept"]) == [True, False]
    assert list(out["c4_lines_in"]) == [3, 1]
