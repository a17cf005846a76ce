"""Boilerplate-paragraph detection and stripping."""

import pyarrow as pa

import ray


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in rows], pa.int64()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        )
    )


FOOTER = "(c) Example Corp."


def test_boilerplate_df_counts_distinct_docs(ray_session):
    from cex_crawler_ray.stages.boilerplate import paragraph_df

    # footer twice in doc 1 must count once for that doc
    ds = _docs(
        [
            (1, f"{FOOTER}\nalpha\n{FOOTER}"),
            (2, f"beta\n  {FOOTER}  "),
            (3, f"gamma\n{FOOTER}"),
        ]
    )
    out = paragraph_df(ds).to_pandas().set_index("paragraph")["df"].to_dict()
    assert out[FOOTER] == 3
    assert out["alpha"] == 1


def test_boilerplate_threshold(ray_session):
    from cex_crawler_ray.stages.boilerplate import boilerplate_paragraphs

    ds = _docs(
        [(1, f"a\n{FOOTER}"), (2, f"b\n{FOOTER}"), (3, f"c\n{FOOTER}")]
    )
    out = boilerplate_paragraphs(ds, min_docs=3).to_pandas()
    assert out["paragraph"].tolist() == [FOOTER]
    assert out["df"].tolist() == [3]


def test_strip_keeps_order_and_empty_lines(ray_session):
    from cex_crawler_ray.stages.boilerplate import (
        boilerplate_paragraphs,
        strip_boilerplate,
    )

    ds = _docs(
        [
            (1, f"alpha\n\n{FOOTER}\nbeta"),
            (2, f"{FOOTER}\ngamma"),
            (3, f"delta\n{FOOTER}"),
            (4, FOOTER),  # all-boilerplate -> dropped
        ]
    )
    boiler = boilerplate_paragraphs(ds, min_docs=3)
    out = (
        strip_boilerplate(ds, boiler)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3]
    # empty line preserved, boiler line removed, order kept
    assert out["text"].tolist() == ["alpha\n\nbeta", "gamma", "delta"]


def test_strip_trims_spaces_and_tabs_when_matching(ray_session):
    from cex_crawler_ray.stages.boilerplate import (
        boilerplate_paragraphs,
        strip_boilerplate,
    )

    ds = _docs(
        [
            (1, f"\t{FOOTER} \nkeep1"),
            (2, f"  {FOOTER}\nkeep2"),
            (3, f"{FOOTER}\nkeep3"),
        ]
    )
    boiler = boilerplate_paragraphs(ds, min_docs=3)
    out = (
        strip_boilerplate(ds, boiler)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == ["keep1", "keep2", "keep3"]
