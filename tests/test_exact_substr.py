"""ExactSubstr dedup at >=50-token fidelity (Lee et al. 2022 §4.1):
maximal repeated spans, keep-first, exact lengths."""

import pyarrow as pa
import pytest

import ray
from cex_crawler_ray.stages.substr_dedup import exact_substr_spans


def _corpus(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _toks(prefix, n, start=0):
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


@pytest.mark.parametrize("carry", ["hash", "string"])
def test_long_shared_block_marks_second_occurrence_only(ray_session, carry):
    block = _toks("rep", 60)  # 60-token shared run
    rows = [
        (1, _toks("a", 10) + " " + block),
        (2, _toks("b", 12) + " " + block + " " + _toks("c", 5)),
    ]
    out = (
        exact_substr_spans(_corpus(rows), min_len=50, carry=carry)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    # only doc 2's occurrence is marked; maximal span = exactly the
    # 60-token block (1-based tokens 13..72), exact length reported
    assert out.to_dict("records") == [
        {"doc_id": 2, "span_start": 13, "span_end": 72, "span_len": 60}
    ]


def test_below_min_len_repeats_are_ignored(ray_session):
    block = _toks("rep", 49)  # one token short of the threshold
    rows = [(1, block), (2, block)]
    out = exact_substr_spans(_corpus(rows), min_len=50).to_pandas()
    assert len(out) == 0


def test_adjacent_blocks_merge_into_one_maximal_span(ray_session):
    a = _toks("x", 55)
    b = _toks("y", 55)
    rows = [
        (1, a + " " + b),  # first occurrence of the 110-token run
        (2, a + " " + b),  # repeats the whole run -> ONE span of 110
        (3, b),  # repeats only b -> one span of 55
    ]
    out = (
        exact_substr_spans(_corpus(rows), min_len=50)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    assert out.to_dict("records") == [
        {"doc_id": 2, "span_start": 1, "span_end": 110, "span_len": 110},
        {"doc_id": 3, "span_start": 1, "span_end": 55, "span_len": 55},
    ]
