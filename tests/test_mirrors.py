"""Mirror-host detection (stages/mirrors.py)."""

import pyarrow as pa
import pytest

import ray

from cex_crawler_ray.stages.mirrors import mirror_host_pairs


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "host": pa.array([h for h, _ in rows], pa.string()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        )
    )


def _pairs(ds):
    df = ds.to_pandas()
    return {
        (r.host_a, r.host_b): (r.shared, r.n_a, r.n_b)
        for r in df.itertuples()
    }


@pytest.mark.usefixtures("ray_session")
def test_full_mirror_and_low_overlap():
    rows = (
        [("big.test", f"t{i}") for i in range(10)]
        # small full mirror of 3 of big's pages -> coefficient 1.0
        + [("mir.test", f"t{i}") for i in range(3)]
        # unrelated host sharing 1 page with big -> 1/5 < 1/2, dropped
        + [("other.test", "t0")]
        + [("other.test", f"x{i}") for i in range(4)]
    )
    got = _pairs(mirror_host_pairs(_ds(rows), num=1, den=2, num_parts=8))
    assert got == {("big.test", "mir.test"): (3, 10, 3)}


@pytest.mark.usefixtures("ray_session")
def test_duplicate_rows_collapse():
    # repeated (host, text) rows must not inflate counts
    rows = [("a.test", "p"), ("a.test", "p"), ("b.test", "p"),
            ("b.test", "q"), ("a.test", "q")]
    got = _pairs(mirror_host_pairs(_ds(rows), num=1, den=2, num_parts=8))
    assert got == {("a.test", "b.test"): (2, 2, 2)}


@pytest.mark.usefixtures("ray_session")
def test_boilerplate_cap_drops_mega_shared_digest():
    # one digest on 5 hosts + cap 4 -> contributes no pairs; the pair
    # signal must come from the genuinely shared second page
    rows = [(f"h{i}.test", "chrome-footer") for i in range(5)]
    rows += [("h0.test", "real"), ("h1.test", "real")]
    got = _pairs(
        mirror_host_pairs(
            _ds(rows), num=1, den=2, num_parts=8, max_hosts_per_digest=4
        )
    )
    assert got == {("h0.test", "h1.test"): (1, 2, 2)}
