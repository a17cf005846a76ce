"""Redirect-chain resolution (stages/redirects.py)."""

import pyarrow as pa
import pytest

import ray

from cex_crawler_ray.stages.redirects import redirect_resolve


def _edges(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.string()),
                "dst": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


def _as_dict(ds):
    df = ds.to_pandas()
    return {
        r.url: (r.final_url, r.hops, r.status) for r in df.itertuples()
    }


CHAIN = [("a", "b"), ("b", "c"), ("c", "T")]
LOOP = [("x", "y"), ("y", "x")]
INTO_LOOP = [("w", "x")]  # chain that feeds a loop


@pytest.mark.usefixtures("ray_session")
def test_chain_loop_and_feeder():
    got = _as_dict(redirect_resolve(_edges(CHAIN + LOOP + INTO_LOOP)))
    assert got["a"] == ("T", 3, "resolved")
    assert got["b"] == ("T", 2, "resolved")
    assert got["c"] == ("T", 1, "resolved")
    assert got["x"] == ("", -1, "unresolved")
    assert got["y"] == ("", -1, "unresolved")
    assert got["w"] == ("", -1, "unresolved")


@pytest.mark.usefixtures("ray_session")
def test_hop_cap_midchain_still_resolves():
    # chain u0 -> u1 -> ... -> u9 -> T, cap 4: u0..u5 are over-cap
    # (distance 10..6 > 4... wait distance of u_i is 10 - i), so
    # u0..u5 unresolved, u6..u9 resolved with hops 4..1
    chain = [(f"u{i}", f"u{i+1}") for i in range(9)] + [("u9", "T")]
    got = _as_dict(redirect_resolve(_edges(chain), max_hops=4))
    for i in range(6):
        assert got[f"u{i}"] == ("", -1, "unresolved"), i
    for i in range(6, 10):
        assert got[f"u{i}"] == ("T", 10 - i, "resolved"), i


@pytest.mark.usefixtures("ray_session")
def test_driver_equals_distributed():
    chain = [(f"u{i}", f"u{i+1}") for i in range(9)] + [("u9", "T")]
    edges = CHAIN + LOOP + INTO_LOOP + chain
    drv = _as_dict(redirect_resolve(_edges(edges), max_hops=4))
    dist = _as_dict(
        redirect_resolve(
            _edges(edges), max_hops=4, driver_max_rows=0, num_parts=8
        )
    )
    assert drv == dist


@pytest.mark.usefixtures("ray_session")
def test_self_redirect_is_loop():
    got = _as_dict(redirect_resolve(_edges([("s", "s"), ("a", "s")])))
    assert got["s"] == ("", -1, "unresolved")
    assert got["a"] == ("", -1, "unresolved")
