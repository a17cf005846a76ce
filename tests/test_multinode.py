"""Multi-node simulation (ray.cluster_utils.Cluster, 3 virtual nodes
with constrained object stores): the distributed-frontier crawl and
the MinHash LSH dedup must produce EXACTLY the single-node results
when real shuffles cross raylet boundaries.

The virtual cluster must own its Ray session, so the multi-node run
happens in a child process (bench.py --multinode-child) and only its
one-line JSON report crosses back; the single-node twin runs in the
normal session fixture.
"""

import hashlib
import json
import os
import subprocess
import sys

import pytest

from tests.conftest import SF_TINY

_BENCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")


@pytest.fixture(scope="module")
def multinode_report(tmp_path_factory):
    env = dict(
        os.environ,
        GRAFT_SF_DIR=SF_TINY,
        GRAFT_MULTINODE_STORE_MB="192",
        RAY_GRAFT_CPUS="12",
    )
    proc = subprocess.run(
        [sys.executable, _BENCH, "--multinode"],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stderr[-2000:]
    return json.loads(lines[-1])


def test_three_nodes_came_up(multinode_report):
    assert multinode_report["nodes"] == 3


def test_crawl_matches_single_node(ray_session, multinode_report):
    from cex_crawler_ray.pipelines.flagship import run_flagship_crawl

    run = run_flagship_crawl(SF_TINY, max_rounds=12)
    urls = sorted(run.fetched_table()["url"].to_pylist())
    md5 = hashlib.md5("\n".join(urls).encode()).hexdigest()
    assert multinode_report["crawl"]["pages"] == len(urls)
    assert multinode_report["crawl"]["fetched_md5"] == md5


def test_minhash_matches_single_node(ray_session, multinode_report):
    import __ray_entry__ as entry_mod

    pairs = entry_mod.queries()["minhash_dup_pairs"](SF_TINY)
    if hasattr(pairs, "to_pandas"):
        pairs = pairs.to_pandas()
    assert multinode_report["minhash"]["pairs"] == len(pairs)
