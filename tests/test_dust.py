"""DUST parameter-irrelevance rule mining (Bar-Yossef et al. WWW'07):
strip kernel, evidence semantics, per-host scope, frontier apply."""

import hashlib

import pyarrow as pa
import pytest

import ray
from cex_crawler_ray.stages.dust import (
    apply_rules,
    mine_param_rules,
    strip_param,
)


def _dg(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _caps(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "payload_digest": pa.array(
                    [_dg(r[1]) for r in rows], pa.string()
                ),
            }
        )
    )


def test_strip_param_positions():
    u = "https://a.test/p?x=1&y=2&z=3"
    assert strip_param(u, "x") == "https://a.test/p?y=2&z=3"
    assert strip_param(u, "y") == "https://a.test/p?x=1&z=3"
    assert strip_param(u, "z") == "https://a.test/p?x=1&y=2"
    assert strip_param("https://a.test/p?x=1", "x") == "https://a.test/p"
    assert strip_param("https://a.test/p", "x") == "https://a.test/p"
    # repeated param: all pairs with that name drop
    assert (
        strip_param("https://a.test/p?x=1&y=2&x=3", "x")
        == "https://a.test/p?y=2"
    )


def test_rule_requires_zero_violations(ray_session):
    rows = [
        # s irrelevant on a.test (3 supporting pairs)
        ("https://a.test/1?id=1", "one"),
        ("https://a.test/1?id=1&s=x", "one"),
        ("https://a.test/2?id=2", "two"),
        ("https://a.test/2?id=2&s=y", "two"),
        ("https://a.test/3?id=3", "three"),
        ("https://a.test/3?id=3&s=z", "three"),
        # s load-bearing on b.test: one violation kills the rule
        ("https://b.test/1?id=1", "b-one"),
        ("https://b.test/1?id=1&s=x", "b-one DIFFERENT"),
        ("https://b.test/2?id=2", "b-two"),
        ("https://b.test/2?id=2&s=y", "b-two"),
    ]
    rules = mine_param_rules(_caps(rows), min_support=2).to_pandas()
    got = set(zip(rules["host"], rules["param"]))
    assert ("a.test", "s") in got
    assert ("b.test", "s") not in got
    # id: stripped candidates were never captured -> no evidence
    assert not any(p == "id" for p in rules["param"])
    sup = rules.set_index(["host", "param"])["support"]
    assert sup[("a.test", "s")] == 3


def test_min_support_threshold(ray_session):
    rows = [
        ("https://c.test/1?id=1", "x"),
        ("https://c.test/1?id=1&t=1", "x"),
    ]
    assert mine_param_rules(_caps(rows), min_support=2).count() == 0
    assert mine_param_rules(_caps(rows), min_support=1).count() == 1


def test_apply_rules_strips_only_ruled_hosts(ray_session):
    rows = [
        ("https://a.test/1?id=1", "one"),
        ("https://a.test/1?id=1&s=x", "one"),
        ("https://a.test/2?id=2", "two"),
        ("https://a.test/2?id=2&s=y", "two"),
        ("https://b.test/1?id=1&s=x", "b"),
    ]
    caps = _caps(rows).materialize()
    rules = mine_param_rules(caps, min_support=2)
    out = sorted(apply_rules(caps, rules).to_pandas()["url"])
    assert out == sorted(
        [
            "https://a.test/1?id=1",
            "https://a.test/1?id=1",  # variant collapsed onto base
            "https://a.test/2?id=2",
            "https://a.test/2?id=2",
            "https://b.test/1?id=1&s=x",  # no rule on b.test
        ]
    )


@pytest.mark.parametrize("nparts", [1, 7])
def test_partition_invariance(ray_session, nparts):
    rows = []
    for i in range(30):
        h = f"h{i % 3}.t"
        rows.append((f"https://{h}/p/{i}?id={i}", f"body{i}"))
        rows.append((f"https://{h}/p/{i}?id={i}&u={i}", f"body{i}"))
    ds = _caps(rows).repartition(nparts)
    rules = (
        mine_param_rules(ds, min_support=2)
        .to_pandas()
        .sort_values(["host", "param"])
        .reset_index(drop=True)
    )
    assert list(rules["param"]) == ["u", "u", "u"]
    assert list(rules["support"]) == [10, 10, 10]
