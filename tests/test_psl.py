"""Public-suffix-list matching (functions/psl.py)."""

import pyarrow as pa

from cex_crawler_ray.functions.psl import parse_rules, suffix_and_registrable

RULES = ["test", "co.test", "org.test", "*.cdn.test", "!static.cdn.test"]


def _match(hosts):
    s, r = suffix_and_registrable(pa.array(hosts), parse_rules(RULES))
    return list(zip(s.to_pylist(), r.to_pylist()))


def test_rule_kinds():
    got = _match(
        [
            "src1.test",  # exact TLD
            "www.src1.co.test",  # multi-label exact
            "a.b.src2.org.test",  # deep subdomain
            "src8.edge.cdn.test",  # wildcard consumes 'edge'
            "x.static.cdn.test",  # exception prevails over wildcard
        ]
    )
    assert got == [
        ("test", "src1.test"),
        ("co.test", "src1.co.test"),
        ("org.test", "src2.org.test"),
        ("edge.cdn.test", "src8.edge.cdn.test"),
        ("cdn.test", "static.cdn.test"),
    ]


def test_host_is_itself_a_suffix():
    # a bare public suffix has no registrable domain (spec nil)
    assert _match(["test"]) == [("test", "")]
    assert _match(["co.test"]) == [("co.test", "")]
    # wildcard base alone can't consume a label -> falls to 'test'
    assert _match(["cdn.test"]) == [("test", "cdn.test")]
    # host exactly at wildcard suffix depth: it IS the suffix
    assert _match(["edge.cdn.test"]) == [("edge.cdn.test", "")]


def test_default_rule():
    # unknown TLD: implicit '*' rule -> suffix is the last label
    assert _match(["foo.bar.zz"]) == [("zz", "bar.zz")]
    assert _match(["zz"]) == [("zz", "")]


def test_exception_exact_host():
    # the exception name itself: suffix cdn.test, registrable itself
    assert _match(["static.cdn.test"]) == [
        ("cdn.test", "static.cdn.test")
    ]


def test_longest_match_wins():
    rules = parse_rules(["test", "a.test", "b.a.test"])
    s, r = suffix_and_registrable(
        pa.array(["x.b.a.test", "y.a.test", "z.test"]), rules
    )
    assert s.to_pylist() == ["b.a.test", "a.test", "test"]
    assert r.to_pylist() == ["x.b.a.test", "y.a.test", "z.test"]
