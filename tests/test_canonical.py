"""URL canonicalization + hashing (SURVEY.md §2.3 M9-M11)."""

from cex_crawler_ray.functions.canonical import (
    canonicalize,
    host_bucket,
    host_of,
    md5_id,
    url_hash64,
)


def test_relative_join():
    assert (
        canonicalize("/articles/5", base="https://a.test/hub")
        == "https://a.test/articles/5"
    )


def test_lowercase_and_default_port():
    assert canonicalize("HTTPS://A.Test:443/P") == "https://a.test/P"
    assert canonicalize("http://a.test:8080/p") == "http://a.test:8080/p"


def test_fragment_and_trailing_slash():
    assert canonicalize("https://a.test/x/#frag") == "https://a.test/x"
    assert canonicalize("https://a.test/") == "https://a.test/"
    assert canonicalize("https://a.test") == "https://a.test/"


def test_query_preserved():
    assert canonicalize("https://a.test/x?b=1") == "https://a.test/x?b=1"


def test_hash_stability():
    h = url_hash64("https://a.test/x")
    assert h == url_hash64("https://a.test/x")
    assert h != url_hash64("https://a.test/y")
    assert 0 <= h < 2**64


def test_md5_id_matches_hashlib():
    import hashlib

    u = "https://weex.test/hc/articles/123"
    assert md5_id(u) == hashlib.md5(u.encode()).hexdigest()


def test_host_of_and_bucket():
    assert host_of("https://A.TEST:443/x") == "a.test"
    b = host_bucket("a.test", 16)
    assert 0 <= b < 16 and b == host_bucket("a.test", 16)
