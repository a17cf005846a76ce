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


def test_url_hash64_arrow_parity():
    """Vectorized hash == scalar hash element-for-element, across
    string type variants, slices, chunking, nulls, and unicode."""
    import numpy as np
    import pyarrow as pa

    from cex_crawler_ray.functions.canonical import url_hash64_arrow

    urls = [
        "https://a.test/x",
        "",
        "https://b.test/" + "p" * 500,
        "héllo/ünicode",
        "a",
        "https://a.test/y?q=1#f",
        "\t tab and space ",
        "日本語テキスト",
        "https://c.test/" + "q" * 500,  # same length as the b.test one
    ]
    expect = np.array([url_hash64(u) for u in urls], dtype=np.uint64)

    arr = pa.array(urls, pa.string())
    assert (url_hash64_arrow(arr) == expect).all()
    assert (url_hash64_arrow(pa.array(urls, pa.large_string())) == expect).all()
    # sliced array (nonzero offset into shared buffers)
    assert (url_hash64_arrow(arr.slice(2, 5)) == expect[2:7]).all()
    # chunked
    ch = pa.chunked_array([arr.slice(0, 3), arr.slice(3)])
    assert (url_hash64_arrow(ch) == expect).all()
    # nulls hash like empty strings
    vn = url_hash64_arrow(pa.array(["x", None, ""], pa.string()))
    assert vn[1] == url_hash64("") == vn[2]
    # degenerate columns (no data buffer)
    assert (
        url_hash64_arrow(pa.array(["", ""], pa.string())) == url_hash64("")
    ).all()
    assert len(url_hash64_arrow(pa.array([], pa.string()))) == 0


def test_url_hash64_arrow_random_parity():
    import random

    import numpy as np
    import pyarrow as pa

    from cex_crawler_ray.functions.canonical import url_hash64_arrow

    rng = random.Random(7)
    alphabet = "abcdefghij/.:?&=%20é中"
    urls = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        for _ in range(2000)
    ]
    expect = np.array([url_hash64(u) for u in urls], dtype=np.uint64)
    got = url_hash64_arrow(pa.array(urls, pa.string()))
    assert (got == expect).all()
