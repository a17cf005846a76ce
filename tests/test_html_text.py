"""Byte-identical extraction semantics (SURVEY.md §2.3 M1-M6).

Expected strings are hand-derived from the reference semantics
(``base_scraper.py:271-285`` variant A, ``bingx.py:190-224`` variant B),
NOT produced by the code under test — the fixtures are independent.
"""

from cex_crawler_ray.functions import html_text as ht
from cex_crawler_ray.stages.extract import (
    ExtractProfile,
    extract_with_profile,
)

NASTY = (
    "<html><head><title>T</title>"
    "<script>var x = '<p>not text</p>';</script>"
    "<style>.a { color: red }</style></head>"
    "<body>\n<nav>Home | About</nav>\n<header>Site Header</header>\n"
    "<h1>公告  标题</h1>\n"
    "<p>First   line with  двойной spaces</p>\n"
    "<p>A&amp;B &lt;tag&gt; &#20013;文</p>\n"
    "<div>  leading and trailing  </div>\n"
    "<!-- a comment -->\n"
    "<footer>Footer text</footer>\n</body></html>"
)


def test_get_text_skips_script_style_comments():
    t = ht.get_text(NASTY, exclude=("script", "style"))
    assert "not text" not in t
    assert "color" not in t
    assert "a comment" not in t
    assert "T" in t  # <title> content IS text in get_text
    assert "A&B <tag> 中文" in t  # entities unescaped


def test_variant_a_semantics():
    # variant A keeps nav/header/footer, splits on two spaces, joins '\n'
    out = ht.extract_text_a(NASTY)
    expected = (
        "T\nHome | About\nSite Header\n公告\n标题\nFirst\nline with\n"
        "двойной spaces\nA&B <tag> 中文\nleading and trailing\nFooter text"
    )
    assert out == expected


def test_variant_b_semantics():
    # variant B drops nav/header/footer, joins with spaces, collapses \s+
    out = ht.extract_text_b(NASTY)
    expected = (
        "T 公告 标题 First line with двойной spaces "
        "A&B <tag> 中文 leading and trailing"
    )
    assert out == expected


def test_root_selection_article_body():
    html = (
        '<html><body><div class="other">no</div>'
        '<div class="article-body extra">\n<h2>Head</h2>\n<p>Body  text</p>\n'
        "<div><span>nested</span></div>\n</div>"
        "<p>after root</p></body></html>"
    )
    prof = ExtractProfile(variant="b", root_tag="div", root_class="article-body")
    out = extract_with_profile(html, prof)
    assert out == "Head Body text nested"


def test_root_missing_falls_back_to_whole_page():
    html = "<html><body><p>only  this</p></body></html>"
    prof = ExtractProfile(variant="b", root_tag="div", root_class="article-body")
    assert extract_with_profile(html, prof) == "only this"


def test_article_tag_root():
    # okx-style <article> root with no class filter (reference
    # exchange/okx.py:102-108)
    html = (
        "<body><header>H</header><article><h1>T</h1>\n<p>body  text</p>"
        "</article><footer>F</footer></body>"
    )
    prof = ExtractProfile(variant="b", root_tag="article", root_class=None)
    assert extract_with_profile(html, prof) == "T body text"


def test_root_variant_a():
    html = '<div class="article-content"><p>x  y</p>\n<p>z</p></div>'
    prof = ExtractProfile(
        variant="a", root_tag="div", root_class="article-content"
    )
    assert extract_with_profile(html, prof) == "x\ny\nz"


def test_nested_excluded_tags():
    html = "<body><nav>a<nav>b</nav>c</nav>visible</body>"
    assert ht.get_text(html, exclude=("nav",)) == "visible"


def test_void_elements_do_not_leak_depth():
    html = '<div class="article-body">a<br>b<img src="x">c</div><p>outside</p>'
    out = ht.get_text_in_root(html, "div", "article-body")
    assert out == "abc"


def test_extract_links():
    html = (
        '<ul><li><a href="/a/1">One</a></li>'
        '<li><a href="https://x.test/b">Two  B</a></li>'
        '<li><a href="#frag">skip-me</a></li></ul>'
    )
    links = ht.extract_links(html)
    assert links == [("/a/1", "One"), ("https://x.test/b", "Two  B"), ("#frag", "skip-me")]


def test_pre_json():
    html = "<html><body><pre>{\"a\": [1, 2]}</pre></body></html>"
    assert ht.get_json_from_pre(html) == {"a": [1, 2]}
    # unparseable -> raw html back (reference behaviour)
    bad = "<html><body><pre>{nope</pre></body></html>"
    assert ht.get_json_from_pre(bad) == bad


def test_next_data():
    html = (
        "<html><head><script id=\"__NEXT_DATA__\" type=\"application/json\">"
        "{\"props\": {\"x\": 1}}</script></head></html>"
    )
    assert ht.get_next_data(html) == {"props": {"x": 1}}
    assert ht.get_next_data("<html></html>") is None


def test_windows_newlines_and_two_space_runs():
    html = "<p>a\r\nb</p><p>c    d</p>"
    # splitlines handles \r\n; 4 spaces = two 2-space separators
    assert ht.extract_text_a(html) == "a\nbc\nd"


def test_article_detail_from_next_data():
    """M6 full surface: bybit-style articleDetail projection — type=='p'
    filter, text-children concat, None on non-detail payloads."""
    data = {
        "props": {
            "pageProps": {
                "articleDetail": {
                    "title": "T1",
                    "content": {
                        "json": {
                            "children": [
                                {"type": "p", "children": [
                                    {"text": "hello "}, {"text": "world"}
                                ]},
                                {"type": "img", "src": "x.png"},
                                {"type": "p", "children": [{"text": "again"}]},
                            ]
                        }
                    },
                }
            }
        }
    }
    assert ht.article_detail_from_next_data(data) == (
        "T1",
        ["hello world", "again"],
    )
    # hub-style __NEXT_DATA__ (no articleDetail) -> None (fallback path)
    assert ht.article_detail_from_next_data(
        {"props": {"pageProps": {"articles": []}}}
    ) is None
    assert ht.article_detail_from_next_data(None) is None


def test_json_detail_page_extraction_matches_oracle_text():
    """A synthetic JSON-detail article must extract byte-identically to
    the pages.text oracle column through its host profile."""
    from cex_crawler_ray.sources.pages import (
        article_html,
        expected_extracted_text,
    )
    from cex_crawler_ray.stages.extract import (
        extract_with_profile,
        profiles_for_sources,
    )

    # src3: %4==3 -> JSON detail; %3==0 -> variant A (newline join)
    # src7: %4==3 -> JSON detail; %3==1 -> variant B (space join)
    for src, doc_id in (("src3", 41), ("src7", 42)):
        prof = profiles_for_sources([src])[f"{src}.test"]
        assert prof.json_detail
        html = article_html(doc_id, "en", src, "body text here")
        assert "__NEXT_DATA__" in html
        got = extract_with_profile(html, prof)
        assert got == expected_extracted_text(doc_id, "en", src, "body text here")


def test_nofollow_link_and_meta_semantics():
    """rel=nofollow anchors are dropped; a robots-meta nofollow page
    yields no links; honor_nofollow=False restores raw extraction."""
    from cex_crawler_ray.functions.html_text import extract_links

    html = (
        "<html><body>"
        '<a href="/a">A</a>'
        '<a href="/b" rel="nofollow">B</a>'
        '<a href="/c" rel="external NOFOLLOW">C</a>'
        '<a href="/d" rel="author">D</a>'
        "</body></html>"
    )
    assert [h for h, _ in extract_links(html)] == ["/a", "/d"]
    assert [h for h, _ in extract_links(html, honor_nofollow=False)] == [
        "/a",
        "/b",
        "/c",
        "/d",
    ]

    meta = (
        '<html><head><meta name="robots" content="noindex, nofollow">'
        '</head><body><a href="/x">X</a></body></html>'
    )
    assert extract_links(meta) == []
    assert [h for h, _ in extract_links(meta, honor_nofollow=False)] == [
        "/x"
    ]


def test_base_href_and_canonical_link_extraction():
    from cex_crawler_ray.functions.html_text import (
        base_href,
        canonical_link,
    )

    html = (
        "<html><head>"
        '<base href="https://cdn.h.test/root/">'
        '<link rel="canonical" href="https://h.test/true-url">'
        "</head><body></body></html>"
    )
    assert base_href(html) == "https://cdn.h.test/root/"
    assert canonical_link(html) == "https://h.test/true-url"
    # reversed attribute order on <link>
    rev = '<link href="https://h.test/x" rel="canonical">'
    assert canonical_link(rev) == "https://h.test/x"
    assert base_href("<html><body>no base</body></html>") is None
    assert canonical_link("<html><body>none</body></html>") is None


def test_discover_resolves_links_against_base_href(ray_session):
    import pyarrow as pa

    from cex_crawler_ray.pipelines.crawl import DiscoverStage

    html = (
        "<html><head>"
        '<base href="https://other.test/dir/">'
        '</head><body><a href="page1">P1</a>'
        '<a href="/abs">ABS</a></body></html>'
    ).encode("utf-8")
    batch = pa.table(
        {
            "url": pa.array(["https://h0.test/hub"], pa.string()),
            "html": pa.array([html], pa.binary()),
            "status": pa.array([200], pa.int32()),
            "priority": pa.array([0], pa.int32()),
            "depth": pa.array([0], pa.int32()),
        }
    )
    out = DiscoverStage()(batch)
    urls = out["url"].to_pylist()
    assert "https://other.test/dir/page1" in urls
    assert "https://other.test/abs" in urls
