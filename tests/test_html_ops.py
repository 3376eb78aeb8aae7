"""HTML boilerplate strip / link extraction (ops/html.py)."""

import pytest

from searchengine_spark.ops.html import extract_links, extract_visible_text


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, html string")


def test_strip_script_style_comment_tags(spark):
    html = (
        "<html><head><title> My  Title </title>"
        "<style>body { color: red; }</style></head>"
        "<body><!-- secret <b>x</b> -->"
        "<script>var a = 1 < 2 && b > 3;</script>"
        "<h1>Hello</h1><p>world   again</p></body></html>"
    )
    out = extract_visible_text(_pages(spark, [(1, html)])).collect()[0]
    assert out["title"] == "My Title"
    assert out["text"] == "My Title Hello world again"
    assert out["n_links"] == 0


def test_entity_decode_order(spark):
    # &amp;lt; must decode to literal "&lt;", not "<" (amp LAST)
    html = "<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; x&nbsp;y &amp;amp; &amp;lt; z</p>"
    out = extract_visible_text(_pages(spark, [(1, html)])).collect()[0]
    assert out["text"] == 'a <b> "c" \'d\' x y &amp; &lt; z'


def test_case_insensitive_and_multiline_blocks(spark):
    html = "<BODY><SCRIPT type='x'>\nmulti\nline < junk\n</SCRIPT>ok</BODY>"
    out = extract_visible_text(_pages(spark, [(1, html)])).collect()[0]
    assert out["text"] == "ok"


def test_no_title_no_links(spark):
    out = extract_visible_text(_pages(spark, [(1, "<p>just text</p>")])).collect()[0]
    assert out["title"] == ""
    assert out["text"] == "just text"
    assert out["n_links"] == 0


def test_inlink_host_stats(spark):
    from searchengine_spark.ops.html import inlink_host_stats

    html1 = ('<a href="http://A.com:80/x">1</a>'
             '<a href="https://a.com/y">2</a>'
             '<a href="relative/no-host">skipped</a>')
    html2 = '<a href="http://a.com/z">3</a><a href="http://b.org/w">4</a>'
    from searchengine_spark.ops.html import extract_links

    links = extract_links(_pages(spark, [(1, html1), (2, html2)]))
    got = {r["host"]: (r["n_inlinks"], r["n_source_docs"])
           for r in inlink_host_stats(links).collect()}
    # case + port normalized like the url dedup path; relative hrefs drop
    assert got == {"a.com": (3, 2), "b.org": (1, 1)}


def test_extract_anchors_cleanup_and_pairing(spark):
    from searchengine_spark.ops.html import extract_anchors

    html = (
        '<a href="http://a/1"> click  <b>here</b> &amp; now </a>'
        '<a href="http://b/2">two</a>'
        '<a href="http://c/3">unterminated'
    )
    rows = extract_anchors(_pages(spark, [(1, html)])).collect()
    assert [(r["link_pos"], r["href"], r["anchor"]) for r in rows] == [
        (1, "http://a/1", "click here & now"),
        (2, "http://b/2", "two"),
    ]


def test_anchor_term_stats(spark):
    from searchengine_spark.ops.html import anchor_term_stats, extract_anchors

    pages = _pages(spark, [
        (1, '<a href="http://X.com/a">Best Spark guide</a>'),
        (2, '<a href="http://x.com/b">spark tips</a>'
            '<a href="http://y.org/c">other</a>'),
    ])
    got = {(r["host"], r["term"]): (r["n_links"], r["n_source_docs"])
           for r in anchor_term_stats(extract_anchors(pages)).collect()}
    assert got[("x.com", "spark")] == (2, 2)
    assert got[("x.com", "best")] == (1, 1)
    assert got[("y.org", "other")] == (1, 1)


def test_extract_links_in_order(spark):
    html = (
        '<a href="http://a/1">one</a><p>mid</p>'
        '<A HREF="http://b/2">two</A><a id="x" href="http://c/3">three</a>'
    )
    rows = extract_links(_pages(spark, [(7, html)])).collect()
    assert [(r["doc_id"], r["link_pos"], r["href"]) for r in rows] == [
        (7, 1, "http://a/1"),
        (7, 2, "http://b/2"),
        (7, 3, "http://c/3"),
    ]
    out = extract_visible_text(_pages(spark, [(7, html)])).collect()[0]
    assert out["n_links"] == 3
