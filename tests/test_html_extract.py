"""HTML-bytes extractor (M1/M2): golden test ported from the reference.

Ports /root/reference/pkg/htmlparser/parser_test.go:10-65 byte for byte:
the same fixture (testdata/example1.html), the same asserted URL subsets
per tag class — plus unit pins of the per-tag attribute rules
(ReadResourceURL, parser.go:41-65) the reference leaves untested, and
the render->extract round-trip the conformance query relies on.
"""

import pyarrow as pa

from go_crawler_ray.stages.html_extract import (
    HtmlExtractStage,
    extract_html_resources,
    render_doc_html,
)

GOLDEN = "/root/reference/testdata/example1.html"


class TestGoldenExample1:
    """parser_test.go:10-65 (same fixture, same expected URLs)."""

    @classmethod
    def setup_class(cls):
        with open(GOLDEN, "rb") as f:
            cls.resources = extract_html_resources(f.read())
        cls.by_tag = {}
        for tag, url in cls.resources:
            cls.by_tag.setdefault(tag, []).append(url)

    def test_a_hrefs_found(self):
        for want in ["https://www.sheldonbrown.com/index.html",
                     "web_glossary.html#browser",
                     "web_sample1.html#href2"]:
            assert want in self.by_tag["a"]

    def test_stylesheets_found(self):
        for want in ["https://www.sheldonbrown.com/common-data/document.css",
                     "https://www.sheldonbrown.com/common-data/screen.css",
                     "https://www.sheldonbrown.com/common-data/print.css"]:
            assert want in self.by_tag["link"]

    def test_scripts_found(self):
        for want in ["https://www.googletagmanager.com/gtag/js?id=G-YRNYST4RX7",
                     "http://pagead2.googlesyndication.com/pagead/show_ads.js"]:
            assert want in self.by_tag["script"]

    def test_imgs_found(self):
        assert ("https://www.sheldonbrown.com/images/scb_eagle_contact.jpeg"
                in self.by_tag["img"])

    def test_document_order_is_preserved(self):
        # the reference collects in DOM pre-order; the stylesheet links
        # appear in the <head> before every body <a>
        first_a = next(i for i, (t, _) in enumerate(self.resources)
                       if t == "a")
        css_idx = [i for i, (t, u) in enumerate(self.resources)
                   if t == "link" and u.endswith("document.css")]
        assert css_idx and css_idx[0] < first_a


class TestPerTagRules:
    """ReadResourceURL (parser.go:41-65) semantics."""

    def test_link_requires_stylesheet_rel_or_css_type(self):
        html = ('<link rel="icon" href="/i.ico">'
                '<link rel="stylesheet" href="/a.css">'
                '<link type="text/css" href="/b.css">'
                '<link rel="alternate" type="application/rss+xml" href="/f">')
        assert extract_html_resources(html) == [
            ("link", "/a.css"), ("link", "/b.css")]

    def test_rule_value_match_is_exact(self):
        # Go compares attr VALUES case-sensitively/verbatim
        assert extract_html_resources(
            '<link rel="Stylesheet" href="/x.css">') == []
        assert extract_html_resources(
            '<link type="text/CSS" href="/x.css">') == []

    def test_tag_and_attr_names_case_insensitive(self):
        # both tokenizers lowercase element/attribute NAMES
        assert extract_html_resources('<A HREF="/p.html">x</A>') == \
            [("a", "/p.html")]
        assert extract_html_resources('<IMG SRC="/i.png"/>') == \
            [("img", "/i.png")]

    def test_first_attribute_occurrence_wins(self):
        assert extract_html_resources('<a href="/one" href="/two">x</a>') == \
            [("a", "/one")]

    def test_empty_href_still_collected(self):
        # Go's readHTMLNodeAttrValue returns ok=true for href=""
        assert extract_html_resources('<a href="">x</a>') == [("a", "")]
        assert extract_html_resources("<a href>x</a>") == [("a", "")]

    def test_missing_url_attr_dropped(self):
        assert extract_html_resources('<a name="n">x</a><img alt="y">') == []

    def test_entities_unescaped_in_attr_values(self):
        assert extract_html_resources(
            '<a href="/p?a=1&amp;b=2">x</a>') == [("a", "/p?a=1&b=2")]

    def test_script_content_not_parsed(self):
        html = ('<script src="/s.js">var a = "<a href=\'/fake\'>";</script>'
                '<img src="/i.png">')
        assert extract_html_resources(html) == [
            ("script", "/s.js"), ("img", "/i.png")]


class TestRenderExtractRoundTrip:
    def test_spans_round_trip(self):
        spans = [
            {"kind": "text", "text": "hello & <world>", "media_ref": "",
             "offset": 0},
            {"kind": "link", "text": "go", "media_ref": "/p/1.html#sec",
             "offset": 1},
            {"kind": "css", "text": "", "media_ref": "/static/a.css?v=1",
             "offset": 2},
            {"kind": "css", "text": "", "media_ref": "/static/b.css",
             "offset": 3},
            {"kind": "script", "text": "", "media_ref": "/s/x.js",
             "offset": 4},
            {"kind": "img", "text": "", "media_ref": "/img/i.png",
             "offset": 5},
            {"kind": "text", "text": "bye", "media_ref": "", "offset": 6},
        ]
        got = extract_html_resources(render_doc_html(spans))
        want = [("a", "/p/1.html#sec"), ("link", "/static/a.css?v=1"),
                ("link", "/static/b.css"), ("script", "/s/x.js"),
                ("img", "/img/i.png")]
        assert got == want

    def test_stage_batch_layout(self):
        spans = [{"kind": "link", "text": "t", "media_ref": "/a.html",
                  "offset": 0},
                 {"kind": "img", "text": "", "media_ref": "/i.png",
                  "offset": 1}]
        batch = pa.table({
            "doc_id": ["https://h.example/"],
            "content": pa.array([render_doc_html(spans).encode()],
                                pa.large_binary()),
        })
        out = HtmlExtractStage()(batch)
        assert out.column("kind").to_pylist() == ["link", "img"]
        assert out.column("ref").to_pylist() == ["/a.html", "/i.png"]
        assert out.column("res_idx").to_pylist() == [0, 1]


def test_parse_stage_raises_on_extractor_count_mismatch():
    """parse_html mode exists to DETECT render->extract divergence: if
    the extractor returns a different resource count than the corpus
    spans claim, ParseStage must raise, not silently blend extracted and
    metadata refs."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from go_crawler_ray.stages.parse import ParseStage

    spans = [[
        {"kind": "text", "text": "hello", "media_ref": "", "offset": 0},
        {"kind": "img", "text": "", "media_ref": "http://h/a.png",
         "offset": 1},
        {"kind": "img", "text": "", "media_ref": "http://h/b.png",
         "offset": 2},
    ]]
    # rendered bytes contain only ONE resource, spans claim two
    batch = pa.table({
        "url": ["http://h/page"],
        "kind": ["page"],
        "skipped_on": [""],
        "spans": spans,
        "raw_content": [b'<html><img src="http://h/a.png"></html>'],
    })
    stage = ParseStage(parse_html=True)
    with pytest.raises(ValueError, match="parse_html"):
        stage(batch)
