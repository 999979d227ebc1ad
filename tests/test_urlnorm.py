"""Unit ports of the reference parser/resolver test intents.

Ports internal/pageparser_test.go:9-90 (resolve/filter semantics, incl.
the corrected version of its vacuous asset assertions) and the save-path /
relativization behaviors (internal/models.go:213-249) the reference left
untested.
"""

from go_crawler_ray.functions.urlnorm import (
    Canonicalizer,
    asset_save_path,
    canonicalize_url,
    host_of,
    link_save_path,
    make_relative_url,
    md5_hex,
    page_save_path,
    resolve_local_save_path,
    strip_fragment,
)

BASE = "https://www.sheldonbrown.com/web_sample1.html"


class TestCanonicalize:
    def test_relative_absolutized(self):
        assert canonicalize_url("web_glossary.html", BASE) == \
            "https://www.sheldonbrown.com/web_glossary.html"

    def test_fragment_stripped(self):
        # pageparser_test asserts web_glossary.html#browser -> web_glossary.html
        assert canonicalize_url("web_glossary.html#browser", BASE) == \
            "https://www.sheldonbrown.com/web_glossary.html"

    def test_fragment_only_resolves_to_self(self):
        assert canonicalize_url("#top", BASE) == BASE

    def test_querystring_preserved(self):
        # pageparser_test: added.js?someAttr=true keeps its query
        assert canonicalize_url("added.js?someAttr=true", BASE) == \
            "https://www.sheldonbrown.com/added.js?someAttr=true"

    def test_absolute_same_host_kept(self):
        u = "https://www.sheldonbrown.com/images/scb_eagle_contact.jpeg"
        assert canonicalize_url(u, BASE) == u

    def test_external_host_not_page_host(self):
        u = canonicalize_url("https://www.facebook.com/pages/x", BASE)
        assert host_of(u) != host_of(BASE)  # caller drops it (pageparser.go:45-47)

    def test_dot_segments_resolved(self):
        assert canonicalize_url("../static/x.css", "https://h.example/a/b/c.html") == \
            "https://h.example/a/static/x.css"

    def test_rfc3986_normalization_new(self):
        # [NEW] beyond the reference: scheme/host case, default port
        assert canonicalize_url("HTTPS://H.Example:443/p/../q.html", "https://h.example/") == \
            "https://h.example/q.html"

    def test_scheme_relative(self):
        assert canonicalize_url("//cdn.example/x.js", BASE) == "https://cdn.example/x.js"

    def test_fast_path_rejects_dot_segments_anywhere(self):
        # regression (ADVICE r1): dot-segments beyond the FIRST path
        # segment used to pass the fast path unnormalized
        assert canonicalize_url("http://h/a/../b", BASE) == "http://h/b"
        assert canonicalize_url("http://h/a/..", BASE) == "http://h/"
        assert canonicalize_url("http://h/a/./b", BASE) == "http://h/a/b"
        assert canonicalize_url("http://h/a/.", BASE) == "http://h/a/"

    def test_fast_path_rejects_trailing_dot_segment_before_query(self):
        # regression (ADVICE r2): a trailing dot-segment FOLLOWED BY A
        # QUERY used to leak through the fast path unnormalized — the
        # endswith('/..') checks ran on the whole URL, not the path
        assert canonicalize_url("http://h/a/..?x=1", BASE) == "http://h/?x=1"
        assert canonicalize_url("http://h/a/.?x=1", BASE) == "http://h/a/?x=1"
        from go_crawler_ray.functions.urlnorm import canonicalize_batch

        canon, same = canonicalize_batch(
            ["http://h/a/..?x=1", "http://h/a/.?x=1", "/a/.?x=1"],
            ["http://h/x/y.html"] * 3)
        assert list(canon) == ["http://h/?x=1", "http://h/a/?x=1",
                               "http://h/a/?x=1"]
        assert same.all()

    def test_fast_path_rejects_explicit_port(self):
        # regression (ADVICE r1): explicit default port must be stripped
        assert canonicalize_url("http://h:80/x", BASE) == "http://h/x"
        assert canonicalize_url("https://h:443/x", BASE) == "https://h/x"
        assert canonicalize_url("https://h:8443/x", BASE) == "https://h:8443/x"

    def test_batch_pathless_base_bare_relative(self):
        # regression (ADVICE r1): a pathless base (CLI seed without a
        # trailing slash) must resolve bare-relative refs via the
        # authority, not a rsplit-derived bogus dir
        from go_crawler_ray.functions.urlnorm import canonicalize_batch

        canon, same = canonicalize_batch(
            ["p/1.html", "/a.html", "q.html"],
            ["https://h0.example", "https://h0.example",
             "https://h0.example/d/x.html"])
        assert list(canon) == ["https://h0.example/p/1.html",
                               "https://h0.example/a.html",
                               "https://h0.example/d/q.html"]
        assert same.all()

    def test_memoizing_canonicalizer(self):
        c = Canonicalizer()
        assert c("a.html", BASE) == c("a.html", BASE) == \
            "https://www.sheldonbrown.com/a.html"

    def test_strip_fragment(self):
        assert strip_fragment("x#y#z") == "x"
        assert strip_fragment("x") == "x"


class TestSavePaths:
    def test_page_root_fallback_index(self):
        # internal/models.go:222-227: "/" basename -> fallback "index"
        assert page_save_path("https://h.example/") == "/index.html"

    def test_page_regular(self):
        assert page_save_path("https://h.example/p/3.html") == "/p/3.html.html"

    def test_asset_no_ext_appended(self):
        assert asset_save_path("https://h.example/static/a.css") == "/static/a.css"

    def test_asset_query_excluded_from_path(self):
        # Go path funcs operate on url.Path only
        assert asset_save_path("https://h.example/s/a.js?v=1") == "/s/a.js"

    def test_empty_path_md5_fallback(self):
        # empty basename and empty fallback -> md5 of full URL (models.go:208-211,226)
        u = "https://h.example"
        got = resolve_local_save_path(u, "", "")
        assert md5_hex(u) in got

    def test_link_save_path_gets_html_ext(self):
        assert link_save_path("https://h.example/p/7.html") == "/p/7.html.html"


class TestMakeRelative:
    def test_sibling_dir(self):
        # Go filepath.Rel("/p", "/static/a.css") = "../static/a.css"
        assert make_relative_url("/p/3.html.html", "/static/a.css") == "../static/a.css"

    def test_same_dir_gets_dot_slash(self):
        assert make_relative_url("/p/3.html.html", "/p/7.html.html") == "./7.html.html"

    def test_root_page(self):
        assert make_relative_url("/index.html", "/static/a.css") == "./static/a.css"
