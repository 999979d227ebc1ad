"""URL canonicalization, save-path resolution and relativization.

Reference semantics (pinned, /root/reference):
- resolve + de-fragment + same-host filter: internal/pageparser.go:28-68
  (parse ref URL, drop on error; strip fragment; resolve relative->absolute
  against the page URL; drop when host differs from the page host).
- save-path resolution: internal/models.go:213-231 (dir+basename of URL
  path; fallback name when basename is "." or "/"; md5-of-full-URL when
  empty; optional ".<ext>" suffix). Page variant uses ("index", "html")
  (models.go:61-63); asset variant ("", "") (models.go:187-189); links are
  relativized with ("", "html") (models.go:97).
- relative-URL maker: internal/models.go:233-249 (path relative to the
  page's save dir, "/" separators, "./" prefix unless already dotted,
  fallback "./<basename>").
- md5 hasher: internal/models.go:208-211.

[NEW] beyond the reference (north_star RFC 3986 normalization):
``canonicalize_url`` additionally lowercases scheme/host, strips default
ports and removes dot-segments, controlled by ``strict_rfc3986`` (default
True; resolution via urllib already removes dot-segments, so the flag only
affects scheme/host case and default ports — the reference never emits
those forms, keeping conformance intact).

All functions are pure and vectorization-friendly; the batch-level
canonicalizer caches per unique (base, ref) pair since web batches repeat
refs heavily.
"""

from __future__ import annotations

import hashlib
import posixpath
import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import numpy as np

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# Fast path: already-absolute, already-canonical URL with no fragment,
# no port (an explicit port may be a default port needing strip), and
# lowercase scheme+host. Dot-segments anywhere in the path are rejected
# by the substring post-check in _is_fast_canonical (Go's
# ResolveReference always removes dot segments, so '/a/../b' forms must
# go through _normalize_rfc3986, not pass through verbatim).
_CANONICAL_RE = re.compile(
    r"^(?:http|https)://[a-z0-9.\-]+(?:/[^#]*)?$"
)


def _is_fast_canonical(ref: str) -> bool:
    if not _CANONICAL_RE.match(ref):
        return False
    # Dot-segment checks must run on the PATH only: 'http://h/a/..?x=1'
    # ends in '?x=1', not '/..', yet needs normalization to 'http://h/?x=1'
    # (Go's ResolveReference removes dot segments before the query).
    path = ref.split("?", 1)[0]
    return not ("/./" in path or "/../" in path
                or path.endswith("/.") or path.endswith("/.."))


def md5_hex(s: str) -> str:
    """md5 hex digest of a string (internal/models.go:208-211)."""
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def strip_fragment(url: str) -> str:
    """Drop the #fragment (internal/pageparser.go:39)."""
    i = url.find("#")
    return url if i < 0 else url[:i]


def _normalize_rfc3986(url: str) -> str:
    """Lowercase scheme/host, strip default port, remove dot-segments [NEW]."""
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    netloc = parts.netloc
    host = parts.hostname
    if host is not None:
        port = parts.port
        userinfo = ""
        if "@" in netloc:
            userinfo = netloc.rsplit("@", 1)[0] + "@"
        if port is None or str(port) == _DEFAULT_PORTS.get(scheme, ""):
            netloc = userinfo + host
        else:
            netloc = f"{userinfo}{host}:{port}"
    path = parts.path
    if "." in path:
        path = posixpath.normpath(path) if path else path
        # posixpath.normpath drops trailing slash and maps "" -> ".";
        # RFC 3986 remove_dot_segments keeps a trailing "/" for paths
        # ending in "/", "/." or "/.."
        if (parts.path.endswith(("/", "/.", "/.."))
                and not path.endswith("/")):
            path += "/"
        if path == ".":
            path = "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def canonicalize_url(ref: str, base: str, strict_rfc3986: bool = True) -> str | None:
    """Canonical absolute URL for a raw extracted reference, or None.

    Mirrors internal/pageparser.go:33-42: parse (None on failure), strip
    fragment, resolve against ``base``. The same-host filter is applied
    separately by :func:`same_host` (the caller needs the host anyway).
    """
    if _is_fast_canonical(ref):
        return ref  # already canonical and absolute; fragment-free by regex
    try:
        absolute = urljoin(base, strip_fragment(ref))
    except ValueError:
        return None
    if strict_rfc3986:
        try:
            absolute = _normalize_rfc3986(absolute)
        except ValueError:
            return None
    return absolute


def host_of(url: str) -> str:
    """netloc of a URL ('' when relative) — the Go url.Host equivalent."""
    try:
        return urlsplit(url).netloc
    except ValueError:
        return ""


class Canonicalizer:
    """Memoizing canonicalizer for batch use (compile-once, cache-per-actor).

    The cache key is (base, ref); crawl batches repeat both heavily (every
    span of a page shares the base; popular refs repeat across pages).
    """

    def __init__(self, strict_rfc3986: bool = True, max_cache: int = 1_000_000):
        self._cache: dict[tuple[str, str], str | None] = {}
        self._strict = strict_rfc3986
        self._max = max_cache

    def __call__(self, ref: str, base: str) -> str | None:
        key = (base, ref)
        hit = self._cache.get(key, False)
        if hit is not False:
            return hit
        val = canonicalize_url(ref, base, self._strict)
        if len(self._cache) < self._max:
            self._cache[key] = val
        return val


def _go_path_base(p: str) -> str:
    """Go path.Base: ""->"."; all-slashes->"/"; else last element
    (trailing slashes stripped first)."""
    if p == "":
        return "."
    p = p.rstrip("/")
    if p == "":
        return "/"
    return p.rsplit("/", 1)[-1]


def _go_path_dir(p: str) -> str:
    """Go path.Dir: Clean of everything up to (incl.) the final slash."""
    i = p.rfind("/")
    head = p[: i + 1] if i >= 0 else ""
    return posixpath.normpath(head) if head else "."


def resolve_local_save_path(url: str, fallback_name: str, ext: str) -> str:
    """URL -> local relative save path (internal/models.go:213-231).

    Go's path.Dir/path.Base on the URL *path* (query excluded); "."/"/"
    basename -> fallback; empty -> md5 of the full URL; optional ".ext".
    """
    path = urlsplit(url).path
    d = _go_path_dir(path)
    name = _go_path_base(path)
    if name in (".", "/"):
        name = fallback_name
    if name == "":
        name = md5_hex(url)
    joined = posixpath.normpath(posixpath.join(d, name))
    if ext:
        joined += "." + ext
    return joined


def page_save_path(url: str) -> str:
    """internal/models.go:61-63."""
    return resolve_local_save_path(url, "index", "html")


def asset_save_path(url: str) -> str:
    """internal/models.go:187-189."""
    return resolve_local_save_path(url, "", "")


def link_save_path(url: str) -> str:
    """Link target's would-be local path (internal/models.go:97)."""
    return resolve_local_save_path(url, "", "html")


def canonicalize_batch(refs, bases, strict_rfc3986: bool = True,
                       fallback: "Canonicalizer | None" = None):
    """Vectorized canonicalization of (ref, base) pairs.

    Fast paths (numpy/pandas string kernels, no urllib):
    - already-canonical absolute http(s) URLs -> kept as-is;
    - root-relative "/path"  -> base origin + path;
    - bare-relative "p/x"    -> base dir + "/" + path.
    Anything irregular (other schemes, "//host", dot-segments, uppercase
    scheme/host, ports, empty) falls back to the exact per-item
    :class:`Canonicalizer` — identical semantics, just slower. The same
    function therefore serves conformance AND the hot path.

    Returns (canon: object ndarray with None for unparsable,
             same_host: bool ndarray vs each base's host).

    Bases MUST be canonical absolute http(s) URLs (frontier invariant).
    """
    import pandas as pd

    refs = pd.Series(refs, dtype="object")
    bases = pd.Series(bases, dtype="object")
    n = len(refs)
    out = np.empty(n, dtype=object)
    same = np.zeros(n, dtype=bool)

    nofrag = refs.str.split("#", n=1).str[0]
    # base decomposition (vectorized): origin = scheme://host, dir = up to
    # the last '/'
    b_origin_host = bases.str.extract(r"^(https?://([^/]+))", expand=True)
    b_origin = b_origin_host[0]
    b_host = b_origin_host[1]
    b_dir = bases.str.rsplit("/", n=1).str[0]
    # a pathless base ("https://h0.example", no '/' after the authority)
    # makes rsplit-derived b_dir wrong ("https:/"); such rows must take
    # the exact urljoin fallback for bare-relative refs
    b_has_path = bases.str.count("/") >= 3

    # dotty routes to the exact fallback; run dot-segment checks on the
    # PATH portion so '/a/.?x=1' (single-dot before a query) is caught.
    nfpath = nofrag.str.split("?", n=1).str[0]
    dotty = (nofrag.str.contains("..", regex=False)
             | nfpath.str.contains("/./", regex=False)
             | nfpath.str.startswith("./")
             | nfpath.str.endswith("/.")
             | (nfpath == "."))
    has_colon = nofrag.str.contains(":", regex=False)

    is_abs = nofrag.str.startswith("https://") | nofrag.str.startswith("http://")
    abs_host = nofrag.str.extract(r"^https?://([^/?#]*)", expand=False)
    ah = abs_host.fillna("")            # NaN-free so boolean kernels stay bool
    abs_simple = (is_abs & ~dotty
                  & (ah == ah.str.lower())
                  & ~ah.str.contains(":", regex=False)
                  & ~ah.str.contains("@", regex=False))

    is_root = (~has_colon & nofrag.str.startswith("/")
               & ~nofrag.str.startswith("//") & ~dotty)
    is_rel = (~has_colon & ~nofrag.str.startswith("/")
              & ~nofrag.str.startswith(".") & ~dotty
              & (nofrag != "") & ~nofrag.str.startswith("?")
              & b_has_path)

    m = abs_simple.to_numpy(dtype=bool)
    if m.any():
        out[m] = nofrag[m].to_numpy(dtype=object)
        same[m] = (abs_host[m] == b_host[m]).to_numpy(dtype=bool)
    m = is_root.to_numpy(dtype=bool)
    if m.any():
        out[m] = (b_origin[m] + nofrag[m]).to_numpy(dtype=object)
        same[m] = True
    m = is_rel.to_numpy(dtype=bool)
    if m.any():
        out[m] = (b_dir[m] + "/" + nofrag[m]).to_numpy(dtype=object)
        same[m] = True

    rest = ~(abs_simple | is_root | is_rel).to_numpy(dtype=bool)
    if rest.any():
        canon = fallback or Canonicalizer(strict_rfc3986)
        ridx = np.nonzero(rest)[0]
        r_refs = refs.to_numpy(dtype=object)
        r_bases = bases.to_numpy(dtype=object)
        bh = b_host.to_numpy(dtype=object)
        for i in ridx:
            u = canon(r_refs[i], r_bases[i])
            out[i] = u
            same[i] = u is not None and host_of(u) == bh[i]
    return out, same


def make_relative_url(root_path: str, local_path: str) -> str:
    """Relativize ``local_path`` against dir of ``root_path``
    (internal/models.go:233-249)."""
    from_dir = posixpath.dirname(root_path) or "."
    try:
        rel = posixpath.relpath(local_path, from_dir)
    except ValueError:
        return "./" + posixpath.basename(local_path)
    if not rel.startswith("."):
        rel = "./" + rel
    return rel
