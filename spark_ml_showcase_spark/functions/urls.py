"""URL canonicalization for web-corpus pipelines (X113).

The first stage of every CCNet/RefinedWeb-style dedup pipeline: two
fetches of the same page rarely carry byte-identical URLs (tracking
params, case-variant scheme/host, default ports, fragments, trailing
slashes), so URL-level dedup without canonicalization systematically
under-merges. Not present in the reference (no URL surface in its four
scripts); built as pure ``regexp_replace`` / ``regexp_extract`` column
expressions — whole-stage codegen, no UDF, no shuffle — kept to the
Java-regex ∩ RE2 common subset (NO lookaround: RE2 has none) so the
DuckDB oracle can run the literal same patterns. The only dialect
difference is replacement syntax (Spark ``$1`` vs DuckDB ``\\1``) and
DuckDB's explicit ``'g'`` flag, both already pinned conventions.

Canonical form (applied in THIS order — each step's regex assumes the
previous step's normal form):

1. trim surrounding ASCII whitespace
2. lowercase the scheme://authority prefix ONLY (paths are
   case-sensitive by RFC 3986; hosts and schemes are not)
3. drop the fragment (``#...`` never reaches the server)
4. drop tracking params (``utm_*``, ``ref``, ``fbclid``, ``gclid``) —
   via separator normalization: ``?`` → ``&`` so EVERY param owns its
   leading delimiter, one global ``&name=value`` removal (adjacent
   tracking params each match their own span — the naive
   ``name=value&`` form consumes the next param's anchor), then the
   first surviving ``&`` restores to ``?`` (``^``-anchored, so
   first-only even under global replace). A ``&`` or a second ``?``
   inside the path/query VALUE is out of contract.
5. strip scheme-default ports (``http…:80``, ``https…:443``)
6. strip the trailing path slash (``…/path/`` ≡ ``…/path``; also
   ``…/?q`` ≡ ``…?q``)

``url_host`` extracts the lowercased registrable host (optionally
``www.``-stripped) for host-level rollups.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking query parameters dropped by canonicalization — the
#: CCNet-style analytics noise set (alternation kept RE2-safe)
TRACKING_PARAM_RE = r"(utm_[a-z]+|ref|fbclid|gclid)"

#: scheme://authority prefix (group 1); authority stops at /, ?, #
_PREFIX_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"

#: ASCII whitespace, spelled out (r14 ADVICE): this is Java's ``\s``
#: exactly, but RE2's ``\s`` omits ``\x0b`` — writing the class
#: explicitly on BOTH sides keeps the trim step char-for-char equal
#: instead of resting on a dialect identity that does not hold.
_WS = r"[ \t\n\x0b\f\r]"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonicalize_url(col: str | Column) -> Column:
    """Canonical URL as a Column expression (steps documented in the
    module docstring). Every step is one codegen'd ``regexp_replace``;
    the lowercased prefix splice uses extract + substring so the PATH
    keeps its case."""
    u = F.regexp_replace(_c(col), rf"^{_WS}+|{_WS}+$", "")
    # 2: lowercase scheme://authority, splice the untouched remainder
    prefix = F.regexp_extract(u, _PREFIX_RE, 1)
    u = F.concat(F.lower(prefix), F.substring(u, F.length(prefix) + 1, 2**31 - 1))
    # 3: fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 4: tracking params via separator normalization (module docstring)
    u = F.regexp_replace(u, r"\?", "&")
    u = F.regexp_replace(u, r"&" + TRACKING_PARAM_RE + r"=[^&]*", "")
    u = F.regexp_replace(u, r"^([^&]*)&", r"$1?")
    # 5: scheme-default ports (the delimiter is captured, not a
    # lookahead — RE2 has no lookaround)
    u = F.regexp_replace(u, r"^(http://[^/?#:]+):80([/?]|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#:]+):443([/?]|$)", r"$1$2")
    # 6: trailing path slash; '/?' → '?'; root '/' folds too
    u = F.regexp_replace(u, r"/\?", "?")
    u = F.regexp_replace(u, r"(://[^/]+.*[^/])/$", r"$1")
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.\-]*://[^/?#]+)/$", r"$1")
    return u


def url_host(col: str | Column, *, strip_www: bool = True) -> Column:
    """Lowercased host of a CANONICAL url (port excluded); ``www.``
    stripped by default for host-level rollups."""
    h = F.regexp_extract(_c(col), r"^[a-z][a-z0-9+.\-]*://([^/?#:]+)", 1)
    return F.regexp_replace(h, r"^www\.", "") if strip_www else h


def duckdb_canonicalize_sql(expr: str) -> str:
    """The DuckDB twin of :func:`canonicalize_url` as a SQL fragment
    over ``expr`` — the LITERAL same patterns with DuckDB's ``\\1``
    replacement syntax and explicit 'g' flags, so oracle queries and
    tests share one definition instead of hand-copying the chain."""
    u = f"regexp_replace({expr}, '^{_WS}+|{_WS}+$', '', 'g')"
    prefix = f"regexp_extract({u}, '{_PREFIX_RE}', 1)"
    u = f"(lower({prefix}) || substring({u}, length({prefix}) + 1))"
    u = f"regexp_replace({u}, '#.*$', '')"
    u = f"regexp_replace({u}, '\\?', '&', 'g')"
    u = f"regexp_replace({u}, '&{TRACKING_PARAM_RE}=[^&]*', '', 'g')"
    u = f"regexp_replace({u}, '^([^&]*)&', '\\1?')"
    u = f"regexp_replace({u}, '^(http://[^/?#:]+):80([/?]|$)', '\\1\\2')"
    u = f"regexp_replace({u}, '^(https://[^/?#:]+):443([/?]|$)', '\\1\\2')"
    u = f"regexp_replace({u}, '/\\?', '?')"
    u = f"regexp_replace({u}, '(://[^/]+.*[^/])/$', '\\1')"
    u = f"regexp_replace({u}, '^([a-z][a-z0-9+.\\-]*://[^/?#]+)/$', '\\1')"
    return u


def duckdb_host_sql(expr: str, *, strip_www: bool = True) -> str:
    """DuckDB twin of :func:`url_host` over a canonical-url ``expr``."""
    h = f"regexp_extract({expr}, '^[a-z][a-z0-9+.\\-]*://([^/?#:]+)', 1)"
    return f"regexp_replace({h}, '^www\\.', '')" if strip_www else h
