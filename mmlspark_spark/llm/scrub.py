"""PII scrubbing + URL extraction for training-data pipelines.

Beyond the reference's surface (SURVEY north-star: the operations a
100 TB web-corpus pipeline needs before text reaches a trainer):
redaction of emails / phone numbers / IPv4 addresses / SSNs, and URL /
domain extraction for domain-level filtering — the standard scrub
stage of CCNet/RefinedWeb-style pipelines.

Scale design: everything here is a pure Catalyst ``regexp_replace`` /
``regexp_extract_all`` expression chain — map-only, whole-stage
codegen, zero shuffles; scrubbing 100 TB is embarrassingly parallel.
Patterns are written in the common subset of Java regex (Spark) and
RE2 (DuckDB/Go) so the SQL oracle runs the byte-identical semantics:
no backreferences, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Transformer

# Ordered: email first (its local part may contain digits/dots that
# later digit patterns would otherwise shred).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ip": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}

URL_PATTERN = r"https?://[^\s]+"
# optional userinfo ("user:pass@") is skipped — without it the capture
# stopped at the credential's ':' and returned the username as the
# "domain"; the host class also excludes '@' so a credentialed URL
# can never leak its userinfo into domain-level filtering
DOMAIN_PATTERN = r"https?://(?:[^/\s@]+@)?([^/\s:@]+)"


def redact_pii(text: Column | str, kinds=tuple(PII_PATTERNS),
               tokenFormat: str = "<{kind}>") -> Column:
    """Replace each PII kind with its redaction token (e.g.
    ``<EMAIL>``). Application order is the ``PII_PATTERNS`` order so
    composite strings (an email whose local part looks numeric) redact
    as the more specific kind first. Idempotent: tokens contain no
    redactable substrings."""
    col = F.col(text) if isinstance(text, str) else text
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII kind(s) {unknown!r}")
    # iterate in canonical PII_PATTERNS order regardless of how the
    # caller ordered `kinds`: running a later pattern first (ip before
    # email) shreds composite strings the documented email-first
    # ordering exists to protect
    wanted = set(kinds)
    for kind, pattern in PII_PATTERNS.items():
        if kind in wanted:
            col = F.regexp_replace(col, pattern,
                                   tokenFormat.format(kind=kind.upper()))
    return col


def extract_urls(text: Column | str) -> Column:
    """All http(s) URLs in the text, in order of appearance."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(col, F.lit(URL_PATTERN), 0)


def extract_domains(text: Column | str) -> Column:
    """Hostnames of all http(s) URLs (port and path stripped)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(col, F.lit(DOMAIN_PATTERN), 1)


class PIIRedactor(Transformer):
    """Map-only PII scrub stage: ``textCol`` → ``outputCol`` with the
    selected kinds replaced by redaction tokens."""

    def __init__(self, textCol: str = "text", outputCol: str = "redacted",
                 kinds=tuple(PII_PATTERNS), tokenFormat: str = "<{kind}>"):
        super().__init__(textCol=textCol, outputCol=outputCol,
                         kinds=tuple(kinds), tokenFormat=tokenFormat)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.textCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, T.StringType())])

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            self.outputCol,
            redact_pii(self.textCol, self.kinds, self.tokenFormat))


# Markup stripping — ordered chain (script/style bodies first, then
# tags, then entities, then whitespace normalization). Patterns stay
# in the Java-regex ∩ RE2 subset (non-greedy + (?s) are in both; no
# lookaround) so the DuckDB oracle runs byte-identical semantics.
_MARKUP_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?s)<script\b[^>]*>.*?</script>", " "),   # script incl. body
    (r"(?s)<style\b[^>]*>.*?</style>", " "),     # style incl. body
    (r"(?s)<!--.*?-->", " "),                    # comments
    (r"<[^>]+>", " "),                           # any remaining tag
    # entity decode — &amp; strictly LAST: decoding it first turns a
    # double-escaped '&amp;lt;' (the literal text "&lt;") into '&lt;'
    # which the later steps would then decode AGAIN to '<'. With &amp;
    # last, each entity decodes exactly once.
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;|&apos;", "'"),
    (r"&amp;", "&"),
    (r"\s+", " "),                               # collapse whitespace
)


def strip_markup(text: Column | str) -> Column:
    """HTML/markup → plain text: drop script/style bodies, comments
    and tags, decode the common entities, collapse whitespace. The
    standard pre-tokenization cleanup of web-extracted corpora
    (trafilatura-lite); map-only regexp chain, zero shuffles."""
    col = F.col(text) if isinstance(text, str) else text
    for pattern, repl in _MARKUP_STEPS:
        col = F.regexp_replace(col, pattern, repl)
    return F.trim(col)


class MarkupStripper(Transformer):
    """Map-only markup-strip stage: ``textCol`` → ``outputCol`` via
    :func:`strip_markup`."""

    def __init__(self, textCol: str = "text", outputCol: str = "clean"):
        super().__init__(textCol=textCol, outputCol=outputCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.textCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, T.StringType())])

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.outputCol, strip_markup(self.textCol))


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL form for URL-keyed dedup / domain aggregation:
    lowercase scheme+host, default port stripped (http:80 / https:443),
    fragment dropped, tracking params removed (utm_*, fbclid, gclid),
    remaining query params SORTED, trailing path slashes collapsed
    (empty path → ``/``). Path case and param values are preserved —
    they are significant to most origin servers.

    Pure column expressions over conservative regex character classes
    (``[^/?#]`` etc.) that mean the same thing in Java regex and
    DuckDB's RE2, so the ``url_canonicalize`` catalog query replays the
    whole normalization hash-exact. Map-only at any scale: canonical
    keys make URL dedup an exact groupBy instead of a fuzzy match.
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    # anchor: the '?' must PRECEDE any '#' — a bare \?([^#]*) would
    # match a '?' inside the fragment ('/p#sec?x=1' → query 'x=1'),
    # resurrecting dropped fragment content as query params
    query = F.regexp_extract(u, r"^[^#?]*\?([^#]*)", 1)
    keep = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit(""))
        & ~p.rlike(r"^(utm_[^=]*|fbclid|gclid)=")))
    qs = F.concat_ws("&", keep)
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path_norm = F.coalesce(
        F.nullif(F.regexp_replace(path, r"/+$", ""), F.lit("")),
        F.lit("/"))
    return F.concat(
        scheme, F.lit("://"), host, port_part, path_norm,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")))
