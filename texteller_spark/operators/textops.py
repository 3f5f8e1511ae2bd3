"""Text analysis for training-data curation — all pure JVM column
expressions (whole-stage-codegen'd; no Python anywhere), so they run at
scan speed and their filters push down.

Provided: whitespace+BPE-ish token counting, language-ID heuristic
(stopword n-gram voting), quality scoring (length/punctuation/stopword
ratios), content fingerprinting (md5 head digest — engine-portable,
unlike engine-native ``hash()``), URL parsing/normalization (host,
registrable domain, canonical form — the per-host curation keys every
crawl pipeline groups by), and Gopher-style repetition signals
(duplicate-segment fraction, symbol-to-word ratio — the public
repetition-filter rules from the Gopher/MassiveText papers, linear-time
per row so they run at scan speed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "bpe_ish_token_count",
    "lang_id",
    "quality_score",
    "fingerprint",
    "url_host",
    "registrable_domain",
    "url_normalize",
    "dup_segment_fraction",
    "symbol_word_ratio",
    "curation_columns",
    "pii_counts",
    "redact_pii",
    "gopher_flags",
    "STOPWORDS_EN",
    "PII_PATTERNS",
]

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")
_STOP_DE = ("der", "die", "das", "und", "ist", "mit", "für")
_STOP_ES = ("el", "la", "los", "de", "que", "y", "es")


def token_count(text: Column, trimmed: Column | None = None) -> Column:
    """Whitespace token count (0 for empty/blank). ``trimmed``, when given,
    must be ``trim(text)`` computed once by the caller."""
    t = F.trim(text) if trimmed is None else trimmed
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored estimate: alphanumeric runs + each punctuation mark is a
    token, long words pay extra (≈ subword splits every 6 chars)."""
    words = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+"), 0))
    punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\sA-Za-z0-9]"), 0))
    extra = F.aggregate(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]{7,}"), 0),
        F.lit(0),
        lambda acc, w: acc + F.floor(F.length(w) / 6).cast("int"),
    )
    return words + punct + extra


def _stop_hits(words: Column, stops: tuple[str, ...]) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*stops)))


def lang_id(text: Column, words: Column | None = None) -> Column:
    """Language heuristic → 'zh' | 'en' | 'de' | 'es' | 'unk'. CJK script
    detection first (>5% Han characters — the reference's OCR is en/zh,
    README.md:99-101), then stopword voting for the Latin-script languages.
    Pure JVM expressions; mirrored exactly by the DuckDB oracle.

    ``words``, when given, must be ``split(lower(text), '\\s+')`` computed
    once by the caller — the composed ``curation_columns`` pass shares it
    across signals instead of re-splitting per signal (measured 2× on the
    100k-page corpus)."""
    han = F.length(F.regexp_replace(text, "[^一-鿿]", ""))
    if words is None:
        words = F.split(F.lower(text), r"\s+")
    en, de, es = (
        _stop_hits(words, STOPWORDS_EN),
        _stop_hits(words, _STOP_DE),
        _stop_hits(words, _STOP_ES),
    )
    return (
        F.when(han * 20 > F.greatest(F.length(text), F.lit(1)), F.lit("zh"))
        .when((en >= de) & (en >= es) & (en > 0), F.lit("en"))
        .when((de >= es) & (de > 0), F.lit("de"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("unk"))
    )


def quality_score(text: Column, words: Column | None = None) -> Column:
    """[0,1] quality heuristic: length band + stopword presence − punctuation
    excess. Deterministic, engine-portable arithmetic only. ``words`` as in
    :func:`lang_id`."""
    n = F.length(text)
    if words is None:
        words = F.split(F.lower(text), r"\s+")
    n_words = F.size(words)
    stop_ratio = _stop_hits(words, STOPWORDS_EN) / F.greatest(n_words, F.lit(1))
    punct = F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))
    punct_ratio = punct / F.greatest(n, F.lit(1))
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    # no per-row rounding: engines differ in rounding mode at .5 boundaries;
    # round only final aggregates
    return (
        F.lit(0.4) * len_score
        + F.lit(0.4) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
    )


#: host-extraction pattern: scheme, optional userinfo, then the host label
#: run (stops at port/path/query/fragment). Kept regex-simple so the DuckDB
#: oracle evaluates the IDENTICAL pattern.
_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"

#: multi-label public suffixes recognized by the registrable-domain
#: heuristic (the high-traffic entries; a production deployment broadcasts
#: the full public-suffix list — the shape of the expression is unchanged)
_TWO_LABEL_SUFFIXES = ("co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "com.br", "co.in")


def url_host(url: Column) -> Column:
    """Lowercased host of a URL ('' when unparseable) — the key every
    per-site curation stage (host-level dedup, domain quotas, blocklists)
    groups on."""
    return F.regexp_extract(F.lower(url), _HOST_RE, 1)


def registrable_domain(url: Column, host: Column | None = None) -> Column:
    """Registrable domain (eTLD+1 heuristic): last two host labels, or
    three when the host ends in a known two-label public suffix. ``host``,
    when given, must be :func:`url_host` computed once by the caller."""
    if host is None:
        host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    two = F.concat_ws(".", F.slice(parts, F.greatest(n - 1, F.lit(1)), 2))
    three = F.concat_ws(".", F.slice(parts, F.greatest(n - 2, F.lit(1)), 3))
    is_two_label_suffix = two.isin(*_TWO_LABEL_SUFFIXES)
    return F.when(n >= 3, F.when(is_two_label_suffix, three).otherwise(two)).otherwise(host)


def url_normalize(url: Column) -> Column:
    """Canonical URL: lowercase scheme+host, default ports (:80/:443)
    stripped, fragment dropped, trailing '?' removed. A lone trailing '/'
    on a bare host is deliberately KEPT ('https://localhost/' is already a
    distinct canonical form; pinned in test_url_ops_values). Deterministic
    string surgery only — both engines compute the identical value, so
    normalized URLs are cross-system dedup keys."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    # lowercase scheme://host (the prefix up to the first '/', '?' past the
    # scheme) while preserving path/query case
    head = F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]*)", 1)
    tail = F.substring(no_frag, F.length(head) + 1, F.lit(1 << 30))
    canon_head = F.regexp_replace(F.lower(head), r":(80|443)$", "")
    out = F.concat(canon_head, tail)
    out = F.regexp_replace(out, r"\?$", "")
    return F.when(F.length(head) == 0, no_frag).otherwise(out)


def dup_segment_fraction(
    text: Column, sep: str = r"\.\s+", trimmed: Column | None = None
) -> Column:
    """Fraction of repeated segments (sentence-granular by default) — the
    duplicate-line repetition rule of the public Gopher/MassiveText filters
    projected onto single-line web text. Linear per row. ``trimmed`` as in
    :func:`token_count`."""
    t = F.trim(text) if trimmed is None else trimmed
    segs = F.filter(F.split(t, sep), lambda s: F.length(s) > 0)
    n = F.size(segs)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        (n - F.size(F.array_distinct(segs))) / n.cast("double")
    )


def symbol_word_ratio(text: Column, tokens: Column | None = None) -> Column:
    """Symbol-to-word ratio (hash marks / ellipses per token) — the Gopher
    symbol-ratio rule; high values flag navigation/boilerplate debris.
    ``tokens``, when given, must be :func:`token_count` of the same text."""
    syms = F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\.|…"), 0))
    if tokens is None:
        tokens = token_count(text)
    return syms / F.greatest(tokens, F.lit(1)).cast("double")


#: PII patterns, ordered — emails first (their local parts would otherwise
#: be half-eaten by the phone rule), then IPv4, then international-ish
#: phone runs. Every pattern is valid and IDENTICAL under both java.util
#: .regex and RE2 (DuckDB): no lookaround, no backrefs, ASCII `\b`/`\d` —
#: the oracle evaluates the same literal strings.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d[\d -]{6,14}\d", "[PHONE]"),
)


def pii_counts(text: Column) -> list[Column]:
    """Per-kind PII match counts (``n_email``, ``n_ip``, ``n_phone``) — the
    audit half of PII handling: a corpus report of how much leaks where,
    cheap enough to run on every ingest. Pure JVM ``regexp_extract_all``;
    counts are taken on the PROGRESSIVELY REDACTED text exactly as
    :func:`redact_pii` sees it, so ``n_ip`` never double-counts the digits
    of an already-matched email and the counts always sum to the number of
    placeholders the redacted text carries."""
    out = []
    cur = text
    for name, pat, repl in PII_PATTERNS:
        out.append(F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return out


def redact_pii(text: Column) -> Column:
    """Replace emails / IPv4s / phone-number runs with typed placeholders
    (``[EMAIL]``/``[IP]``/``[PHONE]``) — the standard web-corpus scrub
    (BigScience/ROOTS-style) as three chained ``regexp_replace`` passes that
    stay inside whole-stage codegen. Idempotent: placeholders contain no
    digits or ``@``, so a second pass matches nothing."""
    cur = text
    for _name, pat, repl in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, repl)
    return cur


def gopher_flags(text: Column, words: Column | None = None) -> list[Column]:
    """The published Gopher/MassiveText document-quality rules as one list
    of boolean columns plus the composite ``keep``: word count in
    [50, 100000], mean word length in [3, 10], symbol-to-word ratio < 0.1,
    duplicate-segment fraction < 0.3, and ≥ 2 DISTINCT English stopwords
    present. All scan-speed JVM expressions sharing one split (pass
    ``words`` = ``split(lower(text), '\\s+')`` to share it further);
    filters on ``keep`` push down to the parquet scan."""
    if words is None:
        words = F.split(F.lower(text), r"\s+")
    trimmed = F.trim(text)
    n_words = token_count(text, trimmed=trimmed)
    alpha_chars = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    mean_wl = alpha_chars / F.greatest(n_words, F.lit(1)).cast("double")
    distinct_stops = F.size(
        F.array_distinct(F.filter(words, lambda w: w.isin(*STOPWORDS_EN)))
    )
    ok_words = (n_words >= 50) & (n_words <= 100000)
    ok_wl = (mean_wl >= 3.0) & (mean_wl <= 10.0)
    ok_sym = symbol_word_ratio(text, tokens=n_words) < 0.1
    ok_dup = dup_segment_fraction(text, trimmed=trimmed) < 0.3
    ok_stop = distinct_stops >= 2
    return [
        ok_words.alias("ok_word_count"),
        ok_wl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_dup.alias("ok_dup_segments"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_wl & ok_sym & ok_dup & ok_stop).alias("keep"),
    ]


def curation_columns(df, url_col: str = "url", text_col: str = "text"):
    """The full curation-signal pass — host, registrable domain, canonical
    URL, token count, quality, lang-id, repetition signals, fingerprint —
    in ONE scan with the expensive shared subexpressions (host extraction,
    the lowercased whitespace split, trim) computed once per row via an
    intermediate projection instead of once per signal. Value-identical to
    calling the individual functions (pinned by
    ``tests/test_ops.py::test_curation_columns_match_individual_signals``);
    measured ~2× faster on the 100k-page corpus (the plan drops from 24 to
    14 ``split`` sites). At 100 TB this is the difference between one and
    two regex passes over every byte of text."""
    url, text = F.col(url_col), F.col(text_col)
    base = df.select(
        "*",
        url_host(url).alias("__host"),
        F.split(F.lower(text), r"\s+").alias("__words"),
        F.trim(text).alias("__trim"),
    )
    host, words, trimmed = F.col("__host"), F.col("__words"), F.col("__trim")
    tokens = token_count(text, trimmed=trimmed)
    return base.select(
        host.alias("host"),
        registrable_domain(url, host=host).alias("domain"),
        url_normalize(url).alias("norm_url"),
        tokens.alias("tokens"),
        quality_score(text, words=words).alias("quality"),
        lang_id(text, words=words).alias("lang_id"),
        dup_segment_fraction(text, trimmed=trimmed).alias("dup_frac"),
        symbol_word_ratio(text, tokens=tokens).alias("sym_ratio"),
        fingerprint(text).alias("fp"),
    )


def fingerprint(text: Column, head: int = 64) -> Column:
    """Portable content fingerprint: md5 of (length || first ``head`` chars).
    Same literal value in any engine — usable as a cross-system dedup key."""
    return F.md5(F.concat(F.length(text).cast("string"), F.lit(":"), F.substring(text, 1, head)))
