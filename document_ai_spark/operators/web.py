"""Web-corpus hygiene: PII redaction and URL/domain statistics.

Two operators every web-scale pretraining pipeline runs between crawl
and tokenizer (beyond the reference's own surface — the reference
extracts fields from trusted documents and never redacts; a 10^12-doc
web corpus must):

- ``scrub_pii`` — replace e-mail addresses, international phone numbers
  and IPv4 addresses with typed placeholder tokens and count what was
  removed per document. Pure ``regexp_replace``/``regexp_extract_all``
  JVM expressions (whole-stage codegen, zero Python, zero shuffle); the
  patterns are kept inside the Java-regex ∩ RE2 common subset (no
  lookaround, no backreferences, explicit character classes) so the
  DuckDB oracle computes bit-identical output.
- ``extract_urls`` / ``domain_stats`` — pull ``https://host/...`` links
  out of document text and aggregate per registrable domain (last two
  host labels). This is the C4/CommonCrawl domain-histogram job: a
  map-side explode followed by ONE hash aggregation on a low-cardinality
  domain key with map-side partial aggregation, so at 10^12 docs the
  shuffle carries (domain, partial count) rows only — never text.

Scale shape: both operators are single-scan. ``scrub_pii`` adds no
exchange at all; ``domain_stats`` adds the two tiny exchanges of an
exact distinct-agg ((domain, doc_id) then (domain) — key + partial
count rows only). Placeholder tokens contain no ``@``/digit-dot runs, so scrubbing
is idempotent — re-running the pass over an already-scrubbed corpus is
a no-op (pinned by test).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenize import WS_RANGES as _WS_CLASS

# Patterns shared verbatim with the DuckDB oracle (__spark_entry__.py).
# Leftmost-first vs leftmost-longest ambiguity is avoided by making each
# quantifier's extent unambiguous at any match start: the e-mail local
# part / host greedily absorb their class, the phone groups are
# digit-run bounded, the IPv4 octets are \b-delimited.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+"
PHONE_PATTERN = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{3,4})?"
IPV4_PATTERN = (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b")

# (column suffix, pattern, replacement token), applied in order. E-mail
# runs before IPv4 so a host like user@10.0.0.1 redacts as one <EMAIL>
# rather than a dangling local part plus an <IP>.
PII_RULES = (
    ("email", EMAIL_PATTERN, "<EMAIL>"),
    ("phone", PHONE_PATTERN, "<PHONE>"),
    ("ipv4", IPV4_PATTERN, "<IP>"),
)

URL_PATTERN = r"https?://([A-Za-z0-9.-]+)/"
DOMAIN_PATTERN = r"([A-Za-z0-9-]+\.[A-Za-z0-9-]+)$"


# C4 cleaning heuristics (Raffel et al. 2020 §2.2), shared verbatim
# with the DuckDB oracle. Policy phrases are matched lowercase as plain
# substrings (no regex); the terminal-punctuation class is the
# published set {. ! ? "} spelled \x{hhhh} for Java/RE2 parity.
C4_POLICY_PHRASES = ("terms of use", "privacy policy", "cookie policy",
                     "uses cookies", "use of cookies", "use cookies")
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3


def c4_clean(docs: DataFrame, text_col: str = "text",
             min_line_words: int = C4_MIN_LINE_WORDS,
             min_kept_lines: int = C4_MIN_KEPT_LINES) -> DataFrame:
    """The C4 line/page cleaning rules (Raffel et al. 2020 §2.2) — the
    third published curation canon next to Gopher (selection.py
    gopher_rules + textquality.ngram_repetition) and CCNet
    (perplexity_buckets):

    line KEPT iff it ends in terminal punctuation (. ! ? \"), has >=
    min_line_words whitespace-separated words (C4's English-centric
    definition — deliberately NOT the script-aware tokenizer, matching
    the published rule), does not contain the word 'javascript', and
    contains no cookie/policy boilerplate phrase (lowercased substring
    match). Page DROPPED (c4_keep = false) iff its text contains '{'
    (code), contains 'lorem ipsum' (placeholder), or fewer than
    min_kept_lines lines survive — the paper's ">= 3 sentences" stated
    on kept lines, each of which ends in terminal punctuation (the
    documented approximation).

    Emits text_clean (kept lines re-joined), per-rule counters and the
    page verdict; the (kind='dirty-word list') rule is out of scope —
    noted, not silently skipped. Pure map-side HOFs over one line
    split — ZERO exchanges, whole-stage codegen, no Python."""
    lines = F.split(F.col(text_col), "\n")
    # Every predicate references the lambda line var only — one filter
    # pass; trim once per line inside the lambda.
    policy = list(C4_POLICY_PHRASES)

    def line_ok(line):
        t = F.trim(line)
        lt = F.lower(t)
        ok = t.rlike(r'[.!?\x{22}]$')
        n_words = F.size(F.filter(
            F.split(t, f"[{_WS_CLASS}]+"), lambda x: x != ""))
        ok = ok & (n_words >= min_line_words)
        ok = ok & ~lt.rlike(r"(^|[^a-z])javascript([^a-z]|$)")
        for p in policy:
            ok = ok & ~lt.contains(p)
        return ok

    staged = (docs
              .withColumn("_lines", lines)
              .withColumn("_kept", F.filter(F.col("_lines"), line_ok)))
    lt_all = F.lower(F.col(text_col))
    return (staged.select(
        "doc_id",
        F.array_join("_kept", "\n").alias("text_clean"),
        F.size("_lines").cast("long").alias("n_lines"),
        F.size("_kept").cast("long").alias("n_kept_lines"),
        F.col(text_col).contains("{").alias("has_brace"),
        lt_all.contains("lorem ipsum").alias("has_lorem"),
        ((F.size("_kept") >= min_kept_lines)
         & ~F.col(text_col).contains("{")
         & ~lt_all.contains("lorem ipsum")).alias("c4_keep")))


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact e-mail / phone / IPv4 occurrences in ``text_col``.

    Returns the input with ``text_col`` replaced by the scrubbed text
    plus one ``n_<kind>`` BIGINT count column per rule. Counts are taken
    on the ORIGINAL text (before any replacement) so rule order cannot
    shadow a count; replacement is sequential in PII_RULES order.

    Every added expression references its input exactly once, so the
    whole operator is a single narrow projection — no shuffle, no
    Python, safe to fuse with any up/downstream stage.
    """
    text = F.col(text_col)
    counts = [
        # NULL text -> NULL count (SQL semantics; Spark's size() alone
        # would yield -1 on the null array and diverge from the oracle).
        F.when(text.isNotNull(),
               F.size(F.regexp_extract_all(text, F.lit(pat), 0)))
         .cast("long").alias(f"n_{kind}")
        for kind, pat, _rep in PII_RULES
    ]
    scrubbed = text
    for _kind, pat, rep in PII_RULES:
        scrubbed = F.regexp_replace(scrubbed, pat, rep)
    others = [F.col(c) for c in docs.columns if c != text_col]
    return docs.select(*others, scrubbed.alias(text_col), *counts)


def extract_urls(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode one row per ``https://host/`` link found in ``text_col``.

    Output: (doc_id, host, domain) where domain is the registrable
    suffix (last two host labels). Map-side only — the explode happens
    inside the scan's projection; no exchange is introduced here.
    """
    hosts = F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 1)
    return (docs
            .select("doc_id", F.explode(hosts).alias("host"))
            .withColumn("domain",
                        F.regexp_extract(F.col("host"), DOMAIN_PATTERN, 1)))


def domain_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-registrable-domain URL and document counts.

    Exact count_distinct(doc_id) plans as the standard two-phase
    distinct aggregate: one exchange keyed (domain, doc_id), then one
    keyed (domain) — both shuffles carry key + partial-count rows only,
    never text (plan-pinned by test). The classic crawl-curation
    histogram used for domain-level filtering/balancing decisions.
    """
    return (extract_urls(docs, text_col)
            .groupBy("domain")
            .agg(F.count("*").alias("n_urls"),
                 F.countDistinct("doc_id").alias("n_docs"))
            .orderBy("domain"))


# -- URL canonicalization / URL-level dedup --------------------------------
# The C4 / CommonCrawl page-identity rule: one kept document per
# canonical URL. All patterns live in the Java ∩ RE2 subset (no
# lookaround) so the DuckDB oracle (`url_dedup`) replays them verbatim
# (with the 'g' flag — DuckDB's regexp_replace is first-match by
# default, Spark's is global).

SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"
TRACKING_RE = r"(utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*"


def canonical_url(col) -> "F.Column":
    """Canonical form of a URL column: lowercase scheme + host, strip
    fragment / 'www.' / the scheme's default port / tracking params
    (utm_*, fbclid, gclid) / the trailing slash. NULL when the value
    does not parse as scheme://host (callers keep such rows as their
    own dedup group).

    Pure regexp expressions — map-side, whole-stage codegen, no UDF.
    Separator repair after param removal is ordered: collapse '&&',
    then '?&' -> '?', then strip a trailing '?'/'&', then '/?' -> '?'
    and a trailing '/' (so 'ex.com/p/' == 'ex.com/p', and 'ex.com/'
    == 'ex.com' at the root)."""
    u = F.regexp_replace(col, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, HOST_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = (F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
             .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
             .otherwise(host))
    q = F.regexp_extract(u, REST_RE, 1)
    q = F.regexp_replace(q, TRACKING_RE, "")
    q = F.regexp_replace(q, "&&+", "&")
    q = F.regexp_replace(q, r"\?&", "?")
    q = F.regexp_replace(q, "[?&]$", "")
    q = F.regexp_replace(q, r"/\?", "?")
    q = F.regexp_replace(q, "/$", "")
    return (F.when((scheme != "") & (host != ""),
                   F.concat(scheme, F.lit("://"), host, q))
            .otherwise(F.lit(None).cast("string")))


def url_dedup(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-document URL-identity dedup verdict: the input plus
    ``canon_url`` and ``keep_doc_id`` (min doc_id sharing the canonical
    URL — first-seen-wins, the exact_duplicates rule). A doc survives
    the C4 page-identity pass iff doc_id == keep_doc_id; unparseable
    URLs (canon_url NULL) are always their own keeper.

    Scale shape: canonicalization is map-side; the only exchange is the
    window's hash partition on canon_url (URL-sized keys, no text).
    Skew note: at web scale a single hot canonical URL (e.g. a crawl
    artifact) concentrates one partition — the window computes only
    min(doc_id) over it (no buffering of rows in memory beyond the
    sort), so the worst case is one task sorting that key's rows."""
    from pyspark.sql import Window
    out = docs.withColumn("canon_url", canonical_url(F.col(url_col)))
    w = Window.partitionBy("canon_url")
    keep = (F.when(F.col("canon_url").isNull(), F.col("doc_id"))
             .otherwise(F.min("doc_id").over(w)))
    return out.withColumn("keep_doc_id", keep)
