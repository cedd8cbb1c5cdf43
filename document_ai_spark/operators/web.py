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

from ..functions.tokenize import WS_RANGES as _WS_CLASS, ws_trim

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
        t = ws_trim(line)
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
    window's hash partition on the dedup key (URL-sized keys, no text).
    NULL canon_urls do NOT share a window partition: real crawls carry
    large unparseable fractions (relative links, mailto:, artifacts)
    and window partitioning groups every NULL key into ONE task — so
    the partition key falls back to a per-doc unique string for them
    (each is its own singleton keeper anyway; the verdict is identical,
    the straggler is gone). Skew note: a single hot canonical URL
    (e.g. a crawl artifact) still concentrates one partition — the
    window computes only min(doc_id) over it (no buffering of rows in
    memory beyond the sort), so the worst case is one task sorting
    that key's rows."""
    from pyspark.sql import Window
    out = docs.withColumn("canon_url", canonical_url(F.col(url_col)))
    # chr(0) prefix keeps the fallback keys disjoint from real URLs
    w = Window.partitionBy(F.coalesce(
        "canon_url", F.concat(F.lit("\x00"), F.col("doc_id"))))
    keep = (F.when(F.col("canon_url").isNull(), F.col("doc_id"))
             .otherwise(F.min("doc_id").over(w)))
    return out.withColumn("keep_doc_id", keep)


# -- FineWeb custom quality filters -----------------------------------------
# Penedo et al. 2024 ("The FineWeb Datasets") §3.4: the three filters
# FineWeb derived on top of C4/Gopher, plus the newline/word ratio, with
# the published thresholds. Comparators are spelled exactly as below
# (keep iff every ratio is on the keep side, boundary inclusive on the
# keep side) and shared verbatim with the DuckDB oracle.
FW_STOP_CHARS_RE = r'[.\x{27}\x{22}!?]$'   # . ' " ! ?  (raw line end)
FW_LINE_PUNCT_MIN = 0.12     # keep iff punct-ending line ratio >= this
FW_SHORT_LINE_LEN = 30       # a "short" line has length(line) <= this
FW_SHORT_LINE_MAX = 0.67     # keep iff short-line ratio <= this
FW_DUP_CHAR_MAX = 0.01       # keep iff duplicated-line char frac <= this
FW_NEWLINE_WORD_MAX = 0.3    # keep iff (n_lines-1)/n_words <= this


def fineweb_filters(docs: DataFrame, text_col: str = "text",
                    line_punct_min: float = FW_LINE_PUNCT_MIN,
                    short_line_max: float = FW_SHORT_LINE_MAX,
                    dup_char_max: float = FW_DUP_CHAR_MAX,
                    newline_word_max: float = FW_NEWLINE_WORD_MAX,
                    ) -> DataFrame:
    """The FineWeb custom quality filters (Penedo et al. 2024 §3.4) as
    one relational pass: per doc the punct-ending line ratio, the
    short-line (<= 30 chars) ratio, the duplicated-line char fraction
    (chars in occurrences BEYOND the first of each non-empty line,
    over total line chars — the find_duplicates definition), and the
    newline/word ratio; ``fineweb_keep`` ands the four published
    thresholds. Words are whitespace-split (the C4-English convention
    for these line rules — deliberately not the script-aware
    tokenizer; documented, matching c4_clean).

    Scale shape: ONE corpus scan. Lines explode to (doc_id, md5(line),
    flags, chars, words) — the shuffle carries 16-byte line keys plus
    small ints, never line text — then two hash aggregations with
    map-side partials: (doc_id, lk) -> occurrence count, and doc_id ->
    the four ratios. Same bounded-per-task shape as repetition_stats:
    an adversarial 10^6-line doc costs O(lines) map work and O(distinct
    lines) agg state, never O(lines^2) as a per-doc HOF scan would.
    Ratios are exact-integer divisions rounded to 6; the keep verdict
    gates on the rounded values so both engines agree at thresholds."""
    ws = f"[{_WS_CLASS}]+"
    per_line = (docs
                .select("doc_id",
                        F.explode(F.split(F.col(text_col), "\n"))
                        .alias("_l"))
                .select(
                    "doc_id",
                    F.md5(F.col("_l")).alias("lk"),
                    F.length("_l").alias("chars"),
                    F.col("_l").rlike(FW_STOP_CHARS_RE).alias("punct"),
                    (F.length("_l") <= FW_SHORT_LINE_LEN).alias("short"),
                    (ws_trim(F.col("_l")) != "").alias("nonempty"),
                    F.size(F.filter(F.split(F.col("_l"), ws),
                                    lambda x: x != "")).alias("words")))
    grouped = (per_line
               .groupBy("doc_id", "lk")
               .agg(F.count(F.lit(1)).alias("cnt"),
                    F.first("chars").alias("chars"),
                    F.first("punct").alias("punct"),
                    F.first("short").alias("short"),
                    F.first("nonempty").alias("nonempty"),
                    F.first("words").alias("words")))
    n_lines = F.sum("cnt")
    n_words = F.sum(F.col("cnt") * F.col("words"))
    tot_chars = F.sum(F.col("cnt") * F.col("chars"))
    dup_chars = F.sum(F.when(F.col("nonempty"),
                             (F.col("cnt") - 1) * F.col("chars"))
                      .otherwise(F.lit(0)))
    # Ratios are rounded to 6 (the repetition_stats convention) and the
    # keep verdict compares the ROUNDED values, so both engines gate on
    # byte-identical doubles.
    agg = (grouped.groupBy("doc_id").agg(
        n_lines.alias("n_lines"),
        n_words.alias("n_words"),
        F.round(
            F.sum(F.when(F.col("punct"), F.col("cnt")).otherwise(F.lit(0)))
            / n_lines, 6).alias("line_punct_ratio"),
        F.round(
            F.sum(F.when(F.col("short"), F.col("cnt")).otherwise(F.lit(0)))
            / n_lines, 6).alias("short_line_frac"),
        F.round(
            F.when(tot_chars > 0, dup_chars / tot_chars)
            .otherwise(F.lit(0.0)), 6).alias("dup_line_char_frac"),
        F.round(
            F.when(n_words > 0, (n_lines - 1) / n_words)
            .otherwise(F.lit(0.0)), 6).alias("newline_word_ratio")))
    return agg.withColumn(
        "fineweb_keep",
        (F.col("line_punct_ratio") >= line_punct_min)
        & (F.col("short_line_frac") <= short_line_max)
        & (F.col("dup_line_char_frac") <= dup_char_max)
        & (F.col("newline_word_ratio") <= newline_word_max))


# -- RefinedWeb line-wise corrections ---------------------------------------
# Penedo et al. 2023 ("The RefinedWeb Dataset for Falcon LLM") App. G.2:
# drop a LINE if it is mainly uppercase, only numeric, a social-media
# counter, or a single word; drop the DOC if the removed lines account
# for more than 5% of its characters. [A-Z]/[A-Za-z] are deliberately
# ASCII classes (the published rule targets Latin-script shouting);
# non-Latin lines have zero alpha chars and are never "mainly upper".
RW_COUNTER_RE = (r'^[0-9]+ *(likes?|shares?|comments?|views?|'
                 r'followers?|retweets?|upvotes?|subscribers?)$')
RW_MAX_REMOVED_FRAC = 0.05


def refinedweb_lines(docs: DataFrame, text_col: str = "text",
                     max_removed_frac: float = RW_MAX_REMOVED_FRAC,
                     ) -> DataFrame:
    """RefinedWeb line-wise corrections (Penedo et al. 2023 App. G.2):
    emits ``text_clean`` (surviving lines re-joined), per-doc line and
    char counts, ``removed_char_frac`` and the ``rw_keep`` verdict
    (keep iff removed chars <= 5% of line chars; newlines excluded
    from both sides so the fraction is over visible text).

    A line is dropped iff (trimmed): mainly uppercase (ASCII alpha
    chars exist and more than half are A-Z), only digits, a
    social-counter phrase ('3 likes'), or a single word (non-empty,
    no internal whitespace). Pure map-side HOFs over one line split —
    ZERO exchanges, whole-stage codegen; the drop predicate runs a
    bounded number of times per line (kept-filter, counts), the same
    accepted re-eval budget as c4_clean."""
    ws_probe = f"[{_WS_CLASS}]"

    def dropped(line):
        t = ws_trim(line)
        lt = F.lower(t)
        alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
        upper = F.length(F.regexp_replace(t, "[^A-Z]", ""))
        mainly_upper = (alpha > 0) & (upper * 2 > alpha)
        numeric_only = t.rlike("^[0-9]+$")
        counter = lt.rlike(RW_COUNTER_RE)
        one_word = (t != "") & ~t.rlike(ws_probe)
        return mainly_upper | numeric_only | counter | one_word

    staged = (docs
              .withColumn("_lines", F.split(F.col(text_col), "\n"))
              .withColumn("_kept",
                          F.filter(F.col("_lines"),
                                   lambda l: ~dropped(l))))
    tot = F.aggregate("_lines", F.lit(0).cast("long"),
                      lambda acc, l: acc + F.length(l))
    kept = F.aggregate("_kept", F.lit(0).cast("long"),
                       lambda acc, l: acc + F.length(l))
    out = staged.select(
        "doc_id",
        F.array_join("_kept", "\n").alias("text_clean"),
        F.size("_lines").cast("long").alias("n_lines"),
        (F.size("_lines") - F.size("_kept")).cast("long")
        .alias("n_removed_lines"),
        tot.alias("tot_chars"),
        F.round(F.when(tot > 0, (tot - kept) / tot).otherwise(F.lit(0.0)),
                6).alias("removed_char_frac"))
    return out.withColumn(
        "rw_keep", F.col("removed_char_frac") <= max_removed_frac)


# -- URL-level blocklist filtering ------------------------------------------
# The FineWeb/RefinedWeb URL filtering stage (both cite the public UT1
# blocklist): a document is blocked when its URL's registrable domain
# is on the blocklist, or when enough "soft" banned words appear as
# substrings anywhere in the lowercased URL. The word list below is a
# deliberately small demonstration set; production swaps in the full
# public lists via the same two parameters.
BANNED_URL_WORDS = ("porn", "xxx", "sex", "casino", "poker", "viagra",
                    "escort", "adult")
URL_SOFT_MAX = 2   # blocked when >= this many distinct soft words hit


def url_block(docs: DataFrame, blocklist: DataFrame,
              url_col: str = "url",
              banned_words: tuple = BANNED_URL_WORDS,
              soft_max: int = URL_SOFT_MAX) -> DataFrame:
    """URL blocklist verdict per document: parse the registrable
    domain out of ``url_col``, mark ``domain_blocked`` via the
    ``blocklist(domain)`` dim table, count distinct soft banned words
    appearing as substrings of the lowercased URL, and emit
    ``url_keep`` (no domain hit AND soft_hits < soft_max).

    Scale shape: domain parsing and soft-word counting are map-side
    expressions (the word list is a bounded literal array probed with
    one filter pass — no join). The ONLY join is docs LEFT
    blocklist, explicitly broadcast: a UT1-sized list (~5M short
    domains) broadcasts in O(100 MB) and the 10^12-doc side never
    shuffles (plan-pinned by test). NULL/unparseable URLs keep
    domain='' and can only be blocked by soft words."""
    lurl = F.lower(F.coalesce(F.col(url_col), F.lit("")))
    host = F.regexp_replace(F.regexp_extract(lurl, HOST_RE, 1),
                            r"^www\.", "")
    words = F.array(*[F.lit(w) for w in banned_words])
    staged = docs.withColumn(
        "domain", F.regexp_extract(host, DOMAIN_PATTERN, 1)
    ).withColumn(
        "soft_hits",
        F.size(F.filter(words, lambda w: lurl.contains(w)))
        .cast("long"))
    dim = F.broadcast(
        blocklist.select(F.col("domain").alias("_bl_domain"))
        .distinct()
        .withColumn("_bl_hit", F.lit(True)))
    joined = staged.join(dim, staged["domain"] == dim["_bl_domain"],
                         "left")
    return (joined
            .withColumn("domain_blocked",
                        F.coalesce(F.col("_bl_hit"), F.lit(False)))
            .drop("_bl_domain", "_bl_hit")
            .withColumn("url_keep",
                        ~F.col("domain_blocked")
                        & (F.col("soft_hits") < soft_max)))
