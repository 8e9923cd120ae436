"""Text-analysis column functions for large-scale training-data pipelines.

Not present in the reference (its only text handling is prompt assembly,
``README.md:726-730``); mandated by the engine's extension surface
(SURVEY.md §2.11). All functions are pure Catalyst expressions — regex /
split / higher-order functions — so they run JVM-side over 100 TB without a
Python round-trip, and every one is mirrorable in ANSI-ish SQL for the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small, fixed stopword lists keep language-ID deterministic and
# SQL-expressible.  Real deployments would swap in fastText et al. behind the
# same column signature.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
ES_STOPWORDS = ("el", "la", "de", "que", "y", "en", "un", "es", "los", "por")

# "BPE-ish" token regex: runs of word chars, or single non-word-non-space
# symbols — approximates subword pre-tokenization.
TOKEN_REGEX = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"
PUNCT_CLASS = r"[.,;:!?'\"()\-]"


def _c(t: Column | str) -> Column:
    return F.col(t) if isinstance(t, str) else t


def normalized_text(text: Column | str) -> Column:
    """Lowercase, collapse whitespace, trim — canonical form for dedup."""
    return F.trim(F.regexp_replace(F.lower(_c(text)), r"\s+", " "))


def word_tokens(text: Column | str) -> Column:
    """Whitespace tokens of the normalized text (ARRAY<STRING>)."""
    return F.split(normalized_text(text), " ")


def token_count(text: Column | str) -> Column:
    """BPE-ish token count via :data:`TOKEN_REGEX` (JVM regexp_count)."""
    return F.regexp_count(_c(text), F.lit(TOKEN_REGEX))


def word_count(text: Column | str) -> Column:
    return F.size(word_tokens(text))


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty strings)."""
    t = _c(text)
    n = F.length(t)
    p = F.length(t) - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n.cast("double"))


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    toks = word_tokens(text)
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda w: w.isin(*stopwords)))
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n.cast("double"))


def language_id(text: Column | str) -> Column:
    """Stopword-vote language heuristic → 'en' | 'es' | 'unknown'."""
    en = stopword_ratio(text, EN_STOPWORDS)
    es = stopword_ratio(text, ES_STOPWORDS)
    return (
        F.when((en > es) & (en >= 0.03), F.lit("en"))
        .when((es > en) & (es >= 0.03), F.lit("es"))
        .otherwise(F.lit("unknown"))
    )


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0, 1].

    Rewards moderate length and natural stopword frequency, penalizes heavy
    punctuation — the standard cheap pre-filter in training-data pipelines.
    """
    t = _c(text)
    wc = word_count(t).cast("double")
    length_term = F.least(wc / F.lit(50.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(t) / F.lit(0.1), F.lit(1.0))
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(t) * 5.0)
    score = length_term * 0.4 + stop_term * 0.4 + punct_term * 0.2
    return F.round(score, 6)


EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_REGEX = r"\+?\d[\d() .-]{7,}\d"


def redact_pii(text: Column | str) -> Column:
    """Scrub emails and phone numbers → ``[EMAIL]`` / ``[PHONE]``.

    Pure ``regexp_replace`` (JVM, codegen'd) — the cheap pre-filter every
    training-data pipeline runs before anything leaves the cluster. Order
    matters: emails first, so digits inside addresses aren't half-eaten by
    the phone pattern."""
    emails_gone = F.regexp_replace(_c(text), EMAIL_REGEX, "[EMAIL]")
    return F.regexp_replace(emails_gone, PHONE_REGEX, "[PHONE]")


def doc_fingerprint(text: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text.

    md5 (not xxhash64) so any engine reproduces it bit-for-bit; used as the
    exact-dedup key at scale (group on a 16-byte hash instead of multi-KB
    document bodies → small shuffle rows).
    """
    return F.md5(normalized_text(text))


def char_class_ratio(text: Column | str, char_class: str) -> Column:
    """Fraction of characters matching a regex character class (0 for
    empty strings). The building block for script/charset profiling:
    multilingual curation routes documents by script mix (Latin vs CJK vs
    Cyrillic vs digits-heavy boilerplate) before language-specific
    stages. Pure Catalyst — length difference after regexp_replace."""
    t = _c(text)
    n = F.length(t)
    hit = n - F.length(F.regexp_replace(t, char_class, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        hit.cast("double") / n.cast("double")
    )


def html_to_text(html: Column | str) -> Column:
    """Visible text out of an HTML document — the step between WARC
    ingestion (``sources/warc.py``) and every text-quality gate in a
    crawl-curation pipeline.

    Pure Catalyst ``regexp_replace`` chain (JVM, whole-stage codegen'd;
    no backreferences or lookarounds, so the SAME patterns run under
    RE2 engines and the DuckDB oracle reproduces the output exactly):

    1. PAIRED ``<script>``/``<style>`` blocks go WHOLE (their content
       is code, not text — the classic boilerplate-extraction mistake
       is tag-stripping them into the corpus), non-greedy,
       case-insensitive, dotall;
    2. HTML comments go whole — BEFORE the unclosed-tag fallbacks
       below, so a commented-out script tag (``<!-- <script src=…> -->``,
       valid and common HTML) is removed as the comment it is instead
       of matching the unclosed-``<script>`` fallback and deleting the
       rest of the document (paired script/style blocks that contain
       comment markers are already gone by step 1, so comment stripping
       cannot cut a real script block in half);
    3. UNCLOSED ``<script>``/``<style>`` fallbacks strip to the end of
       the document (what browsers do with malformed markup);
    4. remaining tags become spaces (word boundaries survive
       ``</p><p>``);
    5. the named entities that dominate real pages decode (&amp; &lt;
       &gt; &quot; &#39; &nbsp;) — &amp; LAST, so ``&amp;lt;`` decodes
       to the literal ``&lt;`` the author wrote, not to ``<``;
    6. whitespace collapses, ends trim.

    Declared scope: numeric entity references beyond ``&#39;`` and the
    long tail of named entities pass through verbatim (they are rare
    and harmless downstream); malformed markup degrades gracefully —
    an unclosed script block strips to the end of the document, which
    is also what browsers do."""
    t = _c(html)
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script\s*>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")  # before the fallbacks
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*", " ")  # unclosed
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*", " ")
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    for ent, ch in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def canonical_url(url: Column | str) -> Column:
    """Canonicalize a URL for crawl dedup keys: lowercase the scheme and
    authority (path stays case-sensitive per RFC 3986), drop the
    fragment, strip the tracking parameters that make one page look
    like thousands (``utm_*``, ``gclid``, ``fbclid``, ``ref``), and
    tidy the separators that stripping leaves behind. Pure Catalyst,
    RE2-compatible patterns — same-output DuckDB oracle.

    Deliberately NOT done: query-parameter reordering and percent-
    encoding normalization (either changes which URLs alias, a policy
    choice the pipeline should make explicitly, not a default)."""
    u = _c(url)
    head = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    tail = F.substring(u, F.length(head) + F.lit(1), F.lit(1 << 30))
    u = F.concat(F.lower(head), tail)
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    # trackers: the match swallows "<sep>name=value" and puts the
    # SEPARATOR back ($1), so a mid-string strip leaves "&&"/"?&" runs
    # that the tidy passes below collapse — not a bare "?" that would
    # orphan the following parameter
    u = F.regexp_replace(
        u, r"(?i)([?&])(utm_[a-z0-9_]+|gclid|fbclid|ref)=[^&#]*", "$1"
    )
    u = F.regexp_replace(u, r"&&+", "&")   # a?x=1&&y=2 → a?x=1&y=2
    u = F.regexp_replace(u, r"\?[?&]+", "?")  # a?&y=2 / a?? → a?y=2 / a?
    u = F.regexp_replace(u, r"[?&]+$", "")    # trailing separators
    return u
