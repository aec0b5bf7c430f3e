"""Text-analysis expression builders (north-star LLM-pipeline surface).

No reference counterpart (the reference is a sales-analytics toolkit);
these are the text operators a large-scale training-data pipeline needs
(BASELINE.json north_star). All pure Column expressions — JVM-side,
whole-stage-codegen-able, zero Python in the hot path — so they hold up
on a 100 TB ``documents`` table: one scan, no shuffle, no UDF serde.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword list shared with the DuckDB oracles.
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

# Marker words per language for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
}


def tokens(col) -> Column:
    """Whitespace tokenization (the baseline tokenizer)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col) -> Column:
    """Token count over whitespace tokens, as long."""
    return F.size(tokens(col)).cast("long")


def stopword_hits(col) -> Column:
    """Count of STOPWORDS occurrences (one shared definition — feeds
    quality_score AND the Gopher rules; the oracles mirror it via
    _STOPWORDS_SQL)."""
    toks = tokens(col)
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long")



def quality_score(col) -> Column:
    """Deterministic document quality score in [0, 1].

    Components (all integer-derived, so the double arithmetic is
    bit-reproducible across engines):
    - mean token length (chars excl. separators / tokens), scaled;
    - stopword ratio (a natural-language signal);
    - length prior (longer docs score higher, saturating).
    """
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    n_char = F.length(c).cast("double")
    mean_len = (n_char - (n_tok - F.lit(1.0))) / n_tok
    stop_ratio = stopword_hits(c).cast("double") / n_tok
    len_prior = F.least(n_char / F.lit(500.0), F.lit(1.0))
    raw = (
        F.least(mean_len / F.lit(8.0), F.lit(1.0)) * F.lit(0.4)
        + stop_ratio * F.lit(2.0) * F.lit(0.3)
        + len_prior * F.lit(0.3)
    )
    return F.least(raw, F.lit(1.0))


def lang_id(col) -> Column:
    """Marker-word language-ID heuristic → predicted language code.

    Scores each candidate language by marker-token hits; highest hit
    count wins, ties broken by language-code order; zero hits → 'und'.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    scored = None
    for code in sorted(LANG_MARKERS):
        hits = F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[code])))
        pair = F.struct(hits.alias("hits"), F.lit(code).alias("code"))
        scored = pair if scored is None else F.when(hits > scored["hits"], pair).otherwise(scored)
    return F.when(scored["hits"] > 0, scored["code"]).otherwise(F.lit("und"))


def mean_token_len(col) -> Column:
    """Mean token length in chars (separator chars excluded).

    Integer-derived double (chars and tokens are exact counts), so the
    division is bit-reproducible across engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    return (F.length(c).cast("double") - (n_tok - F.lit(1.0))) / n_tok


def dup_token_ratio(col) -> Column:
    """Fraction of tokens that repeat an earlier token — the Gopher-style
    repetition signal (a high ratio marks template/boilerplate text)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n = F.size(toks).cast("double")
    return (n - F.size(F.array_distinct(toks)).cast("double")) / n


def fingerprint(col) -> Column:
    """Document fingerprint: md5 over the sorted distinct token set.

    Word-order- and repetition-insensitive, so near-identical documents
    (shuffled/duplicated words) collide — the cheap exact-ish dedup key.
    """
    c = F.col(col) if isinstance(col, str) else col
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(c))))
    # NULL text → NULL (concat_ws would launder the NULL token array
    # into md5('') and merge NULL docs with empty docs)
    return F.when(c.isNotNull(), F.md5(canon))
