"""Text-analysis column functions for the training-data pipeline:
tokenization, shingling, quality metrics, fingerprinting, language-ID.

All of these are built-in-function compositions (JVM-side, codegen'd) —
no Python UDFs — so they run at full whole-stage-codegen speed over
100 TB of documents. Each has an exactly-matching DuckDB SQL rendering
used by the oracles (integer arithmetic and int/int double division
only, so cross-engine results are bit-identical).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deliberately small and fixed: these lists are part of the operator
# definition (they appear verbatim in the SQL oracles too).
STOPWORDS_EN = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "for"]
LANG_MARKERS = {
    "de": ["der", "die", "das", "und", "ist"],
    "en": ["the", "and", "of", "is", "a"],
    "es": ["el", "los", "las", "y", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["de", "shi", "zai", "he", "le"],
}

_TOKENS = "split(trim({col}), '\\\\s+')"
_SQL_TOKENS = "string_split_regex(trim({col}), '\\s+')"


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization (the baseline tokenizer)."""
    return F.expr(_TOKENS.format(col=col))


def token_count(col: str = "text") -> Column:
    return F.size(tokens(col))


def word_shingles(col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles — the unit set for Jaccard/MinHash
    dedup. Pure array functions; no explode until the caller wants one
    row per shingle. Guarded so short docs yield an empty set
    (``sequence(0, -k)`` would otherwise count DOWN in Spark)."""
    t = _TOKENS.format(col=col)
    return F.expr(
        f"CASE WHEN size({t}) < {n} THEN array() "
        f"ELSE array_distinct(transform(sequence(0, size({t}) - {n}), "
        f"i -> concat_ws(' ', slice({t}, i + 1, {n})))) END"
    )


def word_shingles_from_tokens(toks_col: str, n: int = 3) -> Column:
    """:func:`word_shingles` over a pre-projected token-array COLUMN.

    Splitting must happen in a prior projection: referencing the
    ``split(...)`` expression inside the ``transform`` lambda would
    re-tokenize the document once per shingle index (O(tokens^2) per
    doc — measured 3x wall on the dedup pipeline). A bound attribute is
    evaluated once per row."""
    return F.expr(
        f"CASE WHEN size({toks_col}) < {n} THEN array() "
        f"ELSE array_distinct(transform(sequence(0, size({toks_col}) - {n}), "
        f"i -> concat_ws(' ', slice({toks_col}, i + 1, {n})))) END"
    )


def sql_word_shingles(col: str = "text", n: int = 3) -> str:
    """DuckDB rendering of :func:`word_shingles` (1-based inclusive
    list slicing; ``range`` is empty when stop <= start)."""
    t = _SQL_TOKENS.format(col=col)
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({t}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(({t})[i : i + {n - 1}], ' ')))"
    )


def stopword_count(col: str = "text") -> Column:
    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    t = _TOKENS.format(col=col)
    return F.expr(f"size(filter({t}, x -> x IN ({stoplist})))")


def sql_stopword_count(col: str = "text") -> str:
    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    t = _SQL_TOKENS.format(col=col)
    return f"len(list_filter({t}, x -> x IN ({stoplist})))"


def char_total_of_tokens(col: str = "text") -> Column:
    """Sum of token lengths (for avg token length; exact int math)."""
    t = _TOKENS.format(col=col)
    return F.expr(
        f"aggregate(transform({t}, x -> length(x)), 0, (acc, x) -> acc + x)"
    )


def sql_char_total_of_tokens(col: str = "text") -> str:
    t = _SQL_TOKENS.format(col=col)
    return f"list_sum(list_transform({t}, x -> length(x)))"


#: bump when :func:`fingerprint`'s hash or normalization changes —
#: standing state keyed by fingerprints from another family (e.g. the
#: streaming quota index's accepted budgets) must not be reinterpreted
FINGERPRINT_FAMILY = "md5/ws-normalized"


def fingerprint(col: str = "text") -> Column:
    """Document fingerprint: md5 of the whitespace-normalized text
    (md5 hex is bit-identical across engines)."""
    return F.md5(F.regexp_replace(F.trim(F.col(col)), r"\s+", " ").cast("binary"))


def sql_fingerprint(col: str = "text") -> str:
    return f"md5(regexp_replace(trim({col}), '\\s+', ' ', 'g'))"


def kgram_hashes(col: str, k: int = 8) -> Column:
    """Array of rolling character k-gram hashes as 60-bit BIGINTs
    (md5-prefix parsed base-16, the ``md5_token_hash`` trick).

    The winnowing scheme (Schleimer/Wilkerson/Aiken, "Winnowing: Local
    Algorithms for Document Fingerprinting", SIGMOD'03) hashes every
    k-gram; the md5 prefix is the cross-engine-stable stand-in for the
    polynomial rolling hash, and because a FIXED-length hex prefix
    orders lexicographically exactly as its numeric value, the window
    minima over the parsed longs equal the minima over the hex
    strings. Longs, not strings, on purpose: every downstream move —
    the explode, the doc-frequency shuffle, the fingerprint equi-join
    — then carries an 8-byte key instead of a 16-char string, and
    array_min compares longs; at warehouse scale the fingerprint
    shuffle is the operator's dominant cost. O(n*k) per document,
    computed once per row — Catalyst evaluates the projected array a
    single time, and the window-min pass below binds it rather than
    recomputing per window.
    """
    return F.expr(
        f"transform(sequence(1, greatest(length({col}) - {k} + 1, 1)), "
        f"i -> CAST(conv(substring(md5(cast(substring({col}, i, {k}) as binary)), 1, 15), 16, 10) AS BIGINT))"
    )


def sql_kgram_hashes(col: str, k: int = 8) -> str:
    return (
        f"list_transform(range(1, greatest(length({col}) - {k} + 1, 1) + 1), "
        f"i -> ('0x' || substr(md5(substring({col}, i, {k})), 1, 15))::BIGINT)"
    )


def winnow_mins(grams_col: str, w: int = 4) -> Column:
    """Per-window minima over a BOUND k-gram-hash array column — the
    winnowing selection step. Always reference a projected column here,
    never inline ``kgram_hashes`` into the lambda: expressions inside a
    higher-order-function lambda re-evaluate per element (O(n^2))."""
    return F.expr(
        f"transform(sequence(1, greatest(size({grams_col}) - {w} + 1, 1)), "
        f"j -> array_min(slice({grams_col}, j, {w})))"
    )


def sql_winnow_mins(grams_col: str, w: int = 4) -> str:
    return (
        f"list_transform(range(1, greatest(len({grams_col}) - {w} + 1, 1) + 1), "
        f"j -> list_min(list_slice({grams_col}, j, j + {w} - 1)))"
    )


def lang_scores(col: str = "text") -> dict[str, Column]:
    """Marker-stopword vote counts per language (n-gram heuristic)."""
    t = _TOKENS.format(col=col)
    out = {}
    for lang, words in LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        out[lang] = F.expr(f"size(filter({t}, x -> x IN ({lst})))")
    return out


def sql_lang_scores(col: str = "text") -> dict[str, str]:
    t = _SQL_TOKENS.format(col=col)
    out = {}
    for lang, words in LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        out[lang] = f"len(list_filter({t}, x -> x IN ({lst})))"
    return out


def predicted_lang(col: str = "text") -> Column:
    """Argmax language with deterministic alphabetical tie-break
    (strictly-greater chain: earliest alphabetical lang wins ties)."""
    scores = lang_scores(col)
    langs = sorted(scores)
    best = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def sql_predicted_lang(col: str = "text") -> str:
    scores = sql_lang_scores(col)
    langs = sorted(scores)
    expr = f"'{langs[0]}'"
    score_expr = scores[langs[0]]
    for lang in langs[1:]:
        new_expr = (
            f"CASE WHEN {scores[lang]} > ({score_expr}) "
            f"THEN '{lang}' ELSE {expr} END"
        )
        new_score = (
            f"CASE WHEN {scores[lang]} > ({score_expr}) "
            f"THEN {scores[lang]} ELSE ({score_expr}) END"
        )
        expr, score_expr = new_expr, new_score
    return expr
