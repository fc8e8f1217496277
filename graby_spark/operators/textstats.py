"""Text-analysis operators: token counts, quality scoring, language ID,
document fingerprinting.

Everything here is pure JVM Spark SQL (whole-stage codegen; zero Python in
the hot path) except the rolling-hash fingerprint, which is a vectorized
pandas UDF.  Each operator has an ANSI-SQL twin used as the DuckDB oracle
in __spark_entry__.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_stats",
    "quality_score",
    "language_id",
    "fingerprints",
    "unigram_logprob",
    "STOPWORDS",
]

# tiny per-language stopword tables for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "was"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "que"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "en"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"],
}


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts and basic char stats."""
    text = F.trim(F.col(text_col))
    ws_tokens = F.split(text, r"\s+")
    # BPE-ish: word pieces + digits + punctuation as separate tokens
    bpe_tokens = F.split(text, r"(?<=[^\w])|(?=[^\w\s])|\s+")
    return df.select(
        F.col(id_col),
        F.length(text).alias("char_count"),
        F.size(ws_tokens).alias("ws_token_count"),
        F.size(F.filter(bpe_tokens, lambda t: t != "")).alias("bpe_token_count"),
        F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).alias("punct_count"),
        F.length(F.regexp_replace(text, r"[^0-9]", "")).alias("digit_count"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0, 1]: length band, punctuation ratio,
    stopword ratio, mean word length band.  Mirrors common web-text
    filtering recipes; every term is a SQL expression (oracle-checkable)."""
    text = F.trim(F.col(text_col))
    tokens = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    n_tokens = F.size(tokens)
    n_chars = F.length(text)
    stop_list = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(tokens, lambda t: F.array_contains(stop_list, t)))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    mean_word_len = (n_chars - (n_tokens - 1)) / n_tokens

    length_ok = (n_chars >= 50) & (n_chars <= 20000)
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    word_len_ok = (mean_word_len >= 2.0) & (mean_word_len <= 12.0)

    score = (
        length_ok.cast("double") * 0.25
        + (punct_ratio <= 0.2).cast("double") * 0.25
        + (stop_ratio >= 0.05).cast("double") * 0.25
        + word_len_ok.cast("double") * 0.25
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 2).alias("quality"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-vote language heuristic over en/fr/es/de + CJK char check.

    Pure CASE/array expressions; deterministic tie-break by language-code
    order (en < fr < es < de checked in that order, zh wins when CJK chars
    dominate)."""
    text = F.lower(F.trim(F.col(text_col)))
    tokens = F.filter(F.split(text, r"\s+"), lambda t: t != "")

    def hits(lang: str):
        arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))

    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    en, fr, es, de = hits("en"), hits("fr"), hits("es"), hits("de")
    best = F.greatest(en, fr, es, de)
    guess = (
        F.when(cjk * 4 > F.length(text), F.lit("zh"))
        .when(best == F.lit(0), F.lit("unknown"))
        .when(en == best, F.lit("en"))
        .when(fr == best, F.lit("fr"))
        .when(es == best, F.lit("es"))
        .otherwise(F.lit("de"))
    )
    return df.select(
        F.col(id_col),
        en.alias("en_hits"),
        fr.alias("fr_hits"),
        es.alias("es_hits"),
        de.alias("de_hits"),
        guess.alias("lang_guess"),
    )


def fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", window: int = 16
) -> DataFrame:
    """Winnowing-style document fingerprint: hash every ``window``-char
    gram of the whitespace-normalized text, keep the minimum hash per
    non-overlapping window of grams — a compact signature for
    shift-tolerant duplicate detection.

    Pure JVM whole-stage-codegen expressions, zero Python: the gram hash
    is the top 60 bits of md5 (portable — the DuckDB oracle computes the
    identical value), grams/minima are array ``transform``s, and the
    final fingerprint is md5 over the comma-joined minima.
    """
    src = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("text"))
    norm = F.regexp_replace(
        F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+", " "
    )
    # rpad TRUNCATES longer strings (Spark and DuckDB both) — pad only
    # when the normalized text is shorter than one gram
    padded = F.when(F.length(norm) < window, F.rpad(norm, window, " ")).otherwise(norm)
    # position-dependent substring inside a lambda needs SQL-expression
    # form (python F.substring takes plain-int pos only)
    w = window
    out = src.select(
        "doc",
        padded.alias("_padded"),
    ).select(
        "doc",
        F.expr(
            f"transform(sequence(1, length(_padded) - {w} + 1), "
            f"i -> cast(conv(substring(md5(substring(_padded, i, {w})), 1, 15), 16, 10) as bigint))"
        ).alias("_hashes"),
    ).select(
        "doc",
        F.expr(
            # floor(), not cast: DuckDB's double->int cast rounds while
            # Spark's truncates — floor() is identical in both oracles
            f"transform(sequence(0, greatest(cast(floor(size(_hashes) / {w}) as int) - 1, 0)), "
            f"j -> array_min(slice(_hashes, j * {w} + 1, {w})))"
        ).alias("minima"),
    ).select(
        "doc",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(",", F.transform("minima", lambda m: m.cast("string")))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("fingerprint"),
        "minima",
    )
    return out.select("doc", "fingerprint", "minima")


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-statistical quality signal: mean unigram log10-probability
    per document under the corpus's own unigram distribution (the classic
    cheap 'LM perplexity' stand-in for web-text filtering — gibberish and
    boilerplate-stuffed documents score far from the corpus mode).

    Two aggregations, both shuffled on the token: global counts (the
    model) and per-doc scoring via an equi-join on token.  At corpus
    scale the vocabulary side is Zipf-bounded (vastly smaller than the
    corpus) and the join is the standard inverted-index shape; every
    expression is JVM-side and ANSI-SQL expressible (oracle-checkable).
    Returns (id, n_tokens, mean_logprob rounded to 6 digits).
    """
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != "")
        ).alias("token"),
    )
    total = toks.count()
    vocab = toks.groupBy("token").agg(F.count("*").alias("tf"))
    scored = (
        toks.join(vocab, "token")
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.log10(F.col("tf") / F.lit(float(total)))), 6
            ).alias("mean_logprob"),
        )
    )
    return scored
