"""Text analysis for training-data pipelines: language id, quality scoring,
token counting, fingerprinting — all pure Catalyst expressions (regexp +
higher-order array functions); no Python in the row path."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.exprs import let_

# tiny stopword profiles; the language with the highest stopword-hit ratio
# wins (n-gram/stopword heuristic — no external models in this container)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on", "with", "as", "was", "at"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von", "im", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "du", "que", "pour", "dans", "pas", "sur"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "de", "que", "por", "con", "para", "no"],
}


def _words(col):
    return F.split(F.trim(F.lower(col)), r"\s+")


def lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Most-hits-wins stopword voting; ties broken by language code order
    (deterministic).  `array_intersect`-free formulation: per-language hit
    counts via a filtered size, all in one projection."""
    langs = sorted(STOPWORDS)

    def score(w):
        # one tokenization feeds all four language filters (let-bound: the
        # inline split would otherwise run once per language; core/exprs.py)
        scores = []
        for idx, lang in enumerate(langs):
            lit = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
            hits = F.size(F.filter(w, lambda t: F.array_contains(lit, t)))
            # desc sort key (hits, pref) with pref = reversed index, so
            # equal-hit ties resolve to the alphabetically smallest code
            scores.append(
                F.struct(
                    hits.alias("hits"),
                    F.lit(len(langs) - 1 - idx).alias("pref"),
                    F.lit(lang).alias("lang"),
                )
            )
        return F.sort_array(F.array(*scores), asc=False)[0].getField("lang")

    return df.withColumn(out, let_(_words(F.col(text_col)), score))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword count (word chars split from
    punctuation runs) + char count."""
    txt = F.col(text_col)
    ws_tokens = F.size(_words(txt))
    bpe_ish = F.size(
        F.filter(
            F.split(txt, r"(?<=\W)|(?=\W)"), lambda t: F.trim(t) != F.lit("")
        )
    )
    return (
        df.withColumn("n_tokens", ws_tokens)
        .withColumn("n_subtokens", bpe_ish)
        .withColumn("n_chars_engine", F.length(txt))
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio heuristics → quality in [0, 1]."""
    txt = F.col(text_col)
    en = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    # let-bind the token array: n_tok and the stopword filter share ONE split
    n_tok = let_(_words(txt), F.size)
    n_char = F.length(txt)
    punct = F.length(F.regexp_replace(txt, r"[^\p{Punct}]", ""))
    stop_ratio = let_(
        _words(txt),
        lambda w: F.size(F.filter(w, lambda t: F.array_contains(en, t))) / F.greatest(F.size(w), F.lit(1)),
    )
    mean_wlen = n_char / F.greatest(n_tok, F.lit(1))
    punct_ratio = punct / F.greatest(n_char, F.lit(1))
    length_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    word_score = F.when((mean_wlen >= 3) & (mean_wlen <= 12), 1.0).otherwise(0.3)
    punct_score = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.2)
    stop_score = F.least(stop_ratio * 4.0, F.lit(1.0))
    quality = (length_score + word_score + punct_score + stop_score) / 4.0
    return (
        df.withColumn("stop_ratio", stop_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("mean_word_len", mean_wlen)
        .withColumn("quality", F.round(quality, 6))
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Order-sensitive rolling fingerprint: xxhash64 chained over word-window
    hashes (winnowing-style content id), fully JVM-side via aggregate()."""
    # let-bind the words array: an inline split referenced 4x per window
    # position would re-tokenize O(positions x 4) times (see core/exprs.py)
    rolled = let_(
        _words(F.col(text_col)),
        lambda w: F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(w) - 4, F.lit(0))),
                lambda p: F.xxhash64(F.concat_ws(" ", *[F.element_at(w, (p + i + 1).cast("int")) for i in range(4)])),
            ),
            F.lit(0).cast("long"),
            lambda acc, h: F.xxhash64(acc, h),
        ),
    )
    return df.withColumn(out, rolled)
