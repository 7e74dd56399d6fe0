"""Text-analysis operators for large-scale training-data pipelines.

All pure built-in column expressions (JVM-side, codegen'd): language id,
quality scoring, token counting, document fingerprinting. Designed to run
in the same scan as extraction output — no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..search.analysis import tokens_expr

#: tiny per-language stopword signatures for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "ru": ["и", "в", "не", "на", "что", "с", "по"],
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "es": ["el", "la", "de", "que", "y", "en"],
    "fr": ["le", "la", "de", "et", "les", "des"],
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def token_count_expr(col: Column | str) -> Column:
    """Whitespace+punct token count (BPE-ish regex splitter)."""
    return F.size(tokens_expr(_col(col)))


def lang_id_expr(col: Column | str) -> Column:
    """Heuristic language id: Cyrillic ratio first, then stopword votes.

    Returns a language code string; 'und' when nothing matches.
    """
    c = _col(col)
    toks = tokens_expr(c)
    cyr = F.length(F.regexp_replace(c, "[^а-яёА-ЯЁ]", ""))
    votes = {
        lang: F.size(
            F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in LANG_STOPWORDS.items()
    }
    best = F.greatest(*votes.values())
    expr = F.when(cyr * 2 > F.length(c), F.lit("ru"))
    # deterministic tie-break: first language (dict order) with the max votes
    cond = None
    for lang in LANG_STOPWORDS:
        branch = (votes[lang] == best) & (best > 0)
        cond = F.when(branch, F.lit(lang)) if cond is None else cond.when(branch, F.lit(lang))
    return expr.otherwise(cond.otherwise(F.lit("und")))


def quality_metrics(col: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals.

    Returns named expressions; compose with ``df.select(**)`` or
    ``withColumns``. Ratios are int-count pairs where cross-engine float
    determinism matters (numerator, denominator), plus rounded floats.
    """
    c = _col(col)
    toks = tokens_expr(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace(c, "[^.,;:!?]", ""))
    en_stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    mean_word_len = F.when(
        n_tokens > 0,
        F.round(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
            / n_tokens,
            4,
        ),
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_punct": n_punct,
        "n_stopwords": n_stop,
        "mean_word_len": mean_word_len,
        "stopword_ratio": F.when(n_tokens > 0, F.round(n_stop / n_tokens, 4)).otherwise(
            F.lit(0.0)
        ),
    }


def fingerprint_expr(col: Column | str) -> Column:
    """Exact-content fingerprint: md5 of the text (engine-portable)."""
    return F.md5(F.encode(_col(col), "utf-8"))


def rolling_fingerprints_expr(col: Column | str, window: int = 8) -> Column:
    """Rolling-hash document fingerprints: md5 over each ``window``-token
    shingle — the winnowing-style input set (min-sampled by callers)."""
    toks = tokens_expr(_col(col))
    n = F.size(toks)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(0))),
        lambda i: F.md5(F.encode(F.concat_ws(" ", F.slice(toks, i, window)), "utf-8")),
    )
