"""Text-analysis expressions: tokenize, shingle, language-ID, quality.

All pure ``Column`` expressions (codegen, no Python in the hot path) with
DuckDB-SQL twins for the oracle. Token model: whitespace words (the
testdata corpus is space-separated); a BPE-ish regex tokenizer is also
provided for mixed text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import token_hash, token_hash_sql

#: BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbol.
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

#: tiny per-language marker lexicons for the heuristic language-ID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow"),
    "de": ("der", "die", "und", "schnell"),
    "es": ("el", "la", "los", "rápido"),
    "fr": ("le", "la", "les", "vite"),
    "zh": ("的", "快", "慢", "表"),
}

STOPWORDS = ("the", "a", "of", "and")


def tokens(text: Column) -> Column:
    """Whitespace tokens with empties dropped."""
    return F.filter(F.split(text, " "), lambda t: t != F.lit(""))


def tokens_sql(expr: str) -> str:
    return f"list_filter(string_split({expr}, ' '), t -> t <> '')"


def bpe_tokens(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(BPE_RE), 0)


def bpe_tokens_sql(expr: str) -> str:
    return f"regexp_extract_all({expr}, '{BPE_RE}')"


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-grams; docs shorter than n words fall back to the whole
    token list joined (so every doc has ≥1 shingle)."""

    def gram(i: Column) -> Column:
        return F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)])

    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n), gram),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def shingles_sql(toks: str, n: int = 3) -> str:
    parts = " || ' ' || ".join(f"{toks}[i + {k + 1}]" for k in range(n))
    return f"""(CASE WHEN len({toks}) >= {n}
        THEN list_transform(range(len({toks}) - {n - 1}), i -> {parts})
        ELSE [array_to_string({toks}, ' ')] END)"""


def hashed_distinct_shingles(text: Column, n: int = 3) -> Column:
    """array<long> — portable hashes of the distinct word n-grams."""
    sh = F.array_distinct(shingles(tokens(text), n))
    return F.transform(sh, token_hash)


def hashed_distinct_shingles_sql(expr: str, n: int = 3) -> str:
    sh = f"list_distinct({shingles_sql(tokens_sql(expr), n)})"
    return f"list_transform({sh}, s -> {token_hash_sql('s')})"


def _member_of(markers: tuple[str, ...]):
    # factory keeps the predicate lambda 1-ary (PySpark binds HOF variables
    # by inspecting lambda arity)
    return lambda t: t.isin(*markers)


def lang_scores(toks: Column) -> dict[str, Column]:
    """marker-hit count per language (token-set membership)."""
    return {
        lang: F.size(F.filter(toks, _member_of(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(toks: Column) -> Column:
    """argmax of marker hits; ties → first language in LANG_MARKERS order;
    zero hits → 'und' (undetermined). A strict-> fold keeps first-wins."""
    scores = lang_scores(toks)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in LANG_MARKERS:
        beats = scores[lang] > best_score
        best_lang = F.when(beats, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(beats, scores[lang]).otherwise(best_score)
    return best_lang


def predict_lang_sql(toks: str) -> str:
    """DuckDB twin of :func:`predict_lang`: first language hitting the max
    wins (CASE evaluates in LANG_MARKERS order)."""
    score = {
        lang: f"len(list_filter({toks}, t -> t IN ({', '.join(repr(m) for m in markers)})))"
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    mx = f"greatest({', '.join(score[lang] for lang in langs)})"
    whens = " ".join(f"WHEN {score[lang]} = {mx} THEN '{lang}'" for lang in langs)
    return f"(CASE WHEN {mx} = 0 THEN 'und' {whens} END)"


def stopword_ratio(toks: Column) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def stopword_ratio_sql(toks: str) -> str:
    inlist = ", ".join(repr(s) for s in STOPWORDS)
    return (
        f"len(list_filter({toks}, t -> t IN ({inlist})))"
        f" / greatest(len({toks}), 1)"
    )
