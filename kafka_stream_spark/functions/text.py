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


#: coefficients combining the n token hashes of a shingle (all < P).
SHINGLE_COEF = (1000003, 19349663, 83492791)


def hashed_tokens_mod(text: Column) -> Column:
    """array<long> — md5-derived token hash reduced mod P, one per token.

    This is the expensive step (one md5 per token); everything downstream
    combines these integers, so it runs once per token, not once per
    shingle — a ~n× saving over hashing each n-gram string."""
    from .hashing import MERSENNE_P

    return F.transform(tokens(text), lambda t: token_hash(t) % MERSENNE_P)


def shingle_hashes(th: Column, toks: Column, n: int = 3) -> Column:
    """array<long> — n-gram hashes as a positional polynomial over the
    pre-hashed tokens: (c1·h_i + c2·h_{i+1} + c3·h_{i+2}) mod P. Each
    term is reduced mod P before summing so all arithmetic stays in
    int64 in both engines. Docs shorter than n words get one whole-text
    hash so every doc has ≥1 shingle."""
    from .hashing import MERSENNE_P

    def gram(i: Column) -> Column:
        acc = None
        for k, c in enumerate(SHINGLE_COEF[:n]):
            term = (F.lit(c) * F.element_at(th, i + k + 1)) % MERSENNE_P
            acc = term if acc is None else acc + term
        return acc % MERSENNE_P

    fallback = F.array(token_hash(F.concat_ws(" ", toks)) % MERSENNE_P)
    return F.when(
        F.size(th) >= n, F.transform(F.sequence(F.lit(0), F.size(th) - n), gram)
    ).otherwise(fallback)


def hashed_shingle_table_sql(extra_cols: str = "", n: int = 3) -> str:
    """DuckDB derived table ``(doc_id[, extra], hs)`` mirroring the
    two-step Spark computation (tokens hashed once, then combined)."""
    from .hashing import MERSENNE_P as P

    terms = " + ".join(
        f"(({c} * th[i + {k + 1}]) % {P})" for k, c in enumerate(SHINGLE_COEF[:n])
    )
    whole = token_hash_sql("array_to_string(toks, ' ')")
    sh = (
        f"CASE WHEN len(th) >= {n} THEN "
        f"list_transform(range(len(th) - {n - 1}), i -> ({terms}) % {P}) "
        f"ELSE [{whole} % {P}] END"
    )
    return f"""(
      SELECT doc_id{extra_cols}, list_distinct({sh}) AS hs
      FROM (SELECT doc_id{extra_cols},
                   list_transform({tokens_sql('text')}, t -> {token_hash_sql('t')} % {P}) AS th,
                   {tokens_sql('text')} AS toks
            FROM documents)
    )"""


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
