"""Aho-Corasick multi-pattern text scan (X805).

The dictionary-matching primitive a blocklist/compliance/PII pass
needs at corpus scale: ONE automaton walk per document finds every
occurrence of every dictionary phrase simultaneously — O(text +
matches) per doc regardless of dictionary size — where the naive plan
is one `contains`/`instr` scan PER PATTERN (dictionary-size × corpus
passes). Classic public algorithm (Aho & Corasick, CACM 1975:
goto/fail/output functions); this is a from-scratch implementation.

Spark shape: the automaton builds once on the driver from the
(bounded, dimension-sized) pattern list and ships inside the
mapInPandas closure — the broadcast-small-dim pattern — while the
corpus side streams through executors Arrow-batched, one linear walk
per document. Counts are per-(doc, pattern) integers, so downstream
aggregation is map-side combinable. Matches are counted at every
position a pattern ENDS (standard AC semantics: overlapping
occurrences and patterns nested in longer patterns all count, via the
output links).
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator


def build_automaton(patterns: list[str]):
    """goto/fail/output tables for the pattern list.

    Returns (goto, fail, out) where goto is a list of dicts
    char→state, fail a list of ints, and out a list of tuples of
    pattern indexes that END at each state (own word + every word
    reachable by fail links, precomputed so the scan is O(1) per
    emitted match)."""
    goto: list[dict[str, int]] = [{}]
    word_at: list[list[int]] = [[]]
    for pi, p in enumerate(patterns):
        if not p:
            raise ValueError("empty pattern")
        s = 0
        for ch in p:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                word_at.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        word_at[s].append(pi)

    fail = [0] * len(goto)
    out: list[tuple[int, ...]] = [()] * len(goto)
    q: deque[int] = deque()
    for s in goto[0].values():
        q.append(s)
        out[s] = tuple(word_at[s])
    while q:
        u = q.popleft()
        for ch, v in goto[u].items():
            q.append(v)
            f = fail[u]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[v] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != v else 0
            out[v] = tuple(word_at[v]) + out[fail[v]]
    return goto, fail, out


def scan_counts(text: str, automaton) -> dict[int, int]:
    """One automaton walk → {pattern_index: occurrence count}."""
    goto, fail, out = automaton
    s = 0
    counts: dict[int, int] = {}
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        if out[s]:
            for pi in out[s]:
                counts[pi] = counts.get(pi, 0) + 1
    return counts


def multi_pattern_counts(docs, patterns: list[str], text_col: str = "text"):
    """Distributed dictionary scan: documents DataFrame → one row per
    (doc_id, pattern) with its occurrence count (docs without a match
    emit nothing — downstream aggregates are sparse)."""
    import pandas as pd

    auto = build_automaton(patterns)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, pats, ns = [], [], []
            for doc_id, text in zip(b["doc_id"], b[text_col]):
                for pi, n in scan_counts(text or "", auto).items():
                    ids.append(doc_id)
                    pats.append(patterns[pi])
                    ns.append(n)
            yield pd.DataFrame(
                {"doc_id": ids, "pattern": pats, "n_occ": ns}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        scan, "doc_id long, pattern string, n_occ long"
    )
