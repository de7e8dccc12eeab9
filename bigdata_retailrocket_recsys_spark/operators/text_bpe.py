"""Deterministic greedy-merge BPE tokenization, Arrow-batched.

The reference pipeline never tokenizes text (its only text handling is
event-type strings, py:96-131); this module is part of the engine's
LLM-training-data extension surface: token-budget capping and sequence
packing (``operators/splits.py`` / ``operators/features.py``) count
WHITESPACE tokens by default, which materially misprices budgets for
LLM data (~1.3-1.6 BPE tokens per English word, far more for code).
No third-party tokenizer ships in this environment, so the engine
carries its own small, fully deterministic byte-level BPE:

- :func:`train_bpe` — classic Sennrich et al. (ACL 2016) merge
  learning over a word-frequency table (pure Python, driver-side, tiny);
- :data:`DEFAULT_MERGES` — up to 256 merges trained on a fixed seed corpus
  committed below, so every session/engine derives the IDENTICAL table
  (no binary artifact to version);
- :func:`bpe_encode` — the pure-Python reference encoder (greedy
  lowest-rank merge until fixpoint), the property-test oracle;
- :func:`bpe_token_counts` — the distributed operator: ``mapInPandas``
  over (id, text) with the merges table shipped in the closure
  (~KBs — broadcast-by-closure, the F1 pattern), a per-batch word
  cache (Zipf reuse makes the amortized per-word cost ~0), and NO
  shuffle: scan → narrow Arrow-batched map.

Scale shape at 100 TB: embarrassingly parallel over input splits; the
merge table is O(vocab) bytes per executor; output is two ints per doc.
The hot loop is per-UNIQUE-word within a batch, not per-byte-per-doc.
This is the honest sandbox stand-in for tiktoken/HF tokenizers — the
Spark plumbing (closure shipping, Arrow batching, schema contract) is
exactly what a real tokenizer UDF needs.
"""

from __future__ import annotations

import re
from functools import lru_cache

from pyspark.sql import DataFrame

#: pre-tokenizer: letter runs (with leading space kept, GPT-2 style),
#: digit runs, or single punctuation — deterministic and locale-free.
_PRETOKEN_RE = re.compile(r" ?[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]|\s")

#: fixed seed corpus the default merges are trained on. Plain public
#: English + code-ish fragments; chosen for stable, unexciting merges.
_SEED_CORPUS = (
    "the quick brown fox jumps over the lazy dog "
    "of and to in is it that for on with as at this the theory "
    "there then them these those other another together the "
    "user users session sessions event events item items view "
    "views add cart addtocart transaction transactions the "
    "return returns count counts window windows partition "
    "partitions token tokens budget budgets sample samples "
    "train training data dataset datasets model models "
    "def return import from class self none true false "
    "select where group by order limit join inner left "
    "ing tion ation er ed es re un de is at or an en "
) * 4


def _word_freqs(corpus: str) -> dict[tuple[str, ...], int]:
    freqs: dict[tuple[str, ...], int] = {}
    for m in _PRETOKEN_RE.finditer(corpus):
        w = tuple(m.group(0))
        freqs[w] = freqs.get(w, 0) + 1
    return freqs


def train_bpe(corpus: str, n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from ``corpus`` (Sennrich et al.,
    ACL 2016). Deterministic: ties on pair frequency break on the pair
    itself (lexicographic), so every run/engine derives the same table.
    Driver-side and tiny by construction — training at corpus scale is a
    separate (offline) concern; this engine CONSUMES a merges table."""
    freqs = _word_freqs(corpus)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, f in freqs.items():
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + f
        if not pair_counts:
            break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_freqs: dict[tuple[str, ...], int] = {}
        for w, f in freqs.items():
            out: list[str] = []
            i = 0
            while i < len(w):
                if i + 1 < len(w) and (w[i], w[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            t = tuple(out)
            new_freqs[t] = new_freqs.get(t, 0) + f
        freqs = new_freqs
    return merges


#: the committed default merges table (derived, not stored — identical
#: on every import because train_bpe is deterministic).
DEFAULT_MERGES: list[tuple[str, str]] = train_bpe(_SEED_CORPUS, 256)


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    parts: list[str] = list(word)
    while len(parts) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return tuple(parts)


def bpe_encode(
    text: str, merges: list[tuple[str, str]] | None = None
) -> list[str]:
    """Pure-Python reference encoder: pre-tokenize, then per word apply
    the LOWEST-RANK applicable merge until fixpoint (ties broken by
    position — leftmost). This is the oracle the distributed operator is
    property-tested against; it is also exactly what the operator runs
    per unique word."""
    ranks = {p: i for i, p in enumerate(merges or DEFAULT_MERGES)}
    out: list[str] = []
    for m in _PRETOKEN_RE.finditer(text):
        w = m.group(0)
        if w.isspace() and w != " ":
            continue  # newlines/tabs are pretoken separators, not tokens
        if w == " ":
            continue  # bare spaces fold into the following word's " x"
        out.extend(_encode_word(w, ranks))
    return out


def bpe_token_counts(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Per-document BPE token counts: ``(id, n_bpe_tokens, n_pretokens)``.

    ``mapInPandas`` (Arrow-batched — never the banned row-at-a-time
    Python UDF): the merges table rides the closure to each executor
    once; within a batch an ``lru_cache`` over unique words makes the
    merge loop amortized-free under Zipf reuse. NULL text counts 0/0
    with a NULL flag preserved via n_pretokens = NULL.

    Plan shape: scan → ArrowEvalPython(mapInPandas) → project. No
    shuffle, no driver collect; linear in input splits at any scale.
    """
    merge_list = list(merges or DEFAULT_MERGES)

    def _count(batches):
        import pandas as pd

        ranks = {p: i for i, p in enumerate(merge_list)}

        @lru_cache(maxsize=65536)
        def word_ntok(w: str) -> int:
            return len(_encode_word(w, ranks))

        def doc_counts(t):
            if t is None:
                return None, None
            n_bpe = 0
            n_pre = 0
            for m in _PRETOKEN_RE.finditer(t):
                w = m.group(0)
                if w == " " or (w.isspace() and w != " "):
                    continue
                n_pre += 1
                n_bpe += word_ntok(w)
            return n_bpe, n_pre

        for pdf in batches:
            pairs = [doc_counts(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bpe_tokens": pd.array(
                        [p[0] for p in pairs], dtype="Int64"
                    ),
                    "n_pretokens": pd.array(
                        [p[1] for p in pairs], dtype="Int64"
                    ),
                }
            )

    # carry the id's ACTUAL type through — hardcoding bigint would make
    # mapInPandas emit nulls/errors at runtime for string/int ids
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, n_bpe_tokens bigint, n_pretokens bigint"
    )
    return df.select(id_col, text_col).mapInPandas(_count, out_schema)
