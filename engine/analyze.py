"""Analysis chain: tokenize → lowercase → stop, plus per-doc norms.

Re-expression of the reference analyzer pipeline
(lucene/core .../analysis/standard/StandardTokenizer.java:48-199,
analysis/LowerCaseFilter.java:27, analysis/StopFilter.java:28,
StandardAnalyzer.java:39-88) as plain-function composition over batches.

Contract notes mirrored from the reference:
- Default analyzer = tokenize + lowercase with an EMPTY stopword set
  (StandardAnalyzer.java:51-53 — CharArraySet.EMPTY_SET by default).
- Tokens longer than ``max_token_length`` (default 255,
  StandardAnalyzer.java:39) are skipped — they are never indexed and do not
  count toward the field length used for norms (the tokenizer never emits
  them: StandardTokenizer.java:152-175).
- The default token pattern is the documented ASCII/Latin subset of UAX#29
  word-break: maximal runs of [a-z0-9] over lowercased text. The fixture
  corpus is ASCII web text, so this subset is exhaustive for it; the DuckDB
  oracle expression is ``regexp_extract_all(lower(text), '[a-z0-9]+')``.

Everything returns flat numpy/Arrow-friendly structures so the SPIMI
inverter can stay vectorized: one flat token list + an int64 lengths array
per batch (no per-row Python objects leak out of this module).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.java:39 (maxTokenLength default)

# Maximal alnum runs; lowercasing is applied to the whole text first, which
# is equivalent to per-token lowercase for this ASCII pattern.
TOKEN_RE = re.compile(r"[a-z0-9]+")
# fast screen for over-long tokens (C-speed) so the per-token length filter
# only runs on documents that actually contain one
_LONG_RE = re.compile(r"[a-z0-9]{256,}")


@dataclass(frozen=True)
class Analyzer:
    """Composable analysis config (the reference's Analyzer subclass surface,
    analysis/Analyzer.java — here: a token regex + stopword set + max len)."""

    token_pattern: str = r"[a-z0-9]+"
    stopwords: frozenset[str] = field(default_factory=frozenset)
    max_token_length: int = MAX_TOKEN_LENGTH

    def compiled(self) -> re.Pattern[str]:
        return re.compile(self.token_pattern)


DEFAULT_ANALYZER = Analyzer()

# ---------------------------------------------------------------------------
# Unicode analyzer — the UAX#29 word-break subset StandardTokenizer
# implements for non-Latin web text (StandardTokenizerImpl.java token
# types; StandardTokenizer.java:48):
#   - Han ideographs (+ ext-A, compat) and Hiragana emit ONE TOKEN PER
#     CHARACTER (IDEOGRAPHIC / HIRAGANA types);
#   - Katakana and Hangul form maximal runs (KATAKANA / HANGUL types);
#   - every other letter/digit forms maximal alnum runs (ALPHANUM),
#     lowercased (LowerCaseFilter) — accents/Greek/Cyrillic included.
# Python re has no \p classes, so the CJK blocks are explicit ranges and
# the alnum run branch excludes them with a lookahead. This is the
# documented CJK extension of the default ASCII subset: a lang=zh/ja/ko
# Common-Crawl page indexes real per-ideograph tokens instead of garbage.
# ---------------------------------------------------------------------------

_HAN_HIRA = "぀-ゟ㐀-䶿一-鿿豈-﫿"
_KATAKANA = "゠-ヿㇰ-ㇿ"
_HANGUL = "ᄀ-ᇿ가-힯"
UNICODE_TOKEN_PATTERN = (
    f"[{_HAN_HIRA}]"
    f"|[{_KATAKANA}]+"
    f"|[{_HANGUL}]+"
    f"|(?:(?![{_HAN_HIRA}{_KATAKANA}{_HANGUL}])[^\\W_])+"
)

UNICODE_ANALYZER = Analyzer(token_pattern=UNICODE_TOKEN_PATTERN)


def tokenize(text: str, analyzer: Analyzer = DEFAULT_ANALYZER) -> list[str]:
    """Tokens for one document (lowercased, stopped, long tokens skipped)."""
    toks = analyzer.compiled().findall(text.lower())
    mx = analyzer.max_token_length
    stop = analyzer.stopwords
    if stop:
        return [t for t in toks if len(t) <= mx and t not in stop]
    return [t for t in toks if len(t) <= mx]


def analyze_batch(
    texts: list[str], analyzer: Analyzer = DEFAULT_ANALYZER
) -> tuple[list[str], np.ndarray]:
    """Analyze a batch of documents.

    Returns ``(flat_tokens, doc_lengths)`` where ``flat_tokens`` is every
    emitted token in document order and ``doc_lengths[i]`` is the number of
    tokens emitted for document i (the BM25 norm input: FieldInvertState
    length, DefaultIndexingChain.java:965-1112).
    """
    pat = analyzer.compiled()
    mx = analyzer.max_token_length
    stop = analyzer.stopwords
    flat: list[str] = []
    lengths = np.empty(len(texts), dtype=np.int64)
    append = flat.extend
    default = pat.pattern == DEFAULT_ANALYZER.token_pattern and mx == MAX_TOKEN_LENGTH
    for i, text in enumerate(texts):
        low = text.lower() if text else ""
        toks = pat.findall(low) if low else []
        if stop:
            toks = [t for t in toks if len(t) <= mx and t not in stop]
        elif toks and (
            (_LONG_RE.search(low) is not None)
            if default
            else any(len(t) > mx for t in toks)
        ):
            toks = [t for t in toks if len(t) <= mx]
        lengths[i] = len(toks)
        append(toks)
    return flat, lengths


def analyze_batch_with_positions(
    texts: list[str], analyzer: Analyzer = DEFAULT_ANALYZER
) -> tuple[list[str], np.ndarray, np.ndarray]:
    """``analyze_batch`` plus per-token POSITIONS with position-increment
    gaps: a removed stopword (StopFilter.java:28 — posIncr accumulates
    across removed tokens) or a skipped over-long token
    (StandardTokenizer.java:152-175 — skipped but still increments
    position) advances the position counter, so phrases across a removed
    token do NOT match adjacently. Each kept token's position is its index
    in the PRE-filter token stream. With the default analyzer (no
    stopwords, no over-long tokens present) positions equal the emitted
    index and the whole path stays vectorized."""
    pat = analyzer.compiled()
    mx = analyzer.max_token_length
    stop = analyzer.stopwords
    flat: list[str] = []
    positions: list[int] = []
    lengths = np.empty(len(texts), dtype=np.int64)
    default = pat.pattern == DEFAULT_ANALYZER.token_pattern and mx == MAX_TOKEN_LENGTH
    gaps_possible = bool(stop)
    for i, text in enumerate(texts):
        low = text.lower() if text else ""
        toks = pat.findall(low) if low else []
        has_long = bool(toks) and (
            (_LONG_RE.search(low) is not None)
            if default
            else any(len(t) > mx for t in toks)
        )
        if gaps_possible or has_long:
            kept = [
                (j, t)
                for j, t in enumerate(toks)
                if len(t) <= mx and t not in stop
            ]
            lengths[i] = len(kept)
            flat.extend(t for _, t in kept)
            positions.extend(j for j, _ in kept)
        else:
            lengths[i] = len(toks)
            flat.extend(toks)
            positions.extend(range(len(toks)))
    return flat, lengths, np.asarray(positions, dtype=np.int64)


def analyze_batch_with_offsets(
    texts: list[str], analyzer: Analyzer = DEFAULT_ANALYZER
) -> tuple[list[str], np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """``analyze_batch_with_positions`` plus per-token CHARACTER offsets
    (start, end) from the tokenizer spans — the
    DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS analysis contract
    (OffsetAttribute from StandardTokenizer's zzStartRead spans;
    index/IndexOptions.java:28). Offsets refer to the LOWERCASED text;
    for this engine's token patterns lowercasing is length-preserving on
    every character that can start or continue a token, so they are valid
    spans of the original text as stored.

    Returns (flat_tokens, doc_lengths, positions, starts, ends)."""
    pat = analyzer.compiled()
    mx = analyzer.max_token_length
    stop = analyzer.stopwords
    flat: list[str] = []
    positions: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    lengths = np.empty(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        low = text.lower() if text else ""
        n_kept = 0
        for j, m in enumerate(pat.finditer(low)):
            t = m.group(0)
            if len(t) > mx or (stop and t in stop):
                continue  # skipped tokens still advance the position
            flat.append(t)
            positions.append(j)
            starts.append(m.start())
            ends.append(m.end())
            n_kept += 1
        lengths[i] = n_kept
    return (
        flat,
        lengths,
        np.asarray(positions, dtype=np.int64),
        np.asarray(starts, dtype=np.int64),
        np.asarray(ends, dtype=np.int64),
    )


def compute_norms(doc_lengths: np.ndarray) -> np.ndarray:
    """Per-doc norm bytes: SmallFloat.intToByte4(numTerms)
    (BM25Similarity.java:115-126, discountOverlaps default — no overlap
    tokens exist in this chain, so numTerms == emitted token count)."""
    from .smallfloat import int_to_byte4_array

    return int_to_byte4_array(doc_lengths)
