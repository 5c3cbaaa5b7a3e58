"""1:1 token filters for the analysis chain: Porter stemming + ASCII folding.

Reference roles:
- Porter stemmer: lucene/analysis/common .../en/PorterStemFilter.java:38-55
  wrapping .../tartarus/PorterStemmer.java (Martin Porter's 1980 algorithm,
  implemented here fresh from the published algorithm, not ported from the
  Java). Applied AFTER LowerCase+Stop, matching EnglishAnalyzer.java:108-118
  chain order (tokenize -> lowercase -> stop -> stem).
- ASCII folding: .../miscellaneous/ASCIIFoldingFilter.java:38-117 — maps
  Latin Unicode (accents, ligatures) to ASCII equivalents. The Java file is
  a 3,000-case generated switch; here NFKD decomposition + combining-mark
  strip covers the accent classes and an explicit table covers the
  non-decomposing ligatures/specials the filter documents.

"asciifold" is meaningful with the UNICODE analyzer (analyze.py
UNICODE_ANALYZER): the default ASCII token pattern drops non-ASCII chars at
tokenization, before any filter runs (the same reason Lucene puts
ASCIIFoldingFilter after a Unicode-aware tokenizer).

Both filters are token→token (1:1, never drop or split), so positions,
offsets and norm lengths from the tokenizer are unchanged — they plug into
every analyze_* path as a flat-list map. Per-process memo caches make the
cost O(vocabulary), not O(tokens): web text re-uses a small vocab per batch.
"""

from __future__ import annotations

import unicodedata

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V] — the number of vowel→consonant transitions."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        if _is_cons(stem, i):
            if prev_vowel:
                m += 1
            prev_vowel = False
        else:
            prev_vowel = True
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (
        len(w) >= 2
        and w[-1] == w[-2]
        and _is_cons(w, len(w) - 1)
    )


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def porter_stem(word: str) -> str:
    """The 1980 Porter algorithm over one lowercase token. Tokens shorter
    than 3 chars are returned unchanged (PorterStemmer.java k <= 1 guard)."""
    w = word
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses") or w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("s") and not w.endswith("ss"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        fired = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            fired = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            fired = True
        if fired:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    break
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


# non-decomposing chars ASCIIFoldingFilter maps explicitly (NFKD leaves
# these intact); the common Latin-1 / Latin Extended-A set
_FOLD_SPECIALS = {
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ß": "ss", "ẞ": "SS",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D",
    "ð": "d", "Ð": "D", "þ": "th", "Þ": "TH",
    "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
    "ı": "i", "ĸ": "q", "ŋ": "n", "Ŋ": "N",
    "ŧ": "t", "Ŧ": "T", "ƒ": "f",
}
_FOLD_TABLE = str.maketrans(_FOLD_SPECIALS)


def fold_ascii(token: str) -> str:
    """Fold accented/ligature Latin characters to ASCII
    (ASCIIFoldingFilter.java:38 contract: output contains only chars < 0x80
    for the mapped classes; unmapped non-Latin chars pass through)."""
    if token.isascii():
        return token
    folded = token.translate(_FOLD_TABLE)
    decomposed = unicodedata.normalize("NFKD", folded)
    return "".join(c for c in decomposed if not unicodedata.combining(c))


# --- phonetic --------------------------------------------------------------

_SOUNDEX_CODE = {
    **dict.fromkeys("bfpv", "1"),
    **dict.fromkeys("cgjkqsxz", "2"),
    **dict.fromkeys("dt", "3"),
    "l": "4",
    **dict.fromkeys("mn", "5"),
    "r": "6",
}


def soundex(token: str) -> str:
    """American Soundex (the algorithm Lucene's PhoneticFilter applies via
    commons-codec Soundex — analysis/phonetic/PhoneticFilter.java:35-77
    role; implemented fresh from the published algorithm): first letter +
    3 consonant-class digits; adjacent same-class letters collapse, also
    across 'h'/'w'; vowels reset the adjacency. Non-alphabetic tokens pass
    through unchanged (the filter only encodes letter tokens)."""
    if not token or not token.isalpha() or not token.isascii():
        return token
    t = token.lower()
    out = [t[0].upper()]
    prev = _SOUNDEX_CODE.get(t[0], "")
    for ch in t[1:]:
        code = _SOUNDEX_CODE.get(ch)
        if code is None:
            # 'h'/'w' are transparent (adjacency survives); vowels reset
            if ch not in "hw":
                prev = ""
            continue
        if code != prev:
            out.append(code)
            if len(out) == 4:
                return "".join(out)
        prev = code
    return "".join(out) + "0" * (4 - len(out))


# --- filter registry -------------------------------------------------------
# Named 1:1 filters the Analyzer config can chain (Analyzer.filters).
# Each is str -> str and must never return "" for a non-"" token.
def reverse_string(token: str, marker: str = "") -> str:
    """ReverseStringFilter (analysis/reverse/ReverseStringFilter.java:26-33):
    reverse the token, optionally prepending a marker char that keeps
    reversed terms out of the forward dictionary's term space (the Solr
    ReversedWildcardFilterFactory convention, marker U+0001)."""
    return marker + token[::-1]


def reverse_token(token: str) -> str:
    return token[::-1]


FILTERS = {
    "porter": porter_stem,
    "asciifold": fold_ascii,
    "soundex": soundex,
    "reverse": reverse_token,
}


def apply_filters(tokens: list[str], names: tuple[str, ...], _caches={}) -> list[str]:
    """Apply the named filter chain to a flat token list through a
    per-process memo (keyed by the chain) — O(distinct tokens) filter calls
    per worker, vectorized dict-lookup for repeats."""
    if not names:
        return tokens
    fns = [FILTERS[n] for n in names]
    cache = _caches.setdefault(names, {})
    out = []
    get = cache.get
    for t in tokens:
        v = get(t)
        if v is None:
            v = t
            for fn in fns:
                v = fn(v)
            cache[t] = v
        out.append(v)
    return out


# ---------------------------------------------------------------------------
# WordDelimiterGraphFilter (analysis/common/.../miscellaneous/
# WordDelimiterGraphFilter.java + WordDelimiterIterator.java) — the
# camelCase / product-code / possessive splitter of Solr's text_en_splitting
# chain, ASCII char classes (the corpus subset; the reference consults
# Character.getType for the full Unicode table).

_WD_LOWER, _WD_UPPER, _WD_DIGIT, _WD_DELIM = 0x01, 0x02, 0x04, 0x08
_WD_ALPHA = _WD_LOWER | _WD_UPPER
_WD_DONE = -1


def _wd_type(ch: str) -> int:
    if "a" <= ch <= "z":
        return _WD_LOWER
    if "A" <= ch <= "Z":
        return _WD_UPPER
    if "0" <= ch <= "9":
        return _WD_DIGIT
    return _WD_DELIM


class _WDIterator:
    """WordDelimiterIterator.java:134-259 faithful port: subword bounds
    with leading/trailing-delimiter trim, isBreak transition table, and
    the English-possessive ('s) skip."""

    def __init__(self, text: str, split_case: bool, split_num: bool, poss: bool):
        self.text = text
        self.split_case = split_case
        self.split_num = split_num
        self.poss = poss
        self.length = self.end_bounds = len(text)
        self.current = self.start_bounds = self.end = 0
        self.skip_possessive = self.has_final_possessive = False
        # setBounds (:254-263)
        while self.start_bounds < self.length and _wd_type(text[self.start_bounds]) == _WD_DELIM:
            self.start_bounds += 1
        while self.end_bounds > self.start_bounds and _wd_type(text[self.end_bounds - 1]) == _WD_DELIM:
            self.end_bounds -= 1
        if self._ends_with_possessive(self.end_bounds):
            self.has_final_possessive = True
        self.current = self.start_bounds

    def _ends_with_possessive(self, pos: int) -> bool:
        t = self.text
        return (
            self.poss
            and pos > 2
            and t[pos - 2] == "'"
            and t[pos - 1] in "sS"
            and _wd_type(t[pos - 3]) & _WD_ALPHA
            and (pos == self.end_bounds or _wd_type(t[pos]) == _WD_DELIM)
        )

    def _is_break(self, last: int, cur: int) -> bool:
        # isBreak (:216-236)
        if cur & last:
            return False
        if not self.split_case and (last & _WD_ALPHA) and (cur & _WD_ALPHA):
            return False
        if (last & _WD_UPPER) and (cur & _WD_ALPHA):
            return False  # UPPER->letter never splits
        if not self.split_num and (
            ((last & _WD_ALPHA) and cur == _WD_DIGIT)
            or (last == _WD_DIGIT and (cur & _WD_ALPHA))
        ):
            return False
        return True

    def next(self) -> int:
        self.current = self.end
        if self.current == _WD_DONE:
            return _WD_DONE
        if self.skip_possessive:
            self.current += 2
            self.skip_possessive = False
        last = 0
        while self.current < self.end_bounds and (
            (last := _wd_type(self.text[self.current])) == _WD_DELIM
        ):
            self.current += 1
        if self.current >= self.end_bounds:
            self.end = _WD_DONE
            return _WD_DONE
        self.end = self.current + 1
        while self.end < self.end_bounds:
            t = _wd_type(self.text[self.end])
            if self._is_break(last, t):
                break
            last = t
            self.end += 1
        if self.end < self.end_bounds - 1 and self._ends_with_possessive(self.end + 2):
            self.skip_possessive = True
        return self.end

    def type(self) -> int:
        t = _wd_type(self.text[self.current])
        return _WD_ALPHA if t & _WD_ALPHA else t

    def is_single_word(self) -> bool:
        if self.has_final_possessive:
            return self.current == self.start_bounds and self.end == self.end_bounds - 2
        return self.current == self.start_bounds and self.end == self.end_bounds


def word_delimiter_parts(
    token: str,
    *,
    generate_word_parts: bool = True,
    generate_number_parts: bool = True,
    catenate_words: bool = False,
    catenate_numbers: bool = False,
    catenate_all: bool = False,
    preserve_original: bool = False,
    split_on_case_change: bool = True,
    split_on_numerics: bool = True,
    stem_english_possessive: bool = True,
) -> list[str]:
    """Emitted terms for one input token, in the reference's buffer order
    (WordDelimiterGraphFilter.bufferWordParts: original first, parts as
    the iterator yields them, each words/numbers catenation at its flush
    point, catenate-all last with the subwordCount > lastConcatCount
    dedup). Tokens with no delimiter pass through unchanged (:146-151);
    all-delimiter tokens drop unless preserved (:158-166)."""
    it = _WDIterator(
        token, split_on_case_change, split_on_numerics, stem_english_possessive
    )
    it.next()
    if it.current == 0 and it.end == len(token):
        return [token]
    if it.end == _WD_DONE:
        return [token] if preserve_original else []

    def _gen(wtype: int) -> bool:
        return (generate_word_parts and bool(wtype & _WD_ALPHA)) or (
            generate_number_parts and wtype == _WD_DIGIT
        )

    def _cat(wtype: int) -> bool:
        return (catenate_words and bool(wtype & _WD_ALPHA)) or (
            catenate_numbers and wtype == _WD_DIGIT
        )

    out: list[str] = []
    if preserve_original:
        out.append(token)
    if it.is_single_word():
        out.append(token[it.current : it.end])
        return out

    concat: list[str] = []
    concat_type = 0
    concat_all: list[str] = []
    last_concat_count = 0

    def _flush() -> None:
        nonlocal last_concat_count
        last_concat_count = len(concat)
        if len(concat) != 1 or not _gen(concat_type):
            out.append("".join(concat))
        concat.clear()

    while it.end != _WD_DONE:
        wtype = it.type()
        part = token[it.current : it.end]
        if concat and not (concat_type & wtype):
            _flush()
        if _cat(wtype):
            if not concat:
                concat_type = wtype
            concat.append(part)
        if catenate_all:
            concat_all.append(part)
        if _gen(wtype):
            out.append(part)
        it.next()
    if concat:
        _flush()
    if concat_all:
        # skip if identical to the combo just flushed (e.g. PowerShot
        # with CATENATE_WORDS already wrote the full catenation)
        if len(concat_all) > last_concat_count:
            out.append("".join(concat_all))
    return out
