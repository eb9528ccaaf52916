"""Text column expressions (all JVM-side, whole-stage-codegen friendly).

Tokenization parity: the reference splits on non-letter/non-digit runes
(``strings.FieldsFunc`` with ``!IsLetter && !IsNumber`` —
src/main/wc.go:16-29, src/main/ii.go:17-31). We use the ASCII-alnum
regex class, which is identical on the synthetic corpus and keeps the
same regex runnable in the DuckDB oracle.

Everything here is a pure Column function — no UDFs — so the operators
built on top stay inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Same class in Spark (Java regex) and DuckDB (RE2): safe for oracles.
TOKEN_SPLIT_RE = "[^A-Za-z0-9]+"
# The findall complement of TOKEN_SPLIT_RE (DERIVED, so the two
# tokenizer spellings cannot drift — ADVICE r8): Python re callers
# (bigram_pmi's fused gram counter) match tokens with this instead of
# redefining the class locally.
TOKEN_MATCH_RE = TOKEN_SPLIT_RE.replace("[^", "[", 1)
assert TOKEN_MATCH_RE == "[A-Za-z0-9]+"

# Tiny per-language stopword sets for the n-gram/lexicon lang-id
# heuristic. Deterministic and SQL-expressible on both engines.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"),
    "es": ("el", "la", "que", "de", "los", "una", "es", "por", "con", "para"),
    "zh": ("de", "shi", "le", "zai", "you", "wo", "ta", "men", "zhe", "bu"),
}

EN_STOPWORDS = LANG_LEXICONS["en"]


def tokens(col: Column | str) -> Column:
    """Split into alnum tokens, dropping empty strings (T2).

    ASCII class, matching the DuckDB oracles exactly. The reference's
    tokenizer is Unicode-class based (Go unicode.IsLetter/IsNumber,
    main/wc.go:18-22) — use ``tokens_unicode`` for that parity.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def tokens_unicode(col: Column | str) -> Column:
    """Unicode tokenizer: splits on any non-letter/non-digit code point
    (Java regex ``\\p{L}\\p{N}`` == Go's IsLetter/IsNumber classes,
    main/wc.go:18-22) — accented/CJK text tokenizes correctly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"[^\p{L}\p{N}]+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    """Whitespace/punct token count — [EXT] token counting.

    ``regexp_count`` of alnum runs ≡ ``size(tokens(col))`` but single-
    pass and codegen'd: the array HOF path (split → filter) is
    interpreted per element and measured 6.5× slower at the 20× tier.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit("[A-Za-z0-9]+"))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish proxy: alnum runs + each punct char counts as a token.

    A real BPE needs a vocab file; this regex estimate (word pieces +
    punctuation marks) is the standard cheap proxy and stays JVM-side.
    """
    c = F.col(col) if isinstance(col, str) else col
    # non-alnum-non-space chars, via positive classes: every char is
    # exactly one of alnum / whitespace / other, and Java regex runs
    # negated classes ~15× slower than positive ones (measured 3.2 s vs
    # 0.2 s per class over the 20× tier)
    punct = (
        F.length(c)
        - F.regexp_count(c, F.lit("[A-Za-z0-9]"))
        - F.regexp_count(c, F.lit("\\s"))
    )
    return token_count(c) + punct


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    p = F.regexp_count(c, F.lit("[.,;:!?]"))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def word_set_pattern(words: tuple[str, ...]) -> str:
    """Regex matching any of ``words`` exactly at token boundaries of
    the `[^A-Za-z0-9]+`-split tokenizer: lookarounds assert no adjacent
    alnum, so matches are in 1:1 correspondence with whole tokens —
    unlike ``\\b``, which treats '_' as a word char."""
    import re as _re

    alt = "|".join(_re.escape(w) for w in words)
    return f"(?<![a-z0-9])({alt})(?![a-z0-9])"


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are (lowercased) stopwords.

    One ``regexp_count`` pass over the lowered text (boundary-anchored
    alternation) ≡ counting stopword members of the token array; the
    HOF form (transform + filter + isin) measured 28× slower."""
    c = F.col(col) if isinstance(col, str) else col
    hits = F.regexp_count(F.lower(c), F.lit(word_set_pattern(stopwords)))
    n = token_count(c)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text_col: Column | str) -> Column:
    """[EXT] deterministic quality score in [0,1].

    Blend of length band, stopword presence, and punctuation sanity —
    the standard cheap heuristics a pretraining filter applies. The
    exact formula is mirrored in the DuckDB oracle (see registry).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n_tok = token_count(c).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    sw = stopword_ratio(c)
    sw_score = F.least(sw * F.lit(5.0), F.lit(1.0))
    punct_pen = F.least(punct_ratio(c) * F.lit(4.0), F.lit(1.0))
    return F.round(
        F.lit(0.5) * len_score + F.lit(0.4) * sw_score + F.lit(0.1) * (F.lit(1.0) - punct_pen),
        6,
    )


def normalize_text(col: Column | str) -> Column:
    """Lowercase + whitespace-collapse + trim — canonical form for dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """[EXT] document fingerprint: md5 of the normalized text.

    md5 exists verbatim in DuckDB so the oracle matches bit-for-bit. A
    rolling/winnowing fingerprint variant lives in operators/dedup.py
    (simhash) where cross-engine parity is not required.
    """
    return F.md5(normalize_text(col))


def rolling_fingerprint(col: Column | str, modulus: int = 2_147_483_647) -> Column:
    """[EXT] polynomial rolling hash over the token stream
    (Rabin-Karp-style): ``h = h·B + hash(token) mod M``, folded with
    ``F.aggregate`` — pure JVM, order-sensitive (unlike a token-set
    hash, reordered documents fingerprint differently), and incremental
    by construction. Terms stay under 2^51, so ANSI mode never
    overflows. B=1000003 (prime), M=2^31-1 (Mersenne prime).
    """
    B = 1_000_003
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        tokens(c),
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * B + F.pmod(F.xxhash64(t), F.lit(modulus)), F.lit(modulus)
        ),
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the token stream, as one array.

    Implementation note (measured): referencing the token array inside a
    higher-order-function lambda re-evaluates the whole split per
    element (no CSE on the interpreted HOF path), so this builds the
    n-gram windows with ``arrays_zip`` of shifted slices — each input
    array evaluates O(n) times per ROW, not per element. For the
    operators that explode shingles anyway (dedup/minhash), prefer
    ``operators.dedup.shingle_rows`` — posexplode + window-lead — whose
    doc_id shuffle is reused by their downstream aggregation.
    """
    toks = tokens(col)
    parts = [
        F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0))).alias(f"t{k}")
        for k in range(n)
    ]
    zipped = F.arrays_zip(*parts)
    lim = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    windows = F.slice(zipped, 1, lim)
    grams = F.transform(
        windows, lambda s: F.concat_ws(" ", *[s[f"t{k}"] for k in range(n)])
    )
    return F.array_distinct(grams)
