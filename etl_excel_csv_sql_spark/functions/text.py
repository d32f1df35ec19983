"""Text-analysis column expressions for large-scale corpus pipelines.

All pure built-in expressions (split/filter/transform/aggregate) — they run
inside codegen on executors, shuffle nothing by themselves, and scale
linearly with the corpus. Designed for the ``documents`` table
(doc_id, text, lang, source, n_chars) but column-generic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str

#: Tiny embedded stopword lists per language for the n-gram/stopword
#: language-ID heuristic and quality scoring. Deliberately small: real
#: deployments plug in their own lists via the ``stopwords=`` params.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "mit"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "es", "los"),
    "fr": ("le", "la", "de", "et", "un", "une", "est", "que", "les", "dans"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不", "这", "人"),
}


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_text(text: ColumnOrName) -> Column:
    """Lowercase + collapse whitespace — canonical form for exact-dup
    fingerprinting."""
    return F.trim(F.regexp_replace(F.lower(_col(text)), r"\s+", " "))


def tokens(text: ColumnOrName) -> Column:
    """Whitespace tokenization → array<string>. Empty text → empty array."""
    trimmed = F.trim(_col(text))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: ColumnOrName) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: ColumnOrName) -> Column:
    """Approximate subword token count: regex-split into word pieces,
    numbers, and punctuation runs (a BPE-ish proxy — counts the units a
    byte-pair tokenizer would rarely merge across)."""
    pieces = F.regexp_extract_all(
        _col(text), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
    )
    return F.size(pieces)


def punct_ratio(text: ColumnOrName) -> Column:
    """Fraction of non-whitespace characters that are punctuation."""
    t = _col(text)
    non_ws = F.length(F.regexp_replace(t, r"\s", ""))
    non_punct_non_ws = F.length(F.regexp_replace(t, r"[\s\p{Punct}]", ""))
    return F.when(non_ws > 0, (non_ws - non_punct_non_ws) / non_ws).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(
    text: ColumnOrName, stopwords: tuple[str, ...] = STOPWORDS["en"]
) -> Column:
    """Fraction of tokens that are stopwords (quality signal: natural prose
    has a stable stopword ratio; keyword spam / boilerplate does not)."""
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.array_intersect(toks, sw))
    # array_intersect dedups; count actual occurrences instead:
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: ColumnOrName) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    low punctuation density. A cheap pre-filter for training-data pipelines;
    tune weights per corpus."""
    tc = token_count(text)
    length_ok = F.when((tc >= 10) & (tc <= 10_000), 1.0).otherwise(0.0)
    sw_ok = F.when(stopword_ratio(text) > 0.01, 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) < 0.3, 1.0).otherwise(0.0)
    return (length_ok + sw_ok + punct_ok) / F.lit(3.0)


def lang_scores(text: ColumnOrName) -> Column:
    """map<lang,double>: per-language stopword hit-rate."""
    toks = tokens(text)
    entries = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
        score = F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))
        entries.extend([F.lit(lang), score])
    return F.create_map(*entries)


def lang_id(text: ColumnOrName, default: str = "en") -> Column:
    """Heuristic language ID: argmax over per-language stopword hit-rates,
    ties broken by language code order; no hits at all → ``default``.

    This is the n-gram-free stopword variant — adequate for corpus routing;
    swap in a real classifier (pandas_udf) for production labeling.
    """
    scores = lang_scores(text)
    langs = sorted(STOPWORDS)
    best_lang, best_score = F.lit(default), F.lit(0.0)
    for lang in langs:
        s = scores.getItem(lang)
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def word_shingles(text: ColumnOrName, n: int = 3) -> Column:
    """Array of n-word shingles (distinct), the unit set for Jaccard /
    MinHash near-dup detection. Documents shorter than n words yield a
    single shingle of the whole text."""
    toks = tokens(text)
    k = F.size(toks)
    shingled = F.transform(
        F.sequence(F.lit(0), k - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    whole = F.array(F.array_join(toks, " "))
    return F.array_distinct(F.when(k >= n, shingled).otherwise(whole))


def positional_word_ngrams(text: ColumnOrName, n: int = 5) -> Column:
    """Array of ALL n-word grams in order (duplicates kept — one entry per
    token position), the unit for exact repeated-span detection (Lee et
    al., "Deduplicating Training Data Makes Language Models Better":
    duplicated spans are counted per occurrence, not per distinct value).
    Documents shorter than n words yield the whole text as one gram."""
    toks = tokens(text)
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), k - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    whole = F.array(F.array_join(toks, " "))
    return F.when(k >= n, grams).otherwise(whole)


def char_ngrams(text: ColumnOrName, n: int = 5) -> Column:
    """Array of distinct character n-grams (SimHash / fingerprint unit)."""
    t = _col(text)
    ln = F.length(t)
    grams = F.transform(
        F.sequence(F.lit(1), ln - n + 1), lambda i: F.substring(t, i, F.lit(n))
    )
    whole = F.array(t)
    return F.array_distinct(F.when(ln >= n, grams).otherwise(whole))


#: Redaction patterns: deliberately simple alternation-free regexes that
#: behave identically under Java regex (Spark) and RE2 (DuckDB oracle).
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "PHONE": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "IPV4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def redact_pii(text: ColumnOrName, kinds: tuple[str, ...] = ("EMAIL", "PHONE", "IPV4")) -> Column:
    """Replace PII-shaped spans with ``<KIND>`` placeholders — the cheap
    regex pass a training-data pipeline runs before anything ships.
    Pattern order matters (emails before phones so digits inside an
    address aren't half-eaten); patterns are intentionally conservative —
    a production pipeline layers an ML pass on top."""
    out = _col(text)
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind}>")
    return out


def rolling_hash(text: ColumnOrName, base: int = 31, mod: int = 2**61 - 1) -> Column:
    """Polynomial rolling hash over the token stream — an order-sensitive
    document fingerprint (exact-dup detection robust to trailing whitespace
    but not to reordering, unlike set-based shingles).

    h = ((h * base) + token_hash) mod m, folded left over tokens via
    ``aggregate`` — pure JVM expression.
    """
    toks = tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, t: (
            (acc * base + F.abs(F.xxhash64(t)) % F.lit(mod)) % F.lit(mod)
        ).cast("decimal(38,0)"),
    ).cast("long")
