"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All pure Column expressions (regex + array ops)
— zero Python in the row loop, so they ride whole-stage codegen at any
scale.  Formulas are deliberately SQL-portable for oracle checking.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from numpy.lib.stride_tricks import sliding_window_view
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# minimal per-language stopword lists (public common words)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "nicht"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "就", "不", "人"],
}

# word-ish tokens: runs of word chars OR single non-space punctuation —
# the BPE-style pre-tokenizer split
BPE_TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def words(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def portable_words(text: Column, digits: bool = True) -> Column:
    """Engine-portable word tokenizer: split on non-alphanumerics FIRST,
    then lowercase the pure-ASCII tokens.  Immune to the Unicode
    special-casing divergence recorded in docs/DEVIATIONS.md (Java's
    lower() maps U+0130 'İ' to two codepoints, DuckDB's utf8proc to one,
    so lower-then-split tokenizes differently between engines).  New
    operators should use this form; the older lower-then-split
    tokenizers above keep their long-green oracle hashes."""
    cls = "[^A-Za-z0-9]+" if digits else "[^A-Za-z]+"
    return F.transform(
        F.filter(F.split(text, cls), lambda w: F.length(w) > 0),
        F.lower)


def token_count(text: Column) -> Column:
    """BPE-ish token count (regex pre-tokenization)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def whitespace_token_count(text: Column) -> Column:
    return F.size(words(text))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    w = words(text)
    sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    hits = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
    return hits / F.greatest(F.size(w), F.lit(1))


def quality_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     keep_cols: list[str] | None = None) -> DataFrame:
    """(id, [keep_cols...,] n_chars, n_words, avg_word_len, punct_ratio,
    stopword_ratio, quality_score) — the classic cheap quality filters.
    `keep_cols` are passed through untouched so downstream stages (e.g.
    the curation funnel) never need a re-join on id."""
    t = F.col(text_col)
    w = words(t)
    n_words = F.size(w)
    avg_wl = F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long")) / F.greatest(n_words, F.lit(1))
    pr = punct_ratio(t)
    sr = stopword_ratio(t, "en")
    score = (
        F.when(n_words < 5, 0.0)
        .otherwise(
            F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
            + (F.lit(1.0) - F.least(pr * 5, F.lit(1.0))) * 0.3
            + F.least(sr * 4, F.lit(1.0)) * 0.3
        )
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.length(t).alias("n_chars"),
        n_words.alias("n_words"),
        F.round(avg_wl, 6).alias("avg_word_len"),
        F.round(pr, 6).alias("punct_ratio"),
        F.round(sr, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def _stopword_best(text: Column) -> Column:
    """struct(score, lang) of the argmax stopword-overlap language for
    `text` — the shared scoring expression behind `language_id` and
    `language_confusion`.  Pure codegen'd Columns."""
    w = words(text)
    n = F.greatest(F.size(w), F.lit(1))

    def sw_filter(lang: str):
        sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
        return lambda x: F.array_contains(sw, x)

    scored = F.array(*[
        F.struct(
            (F.size(F.filter(w, sw_filter(lang))) / n).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(STOPWORDS)
    ])
    # array_max on struct compares field-wise: score first, then lang —
    # ties break to the LAST lang lexicographically; invert lang for
    # deterministic first-wins ordering is overkill: keep struct order
    return F.array_max(scored)


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, pred_lang, pred_score) — stopword-overlap heuristic language ID.

    score_lang = |words ∩ stopwords_lang| / |words|; argmax with a fixed
    tie order (lexicographic by language code)."""
    best = _stopword_best(F.col(text_col))
    return df.select(
        F.col(id_col),
        best.getField("lang").alias("pred_lang"),
        F.round(best.getField("score"), 6).alias("pred_score"),
    )


def language_confusion(df: DataFrame, text_col: str = "text",
                       label_col: str = "lang") -> DataFrame:
    """(lang, pred_lang, n_docs, frac) — confusion matrix of the corpus's
    labeled language column against the stopword-heuristic prediction.

    The standard label-quality diagnostic for a multilingual training
    corpus: off-diagonal mass = documents whose declared language the
    cheap classifier disagrees with (mislabeled ingestion, code-mixed
    docs, or boilerplate-dominated text).  `frac` is row-normalized
    within the labeled language, so each lang row sums to 1.

    Scale design (10^12 rows): prediction is per-row codegen'd Column
    arithmetic (no shuffle); the only exchange is a map-side-combined
    groupBy over (lang, pred_lang) — at most |langs|^2 groups — and the
    row-normalizing totals join is a broadcast of a |langs|-row table.
    Counts are integers, so the output hash is independent of
    parallelism and input order."""
    best = _stopword_best(F.col(text_col))
    cells = (
        df.select(F.col(label_col).alias("lang"),
                  best.getField("lang").alias("pred_lang"))
        .groupBy("lang", "pred_lang").agg(F.count("*").alias("n_docs"))
    )
    totals = cells.groupBy("lang").agg(F.sum("n_docs").alias("_tot"))
    return (
        cells.join(F.broadcast(totals), "lang")
        .select(
            "lang", "pred_lang", "n_docs",
            F.round(F.col("n_docs") * F.lit(1.0) / F.col("_tot"), 6).alias("frac"),
        )
    )


# characteristic character n-grams per language (public linguistic
# commonplace: frequent trigrams incl. word-boundary spaces; single chars
# for zh).  Deliberately small so the score is a cheap profile-hit rate.
CHAR_NGRAM_PROFILES: dict[str, list[str]] = {
    "en": [" th", "the", "he ", " an", "and", "ing", " of", "ion", "ent", " to"],
    "es": [" de", "de ", " la", "os ", " qu", "que", " el", "ció", "ent", " en"],
    "fr": [" de", "es ", " le", "ent", " qu", "que", "les", " la", "ion", " et"],
    "de": ["en ", "er ", "ch ", " de", "der", "die", "sch", "ein", "ung", " un"],
    "zh": ["的", "了", "是", "在", "我",
           "有", "和", "就", "不", "人"],
}


def language_id_ngram(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, pred_lang, pred_score) — character-n-gram heuristic language ID.

    score_lang = fraction of the language's characteristic n-grams that
    occur in the lowercased text (profile-hit rate); argmax, ties broken by
    struct comparison (score, then lang).  Pure codegen'd Column exprs —
    each profile n-gram is one `contains`."""
    t = F.lower(F.col(text_col))
    scored = F.array(*[
        F.struct(
            (sum((t.contains(F.lit(g)).cast("int") for g in grams), F.lit(0))
             / F.lit(float(len(grams)))).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, grams in sorted(CHAR_NGRAM_PROFILES.items())
    ])
    best = F.array_max(scored)
    return df.select(
        F.col(id_col),
        best.getField("lang").alias("pred_lang"),
        F.round(best.getField("score"), 6).alias("pred_score"),
    )


def winnowing_fingerprints(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 8, w: int = 4) -> DataFrame:
    """(id, prints array<long>) — winnowing document fingerprints
    (Schleimer, Wilkerson & Aiken, SIGMOD'03): hash every k-gram of the
    normalized text, slide a window of w consecutive hashes, keep each
    window's minimum; the distinct selected hashes are the fingerprint set.
    Two documents sharing any fingerprint share a ≥k-char run.

    The per-gram hash is the exact base-128 polynomial over the gram's
    ASCII codes (normalization leaves only [a-z0-9 ]): h = Σ c_j·128^(k-1-j).
    For k ≤ 8 that is at most 56 bits, so it fits an int64 with NO modulus —
    the hash is injective on k-grams (strictly better collision behavior
    than the former truncated-md5 digest) and exactly replicable in the
    DuckDB oracle via bit shifts.

    The whole Arrow batch vectorizes as ONE pipeline — no per-document
    Python: every kept document concatenates into a single byte buffer
    (k-byte NUL separators; boundary-spanning gram positions masked to
    int64-max so they never win a window), one sliding_window_view matmul
    hashes every gram, one global sliding minimum selects all windows, and
    the per-document unique-sorted fingerprint sets come from a lexsort +
    boundary-mask split.  That removes the former per-doc loop (the r2→r3
    ask) and keeps the batch CPU-viable at 100 TB.

    Normalization (lowercase, non-alnum→space, squeeze, trim — matching
    `fingerprint` exactly) runs JVM-side as codegen'd regexp_replace
    Columns BEFORE the UDF, so the Arrow batch arrives pre-normalized and
    the Python side spends its cycles only on the numpy hash pipeline
    (pandas .str regex was ~40% of the batch cost)."""
    if k > 8:
        raise ValueError("base-128 polynomial is exact only for k <= 8")
    weights = np.left_shift(np.int64(1), 7 * np.arange(k - 1, -1, -1, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def win_udf(texts: pd.Series) -> pd.Series:
        imax = np.iinfo(np.int64).max
        n = len(texts)
        s = texts.fillna("")  # pre-normalized to [a-z0-9 ] by the caller
        lens = s.str.len().to_numpy(dtype=np.int64)
        keep = np.flatnonzero(lens >= k)
        out = [[]] * n
        if len(keep) == 0:
            return pd.Series(out)
        kl = lens[keep]
        # separator width: a doc with g < w grams reads ONE window of w
        # positions starting at its first gram, so the masked gap after it
        # (sep_len + k - 1 positions) must cover w - 1, or the window
        # would reach the NEXT document's gram hashes -> sep_len >= w - k
        # (k suffices for the default w <= 2k - 1)
        sep_len = max(k, w - k)
        big = ("\x00" * sep_len).join(s.to_numpy()[keep])
        codes = np.frombuffer(big.encode("latin-1"), dtype=np.uint8).astype(np.int64)
        hs = sliding_window_view(codes, k) @ weights
        starts = np.concatenate(([0], np.cumsum(kl[:-1] + sep_len)))
        g = kl - k + 1                       # gram count per kept doc
        # mask separator-spanning gram positions, then pad so every doc's
        # single-window case (g < w) reads a full width-w window of MAXes
        mark = np.zeros(len(hs) + 1, dtype=np.int8)
        np.add.at(mark, starts, 1)
        np.add.at(mark, starts + g, -1)
        hs[np.cumsum(mark[:-1]) == 0] = imax
        hs = np.concatenate((hs, np.full(w, imax, dtype=np.int64)))
        gm = sliding_window_view(hs, w).min(axis=1)
        nw = np.maximum(g - w + 1, 1)        # windows per kept doc
        total = int(nw.sum())
        mdoc = np.repeat(np.arange(len(kl)), nw)
        off = np.arange(total) - np.repeat(np.cumsum(nw) - nw, nw)
        mvals = gm[np.repeat(starts, nw) + off]
        order = np.lexsort((mvals, mdoc))
        d_s, v_s = mdoc[order], mvals[order]
        first = np.ones(total, dtype=bool)
        first[1:] = (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1])
        counts = np.bincount(d_s[first], minlength=len(kl))
        for i, prints in zip(keep, np.split(v_s[first], np.cumsum(counts)[:-1])):
            out[i] = prints.tolist()
        return pd.Series(out)

    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " ")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return df.select(F.col(id_col), win_udf(norm).alias("prints"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fp) — normalization fingerprint: lowercase, strip non-alnum,
    md5. Equal fp ⇔ near-identical text modulo casing/punct/whitespace."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " ")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """(id, n_grams, n_distinct, dup_frac) — within-document word-n-gram
    repetition, the Gopher-style "repetitious document" quality signal
    (duplicate-bigram fraction; Rae et al. 2021 §A1.1).

    Scale shape: everything is per-row higher-order expressions — grams
    built by zip_with over shifted slices (no explode, no shuffle, no
    Python); a 100 TB corpus runs this as a pure distributed map."""
    if n < 2:
        raise ValueError("n must be >= 2")
    w = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
        lambda x: x != F.lit(""))
    # n-gram list by zipping n shifted views of the word array
    grams = F.slice(w, 1, F.greatest(F.size(w) - (n - 1), F.lit(0)))
    for i in range(1, n):
        shifted = F.slice(
            w, i + 1, F.greatest(F.size(w) - (n - 1), F.lit(0)))
        grams = F.zip_with(grams, shifted,
                           lambda a, b: F.concat(a, F.lit(" "), b))
    # null text ⇒ null word array ⇒ size() is NULL under ANSI but -1
    # under legacy sizeOfNull (coalesce would pass the -1); gate on
    # isNull() so null rows report 0 grams under either config
    n_grams = F.when(grams.isNull(), F.lit(0)).otherwise(F.size(grams))
    n_distinct = F.when(grams.isNull(), F.lit(0)) \
        .otherwise(F.size(F.array_distinct(grams)))
    dup = F.when(n_grams > 0,
                 F.round(F.lit(1.0) - n_distinct / n_grams, 6)) \
        .otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        dup.alias("dup_frac"),
    )


# encoding-quality regexes (shared with the DuckDB oracle: RE2 and Java
# regex agree on these classes for BMP text)
ENC_REPLACEMENT = "�"
ENC_CONTROL = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"   # control chars minus \t\n\r
ENC_NON_ASCII = r"[^\x09\x0A\x0D\x20-\x7E]"
ENC_MOJIBAKE = "Ã.|â€."   # classic UTF-8-read-as-Latin-1 artifacts


def encoding_quality(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     keep_cols: list[str] | None = None) -> DataFrame:
    """(id, n_chars, n_replacement, n_control, n_non_ascii, n_mojibake,
    encoding_ok) — cheap encoding-health screen: U+FFFD replacement chars
    (a decoder already gave up), raw control characters (binary spill),
    non-ASCII density, and the classic UTF-8-decoded-as-Latin-1 mojibake
    digraphs ("Ã©", "â€™").  `encoding_ok` is the curation-funnel gate:
    zero replacement/control/mojibake hits.

    100 TB shape: four codegen'd regexp_count Columns, no UDF, no
    shuffle — a pure map stage that fuses into whichever scan feeds it."""
    t = F.col(text_col)
    cnt = lambda pat: F.when(t.isNull(), F.lit(0)) \
        .otherwise(F.regexp_count(t, F.lit(pat))).cast("long")
    n_repl, n_ctrl = cnt(ENC_REPLACEMENT), cnt(ENC_CONTROL)
    n_moji = cnt(ENC_MOJIBAKE)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.coalesce(F.length(t), F.lit(0)).cast("long").alias("n_chars"),
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_control"),
        cnt(ENC_NON_ASCII).alias("n_non_ascii"),
        n_moji.alias("n_mojibake"),
        ((n_repl + n_ctrl + n_moji) == 0).alias("encoding_ok"),
    )



# the eight Gopher "stop words" (Rae et al. 2021, Table A1 — the presence
# filter, distinct from the density STOPWORDS list used by quality_features)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_BULLET_RE = r"^\s*[-*•]"          # line starts with a bullet
GOPHER_ELLIPSIS_RE = r"(\.\.\.|…)\s*$"   # line ends with an ellipsis


def gopher_rules(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_words: int = 50, max_words: int = 100_000,
                 min_avg_wl: float = 3.0, max_avg_wl: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_frac: float = 0.9,
                 max_ellipsis_frac: float = 0.3,
                 min_alpha_frac: float = 0.8,
                 min_stop_hits: int = 2,
                 keep_cols: list[str] | None = None) -> DataFrame:
    """(id, n_words, avg_word_len, symbol_ratio, bullet_frac,
    ellipsis_frac, alpha_frac, stop_hits, rule_* booleans, gopher_pass) —
    the full Gopher document-quality rule battery (Rae et al. 2021,
    Table A1), the de-facto standard pre-filter for web-scale LLM corpora:

      1. word count in [min_words, max_words]
      2. mean word length in [min_avg_wl, max_avg_wl]
      3. symbol-to-word ratio ('#' and '...') <= max_symbol_ratio
      4. fraction of lines starting with a bullet <= max_bullet_frac
      5. fraction of lines ending with an ellipsis <= max_ellipsis_frac
      6. fraction of words containing an alphabetic char >= min_alpha_frac
      7. at least min_stop_hits of the eight Gopher stop words present

    Reference analogue: per-document keyword battery -> one pass/fail plus
    per-rule detail, like the validator's per-keyword error rows
    (JSON::Schema::Modern::Result pass/fail + error list).

    100 TB shape: every rule is a codegen'd Column over split/filter/
    regexp — no UDF, no shuffle, fuses into the scan; the boolean gate
    feeds curation_funnel as a pushable predicate."""
    t = F.col(text_col)
    wf = F.filter(words(t), lambda x: F.length(x) > 0)
    n_words = F.coalesce(F.size(wf), F.lit(0))
    nw1 = F.greatest(n_words, F.lit(1))
    avg_wl = F.aggregate(wf, F.lit(0).cast("long"),
                         lambda a, x: a + F.length(x).cast("long")) / nw1
    avg_wl = F.coalesce(avg_wl, F.lit(0.0))
    cnt = lambda pat: F.coalesce(F.regexp_count(t, F.lit(pat)), F.lit(0))
    symbol_ratio = (cnt("#") + cnt(r"\.\.\.")) / nw1
    lines = F.filter(F.split(t, "\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines1 = F.greatest(F.coalesce(F.size(lines), F.lit(0)), F.lit(1))
    bullet_frac = F.coalesce(
        F.size(F.filter(lines, lambda l: l.rlike(GOPHER_BULLET_RE))),
        F.lit(0)) / n_lines1
    ellipsis_frac = F.coalesce(
        F.size(F.filter(lines, lambda l: l.rlike(GOPHER_ELLIPSIS_RE))),
        F.lit(0)) / n_lines1
    # words are lowercased by words(); alphabetic test is [a-z]
    alpha_frac = F.coalesce(
        F.size(F.filter(wf, lambda x: x.rlike("[a-z]"))), F.lit(0)) / nw1
    stop_hits = F.coalesce(F.size(F.filter(
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        lambda s: F.array_contains(wf, s))), F.lit(0))

    r = {
        "rule_word_count": (n_words >= min_words) & (n_words <= max_words),
        "rule_avg_word_len": (avg_wl >= min_avg_wl) & (avg_wl <= max_avg_wl),
        "rule_symbol_ratio": symbol_ratio <= max_symbol_ratio,
        "rule_bullets": bullet_frac <= max_bullet_frac,
        "rule_ellipsis": ellipsis_frac <= max_ellipsis_frac,
        "rule_alpha_words": alpha_frac >= min_alpha_frac,
        "rule_stopwords": stop_hits >= min_stop_hits,
    }
    gate = None
    for c in r.values():
        gate = c if gate is None else (gate & c)
    rnd = lambda c: F.round(c, 6).cast("double")
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        n_words.cast("long").alias("n_words"),
        rnd(avg_wl).alias("avg_word_len"),
        rnd(symbol_ratio).alias("symbol_ratio"),
        rnd(bullet_frac).alias("bullet_frac"),
        rnd(ellipsis_frac).alias("ellipsis_frac"),
        rnd(alpha_frac).alias("alpha_frac"),
        stop_hits.cast("long").alias("stop_hits"),
        *[c.alias(n) for n, c in r.items()],
        gate.alias("gopher_pass"),
    )


C4_TERMINAL_RE = '[.!?"]$'   # line must end in terminal punctuation


def c4_clean(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", min_line_words: int = 5,
             min_kept_lines: int = 3,
             keep_cols: list[str] | None = None) -> DataFrame:
    """(id, n_lines, n_kept_lines, has_lorem, has_brace, doc_keep,
    clean_text) — the C4 line-level cleaning rules (Raffel et al. 2020,
    §2.2): keep only lines that end in terminal punctuation, carry at
    least `min_line_words` words, and don't mention "javascript"; drop
    the whole document if it contains "lorem ipsum" or a curly brace
    (code spill) or retains fewer than `min_kept_lines` lines.

    Reference analogue: a per-document applicator whose child predicate
    runs per line — contains/minContains over split(text), like the
    validator's `items`+`contains` over an array instance.

    100 TB shape: one split + higher-order filter + array_join per row,
    all codegen'd Columns — no UDF, no shuffle, no explode (the line
    array never leaves the row)."""
    t = F.col(text_col)
    # explicit one-arg lambda: bare F.trim has a (col, trimStr) overload,
    # so transform would pass the array index as trimStr (no-op trim)
    lines = F.transform(F.split(t, "\n"), lambda l: F.trim(l))
    keep = lambda l: (
        l.rlike(C4_TERMINAL_RE)
        & (F.size(F.filter(F.split(l, r"\s+"), lambda w: F.length(w) > 0))
           >= min_line_words)
        & ~F.lower(l).contains("javascript"))
    kept = F.filter(lines, keep)
    n_kept = F.coalesce(F.size(kept), F.lit(0))
    lt = F.lower(t)
    has_lorem = F.coalesce(lt.contains("lorem ipsum"), F.lit(False))
    has_brace = F.coalesce(lt.contains("{"), F.lit(False))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.coalesce(F.size(F.filter(lines, lambda l: F.length(l) > 0)),
                   F.lit(0)).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept_lines"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (~has_lorem & ~has_brace & (n_kept >= min_kept_lines))
            .alias("doc_keep"),
        F.coalesce(F.array_join(kept, "\n"), F.lit("")).alias("clean_text"),
    )


def normalize_text(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", lowercase: bool = True) -> DataFrame:
    """(id, norm_text, n_chars_norm) — canonical text normalization
    applied before hashing/fingerprinting: strip control characters,
    collapse all whitespace runs to single spaces, trim, optionally
    lowercase.  Running every dedup signature over the SAME normal form
    is what makes exact/minhash/simhash keys comparable across sources
    with different formatting.

    100 TB shape: two regexp_replace + lower + trim Columns — codegen'd,
    no UDF, no shuffle, fuses into the scan."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    t = F.regexp_replace(t, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    if lowercase:
        t = F.lower(t)
    return df.select(
        F.col(id_col),
        t.alias("norm_text"),
        F.length(t).cast("long").alias("n_chars_norm"),
    )


def compression_ratio(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", level: int = 6,
                      min_ratio: float = 0.35) -> DataFrame:
    """(id, n_bytes, n_compressed, ratio, low_info) — zlib compression
    ratio as a quality proxy (the RedPajama-v2 / CCNet-family signal):
    highly repetitive or templated documents compress far below natural
    prose, so `ratio < min_ratio` flags low-information text that n-gram
    repetition scores can miss (long-range structure, boilerplate
    templates).  No SQL oracle exists for DEFLATE, so the driver records
    the weaker rows-only check for this entry — determinism still holds
    (fixed zlib level, byte-exact input).

    100 TB shape: one Arrow-batched pandas UDF (compression is inherently
    per-document byte work — there is no Column-expression form), no
    shuffle; the UDF returns two longs per row so the exchange-free map
    stage streams."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("n_bytes long, n_compressed long")
    def _zstats(s: pd.Series) -> pd.DataFrame:
        raw = s.fillna("").map(lambda x: x.encode("utf-8"))
        return pd.DataFrame({
            "n_bytes": raw.map(len),
            "n_compressed": raw.map(
                lambda b: len(zlib.compress(b, level))),
        })

    z = df.select(F.col(id_col), _zstats(F.col(text_col)).alias("_z"))
    nb = F.col("_z.n_bytes")
    nc = F.col("_z.n_compressed")
    ratio = F.when(nb > 0, F.round(nc / nb, 6)).otherwise(F.lit(None))
    return z.select(
        F.col(id_col),
        nb.alias("n_bytes"),
        nc.alias("n_compressed"),
        ratio.alias("ratio"),
        F.coalesce(ratio < min_ratio, F.lit(False)).alias("low_info"),
    )


def quality_gate_cube(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      gopher_kwargs: dict | None = None,
                      c4_kwargs: dict | None = None) -> DataFrame:
    """(encoding_ok, gopher_pass, c4_keep, n_docs) — the agreement cube of
    the three standard web-curation gates, counted in ONE pass: which
    documents every gate rejects, which only one gate catches, and how
    much of the corpus survives all three — the calibration readout run
    before wiring gates into the curation funnel.

    100 TB shape: the three gate operators are pure map stages over the
    same (id, text) scan, so chaining them through `keep_cols` lets
    Catalyst collapse the projections into a single WholeStageCodegen map
    — one scan, zero joins — followed by one 8-row-bounded agg."""
    e = encoding_quality(df, text_col, id_col, keep_cols=[text_col])
    g = gopher_rules(e, text_col, id_col,
                     keep_cols=[text_col, "encoding_ok"],
                     **(gopher_kwargs or {}))
    c = c4_clean(g, text_col, id_col,
                 keep_cols=["encoding_ok", "gopher_pass"],
                 **(c4_kwargs or {}))
    return (c.groupBy("encoding_ok", "gopher_pass",
                      F.col("doc_keep").alias("c4_keep"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
    quant: int = 1_000_000_000,
) -> DataFrame:
    """(id, term, tf, score, rank) — the `top_k` TF-IDF keywords per
    document (idf = ln((N + 1) / (df + 1)), the smoothed textbook form).

    The keyword-extraction primitive behind topic balancing and
    boilerplate screens: a document whose top terms are navigation
    chrome ("click", "menu") is template-dominated; per-source rollups
    of the keyword lists expose topic skew before training.

    Scale design (10^12 rows): the explode→(id, term) aggregate is THE
    data-sized shuffle (map-side combined, output |doc-term pairs|);
    document frequency reuses that aggregate's OUTPUT (groupBy(term)
    over distinct doc-term rows — no second pass over the corpus), and
    joins back as a |vocab|-row table (broadcast-able to ~100M terms;
    beyond that it is an AQE-planned shuffle join on the already-
    aggregated table, still never touching raw text twice).  N is a
    broadcast singleton.  The final top-k window shuffles the doc-term
    aggregate once more on id — both exchanges are over post-agg rows,
    never raw documents.

    Determinism: tf and df are exact integers; idf/score are doubles
    derived from them by one fixed expression, so they are bitwise
    reproducible at any parallelism.  The ranking key quantizes score to
    `quant` (floor(score * quant + 0.5), BIGINT-exact headroom: score
    <= tf * ln(N) — at tf 10^6 and N 10^12, ~2.8e16 < 2^63/quant bound
    holds for quant 1e9 only when tf*ln(N) < 9.2e9; lower quant for
    pathological single-term documents) with a term tiebreak, so engine
    ulp-noise in ln cannot flip the emitted order.

    Tokenization is `portable_words` (split-then-lowercase, immune to
    the Unicode special-casing divergence in docs/DEVIATIONS.md)."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.explode(portable_words(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = df.select(F.countDistinct(id_col).alias("_n"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col), "term", "tf",
            (F.col("tf") * F.log((F.col("_n") + F.lit(1))
                                 / (F.col("_df") + F.lit(1)))).alias("_score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.floor(F.col("_score") * quant + F.lit(0.5)).desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(F.col(id_col), "term", "tf",
                F.round(F.col("_score"), 6).alias("score"),
                F.col("rank").cast("int").alias("rank"))
    )
