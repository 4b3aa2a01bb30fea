"""Text analysis: language-ID, quality scoring, token counting,
document fingerprinting. Pure column expressions (whole-stage codegen);
each has an exact SQL equivalent for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kgt.textops.dedup import normalize_text

# marker words per language for the n-gram/stopword heuristic —
# deterministic and SQL-reproducible (exact token counts for
# space-segmented scripts; substring counts for UNSEGMENTED_LANGS).
# 10 languages × 8 high-frequency function words; cross-language
# collisions are fine (argmax decides, ties break by code order).
# The oracle SQL is GENERATED from this dict (__spark_entry__ imports
# it), so extending coverage is a one-place change.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it"],
    "de": ["der", "und", "die", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "et", "les", "des", "est", "dans", "une", "que"],
    "es": ["el", "y", "los", "las", "es", "una", "por", "como"],
    "it": ["il", "di", "che", "la", "per", "con", "non", "sono"],
    "pt": ["o", "os", "das", "dos", "um", "uma", "para", "não"],
    "nl": ["het", "een", "van", "niet", "zijn", "op", "dat", "ook"],
    "ru": ["и", "в", "не", "на", "что", "это", "как", "его"],
    "zh": ["的", "了", "是", "我", "不", "在", "有", "这"],
    "ja": ["の", "に", "は", "を", "た", "が", "で", "て"],
}


# languages whose scripts don't whitespace-delimit words: marker hits
# count as SUBSTRING occurrences of the normalized text (space-token
# matching can never fire on unsegmented CJK — round-6 review find)
UNSEGMENTED_LANGS = {"zh", "ja"}


def _word_count(words, word):
    """Exact occurrence count of ``word`` among the space-split tokens.
    (The old replace-arithmetic on ' word ' undercounted ADJACENT
    repeats — consecutive occurrences share the delimiting space, so
    'the the the' counted 2 — round-6 review find.)"""
    return F.size(F.filter(words, lambda t: t == F.lit(word))).cast("long")


def _substr_count(norm, marker):
    """Substring occurrence count of ``marker`` in the normalized text
    (exact for the single-glyph CJK markers this is used for)."""
    return (
        (F.length(norm) - F.length(F.replace(norm, F.lit(marker), F.lit(""))))
        / len(marker)
    ).cast("long")


def _language_cols(text_col: str) -> list:
    """language_id's aliased signal expressions (fusable — see
    doc_signals)."""
    norm = normalize_text(F.col(text_col))
    toks = F.split(norm, " ")
    scores = {
        lang: sum(
            (
                _substr_count(norm, w)
                if lang in UNSEGMENTED_LANGS
                else _word_count(toks, w)
                for w in words
            ),
            F.lit(0).cast("long"),
        )
        for lang, words in LANG_MARKERS.items()
    }
    # max score, then the first language code (sorted) achieving it
    max_score = F.greatest(*[scores[lang] for lang in sorted(LANG_MARKERS)])
    lang = F.coalesce(
        *[
            F.when(scores[lang] == max_score, F.lit(lang))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    return [
        F.when(max_score > 0, lang).otherwise(F.lit("und")).alias("lang_pred"),
        max_score.alias("marker_hits"),
    ]


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker-word counts, 'und' when
    all zero. Ties break by language code order (deterministic)."""
    return docs.select(
        F.col(id_col).alias("doc_id"), *_language_cols(text_col)
    )


# BPE-ish lexer pattern (GPT-2-style segmentation, ASCII-safe so Java
# and RE2 regex engines count identically): letter runs, digit runs,
# single non-alnum glyphs
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _token_cols(text_col: str) -> list:
    """token_count's aliased signal expressions (fusable)."""
    t = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(t), r"\s+"))
    n_chars = F.length(t)
    return [
        F.when(F.length(F.trim(t)) == 0, F.lit(0))
        .otherwise(ws_tokens)
        .alias("ws_tokens"),
        F.regexp_count(t, F.lit(BPE_TOKEN_PATTERN)).cast("long").alias(
            "re_tokens"
        ),
        F.ceil(n_chars / 4).cast("long").alias("bpe_tokens_est"),
        n_chars.alias("n_chars"),
    ]


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count (letter/digit
    runs + punctuation glyphs) + the ceil(chars/4) subword proxy +
    char count — the standard budget measures."""
    return docs.select(F.col(id_col).alias("doc_id"), *_token_cols(text_col))


def _quality_cols(text_col: str) -> list:
    """quality_score's aliased signal expressions (fusable)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_words = F.size(F.split(F.trim(t), r"\s+"))
    toks = F.split(normalize_text(t), " ")
    stop_hits = sum(
        (_word_count(toks, w) for w in ["the", "and", "of", "a", "in"]),
        F.lit(0).cast("long"),
    )
    alpha_ratio = F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6)
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop_hits / F.greatest(n_words, F.lit(1)), 6)
    len_band = (
        F.when(n_chars < 20, 0.2)
        .when(n_chars < 2000, 1.0)
        .otherwise(0.6)
    )
    score = F.round(
        (alpha_ratio + F.least(stop_ratio * 5, F.lit(1.0)) + len_band) / 3, 6
    )
    return [
        alpha_ratio.alias("alpha_ratio"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality"),
    ]


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0,1] —
    score = (alpha_ratio + min(stop_ratio·5, 1) + length band) / 3.
    punct_ratio is emitted as a FEATURE column only (not part of the
    composite). All ratios rounded to 6dp so oracle comparison is
    exact."""
    return docs.select(
        F.col(id_col).alias("doc_id"), *_quality_cols(text_col)
    )


def _fingerprint_cols(text_col: str) -> list:
    """fingerprint's aliased signal expressions (fusable). The 8-word
    rolling windows are dedup's ONE shingling expression with md5
    mapped over it — not a copy, so window semantics can never drift
    from the dedup family's."""
    from kgt.textops.dedup import _shingle_array

    windows = F.transform(_shingle_array(F.col(text_col), 8), F.md5)
    return [
        F.md5(normalize_text(F.col(text_col))).alias("fp_exact"),
        F.array_min(windows).alias("fp_rolling_min"),
    ]


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the normalized text plus a rolling
    winnowing-style proxy (min md5 over normalized 8-word windows) for
    shift-tolerant matching. md5 (not xxhash64) keeps the operator
    SQL-oracle-reproducible; at 100 TB swap the hash, keep the wiring."""
    return docs.select(
        F.col(id_col).alias("doc_id"), *_fingerprint_cols(text_col)
    )


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-trained unigram language-model quality score — the
    classic curation scorer (CCNet/Gopher-style filters rank documents
    by LM likelihood; a unigram model over the corpus itself is its
    oracle-checkable core).

    Per document: avg_logprob = mean over word OCCURRENCES of
    ln(count(word) / N) where count is the corpus-wide frequency of
    the normalized word and N the corpus word total — no OOV by
    construction (the model is trained on the same corpus it scores).
    Rounded to 6 dp (cross-engine float parity, same convention as
    the cosine oracles).

    Scale shape: one shuffle to count the vocabulary (map-side
    combined), one shuffle join of the exploded occurrences against
    it (at 100 TB the Zipf head of the vocab can ride a broadcast
    with a df-capped tail, the same hot-key split the dedup family
    uses), one map-side-combined per-doc average. Empty documents
    drop out (no words → no rows).
    """
    words = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias(
                "word"
            ),
        )
    )
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    total = words.agg(F.count(F.lit(1)).alias("n"))
    return (
        words.join(vocab, "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.avg(F.log(F.col("c") / F.col("n"))), 6).alias(
                "avg_logprob"
            ),
        )
    )


def doc_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """All five text-analysis signal families as ONE per-document
    table — the shape a curation pipeline actually materializes
    (doc_id, n_words, avg_logprob, lang_pred, marker_hits, ws_tokens,
    re_tokens, bpe_tokens_est, n_chars, alpha_ratio, punct_ratio,
    stop_ratio, quality, fp_exact, fp_rolling_min).

    Scale shape: the four PER-ROW families (language ID, token
    counts, quality ratios, fingerprints) are computed in one FUSED
    projection over a single scan — zero shuffles, one whole-stage-
    codegen span — then joined once with the corpus-trained unigram
    LM scores, whose vocabulary-count shuffle is inherent. Joining
    the five standalone operator outputs instead would shuffle the
    full document table four extra times for a result every column
    of which is derivable from one pass.

    Every input document gets a row: unigram_logprob drops wordless
    documents by construction (no occurrences to average), so the LM
    columns join LEFT — an empty/whitespace-only doc keeps its
    per-row signals with n_words = 0 and avg_logprob NULL, and the
    curation gate can still apply its empty-doc rule."""
    per_row = docs.select(
        F.col(id_col).alias("doc_id"),
        *_language_cols(text_col),
        *_token_cols(text_col),
        *_quality_cols(text_col),
        *_fingerprint_cols(text_col),
    )
    lm = unigram_logprob(docs, id_col, text_col)
    return per_row.join(lm, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_words"), F.lit(0)).alias("n_words"),
        "avg_logprob",
        *[c for c in per_row.columns if c != "doc_id"],
    )
