"""Text functions — all JVM-side Column expressions (whole-stage codegen).

The tokenizer is the engine's hottest function (it runs over every byte of a
100 TB corpus), so it is a pure Catalyst expression: `lower` + regex split +
filter. No Python executes per row. The same regex is mirrored in the DuckDB
oracle SQL (string_split_regex) so correctness is checked end-to-end.

Reference parity: mtix tokenization happens inside its remote CNN model; the
contract we keep is "text column in → ranked candidates out"
(/root/reference/src/mtix/predictors.py:22-35). The code-aware rule
(lowercase, split on non-[a-z0-9_]) follows BASELINE.json:north_star.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9_]+"
# DuckDB-side mirror of tokenize(); kept adjacent so they can't drift.
TOKEN_SPLIT_SQL_DUCKDB = (
    "list_filter(string_split_regex(lower({col}), '[^a-z0-9_]+'), t -> t <> '')"
)

# tiny embedded stopword/profile sets for the language-ID heuristic — these are
# *function-word profiles*, not external data.
_LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "que", "de", "los", "una", "por", "con", "para", "es"],
}
_STOPWORDS = _LANG_PROFILES["en"]


def tokenize(col: Column | str) -> Column:
    """content -> array<string> of lowercase [a-z0-9_]+ tokens."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(F.lower(c), TOKEN_SPLIT_RE)
    return F.filter(arr, lambda t: t != F.lit(""))


def tokenize_py(s: str) -> list[str]:
    """Driver-side twin of `tokenize` for normalizing QUERY strings (never
    rows — corpus text only ever meets the Column expression above). One
    shared definition so entry points cannot drift from the analyzer."""
    import re

    return [t for t in re.split(TOKEN_SPLIT_RE, s.lower()) if t]


def token_count(col: Column | str) -> Column:
    """Whitespace-ish token count (training-data pipeline op)."""
    return F.size(tokenize(col))


# Code-identifier analyzer: camelCase / PascalCase / SCREAMING_SNAKE /
# snake_case / dotted.paths all normalize to their lowercase subtokens, so a
# query for "max score" matches `maxScore`, `MAX_SCORE` and `max_score` —
# the identifier-splitting rule every code-search engine ships (the corpus
# per BASELINE.json:input_hint is source code). Two camel boundaries are
# materialized as spaces, then the stream splits on non-alphanumerics
# (underscore is a SEPARATOR here, unlike `tokenize`, which keeps it):
#   1. acronym end:  ([A-Z]+)([A-Z][a-z])  HTTPServer -> HTTP Server
#   2. case rise:    ([a-z0-9])([A-Z])     fooBar, utf8Name -> foo Bar, utf8 Name
# Order matters: rule 1 must run before rule 2 so acronyms keep their tail.
IDENT_CAMEL_ACRONYM_RE = "([A-Z]+)([A-Z][a-z])"
IDENT_CAMEL_RISE_RE = "([a-z0-9])([A-Z])"
IDENT_SPLIT_RE = "[^a-z0-9]+"
# DuckDB mirror (RE2 backrefs are \1 \2); kept adjacent so they can't drift.
IDENT_TOK_SQL_DUCKDB = (
    "list_filter(string_split_regex(lower("
    "regexp_replace(regexp_replace({col}, '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),"
    " '([a-z0-9])([A-Z])', '\\1 \\2', 'g')"
    "), '[^a-z0-9]+'), t -> t <> '')"
)


def ident_tokenize(col: Column | str) -> Column:
    """identifier/code text -> array<string> of lowercase subtokens.

    Pure Catalyst expression (two regexp_replace + lower + split + filter),
    same zero-Python-per-row contract as `tokenize`; usable anywhere a
    tokenizer Column fn is accepted (e.g. expand.expanded_bm25(tokenizer=))."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, IDENT_CAMEL_ACRONYM_RE, r"$1 $2")
    c = F.regexp_replace(c, IDENT_CAMEL_RISE_RE, r"$1 $2")
    arr = F.split(F.lower(c), IDENT_SPLIT_RE)
    return F.filter(arr, lambda t: t != F.lit(""))


def ident_normalize(col: Column | str) -> Column:
    """Code text -> space-separated identifier subtoken stream (case kept;
    the tokenizer lowers it): the pre-transform under which the STANDARD
    index tokenizer emits exactly ident_tokenize's stream —
    tokenize(ident_normalize(c)) ≡ ident_tokenize(c) (property-tested) —
    so a physical segment index built over the normalized column IS an
    identifier-analyzed index, with zero build/query kernel changes.
    The '_' -> ' ' rewrite is what reconciles the two split alphabets
    (tokenize keeps '_'; the identifier analyzer treats it as a separator)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, IDENT_CAMEL_ACRONYM_RE, r"$1 $2")
    c = F.regexp_replace(c, IDENT_CAMEL_RISE_RE, r"$1 $2")
    return F.regexp_replace(c, "_", " ")


def ident_tokenize_py(s: str) -> list[str]:
    """Driver-side twin of `ident_tokenize` (query normalization + tests)."""
    import re

    s = re.sub(IDENT_CAMEL_ACRONYM_RE, r"\1 \2", s)
    s = re.sub(IDENT_CAMEL_RISE_RE, r"\1 \2", s)
    return [t for t in re.split(IDENT_SPLIT_RE, s.lower()) if t]


def language_id(col: Column | str) -> Column:
    """N-gram-free heuristic language ID: score each language by its
    function-word hit count over the token set; ties/zero -> 'und'.

    Pure Column expression: one tokenize, 4 aggregate counts, greatest().
    """
    toks = tokenize(col)
    scores = {
        lang: F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words])))
        for lang, words in _LANG_PROFILES.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # deterministic priority order on ties: en > de > fr > es
    for lang in ["es", "fr", "de", "en"]:
        out = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0,1]:
    0.4·length_score + 0.3·alpha_ratio + 0.3·stopword_presence.

    All Column math — no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    toks = tokenize(c)
    n_tok = F.size(toks)
    # length score: saturates at 1000 chars
    len_score = F.least(n.cast("double") / F.lit(1000.0), F.lit(1.0))
    # alphanumeric ratio
    alpha = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9]", ""))
    alpha_ratio = F.when(n > 0, alpha.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    # stopword presence ratio (distinct stopwords seen / profile size)
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])
    sw_ratio = F.size(F.array_intersect(F.array_distinct(toks), sw)).cast("double") / F.lit(
        float(len(_STOPWORDS))
    )
    q = F.lit(0.4) * len_score + F.lit(0.3) * alpha_ratio + F.lit(0.3) * sw_ratio
    return F.when(n_tok > 0, q).otherwise(F.lit(0.0))


def _lang_from_tokens(toks: Column) -> Column:
    """Language decision over an already-materialized token array."""
    scores = {
        lang: F.size(
            F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in _LANG_PROFILES.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in ["es", "fr", "de", "en"]:
        out = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def with_language_id(df, text_col: str, out_col: str = "lang_pred"):
    """Split-once language ID: tokenization is projected ONCE, then the
    4-way profile scoring runs over the materialized array. The Column form
    (`language_id`) embeds the tokenize subtree inside when-branches, which
    defeats Catalyst's common-subexpression elimination (conditionals are
    lazily evaluated) — measured 4× slower at sf0.1. Identical output."""
    tmp = "__toks"
    pre = df.withColumn(tmp, tokenize(text_col))
    return pre.withColumn(out_col, _lang_from_tokens(F.col(tmp))).drop(tmp)


def with_quality_score(df, text_col: str, out_col: str = "quality"):
    """Split-once quality score (same rationale as with_language_id)."""
    tmp = "__toks"
    c = F.col(text_col)
    pre = df.withColumn(tmp, tokenize(text_col))
    toks = F.col(tmp)
    n = F.length(c)
    len_score = F.least(n.cast("double") / F.lit(1000.0), F.lit(1.0))
    alpha = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9]", ""))
    alpha_ratio = F.when(n > 0, alpha.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])
    sw_ratio = F.size(F.array_intersect(F.array_distinct(toks), sw)).cast("double") / F.lit(
        float(len(_STOPWORDS))
    )
    q = F.lit(0.4) * len_score + F.lit(0.3) * alpha_ratio + F.lit(0.3) * sw_ratio
    return pre.withColumn(
        out_col, F.when(F.size(toks) > 0, q).otherwise(F.lit(0.0))
    ).drop(tmp)


def doc_fingerprint(col: Column | str) -> Column:
    """64-bit rolling-hash-style fingerprint of the token stream: xxhash64 of
    the canonical (tokenized, space-joined) form — whitespace/punct-invariant.
    """
    return F.xxhash64(F.array_join(tokenize(col), " "))


ROLL_B = 131
ROLL_P = 2_147_483_647  # 2^31-1: acc·B + h stays < 2^63 in every engine


def rolling_fingerprint(col: Column | str) -> Column:
    """Polynomial rolling-hash document fingerprint over the token stream:
    fp = fold(tokens, 0, (acc, t) -> (acc·B + h32(t)) mod P) with
    h32 = first 8 md5 hex digits — order-sensitive (unlike a token-set
    hash), whitespace/punct-invariant, and reproducible in ANSI SQL, so the
    driver value-hash-checks it exactly. Pure Column expression:
    one `aggregate` fold per row, no UDF."""
    toks = tokenize(col)
    h32 = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(ROLL_B) + h32(t)) % F.lit(ROLL_P),
    )


# GPT-2-ish pre-tokenizer shape, simplified to the regex subset Java and
# RE2 implement identically: word / number / punctuation runs, each
# optionally preceded by one space
BPE_PATTERN = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def bpe_token_count(col: Column | str) -> Column:
    """Approximate BPE token count: number of pre-tokenizer matches
    (training-data pipeline op — budget estimation for LLM corpora)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_PATTERN))


def content_sha256(col: Column | str) -> Column:
    """Per-row invariant vs. the source table (BASELINE.json:input_hint)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def with_repetition_stats(df, text_col: str, n: int = 3):
    """Gopher-style repetition quality signals (Rae et al., Gopher rules):
    per doc, the fraction of duplicate tokens and of duplicate token
    n-grams — high values flag boilerplate/templated docs a training
    pipeline drops. Pure Column math over one tokenize projection:
    dup_frac = 1 - distinct/total (0.0 for empty docs). Adds columns
    (n_tokens, dup_token_frac, dup_ngram_frac)."""
    tmp = "__toks"
    pre = df.withColumn(tmp, tokenize(text_col))
    toks = F.col(tmp)
    n_tok = F.size(toks)
    dup_tok = F.when(
        n_tok > 0,
        1.0 - F.size(F.array_distinct(toks)).cast("double") / n_tok.cast("double"),
    ).otherwise(F.lit(0.0))
    # n_tok-n+1 n-grams via transform (sequence is inclusive; guarded —
    # sequence(0, negative) would generate a DESCENDING range); grams join
    # with a space, which the tokenizer guarantees absent from tokens
    grams = F.when(
        n_tok >= n,
        F.transform(
            F.sequence(F.lit(0), n_tok - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_gram = F.size(grams)
    dup_gram = F.when(
        n_gram > 0,
        1.0 - F.size(F.array_distinct(grams)).cast("double") / n_gram.cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        pre.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("dup_token_frac", F.round(dup_tok, 6))
        .withColumn("dup_ngram_frac", F.round(dup_gram, 6))
        .drop(tmp)
    )


PII_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PII_PHONE_RE = "\\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\\b"


def scrub_pii(col: Column | str) -> Column:
    """PII masking kernel for training corpora: email addresses and
    NNN-NNN-NNNN phone shapes replaced by typed placeholders. Pure Column
    regexp_replace chain (JVM-side); the patterns stay inside the regex
    subset Java and RE2 implement identically, so the DuckDB oracle is
    bit-exact."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(c, PII_PHONE_RE, "<PHONE>")


def significant_terms(
    df,
    text_col: str,
    fg_predicate: Column,
    k: int = 25,
    min_fg_df: int = 3,
) -> "DataFrame":
    """Elasticsearch significant_terms aggregation with the JLH heuristic:
    for a FOREGROUND doc subset (fg_predicate over the doc row) against the
    whole corpus as background, score each term by

        jlh = (fg_pct − bg_pct) · (fg_pct / bg_pct)
        fg_pct = df_fg / n_fg,  bg_pct = df_bg / n_docs   (document freq)

    — the absolute-change × relative-change product that surfaces terms
    OVERREPRESENTED in the foreground rather than merely frequent. Only
    terms with fg_pct > bg_pct and df_fg ≥ min_fg_df qualify (rare-term
    noise gate, the ES shard_min_doc_count analog).

    Plan shape: one doc-distinct (doc, term) relation computed once, the
    foreground flag carried as a 0/1 column so fg and bg document
    frequencies come out of a SINGLE groupBy(term) aggregation — one
    shuffle over the exploded corpus, no join of two term relations, and
    the two scalar counts broadcast. At 10^12 docs the explode dominates;
    it is the same map-side work every index build already does.

    Returns (term, df_fg, df_bg, score) — score rounded to 6 — truncated
    to the global top-k by (score DESC, term ASC). The cut is
    orderBy().limit(k), which Catalyst plans as TakeOrderedAndProject
    (per-partition partial top-k, k rows to the driver) — never a
    single-partition window over the vocabulary.
    """
    doc_terms = (
        df.withColumn("__fg", fg_predicate.cast("long"))
        .select("__fg", F.explode_outer(F.array_distinct(tokenize(F.col(text_col)))).alias("term"))
        .filter(F.col("term").isNotNull())
    )
    counts = doc_terms.groupBy("term").agg(
        F.sum("__fg").alias("df_fg"), F.count(F.lit(1)).alias("df_bg")
    )
    totals = df.agg(
        F.sum(fg_predicate.cast("long")).alias("n_fg"), F.count(F.lit(1)).alias("n_docs")
    )
    fg_pct = F.col("df_fg") / F.col("n_fg")
    bg_pct = F.col("df_bg") / F.col("n_docs")
    scored = (
        counts.crossJoin(F.broadcast(totals))
        .filter((F.col("df_fg") >= min_fg_df) & (fg_pct > bg_pct))
        .select(
            "term",
            "df_fg",
            "df_bg",
            F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("term")).limit(k)
