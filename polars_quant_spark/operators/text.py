"""Text-analysis operators for LLM-data pipelines (driver extension surface,
SURVEY.md §7 Phase 5): tokenization, language-ID, quality scoring, token
counting, document fingerprinting.

All pure Column expressions (codegen'd, no UDFs); the tokenization contract
is shared with the DuckDB oracles:

    tokens(text) = non-empty pieces of lower(text) split on /[^a-z0-9]+/

Scale: every op is a projection — embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from polars_quant_spark.functions._util import col

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Tiny deterministic stopword inventories for the n-gram language heuristic.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "une", "que"],
}


def tokens(text: Column | str) -> Column:
    """Lowercased alnum tokens; the shared tokenization contract."""
    return F.filter(F.split(F.lower(col(text)), TOKEN_SPLIT_RE), lambda x: x != "")


def token_count(text: Column | str) -> Column:
    """Whitespace/punct token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-flavored proxy: counts word pieces + digits + punctuation marks via
    a regex sweep (a deterministic stand-in for a real tokenizer's count)."""
    return F.size(F.regexp_extract_all(F.lower(col(text)), F.lit(r"[a-z]{1,4}|[0-9]|[^a-z0-9\s]"), 0))


def stopword_hits(text: Column | str, lang: str = "en") -> Column:
    """Number of tokens that are stopwords of `lang` (repeats counted).

    One JVM regex sweep over the space-joined token stream instead of a
    per-token ``F.filter``/``array_contains`` pass — HOF lambdas are
    interpreted per element, while the compiled alternation is codegen'd
    (~2× on the text bench). Tokens are pure [a-z0-9]+ joined by single
    spaces, so the space lookarounds delimit exactly one match per stopword
    token — the count is identical to the filter form (asserted over the
    full documents table during development)."""
    words = "|".join(STOPWORDS[lang])
    joined = F.concat(F.lit(" "), F.concat_ws(" ", tokens(text)), F.lit(" "))
    return F.size(F.regexp_extract_all(joined, F.lit(f"(?<= )(?:{words})(?= )"), 0))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of `lang`."""
    toks = tokens(text)
    hits = stopword_hits(text, lang)
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def detect_language(text: Column | str) -> Column:
    """n-gram/stopword heuristic language-ID over the inventories above.
    Deterministic: argmax of stopword hit-count with lexicographic tie-break;
    'und' (undetermined) when no stopword hits at all."""
    best = None
    for lang_code in sorted(STOPWORDS):
        cnt = stopword_hits(text, lang_code)
        cand = F.struct(cnt.alias("n"), F.lit(lang_code).alias("neg_lang"))
        # the loop keeps the first (lexicographically smallest) lang on ties
        # via the strict > comparison.
        best = cand if best is None else F.when(
            (cand.getField("n") > best.getField("n")), cand
        ).otherwise(best)
    return F.when(best.getField("n") > 0, best.getField("neg_lang")).otherwise(F.lit("und"))


def quality_score(text: Column | str) -> Column:
    """Composite quality score in [0,1]: length score, alpha ratio, stopword
    presence, mean token length sanity — the standard cheap heuristics."""
    t = col(text)
    n_chars = F.length(t).cast("double")
    toks = tokens(text)
    n_toks = F.size(toks).cast("double")
    alpha_chars = F.length(F.regexp_replace(F.lower(t), "[^a-z]", "")).cast("double")
    alpha_ratio = F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0))
    len_score = F.least(n_chars / 200.0, F.lit(1.0))
    mean_tok_len = F.when(n_toks > 0, alpha_chars / n_toks).otherwise(F.lit(0.0))
    tok_len_score = F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    sw_ratio = stopword_ratio(text, "en")
    sw_score = F.least(sw_ratio * 4.0, F.lit(1.0))
    return (len_score + alpha_ratio + tok_len_score + sw_score) / 4.0


def token_frequencies(df, text: str = "text", id_col: str = "doc_id", exploded=None):
    """Corpus vocabulary statistics: (token, freq, n_docs) — the input to
    tokenizer training / vocab pruning. Two-level agg: (token, doc) partial
    counts first (map-side combined), then per-token merge where n_docs is a
    plain row count — avoiding count_distinct's Expand, which doubles the
    exploded token stream (same plan discipline as agg_events_daily).
    Scale: explode → ONE shuffle on (token, doc) → tiny per-token merge.
    Pass ``exploded`` ((_id, token) rows) to reuse a persisted token frame
    (the single-tokenize discipline, see ``oov_stats``)."""
    from polars_quant_spark.functions._util import widen

    ex = (
        exploded
        if exploded is not None
        else widen(df).select(
            F.col(id_col).alias("_id"), F.explode(tokens(text)).alias("token")
        )
    )
    per_doc = ex.groupBy("token", "_id").agg(F.count(F.lit(1)).alias("_c"))
    return per_doc.groupBy("token").agg(
        F.sum("_c").alias("freq"), F.count(F.lit(1)).alias("n_docs")
    )


# 1/ln(2) as an exact double literal: both engines compute a NATURAL log
# (glibc/libm on DuckDB, Math.log on the JVM) and multiply by this same
# constant — avoiding log2(), whose implementations differ more across
# engines than ln's (Spark lowers log2 to ln(x)/ln(2), DuckDB calls libm
# log2 directly; two roundings vs one would double the 1-ulp disagreement
# window on the micro-unit quantization boundary).
_INV_LN2 = 1.4426950408889634


def unigram_surprisal(
    df, text: str = "text", id_col: str = "doc_id", exploded=None
):
    """Per-doc mean unigram surprisal in bits/token — the perplexity quality
    filter (CCNet-style) with the LM trained in-engine on the corpus itself:
    cost(tok) = log2((N+V)/(c_tok+1)) under add-one smoothing, where c is
    the corpus count, N total tokens, V vocab size. Low-probability token
    soup scores high; natural prose scores low. Returns
    (doc_id, n_tokens, bits_per_token).

    Plan: one explode → token-count agg (map-side combined) → the tiny freq
    frame joins back onto the token stream (AQE broadcasts it when it fits;
    at 100 TB vocab ≪ stream so this is the cheap side) → per-doc sum. The
    scalar (N, V) row rides a broadcast cross join. Cross-engine exactness:
    each token cost is quantized to integer micro-bits BEFORE the per-doc
    sum, so association order can't drift the mean."""
    from polars_quant_spark.functions._util import round6, widen

    ex = (
        exploded
        if exploded is not None
        else widen(df).select(
            F.col(id_col).alias("_id"), F.explode(tokens(text)).alias("token")
        )
    )
    # (not persisted: recomputing the codegen'd tokenize is cheaper than
    # caching a token stream larger than the input — see dsir_logratios)
    freq = ex.groupBy("token").agg(F.count(F.lit(1)).alias("_c"))
    tot = freq.agg(
        F.sum("_c").alias("_n"), F.count(F.lit(1)).alias("_v")
    )
    cost_bits = (
        F.log((F.col("_n") + F.col("_v")).cast("double") / (F.col("_c") + F.lit(1)))
        * F.lit(_INV_LN2)
    )
    costs = (
        ex.join(freq, "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "_id",
            F.floor(cost_bits * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("_mc"),
        )
    )
    return costs.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        round6(
            F.sum("_mc").cast("double") / F.lit(1000000.0) / F.count(F.lit(1))
        ).alias("bits_per_token"),
    ).withColumnRenamed("_id", id_col)


def bigrams(text: Column | str) -> Column:
    """Occurrence (non-distinct) token bigrams — the DSIR feature strings.
    Empty for docs with < 2 tokens. Hashing deliberately happens AFTER the
    explode (see ``dsir_logratios``): md5 inside a higher-order-function
    lambda is interpreted per element, md5 over exploded rows is codegen'd
    (the same ~10× explode discipline the MinHash path is built on)."""
    toks = tokens(text)
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda j: F.concat_ws(
                " ", F.element_at(toks, j), F.element_at(toks, j + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dsir_logratios(
    df,
    target: Column,
    text: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): log w(doc) = Σ_features
    [ln λ_target(b) − ln λ_raw(b)] over hashed-bigram features, with
    add-one smoothing over the `buckets` lanes. `target` is a boolean
    Column defining the in-domain subset (e.g. lang == 'en'); the raw
    distribution is the whole corpus. Docs that look like the target get
    positive log-ratios; resample by thresholding or feeding the weights to
    the deterministic samplers. Returns (doc_id, n_feats, logratio).

    Plan: one explode of the hashed features (codegen'd md5+mod) → ONE
    groupBy(bucket) agg producing both corpus and target counts → the freq
    frame is ≤ `buckets` rows, broadcast back onto the feature stream at
    any corpus size — the 100 TB shape by construction. Per-feature costs
    are micro-nat-quantized before the per-doc sum (association-order-free,
    hash-exact vs the DuckDB twin)."""
    from polars_quant_spark.functions._util import round6, widen

    feats = widen(df).select(
        F.col(id_col).alias("_id"),
        target.cast("int").alias("_t"),
        F.explode(bigrams(text)).alias("_g"),
    ).select(
        "_id",
        "_t",
        (
            F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10).cast("long")
            % F.lit(buckets)
        ).alias("_b"),
    )
    # feats feeds the freq agg AND the cost projection; it is deliberately
    # NOT persisted — the exploded feature stream is larger than the input,
    # so recomputing the codegen'd tokenize+md5 beats writing the stream to
    # cache (measured at sf0.1; also the only sane trade at 100 TB)
    freq = feats.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_cr"), F.sum("_t").alias("_ct")
    )
    tot = freq.agg(F.sum("_cr").alias("_nr"), F.sum("_ct").alias("_nt"))
    cost = F.log(
        (F.col("_ct") + F.lit(1.0)) / (F.col("_nt") + F.lit(float(buckets)))
    ) - F.log((F.col("_cr") + F.lit(1.0)) / (F.col("_nr") + F.lit(float(buckets))))
    costs = (
        feats.join(F.broadcast(freq), "_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "_id",
            F.floor(cost * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("_mc"),
        )
    )
    return (
        costs.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            round6(F.sum("_mc").cast("double") / F.lit(1000000.0)).alias("logratio"),
        )
        .withColumnRenamed("_id", id_col)
    )


# PII patterns shared with the DuckDB twin — restricted to syntax both Java
# regex and RE2 support (no lookarounds/backrefs): character classes, bounded
# repeats, \b, \d.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IP": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "PHONE": r"\b\d{3}[- .]\d{3}[- .]\d{4}\b",
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts (one compiled regex sweep each)."""
    t = col(text)
    return {
        kind: F.size(F.regexp_extract_all(t, F.lit(pat), 0))
        for kind, pat in PII_PATTERNS.items()
    }


def scrub_pii(text: Column | str) -> Column:
    """Mask emails / IPs / phone numbers with [KIND] tokens — the standard
    redaction pass before training. Pure projection (three codegen'd regex
    replaces); order is fixed (EMAIL, IP, PHONE) so engines agree when
    patterns could overlap."""
    out = col(text)
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind}]")
    return out


def repetition_stats(df, text: str = "text", id_col: str = "doc_id", n: int = 2):
    """Within-document repetition (the Gopher/C4-style quality filter):
    per document, the duplicate n-gram ratio (1 − distinct/total) and the
    share of the single most frequent n-gram. High values flag boilerplate,
    keyword stuffing and degenerate generations.

    Same explode→two-level-agg discipline as token_frequencies: one shuffle
    on (doc, ngram), then a per-doc merge over distinct n-grams. n=1 gives
    token-level repetition."""
    from polars_quant_spark.functions._util import widen

    toks = tokens(text)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda j: F.concat_ws(" ", F.slice(toks, j, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    ng = widen(df).select(F.col(id_col).alias("_id"), F.explode(grams).alias("_g"))
    per = ng.groupBy("_id", "_g").agg(F.count(F.lit(1)).alias("_c"))
    agg = per.groupBy("_id").agg(
        F.max("_c").alias("_mx"),
        F.sum("_c").alias("_tot"),
        F.count(F.lit(1)).alias("_nd"),
    )
    from polars_quant_spark.functions._util import round6

    return agg.select(
        F.col("_id").alias(id_col),
        round6(
            F.lit(1.0) - F.col("_nd").cast("double") / F.col("_tot")
        ).alias("dup_ngram_ratio"),
        round6(F.col("_mx").cast("double") / F.col("_tot")).alias("top_ngram_share"),
    )


def pack_documents(
    df,
    budget: int = 512,
    text: str = "text",
    id_col: str = "doc_id",
    shards: int = 8,
):
    """Concat-and-chunk sequence packing — the final step of a training-data
    pipeline: documents are laid end-to-end and cut into fixed
    ``budget``-token training sequences (GPT-style packing: documents may
    span a cut; a spanning document contributes a row to each pack it
    touches). Returns one row per (document, pack) overlap:
    (shard, pack_id, doc_id, doc_tok_start, doc_tok_end) — enough for a
    writer to assemble every pack's token stream.

    Scale: a single global ordering would serialize in one window
    partition, so packing runs independently per shard (doc_id % shards —
    deterministic, so re-runs produce identical packs). Each shard's
    prefix-sum window is one exchange; the per-doc pack fan-out is a
    sequence+explode bounded by ceil(doc_len/budget)+1. Empty docs are
    dropped (they contribute no tokens). All arithmetic is integer — the
    layout is engine-exact."""
    n = token_count(text)
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            (F.col(id_col) % shards).alias("shard"),
            n.alias("_n"),
        )
        .where(F.col("_n") > 0)
    )
    w = Window.partitionBy("shard").orderBy("_id")
    cum = (F.sum("_n").over(w) - F.col("_n")).alias("_cum")  # exclusive prefix
    laid = base.select("shard", "_id", "_n", cum)
    first = F.floor(F.col("_cum") / budget).cast("long")
    last = F.floor((F.col("_cum") + F.col("_n") - 1) / budget).cast("long")
    packs = laid.select(
        "shard", "_id", "_n", "_cum", F.explode(F.sequence(first, last)).alias("pack_id")
    )
    tok_start = F.greatest(F.lit(0).cast("long"), F.col("pack_id") * budget - F.col("_cum"))
    tok_end = F.least(F.col("_n").cast("long"), (F.col("pack_id") + 1) * budget - F.col("_cum"))
    return packs.select(
        "shard",
        "pack_id",
        F.col("_id").alias(id_col),
        tok_start.alias("doc_tok_start"),
        tok_end.alias("doc_tok_end"),
    )


def remove_duplicated_spans(
    df,
    text: str = "text",
    id_col: str = "doc_id",
    width: int = 2,
    max_docs: int = 20,
):
    """Corpus-level duplicated-span removal — the C4/CCNet/Dolma boilerplate
    filter: any span whose text occurs in more than ``max_docs`` DISTINCT
    documents is cut from every document; the survivors are reassembled in
    order. Returns (doc_id, clean_text, n_spans, n_dropped).

    The driver corpus is a flat token stream (no newlines), so a span here
    is a non-overlapping ``width``-token chunk; with real line/paragraph
    structure the span expression is the line split and the plan is
    identical.

    Scale: explode spans → distinct-doc count per span via the two-level
    agg (per (span, doc) first — map-side combined, no count_distinct
    Expand) → the banned set is small by construction (it IS the
    boilerplate), so it broadcasts back onto the span rows → one per-doc
    shuffle reassembles survivors with an in-agg sort. No driver collect;
    empty documents carry no spans and drop out."""
    from polars_quant_spark.functions._util import widen

    toks = tokens(text)
    nspans = F.ceil(F.size(toks) / F.lit(float(width))).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), nspans - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * width + 1, width)),
    )
    # ex feeds two consumers (the banned-set agg subtree and the probe side
    # of the flag join); persist so tokenize/span-build/posexplode — the
    # dominant per-row work — happens once (same discipline as
    # dedup.minhash_dedup_pairs). MEMORY_AND_DISK default: spills, not OOMs.
    ex = (
        widen(df)
        .where(F.size(toks) > 0)
        .select(F.col(id_col).alias("_id"), F.posexplode(spans).alias("_pos", "_sp"))
        .persist()
    )
    per_doc = ex.groupBy("_sp", "_id").agg(F.count(F.lit(1)).alias("_c"))
    banned = (
        per_doc.groupBy("_sp")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .where(F.col("_nd") > max_docs)
        .select("_sp", F.lit(1).alias("_ban"))
    )
    flagged = ex.join(F.broadcast(banned), "_sp", "left")
    kept_struct = F.when(
        F.col("_ban").isNull(), F.struct(F.col("_pos"), F.col("_sp"))
    )  # no otherwise: banned spans collect as SQL nulls, which collect_list skips
    return flagged.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["_sp"]
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when(F.col("_ban") == 1, 1).otherwise(0)).alias("n_dropped"),
    ).select(
        F.col("_id").alias(id_col), "clean_text", "n_spans", "n_dropped"
    )


def oov_stats(
    df,
    vocab_size: int = 1000,
    text: str = "text",
    id_col: str = "doc_id",
):
    """Tokenizer-vocabulary coverage: build the top-``vocab_size`` corpus
    vocabulary (by frequency, token-lexicographic tie-break — fully
    deterministic) and measure each document's out-of-vocabulary rate.
    Returns (doc_id, n_tokens, n_oov, oov_ratio) — the standard signal for
    sizing a tokenizer vocab / flagging documents a tokenizer will shred.

    Scale: vocabulary selection is a TakeOrderedAndProject (top-N, no
    global sort partition); the vocab is ≤ vocab_size rows by definition,
    so the membership join broadcasts and the corpus never reshuffles
    beyond the per-doc agg."""
    from polars_quant_spark.functions._util import round6, widen

    # one tokenize pass: the exploded frame feeds both the vocab selection
    # and the membership join
    ex = widen(df).select(
        F.col(id_col).alias("_id"), F.explode(tokens(text)).alias("token")
    ).persist()
    freqs = token_frequencies(df, text, id_col, exploded=ex)
    vocab = (
        freqs.orderBy(F.col("freq").desc(), F.col("token"))
        .limit(vocab_size)
        .select("token", F.lit(1).alias("_in"))
    )
    flagged = ex.join(F.broadcast(vocab), "token", "left")
    agg = flagged.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    return agg.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        "n_oov",
        round6(F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_ratio"),
    )


def select_token_budget(
    df,
    budget: int,
    text: str = "text",
    id_col: str = "doc_id",
):
    """Token-budget corpus curation: greedily keep the highest-quality
    documents whose cumulative token count fits ``budget``, in the
    deterministic order (quality DESC, doc_id ASC). Returns
    (doc_id, n_tokens, quality, selected) for every document.

    Scale design: the naive form is a GLOBAL ordered cumsum — one
    partition sorting the whole corpus. Here selection is two-level:
    token totals per 6-dp quality bin (one small agg), exact running
    totals over the tiny bins frame (a window over ≤10⁶ bin rows, fine on
    one task), then a per-bin — fully parallel — doc_id-ordered cumsum
    decides each bin's partial take. Bit-identical to the global greedy
    prefix because within a 6-dp bin the global order ties break by
    doc_id; the `doc_token_budget` oracle IS the naive global form."""
    from polars_quant_spark.functions._util import round6, widen

    # d feeds the bins subtree AND the join probe side; persist so the
    # quality_score regex sweeps run once per document, not twice
    d = widen(df).select(
        F.col(id_col).alias("doc_id"),
        token_count(text).cast("long").alias("n_tokens"),
        round6(quality_score(text)).alias("quality"),
    ).persist()
    bins = d.groupBy("quality").agg(F.sum("n_tokens").alias("_bt"))
    wb = (
        Window.orderBy(F.col("quality").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binsc = bins.select(
        "quality",
        F.coalesce(F.sum("_bt").over(wb), F.lit(0).cast("long")).alias("_before"),
    )
    wdoc = (
        Window.partitionBy("quality")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.join(F.broadcast(binsc), "quality")
        .select(
            "doc_id",
            "n_tokens",
            "quality",
            ((F.col("_before") + F.sum("n_tokens").over(wdoc)) <= budget).alias(
                "selected"
            ),
        )
    )


def fingerprint(text: Column | str) -> Column:
    """Canonical document fingerprint: md5 over the normalized token stream.
    (md5 is used engine-wide so DuckDB oracles reproduce it bit-for-bit;
    a production deployment would swap in xxhash64.)"""
    return F.md5(F.concat_ws(" ", tokens(text)))


_WN_POS = 1 << 24  # position field width in the packed winnowing key


def winnow_fingerprints(
    df,
    k: int = 3,
    w: int = 4,
    text: str = "text",
    id_col: str = "doc_id",
):
    """Winnowing document fingerprints (the MOSS rolling-hash scheme):
    hash every positional k-token gram, slide a w-gram window, keep each
    window's minimum hash (rightmost on ties). Guarantee: any shared token
    run of ≥ w+k−1 tokens contributes at least one COMMON fingerprint —
    the local-similarity primitive exact/minhash fingerprints can't give.
    Returns (doc_id, fp_hash, pos); docs with < w grams yield no rows
    (standard winnowing; pair with `fingerprint` for whole-doc identity).

    Engine-exact: the "min hash, rightmost position" pick is one packed
    BIGINT min — hash·2²⁴ + (2²⁴−1−pos) — so a single codegen'd window
    MIN does selection and tie-break at once (positions bounded < 2²⁴,
    products < 2⁵⁶: exact in both engines' int64). One shuffle (the
    per-doc window); the distinct dedupes overlapping windows' repeats."""
    from polars_quant_spark.functions._util import widen

    toks = tokens(text)
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda j: F.concat_ws(" ", F.slice(toks, j, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    ex = widen(df).select(
        F.col(id_col).alias("_id"), F.posexplode(grams).alias("_pos", "_g")
    )
    h = F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10).cast("long")
    key = h * _WN_POS + (F.lit(_WN_POS - 1) - F.col("_pos"))
    win = (
        Window.partitionBy("_id").orderBy("_pos").rowsBetween(-(w - 1), 0)
    )
    sel = ex.select(
        "_id",
        F.when(F.count(F.lit(1)).over(win) == w, F.min(key).over(win)).alias("_key"),
    ).where(F.col("_key").isNotNull())
    # decode with integer ops only — key < 2⁵⁶ exceeds double's exact range
    return sel.distinct().select(
        F.col("_id").alias(id_col),
        F.shiftright(F.col("_key"), 24).alias("fp_hash"),
        (F.lit(_WN_POS - 1) - F.col("_key") % _WN_POS).cast("int").alias("pos"),
    )


def bm25_scores(
    df,
    query_terms: list[str],
    text: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 keyword retrieval over the corpus (Robertson/Sparck Jones):
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)), with
    idf(t) = ln(1 + (N−df+0.5)/(df+0.5)). Returns (id, score) for docs
    matching ≥1 term, scores 6dp.

    Plan shape — the inverted-index discipline: one explode → per-(doc,
    term) tf agg restricted to the query terms at the scan (the filter is a
    literal IN over ≤|query| strings, pushed before the shuffle, so the
    aggregated stream is query-sized, not corpus-sized); doc lengths ride a
    separate tiny agg; df/idf come from a ≤|query|-row aggregate that
    broadcasts. Per-term costs are micro-quantized before the per-doc sum
    (association-order-free, the ln discipline of ``unigram_surprisal``),
    so scores hash-match the DuckDB twin."""
    from polars_quant_spark.functions._util import round6, widen

    terms = sorted(set(query_terms))
    ex = widen(df).select(
        F.col(id_col).alias("_id"), F.explode(tokens(text)).alias("token")
    )
    lens = ex.groupBy("_id").agg(F.count(F.lit(1)).alias("_dl"))
    nstats = lens.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_dl").alias("_sumdl")
    )
    tf = (
        ex.where(F.col("token").isin(terms))
        .groupBy("_id", "token")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(lens, "_id")
        .crossJoin(F.broadcast(nstats))
    )
    avgdl = F.col("_sumdl").cast("double") / F.col("_n").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    tfn = F.col("_tf").cast("double")
    denom = tfn + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / avgdl)
    cost = idf * tfn * F.lit(k1 + 1.0) / denom
    per_term = scored.select(
        "_id",
        F.floor(cost * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("_mc"),
    )
    return (
        per_term.groupBy("_id")
        .agg(
            round6(F.sum("_mc").cast("double") / F.lit(1000000.0)).alias("score")
        )
        .withColumnRenamed("_id", id_col)
    )


def hashed_tf_vectors(
    df,
    dim: int = 64,
    text: str = "text",
    id_col: str = "doc_id",
):
    """Feature-hashing (hashing-trick) term-frequency vectors: each token's
    md5 lane indexes one of `dim` buckets; the doc's vector is the integer
    count per bucket. The in-engine text→vector featurizer — its output is
    an ``array<double>`` drop-in for the whole similarity stack
    (``cosine_topk``, ``embedding_gram``/``pca_project``, IVF), giving a
    no-external-model baseline for text similarity search.

    Plan: explode → md5 per token row (codegen'd) → one (doc, bucket)
    count agg → per-doc assembly of the dense array from the collected
    (bucket, count) pairs (a per-doc HOF over ≤dim entries — interpreted,
    but O(dim) per DOC, not per token; the token-volume work all stays in
    codegen). Counts are integers, so vectors are engine-exact."""
    from polars_quant_spark.functions._util import widen

    ex = widen(df).select(
        F.col(id_col).alias("_id"), F.explode(tokens(text)).alias("_tok")
    ).select(
        "_id",
        (
            F.conv(F.substring(F.md5(F.col("_tok")), 1, 8), 16, 10).cast("long")
            % F.lit(dim)
        ).alias("_b"),
    )
    counts = ex.groupBy("_id", "_b").agg(F.count(F.lit(1)).alias("_c"))
    assembled = counts.groupBy("_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_b"), F.col("_c")))
        ).alias("_m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.coalesce(
            F.element_at(F.col("_m"), j), F.lit(0).cast("long")
        ).cast("double"),
    )
    return assembled.select(F.col("_id").alias(id_col), vec.alias("tf_vec"))


def chunk_documents(
    df,
    size: int = 64,
    stride: int = 48,
    text: str = "text",
    id_col: str = "doc_id",
):
    """Sliding-window document chunking (RAG / context-window prep): each
    document's token stream is cut into windows of ``size`` tokens whose
    starts advance by ``stride`` (overlap = size − stride). The final
    window is the last start strictly inside the stream, so every token is
    covered and no start is ≥ the token count. Returns one row per chunk:
    (id, chunk_id, tok_start, tok_end, chunk_text) with chunk_text rebuilt
    on the shared tokenizer contract (lowercased, punctuation folded to
    single spaces — chunk boundaries are token-exact, text is normalized).

    Scale: a pure projection + bounded explode (ceil(n/stride) rows per
    doc) — no shuffle, embarrassingly parallel, the same shape as the
    multimodal frame-sample fan-out. Chunk counts are integer arithmetic,
    so the layout is engine-exact."""
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    from polars_quant_spark.functions._util import widen

    toks = tokens(text)
    # widen() first: a single-row-group corpus file is ONE scan task and
    # would serialize the tokenize+slice explode (SCALE.md narrow-scans)
    base = widen(df).select(
        F.col(id_col).alias("_id"), toks.alias("_toks"), F.size(toks).alias("_n")
    ).where(F.col("_n") > 0)
    # last start index = stride * floor((n-1)/stride)  (ints; engine-exact)
    n_chunks = F.floor((F.col("_n") - 1) / stride).cast("long") + 1
    ch = base.select(
        "_id", "_toks", "_n", F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id")
    )
    start = (F.col("chunk_id") * stride).cast("long")
    end = F.least(F.col("_n").cast("long"), start + size)
    return ch.select(
        F.col("_id").alias(id_col),
        "chunk_id",
        start.alias("tok_start"),
        end.alias("tok_end"),
        F.concat_ws(
            " ", F.slice(F.col("_toks"), start + 1, (end - start).cast("int"))
        ).alias("chunk_text"),
    )


def _bpe_merge_word(syms: Column, a: Column, b: Column) -> Column:
    """Left-to-right non-overlapping merge of adjacent pair (a, b) inside a
    symbol array — ONE BPE merge application, as a pure fold (state string
    "emitted|pending"; symbols are [a-z0-9]+ so ' ' and '|' are safe
    delimiters). Returns the new symbol array. The identical fold runs in
    the DuckDB twin via list_reduce, so merge results are engine-exact
    (including the aaa→[aa,a] overlap rule)."""

    def step(acc: Column, x: Column) -> Column:
        e = F.substring_index(acc, "|", 1)
        p = F.substring_index(acc, "|", -1)
        merged = F.concat(
            F.when(e == "", F.lit("")).otherwise(F.concat(e, F.lit(" "))), a, b, F.lit("|")
        )
        keep = F.concat(
            F.when(p == "", e).otherwise(
                F.when(e == "", p).otherwise(F.concat(e, F.lit(" "), p))
            ),
            F.lit("|"),
            x,
        )
        return F.when((p == a) & (x == b), merged).otherwise(keep)

    acc = F.aggregate(syms, F.lit("|"), step)
    e = F.substring_index(acc, "|", 1)
    p = F.substring_index(acc, "|", -1)
    flat = F.when(p == "", e).otherwise(
        F.when(e == "", p).otherwise(F.concat(e, F.lit(" "), p))
    )
    return F.split(flat, " ")


def bpe_merges(
    df,
    rounds: int = 6,
    text: str = "text",
    id_col: str = "doc_id",
):
    """In-engine BPE tokenizer training: learn the first ``rounds`` merge
    rules from the corpus (standard byte-pair encoding over the shared
    word-token contract, frequency-weighted, ties broken by (pair_a,
    pair_b) byte order). Returns the merge table — one row per round:
    (round, pair_a, pair_b, merged, cnt).

    Scale: the corpus is touched ONCE (token_frequencies' two-level agg);
    every subsequent round runs on the *vocabulary* (distinct words — far
    smaller than the corpus and bounded by language, not data size). Per
    round: an adjacent-pair explode + count (one small shuffle), a 1-row
    argmax via min(struct(-cnt, a, b)) (no global sort), broadcast back
    into the fold-merge projection. The rounds are inherently sequential
    (each merge changes the next round's pair counts) — the chain is
    ``rounds`` tiny jobs, not a scaled scan. localCheckpoint every few
    rounds keeps the HOF-heavy lineage flat."""
    vocab = token_frequencies(df, text=text, id_col=id_col).select(
        F.split("token", "").alias("syms"), "freq"
    )
    merges = None
    for r in range(1, rounds + 1):
        pairs = (
            vocab.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("nc"), F.col("a"), F.col("b")
                )
            ).alias("m")
        ).select(
            F.lit(r).cast("long").alias("round"),
            F.col("m.a").alias("pair_a"),
            F.col("m.b").alias("pair_b"),
            F.concat(F.col("m.a"), F.col("m.b")).alias("merged"),
            (-F.col("m.nc")).alias("cnt"),
        )
        merges = best if merges is None else merges.unionByName(best)
        if r < rounds:
            bj = best.select(
                F.col("pair_a").alias("_ba"), F.col("pair_b").alias("_bb")
            )
            vocab = vocab.join(F.broadcast(bj)).select(
                _bpe_merge_word(F.col("syms"), F.col("_ba"), F.col("_bb")).alias("syms"),
                "freq",
            )
            if r % 3 == 0:
                vocab = vocab.localCheckpoint(eager=False)
    return merges


def temperature_mix(
    df,
    group_by: str = "source",
    taus: tuple[float, ...] = (0.5, 0.7, 1.0),
):
    """Temperature-scaled corpus mixing weights (round-9 promotion of the
    driver-green `doc_temperature_mix` composition, the riskstats
    discipline): per group, the natural share and the sampling share under
    p ∝ share^(1/τ) for each τ — the standard knob that up-samples small
    sources (τ<1) without the head drowning the tail. Returns one row per
    (group_by, tau): (group_by, tau, natural_share, sampling_share), both
    shares 6-dp rounded. Weights nano-quantize (⌊w·1e9+0.5⌋) before the
    per-τ normalizer so shares are engine-exact in any association order.
    Every frame here is group-cardinality-sized (sources × taus), so the
    broadcasts are bounded by the group domain, not the corpus.

    No reference kernel exists (extends /root/reference's surface);
    semantics follow the multilingual-sampling recipe of Lample & Conneau
    2019 §3.1."""
    from polars_quant_spark.functions._util import round6

    if group_by in ("tau", "natural_share", "sampling_share"):
        raise ValueError(f"group_by={group_by!r} collides with an output column")
    spark = df.sparkSession
    t0 = df.groupBy(group_by).agg(F.count(F.lit(1)).alias("n"))
    tt = t0.agg(F.sum("n").alias("t"))
    tdf = spark.createDataFrame([(float(t),) for t in taus], ["tau"])
    w = (
        t0.crossJoin(F.broadcast(tdf))
        .crossJoin(F.broadcast(tt))
        .select(
            group_by,
            "tau",
            "n",
            "t",
            F.floor(
                F.exp(F.log(F.col("n").cast("double") / F.col("t")) / F.col("tau"))
                * 1e9
                + F.lit(0.5)
            )
            .cast("long")
            .alias("qw"),
        )
    )
    s = w.groupBy("tau").agg(F.sum("qw").alias("sw"))
    return w.join(F.broadcast(s), "tau").select(
        group_by,
        round6(F.col("tau")).alias("tau"),
        round6(F.col("n").cast("double") / F.col("t")).alias("natural_share"),
        round6(F.col("qw").cast("double") / F.col("sw")).alias("sampling_share"),
    )


def source_kl(
    df,
    group_by: str = "source",
    text: str = "text",
):
    """Pairwise unigram KL divergence between groups (round-9 promotion of
    the driver-green `doc_source_kl` composition): add-1-smoothed unigram
    distributions over the SHARED vocabulary, KL(a‖b) for every ordered
    group pair — the distributional distance that surface-overlap metrics
    (Jaccard) miss. Returns (source_a, source_b, kl_divergence), 6-dp.
    Per-token terms nano-quantize before the per-pair integer sum, so the
    divergence is engine-exact in any association order. The pair×vocab
    fan-out is vocabulary-sized, not corpus-sized; the group-count and
    vocab-size frames broadcast (bounded by the group domain / distinct
    tokens, not corpus rows)."""
    from polars_quant_spark.functions._util import round6, widen

    if group_by in ("source_a", "source_b", "kl_divergence"):
        raise ValueError(f"group_by={group_by!r} collides with an output column")
    docs = widen(df)
    klt = docs.select(group_by, F.explode(tokens(text)).alias("tok"))
    klc = klt.groupBy(group_by, "tok").agg(F.count(F.lit(1)).alias("c"))
    kln = klc.groupBy(group_by).agg(F.sum("c").alias("n"))
    klv = klc.agg(F.count_distinct("tok").alias("v"))
    srcs = klc.select(group_by).distinct()
    toks = klc.select("tok").distinct()
    pairs = srcs.alias("a").join(
        srcs.alias("b").withColumnRenamed(group_by, "source_b"),
        F.col(group_by) != F.col("source_b"),
    ).withColumnRenamed(group_by, "source_a")
    grid = pairs.crossJoin(toks)
    ca = klc.select(
        F.col(group_by).alias("source_a"),
        F.col("tok").alias("ta"),
        F.col("c").alias("c_a"),
    )
    cb = klc.select(
        F.col(group_by).alias("source_b"),
        F.col("tok").alias("tb"),
        F.col("c").alias("c_b"),
    )
    na = kln.select(F.col(group_by).alias("source_a"), F.col("n").alias("n_a"))
    nb = kln.select(F.col(group_by).alias("source_b"), F.col("n").alias("n_b"))
    j = (
        grid.join(ca, (ca.source_a == grid.source_a) & (F.col("ta") == F.col("tok")), "left")
        .drop(ca.source_a)
        .join(cb, (cb.source_b == grid.source_b) & (F.col("tb") == F.col("tok")), "left")
        .drop(cb.source_b)
        .join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .crossJoin(F.broadcast(klv))
    )
    pa = (F.coalesce(F.col("c_a"), F.lit(0)) + 1).cast("double") / (
        F.col("n_a") + F.col("v")
    )
    pb = (F.coalesce(F.col("c_b"), F.lit(0)) + 1).cast("double") / (
        F.col("n_b") + F.col("v")
    )
    qterm = F.floor(pa * F.log(pa / pb) * 1e9 + F.lit(0.5)).cast("long")
    return (
        j.select("source_a", "source_b", qterm.alias("qkl"))
        .groupBy("source_a", "source_b")
        .agg(round6(F.sum("qkl").cast("double") / 1e9).alias("kl_divergence"))
    )
