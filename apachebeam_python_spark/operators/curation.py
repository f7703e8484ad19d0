"""Corpus-curation operators for LLM training-data pipelines (SURVEY.md
§2.11 north-star family, alongside dedup/similarity/packing): benchmark
decontamination, intra-document repetition metrics (Gopher-style quality
filters), and deterministic mixture resampling.

All three are pure DataFrame plans — no Python UDFs, no driver-side
collection — so they inherit whole-stage codegen and scale with the
cluster like any narrow projection + one designed aggregation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: find corpus documents sharing any word
    n-gram with a benchmark/eval set (the standard test-set-leakage guard
    for training corpora).

    Returns ``(id_col, n_shared_grams)`` — one row per CONTAMINATED corpus
    document; clean documents are absent (caller left-joins to flag).

    100 TB plan: the benchmark side (eval sets — thousands of docs, millions
    of distinct grams) aggregates to a distinct-gram table and BROADCASTS;
    the corpus side explodes grams narrowly and never shuffles its text —
    the only wide op is the per-doc count aggregate over matched (id, gram)
    rows, which is tiny (hits only). If the benchmark ever outgrows
    broadcast, drop the hint: the same plan runs as a shuffle join on gram.
    """
    bench = (
        benchmark.select(F.explode(T.shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    grams = corpus.select(
        F.col(id_col), F.explode(T.shingles(F.col(text_col), n)).alias("gram")
    )
    return (
        grams.join(F.broadcast(bench), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_grams"))
    )


def repetition_metrics(
    df: DataFrame, text_col: str, id_col: str, *, n: int = 2
) -> DataFrame:
    """Per-document repetition metrics (Gopher-style quality filters):

    - ``total_grams`` / ``distinct_grams``: word n-gram counts WITH/WITHOUT
      multiplicity;
    - ``dup_frac``: fraction of grams that are repeats (1 - distinct/total);
    - ``top_frac``: fraction taken by the single most frequent gram.

    Documents too short to form a gram get total=0 and 0.0 fractions.

    100 TB plan: explode grams → two-stage aggregate. The (id, gram) count
    is a partial+final hash aggregate (map-side combine collapses repeated
    grams before the shuffle); the per-doc rollup then shuffles one row per
    DISTINCT gram only. No list is ever collected; skewed docs cost their
    own gram count, nothing global.
    """
    grams = df.select(
        F.col(id_col), F.explode(T.raw_grams(F.col(text_col), n)).alias("gram")
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
    stats = per_gram.groupBy(id_col).agg(
        F.sum("c").alias("total_grams"),
        F.count("*").alias("distinct_grams"),
        F.max("c").alias("top_count"),
    )
    return df.select(id_col).join(stats, id_col, "left").select(
        F.col(id_col),
        F.coalesce("total_grams", F.lit(0)).alias("total_grams"),
        F.coalesce("distinct_grams", F.lit(0)).alias("distinct_grams"),
        F.round(
            F.when(
                F.col("total_grams").isNull() | (F.col("total_grams") == 0), 0.0
            ).otherwise(1.0 - F.col("distinct_grams") / F.col("total_grams")),
            6,
        ).alias("dup_frac"),
        F.round(
            F.when(
                F.col("total_grams").isNull() | (F.col("total_grams") == 0), 0.0
            ).otherwise(F.col("top_count") / F.col("total_grams")),
            6,
        ).alias("top_frac"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap
    (stride < chunk_tokens) — the step that turns long documents into
    model-ready training sequences. Chunk starts are 1, 1+stride, … ≤
    n_tokens, so every token lands in ≥1 chunk and overlap = chunk_tokens -
    stride.

    Returns one row per chunk: ``(id_col, chunk_start, chunk_len,
    chunk_text)``.

    100 TB plan: a narrow posexplode-free explode of a computed start list —
    amplification is ~n_tokens/stride rows per doc with no shuffle at all;
    chunking 100 TB is one scan-bound pass that pipelines straight into the
    packing/writing stage. (No Python, all codegen.)
    """
    if not 1 <= stride <= chunk_tokens:
        raise ValueError(f"need 1 <= stride({stride}) <= chunk_tokens({chunk_tokens})")
    w = T.tokens(F.col(text_col))
    starts = F.sequence(F.lit(1), F.greatest(F.size(w), F.lit(1)), F.lit(stride))
    piece = F.slice(F.col("_w"), F.col("chunk_start"), chunk_tokens)
    return (
        df.select(F.col(id_col), w.alias("_w"), F.explode(starts).alias("chunk_start"))
        .select(
            id_col,
            "chunk_start",
            F.size(piece).alias("chunk_len"),
            F.concat_ws(" ", piece).alias("chunk_text"),
        )
    )


def deterministic_shuffle(df: DataFrame, id_col: str, seed: int = 0) -> DataFrame:
    """Reproducible global training-order shuffle: sort by
    ``xxhash64(seed, id)``. Same seed → identical order on every run,
    machine, and retry (no RNG state to checkpoint); a new seed is a fresh
    epoch permutation.

    100 TB plan: writing in this order is one range-partitioned sort — the
    same cost as any clustered write (sources.layout) — and because the key
    is a hash of the id, the output is free of the source's original
    locality (no domain/time runs for the trainer to see). In practice,
    combine with a partitioned write and let the data loader read files in
    name order.
    """
    return df.orderBy(F.xxhash64(F.lit(seed), F.col(id_col)))


def mixture_flags(
    df: DataFrame,
    key_col: str,
    id_col: str,
    rates: dict[str, float],
    *,
    modulus: int = 10000,
) -> DataFrame:
    """Deterministic mixture resampling: per-key keep rates applied as a
    pure row filter — ``keep = id % modulus < round(rate*modulus)`` — so the
    sample is reproducible run-to-run with no RNG state and no shuffle.
    (The round() keeps 0.96*modulus from landing a hair under the integer
    cutoff in binary floats.)

    Returns ``df`` + an int ``keep`` column (1/0). Keys absent from
    ``rates`` default to keep (rate 1.0). ``modulus`` sets rate granularity
    (1/modulus) — it should be far below the id range so residues cycle.

    100 TB plan: the CASE chain + pmod is a narrow projection that fuses
    into the scan (zero exchanges, predicate pushes past it); resampling a
    100 TB corpus to target domain weights is exactly one pass. Rates are a
    driver-side dict (domain mixtures are small by nature); for per-key
    rates derived from data, join a broadcast rate table instead.
    """
    cutoff = F.lit(modulus).cast("long")
    for key, rate in rates.items():
        cutoff = F.when(
            F.col(key_col) == key, F.lit(int(round(float(rate) * modulus)))
        ).otherwise(cutoff)
    keep = (F.pmod(F.col(id_col), F.lit(modulus)) < cutoff).cast("int")
    return df.withColumn("keep", keep)


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: list[tuple[str, int]],
    *,
    modulus: int = 100,
) -> DataFrame:
    """Deterministic train/val/test split assignment: cumulative id-modulo
    bands — ``splits=[("train", 80), ("val", 10), ("test", 10)]`` assigns
    id % 100 in [0,80) → train, [80,90) → val, [90,100) → test. Band widths
    must sum to ``modulus``.

    Returns ``df`` + a string ``split`` column. Like mixture_flags this is
    a pure narrow projection (zero exchanges, reproducible across retries,
    no RNG); stratification comes free because the modulo stream is
    independent of any data column. For splits that must be disjoint at the
    GROUP level (all docs of one url/source together), pass the group id as
    ``id_col``.
    """
    widths = [w for _, w in splits]
    if sum(widths) != modulus:
        raise ValueError(f"split widths {widths} must sum to modulus={modulus}")
    residue = F.pmod(F.col(id_col), F.lit(modulus))
    expr = F.lit(splits[-1][0])
    hi = 0
    branches = []
    for name, w in splits[:-1]:
        hi += w
        branches.append((name, hi))
    for name, bound in reversed(branches):
        expr = F.when(residue < bound, name).otherwise(expr)
    return df.withColumn("split", expr)


def mixture_resample(
    df: DataFrame,
    key_col: str,
    id_col: str,
    rates: dict[str, float],
    *,
    modulus: int = 10000,
) -> DataFrame:
    """The filtered form of :func:`mixture_flags` (kept rows only)."""
    return (
        mixture_flags(df, key_col, id_col, rates, modulus=modulus)
        .filter(F.col("keep") == 1)
        .drop("keep")
    )


def passage_spans(
    df: DataFrame, text_col: str, id_col: str, *, n: int = 8, stride: int = 4
) -> DataFrame:
    """Token windows of ``n`` tokens at ``stride`` — one row per span.

    Documents shorter than ``n`` tokens yield no span. The explode factor
    is ~tokens/stride per document (bounded, data-independent), and the
    projection fuses into the scan — no shuffle happens here.
    """
    toks = T.tokens(F.col(text_col))
    starts = F.when(
        F.size(toks) >= n,
        F.sequence(F.lit(0), F.size(toks) - n, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    spans = F.transform(starts, lambda s: F.array_join(F.slice(toks, s + 1, n), " "))
    return df.select(F.col(id_col), F.explode(spans).alias("span"))


def repeated_passages(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 8,
    stride: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated-passage census (the substring-level dedup
    signal of Lee et al., "Deduplicating Training Data Makes Language
    Models Better" — doc-level dedup misses boilerplate/licenses/templates
    shared by otherwise-distinct documents).

    Returns spans seen in ≥ ``min_docs`` distinct documents with their doc
    and occurrence counts. Two-stage aggregate: (span, doc) pairs collapse
    map-side before one shuffle on the pair, then a count-per-span shuffle
    — distinct-doc counting WITHOUT per-span sets. At 100 TB shuffle
    ``xxhash64(span)`` instead of span text and keep ``any_value(span)``
    as the exemplar: the wide string rides one partial-agg stage, the
    shuffles carry 8 bytes.
    """
    sp = passage_spans(df, text_col, id_col, n=n, stride=stride)
    pairs = sp.groupBy("span", id_col).agg(F.count("*").alias("c"))
    return (
        pairs.groupBy("span")
        .agg(F.count("*").alias("n_docs"), F.sum("c").alias("n_occurrences"))
        .filter(F.col("n_docs") >= min_docs)
    )


def novelty_scores(
    batch: DataFrame,
    snapshot: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 2,
) -> DataFrame:
    """Per-document n-gram NOVELTY vs an accumulated corpus: the fraction of
    a new document's distinct n-grams never seen in the snapshot — the
    "how much new information does this crawl add" signal that ranks ingest
    batches (near-0 ⇒ re-crawl/boilerplate, near-1 ⇒ genuinely new content).

    Returns (id, n_grams, n_novel, novelty ∈ [0,1]).

    100 TB plan: the snapshot aggregates once to a distinct-gram table —
    the same artifact decontamination uses, worth persisting bucketed by
    gram — and the batch (the small side, an ingest increment) explodes
    narrowly and LEFT-joins it on gram; per-doc counts aggregate the
    batch's own (id, gram) rows only. The snapshot's text never moves; the
    join shuffles O(batch grams) + streams the gram table.
    """
    snap_grams = snapshot.select(
        F.explode(T.shingles(F.col(text_col), n)).alias("gram")
    ).distinct().withColumn("_seen", F.lit(1))
    grams = batch.select(
        F.col(id_col), F.explode(T.shingles(F.col(text_col), n)).alias("gram")
    ).distinct()
    return (
        grams.join(snap_grams, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0)).alias("n_novel"),
        )
        .withColumn(
            "novelty", F.round(F.col("n_novel") / F.col("n_grams"), 6)
        )
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_identifiers: Sequence[str],
    *,
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """Privacy audit before releasing or training on user-derived data
    (SURVEY §2.11 curation family): a table is k-ANONYMOUS on a set of
    quasi-identifiers when every equivalence class (distinct QI
    combination) contains ≥ k rows — smaller classes re-identify
    individuals by linkage. With ``sensitive_col``, also reports each
    class's distinct sensitive-value count (l-DIVERSITY: a class whose
    sensitive values are all identical leaks the attribute even at k).

    Returns one row per equivalence class below the bar (class_size < k,
    or l_diversity = 1 when a sensitive column is given), with the QI
    values, class_size, and l_diversity — the worklist for suppression /
    generalization.

    100 TB plan: one partial+final hash aggregation on the QI key — the
    same shuffle economics as any groupBy; the report is bounded by the
    number of VIOLATING classes, not table size. Skewed QI combos (huge
    compliant classes) combine map-side and never dominate the shuffle.
    """
    aggs = [F.count("*").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("l_diversity"))
    classes = df.groupBy(*quasi_identifiers).agg(*aggs)
    cond = F.col("class_size") < k
    if sensitive_col is not None:
        cond = cond | (F.col("l_diversity") == 1)
    return classes.filter(cond)
