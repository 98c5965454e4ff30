"""Distributed BPE tokenizer training — the learn-the-vocab half of the
tokenizer stage (operators/vocab.py is the word-level apply half).

Byte-Pair Encoding (Sennrich et al. 2016, ACL — public algorithm): start
from character-level symbol sequences, repeatedly find the most frequent
adjacent symbol pair corpus-wide and merge it. The reference engine
consumes pre-tokenized arrays (reference src/audiopro/audio/audio_loader.py
hands numpy arrays straight to the DSP kernel); a training-data pipeline
at 100 TB must LEARN that tokenization first, and the merge loop is the
canonical iterative-aggregation workload.

Scale design (what survives 100 TB):
- The corpus pass happens ONCE: explode words -> hash-agg to a
  (word, freq) table. Everything iterative runs on that table, whose size
  is the distinct-word count (bounded, orders of magnitude below corpus
  rows) — the same bounded-table trick as vocab.build_vocab. Real BPE
  trainers (HF tokenizers, SentencePiece) use exactly this word-frequency
  dict form.
- Each merge iteration is one map-side-combinable pair-count agg plus a
  TakeOrdered(1) argmax — O(1) rows of driver state per merge, the same
  contract as similarity.kmeans_lite's k x d centroids. No corpus
  re-reads, no growing driver memory.
- The merge application is a pure JVM higher-order fold (F.aggregate) —
  no Python, no shuffle. Lineage is truncated with localCheckpoint every
  iteration (the word table is tiny post-agg) so M merges never build an
  M-deep nested-expression plan — the dedup_clusters iterative pattern.
- Determinism: argmax tie-breaks on (count desc, left asc, right asc), so
  the learned merge list is identical across engines/runs — the DuckDB
  twin (duck_twins.bpe_sql) reproduces the loop with materialized CTE
  layers and a list_reduce fold.

Merge semantics: one pass, leftmost-first, non-overlapping — fold the
symbol list left to right, merging current symbol into the accumulator's
tail when (tail, current) == (left, right). A tail already produced by
this pass is the merged symbol left||right, which can never equal `left`
(right is non-empty), so the fold cannot cascade within one pass — exactly
the published BPE single-merge semantics ('aaa' + merge(a,a) -> ['aa','a']).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

MERGE_SCHEMA = StructType(
    [
        StructField("merge_rank", LongType(), False),
        StructField("left_sym", StringType(), False),
        StructField("right_sym", StringType(), False),
        StructField("pair_cnt", LongType(), False),
    ]
)


def word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, sym) — the bounded word-frequency table BPE iterates
    on. sym starts as the character split; freq is the corpus word count
    (pair counts are freq-weighted, so merging on this table is exactly
    merging on the raw corpus)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .withColumn("sym", F.split("word", ""))
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-pair counts over the symbol sequences. One
    narrow transform+explode and one hash agg (map-side combinable)."""
    sym = F.col("sym")
    pairs = F.when(
        F.size(sym) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(sym) - 1),
            lambda i: F.struct(
                F.element_at(sym, i).alias("left_sym"),
                F.element_at(sym, i + 1).alias("right_sym"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left_sym:string,right_sym:string>>"))
    return (
        words.select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy("p.left_sym", "p.right_sym")
        .agg(F.sum("freq").alias("pair_cnt"))
    )


def apply_merge(words: DataFrame, left: str, right: str) -> DataFrame:
    """One BPE merge over the symbol column: leftmost, non-overlapping,
    single pass (see module docstring for why the fold cannot cascade).
    Pure JVM expression — zero shuffle, zero Python."""
    merged = left + right
    fold = F.aggregate(
        F.col("sym"),
        F.array().cast("array<string>"),
        lambda acc, c: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (c == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(c))),
    )
    return words.withColumn("sym", fold)


def train_bpe(
    spark: SparkSession,
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    merges_per_round: int = 1,
) -> DataFrame:
    """Learn `n_merges` BPE merges; returns the ranked merge table
    (merge_rank, left_sym, right_sym, pair_cnt) — the tokenizer model.

    merges_per_round=1 is EXACT textbook BPE (one corpus-wide argmax per
    merge — the oracle mode, one Spark job per merge). merges_per_round=m
    is the scale mode VERDICT r3 #5 asked for: at a realistic 32k-merge
    vocab, exact mode is 32k sequential jobs — hours of scheduler
    overhead at any cluster size — so each round applies the top-m
    MUTUALLY COMPATIBLE candidates from one frozen pair-count pass,
    cutting the job count to ~n_merges/m.

    Compatibility rule (why frozen counts stay exact): applying merge
    (a, b) only changes the counts of pairs that touch one of its three
    symbols {a, b, ab} — at a merge site, pairs (prev, a) and (b, next)
    die and (prev, ab) / (ab, next) are born; every pair disjoint from
    all three symbols has an exactly invariant count. Candidates are
    taken greedily in exact-argmax order, skipping any whose symbol set
    {left, right, left||right} intersects an already-selected merge's
    set (the merged symbol participates in the check, which also covers
    same-concatenation conflicts like (a,bc) vs (ab,c) -> abc). Hence
    every selected merge is applied at EXACTLY its recorded corpus count,
    and in-batch application order is irrelevant (disjoint folds
    commute).

    Documented deviation bound vs exact mode: a pair CREATED by an
    earlier in-batch merge (e.g. (prev, ab)) is invisible until the next
    round, so batched mode can order such a pair up to m-1 ranks later
    than exact mode would; it can never invent a merge exact mode would
    not eventually pick from the same state, and m=1 degenerates to
    exact. This is the standard frequency-threshold batching used by
    production BPE trainers.

    Driver state per round is <= 4*m candidate rows; the word table is
    localCheckpointed each ROUND so the plan nests at most m folds
    (CLAUDE.md: Catalyst re-inlines expression trees across branches —
    pair_counts and the next apply_merge would each re-evaluate an
    un-checkpointed fold chain). Keep m <= ~16 so codegen never sees a
    deeper fold chain than that."""
    if merges_per_round < 1:
        raise ValueError(f"merges_per_round must be >= 1, got {merges_per_round}")
    words = word_table(df, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    rank = 1
    while rank <= n_merges:
        want = min(merges_per_round, n_merges - rank + 1)
        cands = (
            pair_counts(words)
            .orderBy(
                F.desc("pair_cnt"), F.asc("left_sym"), F.asc("right_sym")
            )
            .limit(4 * want)
            .collect()
        )
        if not cands:
            break  # corpus fully merged — fewer merges than requested
        used_syms: set[str] = set()
        batch = []
        for b in cands:
            if len(batch) >= want:
                break
            syms = {b.left_sym, b.right_sym, b.left_sym + b.right_sym}
            if used_syms & syms:
                continue  # interacts with a selected merge — next round
            used_syms |= syms
            batch.append(b)
        for b in batch:
            merges.append((rank, b.left_sym, b.right_sym, int(b.pair_cnt)))
            words = apply_merge(words, b.left_sym, b.right_sym)
            rank += 1
        words = words.localCheckpoint()
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def segment_words(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Apply a learned merge list to a corpus: (word, freq, sym) with the
    final BPE segmentation — the encode side for inspection/tests. Merges
    MUST be applied in training order (BPE is order-sensitive)."""
    words = word_table(df, text_col)
    for left, right in merges:
        words = apply_merge(words, left, right)
    return words
