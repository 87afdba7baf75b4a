"""BPE-style vocabulary induction over a word-frequency table.

Not in the reference (no tokenizer surface exists there); this is the
tokenizer-training step of a pretraining data pipeline: given the corpus
word-frequency table, find the most frequent adjacent symbol pair, merge
it everywhere, repeat (Sennrich et al., "Neural Machine Translation of
Rare Words with Subword Units" — the byte-pair-encoding loop).

Scale design: the corpus contributes exactly ONE hash aggregation (the
word-frequency groupBy — map-side partial, keyed shuffle on the word).
Every merge iteration then runs on the VOCABULARY (distinct words), not
the corpus: pair counting is a keyed aggregation over per-word adjacent
pairs weighted by frequency, and the winning pair — a single row — is
broadcast into the merge fold. At 100 TB the vocab table is millions of
rows where the corpus is billions, so the loop's cost is independent of
corpus size. The fold itself is a codegen-free HOF (``aggregate``) per
DISTINCT word per iteration — bounded by vocab size × max word length.

Merge semantics are the standard greedy left-to-right non-overlapping
scan: folding symbols left to right, a merge consumes both symbols, so
``a a a`` under pair (a, a) becomes ``aa a`` (the produced symbol
``a||b`` can never equal ``a`` — symbols are non-empty — so a fresh
merge is never itself the left operand of another merge in the same
pass). Ties on the pair count break lexicographically (pair_a, pair_b)
— words are ASCII-filtered upstream, so the ordering is engine-portable.

DuckDB twin notes (oracles.py:q_bpe_merges): the fold is
``list_reduce`` over singleton-wrapped symbols (accumulator and element
must share a type); DuckDB list slice ends are INCLUSIVE — dropping the
last accumulator element is ``acc[:-2]``, not ``acc[:-1]``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import materialize

# greedy left-to-right merge of (pair_a, pair_b) within one symbol array;
# pair_a/pair_b are columns of the broadcast single-row winner
_MERGE_FOLD = """
aggregate(
    seq,
    cast(array() as array<string>),
    (acc, x) -> if(size(acc) > 0 AND element_at(acc, -1) = pair_a
                       AND x = pair_b,
                   concat(slice(acc, 1, size(acc) - 1),
                          array(concat(pair_a, pair_b))),
                   concat(acc, array(x))))
"""

_ADJACENT_PAIRS = (
    "arrays_zip(slice(seq, 1, size(seq) - 1), slice(seq, 2, size(seq) - 1))"
)


def _bpe_loop(
    words: DataFrame, word_col: str, freq_col: str, n_merges: int
) -> tuple[list[DataFrame], DataFrame]:
    """Shared induction loop: returns (one single-row step frame per
    iteration, the final (word, freq, seq) vocabulary under all learned
    merges)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    seqs = words.select(
        F.col(word_col).alias("word"),
        F.col(freq_col).alias("freq"),
        F.expr(
            f"transform(sequence(1, length({word_col})),"
            f" i -> substring({word_col}, i, 1))"
        ).alias("seq"),
    ).transform(materialize)
    steps: list[DataFrame] = []
    for it in range(1, n_merges + 1):
        counts = (
            seqs.select("freq", F.explode(F.expr(_ADJACENT_PAIRS)).alias("pr"))
            .groupBy(
                F.col("pr")["0"].alias("pair_a"), F.col("pr")["1"].alias("pair_b")
            )
            .agg(F.sum("freq").alias("cnt"))
        )
        top = (
            counts.orderBy(F.col("cnt").desc(), "pair_a", "pair_b")
            .limit(1)
            .transform(materialize)
        )
        steps.append(
            top.select(
                F.lit(it).alias("iter"),
                "pair_a",
                "pair_b",
                F.concat("pair_a", "pair_b").alias("merged"),
                "cnt",
            )
        )
        # the winner is ONE row — broadcast it into the fold via a
        # constant-key LEFT join, not a cross join: when merges exhaust
        # (no adjacent pair left anywhere) the winner frame is EMPTY and
        # a cross join would silently drop the whole vocabulary; under
        # the left join pair_a/pair_b are NULL and the fold's equality
        # test degenerates to the identity copy. The merged vocab is
        # checkpointed so iteration k+1 never replays 1..k.
        winner = top.select(
            F.lit(1).alias("__k"), "pair_a", "pair_b"
        )
        seqs = (
            seqs.withColumn("__k", F.lit(1))
            .join(F.broadcast(winner), "__k", "left")
            .select("word", "freq", F.expr(_MERGE_FOLD).alias("seq"))
            .transform(materialize)
        )
    return steps, seqs


def bpe_merge_steps(
    words: DataFrame, word_col: str, freq_col: str, n_merges: int = 5
) -> DataFrame:
    """Run ``n_merges`` BPE merge iterations over a (word, frequency)
    table; return one row per iteration: ``(iter, pair_a, pair_b, merged,
    cnt)`` — the learned merge list, in order. ``cnt`` is the pair's
    corpus frequency at the moment it won (adjacent occurrences weighted
    by word frequency). An empty vocabulary (or one with no adjacent
    pairs left) yields fewer than ``n_merges`` rows — never an error."""
    steps, _ = _bpe_loop(words, word_col, freq_col, n_merges)
    return reduce(DataFrame.unionByName, steps)


# apply a FIXED ordered merge list (broadcast single-row array) to a word:
# outer fold over the merges, inner fold = the same greedy merge as
# _MERGE_FOLD closing over the outer lambda's merge struct
_APPLY_MERGES_FOLD = """
aggregate(
    merges,
    transform(sequence(1, length(word)), i -> substring(word, i, 1)),
    (acc, m) -> aggregate(acc, cast(array() as array<string>),
        (a2, x) -> if(size(a2) > 0 AND element_at(a2, -1) = m.pair_a
                          AND x = m.pair_b,
                      concat(slice(a2, 1, size(a2) - 1),
                             array(concat(m.pair_a, m.pair_b))),
                      concat(a2, array(x)))))
"""


def bpe_apply_merges(
    words: DataFrame, word_col: str, merges: DataFrame
) -> DataFrame:
    """Tokenize words under a STANDING merge table — the apply-to-UNSEEN
    side ``bpe_encode_words`` can't do (it only segments the vocabulary
    the induction ran on). ``merges`` is a (iter, pair_a, pair_b) frame;
    it is collected into ONE ordered array row — bounded by the merge
    count (a shipped tokenizer has hundreds to tens of thousands of
    merges, never corpus-scale) — broadcast, and applied as a nested
    fold (merge order outer, greedy left-to-right scan inner) once per
    input row. Callers pass DISTINCT words (one output row per input
    row); an empty merge table degenerates to character segmentation —
    rows are never lost (the collect is a global aggregate, so the
    array row exists even over zero merges)."""
    marr = merges.agg(
        F.array_sort(
            F.collect_list(F.struct("iter", "pair_a", "pair_b"))
        ).alias("merges")
    )
    return (
        words.select(F.col(word_col).alias("word"))
        .crossJoin(F.broadcast(marr))
        .select("word", F.expr(_APPLY_MERGES_FOLD).alias("seq"))
    )


def bpe_encode_words(
    words: DataFrame, word_col: str, freq_col: str, n_merges: int = 5
) -> DataFrame:
    """The APPLY side of the induction: the final vocabulary segmented
    under the ``n_merges`` learned merges — ``(word, seq)`` where ``seq``
    is the word's subword-symbol array. Tokenizing a corpus is then one
    vocab-sized equi-join on the word (never a per-document fold): the
    encode table is corpus-VOCAB-proportional, so at 100 TB the join is
    a keyed shuffle the corpus already pays for word counting — pin
    merge at the call site; the checkpointed table's stats underestimate
    (the PLANS.md broadcast-OOM shape)."""
    _, seqs = _bpe_loop(words, word_col, freq_col, n_merges)
    return seqs.select("word", "seq")
