"""BPE tokenizer training over the corpus — the "fit the tokenizer on your
data" stage of a training-data pipeline (Sennrich et al. 2016).

BPE trains on the WORD-TYPE table, not the corpus: the distributed part is
one word-count exchange + a TakeOrderedAndProject top-V cut (the IVF
discipline: driver-side training on a deterministic, bounded summary —
the type table of any corpus tops out around 10^6 rows, where the corpus
is 10^10).  The merge loop itself is exact integer pair counting on that
bounded table, so the result is deterministic across partition counts and
cluster sizes.

Application (``apply_merges``) is an Arrow-batched map with the merge
ranks broadcast — the standard inference path, no shuffle.

Grading: the merge table and the per-doc applied counts are compared to a
plain-Python golden computed straight from the parquet (the winnow/phash
golden pattern).  The golden shares this module's merge-loop/apply helpers
(driver-side plain Python either way); what it checks DIFFERENTIALLY is
the distributed word count, the deterministic top-V cut, and the Arrow
application path against a row-at-a-time pass over the raw file.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

BPE_TOP_WORDS = 2000
BPE_MERGES = 50
BPE_MIN_PAIR = 2


def word_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, n) — lowercase whitespace tokens; one partial-agg'd exchange."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        df.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(toks).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _merge_loop(
    vocab: list[tuple[str, int]], n_merges: int, min_pair: int
) -> list[tuple[int, str, str, int]]:
    """Exact integer BPE merges over a (word, count) vocabulary."""
    seqs: list[tuple[list[str], int]] = [(list(w), c) for w, c in vocab]
    merges: list[tuple[int, str, str, int]] = []
    for idx in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in seqs:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        # deterministic argmax: highest count, then lexicographically least
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < min_pair:
            break
        merges.append((idx, left, right, cnt))
        tok = left + right
        for syms, _ in seqs:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == left and syms[i + 1] == right:
                    syms[i : i + 2] = [tok]
                else:
                    i += 1
    return merges


def train_bpe(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_words: int = BPE_TOP_WORDS,
    n_merges: int = BPE_MERGES,
    min_pair: int = BPE_MIN_PAIR,
) -> list[tuple[int, str, str, int]]:
    """[(merge_idx, left, right, pair_count)] — the trained merge table.
    The only distributed work is the word count + top-V cut (bounded
    driver collect, the IVF sample discipline)."""
    wc = (
        word_counts(df, id_col=id_col, text_col=text_col)
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(top_words)
        .collect()
    )
    return _merge_loop([(r["word"], r["n"]) for r in wc], n_merges, min_pair)


def merges_df(spark: SparkSession, merges) -> DataFrame:
    return spark.createDataFrame(
        [(int(i), l, r, int(c)) for i, l, r, c in merges],
        "merge_idx long, left string, right string, pair_count long",
    )


def _apply_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Number of BPE symbols for one word under the trained ranks
    (iteratively merge the lowest-rank adjacent pair — the standard
    inference loop)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def apply_merges(
    df: DataFrame,
    merges,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, n_bpe_symbols) — tokenize every document with the
    trained merges: Arrow-batched, ranks broadcast via closure, per-word
    memoization inside the batch (word types repeat heavily)."""
    from pyspark.sql.types import LongType, StructField, StructType

    ranks = {(l, r): i for i, l, r, _ in merges}
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("n_words", LongType(), True),
            StructField("n_bpe_symbols", LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}

        def doc_counts(text: str) -> tuple[int, int]:
            words = text.lower().strip().split()
            total = 0
            for w in words:
                if w not in cache:
                    cache[w] = _apply_word(w, ranks)
                total += cache[w]
            return len(words), total

        for pdf in batches:
            counts = [doc_counts(t or "") for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": [c[0] for c in counts],
                    "n_bpe_symbols": [c[1] for c in counts],
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).mapInPandas(
        run, schema=schema
    )


def naive_bpe_golden(parquet_path: str, top_words: int = BPE_TOP_WORDS,
                     n_merges: int = BPE_MERGES, min_pair: int = BPE_MIN_PAIR):
    """Plain-Python golden straight from the parquet: dict word count,
    same deterministic top-V cut, shared merge loop (see module note on
    what is and is not independent); returns
    (merges, [(doc_id, n_words, n_bpe_symbols)])."""
    import pyarrow.parquet as pq

    docs = pq.read_table(parquet_path, columns=["doc_id", "text"])
    counts: dict[str, int] = {}
    rows = []
    for doc_id, text in zip(docs.column("doc_id"), docs.column("text")):
        words = (text.as_py() or "").lower().strip().split()
        rows.append((doc_id.as_py(), words))
        for w in words:
            counts[w] = counts.get(w, 0) + 1
    vocab = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_words]
    merges = _merge_loop(vocab, n_merges, min_pair)
    ranks = {(l, r): i for i, l, r, _ in merges}
    cache: dict[str, int] = {}
    applied = []
    for doc_id, words in rows:
        total = 0
        for w in words:
            if w not in cache:
                cache[w] = _apply_word(w, ranks)
            total += cache[w]
        applied.append((doc_id, len(words), total))
    return merges, applied


# --- vocabulary coverage / OOV diagnostics --------------------------------------
#
# The fit diagnostic for any fixed vocabulary (the BPE top-V above, or a
# deployed tokenizer's word list): what fraction of each document's tokens
# fall outside it.  High OOV flags domain shift (code in a prose corpus,
# new languages) before training does.  Shape: the vocab is O(V) and
# BROADCASTS; the token explode is map-side; the only exchange is the
# per-doc partial agg.

def oov_stats(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, n_oov, oov_ppm) — vocab is a (word) DataFrame."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("word"),
    ).where(F.col("word") != "")
    flagged = toks.join(
        F.broadcast(vocab.select("word").withColumn("_in", F.lit(1))),
        on="word",
        how="left",
    )
    counted = flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).cast("long").alias("n_oov"),
    )
    # empty/blank docs emit no tokens: restore them with 0/0
    all_docs = df.select(F.col(id_col).alias("doc_id")).distinct()
    return all_docs.join(counted, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_oov"), F.lit(0)).cast("long").alias("n_oov"),
        F.floor(
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("double")
            / F.greatest(F.coalesce(F.col("n_tokens"), F.lit(0)).cast("double"), F.lit(1.0))
            * 1e6
        ).cast("long").alias("oov_ppm"),
    )


def top_vocab(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    top_words: int = BPE_TOP_WORDS,
) -> DataFrame:
    """(word) — the deterministic top-V cut (count desc, word asc);
    TakeOrderedAndProject, no global sort."""
    return (
        word_counts(df, id_col=id_col, text_col=text_col)
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(top_words)
        .select("word")
    )


def duck_oov_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text",
    top_words: int = BPE_TOP_WORDS,
) -> str:
    """DuckDB twin of oov_stats(df, top_vocab(df))."""
    toks = (
        f"SELECT {id_col} AS doc_id, unnest(regexp_split_to_array("
        f"trim(lower({text_col})), '\\s+')) AS word FROM {table} "
        f"WHERE trim({text_col}) <> ''"
    )
    return rf"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, word FROM ({toks}) WHERE word <> ''
),
vocab AS MATERIALIZED (
  SELECT word FROM toks GROUP BY word
  ORDER BY count(*) DESC, word ASC LIMIT {top_words}
),
counted AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM toks t LEFT JOIN vocab v ON v.word = t.word
  GROUP BY 1
)
SELECT d.doc_id,
       coalesce(c.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(c.n_oov, 0)::BIGINT AS n_oov,
       floor(coalesce(c.n_oov, 0)::DOUBLE
             / greatest(coalesce(c.n_tokens, 0), 1)::DOUBLE * 1e6)::BIGINT AS oov_ppm
FROM (SELECT DISTINCT {id_col} AS doc_id FROM {table}) d
LEFT JOIN counted c USING (doc_id)
"""
