"""Incremental MinHash-LSH near-duplicate detection over a stream.

The batch operator (operators/dedup.minhash_neardup_pairs) answers
"which pairs in this corpus are near-dups". A training-data pipeline
asks the incremental form: *the corpus grew by a delta — which NEW
pairs appeared?* Rescanning 100 TB per day to re-answer the batch
question is the thing to avoid; the signature table (1000× smaller
than the text) is exactly the state that makes the delta form cheap:

* fold(delta): signatures for the delta only; candidates from a
  band-bucket join of the DELTA against (state ∪ delta) — old×old
  pairs were found when their second member arrived, so they are
  never re-joined; exact-Jaccard verify on the shingle arrays; the
  confirmed pairs append to a pairs ledger and the delta's signatures
  merge into the state.
* Replay safety: ids already present in the state are dropped from
  the delta first, so a re-delivered micro-batch finds an empty delta
  and changes nothing (idempotent under foreachBatch epoch replay).

State size is O(corpus signatures), not O(corpus); each fold's cost
is O(delta × collision rate), not O(corpus²).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ccgp_data_wrangling_spark.operators.dedup import (
    minhash_signature,
    shingle_hashes,
)
from ccgp_data_wrangling_spark.operators.merge import ParquetTable

__all__ = ["MinHashDedupState", "neardup_stream"]


class MinHashDedupState:
    """Persisted signature state + discovered-pairs ledger."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        threshold: float = 0.7,
        n_hashes: int = 64,
        bands: int = 16,
        shingle_k: int = 5,
        seed: int = 42,
        max_bucket: int = 1000,
    ):
        self.spark = spark
        self.threshold = threshold
        self.n_hashes = n_hashes
        self.bands = bands
        self.shingle_k = shingle_k
        self.seed = seed
        self.max_bucket = max_bucket
        self._sigs = ParquetTable(spark, os.path.join(path, "sigs"), key="id")
        self._pairs = ParquetTable(
            spark, os.path.join(path, "pairs"), key=["id_a", "id_b"]
        )

    # -- state IO ---------------------------------------------------------

    def _sigs_exist(self) -> bool:
        return os.path.isdir(self._sigs.path)

    def signatures(self) -> DataFrame:
        return self._sigs.read()

    def pairs(self) -> DataFrame:
        if not os.path.isdir(self._pairs.path):
            return self.spark.createDataFrame(
                [], "id_a long, id_b long, jaccard double"
            )
        return self._pairs.read()

    # -- the fold ---------------------------------------------------------

    def _sig_table(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        return docs.select(
            F.col(id_col).alias("id"),
            shingle_hashes(F.col(text_col), self.shingle_k).alias("sh"),
        ).withColumn(
            "sig", minhash_signature(F.col("sh"), self.n_hashes, self.seed)
        )

    def _banded(self, sigs: DataFrame) -> DataFrame:
        rows = self.n_hashes // self.bands
        band_hashes = F.array(
            *[
                F.hash(F.slice(F.col("sig"), b * rows + 1, rows))
                for b in range(self.bands)
            ]
        )
        return sigs.select(
            "id", F.posexplode(band_hashes).alias("band_idx", "band_hash")
        )

    def fold(self, batch: DataFrame, id_col: str, text_col: str) -> None:
        new = self._sig_table(batch, id_col, text_col)
        if self._sigs_exist():
            state = self.signatures()
            # replay safety: drop ids the state already holds
            new = new.join(state.select("id"), "id", "left_anti")
        else:
            state = None

        # localCheckpoint: the delta is reused by the band join, the
        # verify re-attach, and the state merge — and it must be
        # materialized BEFORE the sig swap below invalidates the
        # state parquet it was anti-joined against
        new = new.localCheckpoint(eager=True)
        if not new.take(1):
            return

        corpus = new if state is None else state.unionByName(new)
        corpus = corpus.localCheckpoint(eager=True)

        banded_new = self._banded(new)
        banded_all = self._banded(corpus)
        buckets = banded_all.groupBy("band_idx", "band_hash").agg(
            F.count(F.lit(1)).alias("n")
        )
        banded_all = banded_all.join(
            buckets.where(F.col("n") <= self.max_bucket).select(
                "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        )
        cands = (
            banded_new.select(
                "band_idx", "band_hash", F.col("id").alias("id_new")
            )
            .join(banded_all, ["band_idx", "band_hash"])
            .where(F.col("id_new") != F.col("id"))
            .select(
                F.least("id_new", "id").alias("id_a"),
                F.greatest("id_new", "id").alias("id_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )

        sh_a = corpus.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
        sh_b = corpus.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size(F.array_union("sh_a", "sh_b"))
        found = (
            cands.join(sh_a, "id_a")
            .join(sh_b, "id_b")
            .withColumn("jaccard", inter.cast("double") / union)
            .where(F.col("jaccard") >= self.threshold)
            .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
            .localCheckpoint(eager=True)
        )

        if os.path.isdir(self._pairs.path):
            self._pairs._swap_in(self.pairs().unionByName(found))
        else:
            self._pairs.init(found)

        if state is None:
            self._sigs.init(new)
        else:
            self._sigs._swap_in(state.unionByName(new))


def neardup_stream(
    stream: DataFrame,
    state: MinHashDedupState,
    id_col: str,
    text_col: str,
    *,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Maintain incremental near-dup state from a document stream."""

    def _sink(batch: DataFrame, _epoch: int) -> None:
        state.fold(batch, id_col, text_col)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
