"""BPE tokenizer queries: iterative merge training and codegen
encoding, both oracle-backed.

The training oracle is the interesting one: DuckDB replays the SAME
iterative algorithm round by round — each round is a CTE pair
(pair-count argmax → REPLACE merge application on the vocab) — which
is possible only because the operator's merge step IS the builtin
left-to-right non-overlapping ``replace`` on marker-wrapped symbol
strings (operators/bpe.py module docstring). Every CTE is
MATERIALIZED: DuckDB otherwise inlines each reference, and the
round-k vocab is referenced three times per round — ~3^k scans.
No other query in the registry verifies a driver-side iterative loop
this tightly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.catalog import load_table
from ccgp_data_wrangling_spark.queries import register

_N_MERGES = 8

# chr(31) = symbol-open marker, chr(30) = symbol-close marker — the
# disjoint-occurrence representation operators/bpe.py documents.
_STATE = (
    "regexp_replace(replace(replace(w, chr(31), ''), chr(30), ''),"
    " '(.)', chr(31) || '\\1' || chr(30), 'g') || chr(31) || '</w>' || chr(30)"
)

_V0 = rf"""
words AS MATERIALIZED (
  SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents
),
v0 AS MATERIALIZED (
  SELECT {_STATE} AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM words WHERE w != '' GROUP BY 1
)"""


def _round_ctes(k: int, src: str) -> str:
    """One training round: pair counts over v{k-1}, argmax winner m{k}
    (count desc, pair asc — the operator's tie-break), merge applied
    via REPLACE into v{k}."""
    return f""",
p{k} AS MATERIALIZED (
  SELECT a[i] AS l, a[i + 1] AS r, CAST(SUM(n) AS BIGINT) AS cnt
  FROM (SELECT n, list_filter(string_split(replace(s, chr(31), ''), chr(30)),
                              x -> x != '') AS a FROM {src}),
       UNNEST(range(1, len(a))) AS t(i)
  GROUP BY 1, 2
),
m{k} AS MATERIALIZED (SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1),
v{k} AS MATERIALIZED (
  SELECT replace(s,
                 chr(31) || (SELECT l FROM m{k}) || chr(30) ||
                 chr(31) || (SELECT r FROM m{k}) || chr(30),
                 chr(31) || (SELECT l FROM m{k}) || (SELECT r FROM m{k}) || chr(30)) AS s,
         n
  FROM {src}
)"""


def _train_oracle(n: int) -> str:
    body = "WITH " + _V0.strip()
    for k in range(1, n + 1):
        body += _round_ctes(k, f"v{k - 1}")
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS INT) AS merge_rank, l AS lhs, r AS rhs,"
        f" cnt AS pair_count FROM m{k}"
        for k in range(1, n + 1)
    )
    return body + "\n" + sel


_TRAIN_SQL = _train_oracle(_N_MERGES)


@register("bpe_train_merges", _TRAIN_SQL)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 BPE merges learned from the documents corpus
    (operators/bpe.bpe_train): one vocab-sized pair-count shuffle per
    round, deterministic (count desc, pair asc) winner, REPLACE-based
    merge application. The oracle unrolls the identical 8 rounds in
    SQL. min_count=2 cannot trigger at sf>=0.01 (every winning pair
    here counts in the thousands), so both sides always emit 8 rows.
    """
    from ccgp_data_wrangling_spark.operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents").select("text")
    merges = bpe_train(docs, "text", n_merges=_N_MERGES, min_count=2)
    return spark.createDataFrame(
        [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "merge_rank int, lhs string, rhs string, pair_count bigint",
    )


def _encode_oracle(n: int) -> str:
    """Token counts per doc under the trained merges: replay training
    (m1..m{n}) then apply the same REPLACE chain to every document's
    word states; tokens per word = close-marker count."""
    body = "WITH " + _V0.strip()
    for k in range(1, n + 1):
        body += _round_ctes(k, f"v{k - 1}")
    chain = _STATE
    for k in range(1, n + 1):
        chain = (
            f"replace({chain}, chr(31) || (SELECT l FROM m{k}) || chr(30) || "
            f"chr(31) || (SELECT r FROM m{k}) || chr(30), "
            f"chr(31) || (SELECT l FROM m{k}) || (SELECT r FROM m{k}) || chr(30))"
        )
    return (
        body
        + f""",
doc_words AS MATERIALIZED (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
),
enc AS MATERIALIZED (
  SELECT doc_id, {chain} AS s FROM doc_words WHERE w != ''
)
SELECT doc_id,
       CAST(SUM(len(s) - len(replace(s, chr(30), ''))) AS BIGINT) AS n_tokens
FROM enc GROUP BY 1"""
    )


_ENCODE_SQL = _encode_oracle(_N_MERGES)


@register("bpe_encode_token_count", _ENCODE_SQL)
def bpe_encode_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the corpus-trained merges
    (operators/bpe.bpe_encode_expr): training replay semantics, the
    whole encode is one chained-replace codegen expression — no UDF,
    no shuffle beyond the training rounds themselves."""
    from ccgp_data_wrangling_spark.operators.bpe import (
        bpe_token_count_expr,
        bpe_train,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = bpe_train(docs, "text", n_merges=_N_MERGES, min_count=2)
    return docs.select(
        "doc_id", bpe_token_count_expr(F.col("text"), merges).alias("n_tokens")
    )


# ---------------------------------------------------------------------------
# Encode→decode round trip: the decoder inverts the chained-replace
# encoder exactly, so the oracle is closed-form — no BPE machinery on
# the DuckDB side at all. It mirrors the encoder's exact preprocessing
# (r7 advice): reserved marker bytes \x1f/\x1e are stripped per word
# (as _word_state does), and a LITERAL '</w>' spelling inside a word
# decodes to a space (the decoder's global replace cannot distinguish
# it from the terminal marker — inherent to Sennrich's end-of-word
# scheme). Cross-boundary matches are impossible ('<' appears in the
# marker only at position 0), so per-word replace + single-space join
# is byte-identical to the decoder's concat-then-replace. Any merge
# that corrupted symbol boundaries still breaks the hash.
# ---------------------------------------------------------------------------

_ROUNDTRIP_SQL = r"""
WITH w AS (
  SELECT doc_id,
         LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
                     x -> x != '') AS ws
  FROM documents
)
SELECT doc_id,
       TRIM(ARRAY_TO_STRING(
         LIST_TRANSFORM(ws, x -> REPLACE(
           REPLACE(REPLACE(x, chr(31), ''), chr(30), ''),
           '</w>', ' ')),
         ' ')) AS text_rt,
       CAST(LEN(ws) AS INT) AS n_words
FROM w
"""


@register("bpe_roundtrip_identity", _ROUNDTRIP_SQL)
def bpe_roundtrip_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode(encode(text)) == whitespace-normalized text, under the
    corpus-trained merges — the losslessness contract every tokenizer
    deployment depends on, checked corpus-wide in pure codegen."""
    from ccgp_data_wrangling_spark.operators.bpe import (
        bpe_decode_expr,
        bpe_encode_expr,
        bpe_train,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = bpe_train(docs, "text", n_merges=_N_MERGES, min_count=2)
    toks = bpe_encode_expr(F.col("text"), merges)
    words = F.filter(F.split(F.trim("text"), r"\s+"), lambda w: w != "")
    return docs.select(
        "doc_id",
        bpe_decode_expr(toks).alias("text_rt"),
        F.size(words).cast("int").alias("n_words"),
    )
