"""Dataset versioning: diff two corpus snapshots into added / removed /
changed rows.

Every curated training set ships as versioned releases; the release note
is "what changed since v(N-1)" — which docs entered, which left, which
were edited. Over a lake table the two snapshots are time-travel reads of
the SAME table (:meth:`cdc_spark.lake.LakeTable.diff` wires this module to
the version log); over plain frames it is :func:`frame_diff`.

Plan shape at 100 TB: ONE full-outer equi-join on the key — both sides
hash-partitioned on it, payload comparison by a single fingerprint column
computed map-side (xxhash64 over the payload struct), unchanged rows
filtered before any further processing. No windows, no skew (keys are
unique per side), no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def frame_diff(
    old: DataFrame,
    new: DataFrame,
    key: list[str] | tuple[str, ...],
    payload: list[str] | None = None,
) -> DataFrame:
    """(key..., change_op) for every row that differs between ``old`` and
    ``new``: ``added`` (key only in new), ``removed`` (only in old),
    ``changed`` (both, payload fingerprint differs). Unchanged keys are
    dropped. ``payload`` defaults to all non-key columns shared by both
    sides."""
    key = list(key)
    if payload is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        payload = [c for c in shared if c not in set(key)]
    if not payload:
        raise ValueError("frame_diff needs at least one payload column")

    def fp(df: DataFrame, name: str) -> DataFrame:
        # null-safe fingerprint: hash each column WITH a presence flag so
        # NULL and '' (or 0) differ, then fold — all codegen, map-side
        cols: list = []
        for c in payload:
            cols.append(F.col(c).isNull().cast("int"))
            cols.append(F.col(c).cast("string"))
        return df.select(
            *key, F.xxhash64(*cols).alias(name), F.lit(1).alias(f"_in{name}")
        )

    o = fp(old, "_fpo")
    n = fp(new, "_fpn")
    j = o.join(n, key, "full_outer")
    return (
        j.select(
            *key,
            F.when(F.col("_in_fpo").isNull(), F.lit("added"))
            .when(F.col("_in_fpn").isNull(), F.lit("removed"))
            .when(F.col("_fpo") != F.col("_fpn"), F.lit("changed"))
            .alias("change_op"),
        )
        .filter(F.col("change_op").isNotNull())
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracled instance: two synthetic releases of the documents corpus —
    v1 lacks every doc_id % 7 == 0 doc, v2 lacks doc_id % 11 == 0 and
    edits the text of doc_id % 5 == 0 — diffed on doc_id over text."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    v1 = d.filter(F.pmod("doc_id", F.lit(7)) != 0)
    v2 = d.filter(F.pmod("doc_id", F.lit(11)) != 0).select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(5)) == 0, F.concat("text", F.lit("!"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return frame_diff(v1, v2, ["doc_id"], ["text"]).orderBy("doc_id")


SQL_SNAPSHOT_DIFF = """
WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
     v2 AS (SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN text || '!' ELSE text END
                       AS text
            FROM documents WHERE doc_id % 11 <> 0)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.text <> n.text THEN 'changed' END AS change_op
FROM v1 o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id
WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text <> n.text
ORDER BY doc_id
"""


def registry() -> dict:
    return {
        "snapshot_diff": (q_snapshot_diff, SQL_SNAPSHOT_DIFF),
    }
