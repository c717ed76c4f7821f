"""Persisted IVF index: the serving-path counterpart of
``similarity.ivf_ann_topk`` (which builds its inverted file per call).

Layout on disk::

    <path>/cell=<c>/*.parquet   -- members, partitioned by coarse cell
    <path>/_centroids/*.parquet -- the n_cells x dim coarse quantizer

The underscore directory is invisible to Spark's partition discovery, so a
plain ``spark.read.parquet(path)`` sees only the member rows. Probing a
query batch routes each query to its n_probe nearest centroids, collects the
DISTINCT probed cell ids (<= n_cells integers — driver-bounded by the cell
count, never the data), and reads the index with a plan-time
``cell IN (...)`` predicate, so the scan's PartitionFilters prune to the
probed directories: at 100 TB a 10-query probe against a 1024-cell index
touches ~n_probe directories' worth of files, not the corpus. Scoring and
ranking replicate ivf_ann_topk bit-for-bit (same float64 GEMM, round-6
before ranking, first-max/lowest-id tie-breaks), so a probe against a
persisted index equals the in-memory result for the same queries — the
equality a pytest asserts.

The reference has no file storage at all (pipe stdin/stdout only,
HACKING.md:127-140) — this is engine-extension surface (SURVEY.md §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from udlang_spark.operators.similarity import _safe_norms


def _centroids(sdf: DataFrame, n_cells: int):
    """Deterministic coarse quantizer: the first n_cells vectors in id order
    (same seeding as ivf_ann_topk; a production build runs k-means here —
    operators/similarity.kmeans_assign — the index machinery is identical).
    The ONLY driver materialization anywhere in the index, O(n_cells x dim)."""
    import numpy as np

    cent_pdf = sdf.orderBy("id").limit(n_cells).toPandas().sort_values("id")
    if len(cent_pdf) == 0:
        raise ValueError(
            "write_ivf_index: cannot build an IVF index over an empty "
            "relation (no rows to seed the coarse quantizer)"
        )
    cent = np.stack(cent_pdf["vec"].to_numpy()).astype(np.float64)
    return cent_pdf, cent, _safe_norms(cent)


def write_ivf_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    n_cells: int = 16,
) -> None:
    """Build and persist the inverted file: one narrow mapInPandas routes
    every member to its argmax-cosine cell (GEMM against the broadcast
    centroids — no shuffle); the partitioned write is the only wide op.
    Cells are the unit of parallelism AND of persistence."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    sdf = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    cent_pdf, cent, cent_norm = _centroids(sdf, n_cells)
    bc = spark.sparkContext.broadcast((cent, cent_norm))

    def route_members(batches):
        cent_, cent_norm_ = bc.value
        for pb in batches:
            if len(pb) == 0:
                continue
            mat = np.stack(pb["vec"].to_numpy()).astype(np.float64)
            nrm = _safe_norms(mat)
            qc = (mat @ cent_.T) / nrm[:, None] / cent_norm_[None, :]
            np.round(qc, 6, out=qc)  # routing parity with ivf_ann_topk
            yield pd.DataFrame(
                {
                    "cell": np.argmax(qc, axis=1).astype(np.int32),
                    "id": pb["id"].to_numpy(),
                    "vec": pb["vec"].to_numpy(),
                }
            )

    id_type = sdf.schema["id"].dataType
    vec_type = sdf.schema["vec"].dataType
    routed_schema = StructType(
        [
            StructField("cell", IntegerType(), False),
            StructField("id", id_type, True),
            StructField("vec", vec_type, True),
        ]
    )
    members = sdf.mapInPandas(route_members, routed_schema)
    members.write.mode("overwrite").partitionBy("cell").parquet(path)
    # centroids written LAST: a crashed build leaves no complete-looking
    # _centroids over partial member data (readers require both)
    cent_rows = [
        (int(i), [float(x) for x in v])
        for i, v in enumerate(cent_pdf["vec"].to_numpy())
    ]
    spark.createDataFrame(cent_rows, "cell int, vec array<float>").coalesce(
        1
    ).write.mode("overwrite").parquet(path + "/_centroids")


def probe_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k neighbors for each query against a persisted index, reading
    only the probed cells' partitions. Returns (vec_id, nbr, cos_sim, rnk)
    — the ivf_ann_topk schema, value-identical for identical parameters."""
    import numpy as np
    import pandas as pd

    cent_rows = (
        spark.read.parquet(path + "/_centroids").orderBy("cell").collect()
    )
    cent = np.stack([np.asarray(r["vec"]) for r in cent_rows]).astype(np.float64)
    cent_norm = _safe_norms(cent)
    bc = spark.sparkContext.broadcast((cent, cent_norm))
    n_probe = min(n_probe, len(cent_rows))

    q = queries.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))

    def route_queries(batches):
        cent_, cent_norm_ = bc.value
        for pb in batches:
            if len(pb) == 0:
                continue
            ids = pb["id"].to_numpy()
            mat = np.stack(pb["vec"].to_numpy()).astype(np.float64)
            nrm = _safe_norms(mat)
            qc = (mat @ cent_.T) / nrm[:, None] / cent_norm_[None, :]
            np.round(qc, 6, out=qc)
            probe = np.argsort(-qc, kind="stable", axis=1)[:, :n_probe]
            yield pd.DataFrame(
                {
                    "cell": probe.ravel(),
                    "id": np.repeat(ids, n_probe),
                    "vec": np.repeat(pb["vec"].to_numpy(), n_probe),
                }
            )

    id_type = q.schema["id"].dataType
    vec_type = q.schema["vec"].dataType
    routed_schema = StructType(
        [
            StructField("cell", IntegerType(), False),
            StructField("id", id_type, True),
            StructField("vec", vec_type, True),
        ]
    )
    routed_q = q.mapInPandas(route_queries, routed_schema)

    # the probed-cell set is what makes partition pruning PLAN-time: it is
    # bounded by n_cells (distinct over <= n_cells integers), never by |queries|
    cells = sorted(
        r["cell"] for r in routed_q.select("cell").distinct().collect()
    )
    index = spark.read.parquet(path).where(
        F.col("cell").isin([int(c) for c in cells])
    )

    def score(qpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(ipdf) == 0:
            return pd.DataFrame({"vec_id": [], "nbr": [], "cos_sim": []})
        b_ids = ipdf["id"].to_numpy()
        b_mat = np.stack(ipdf["vec"].to_numpy()).astype(np.float64)
        b_norm = _safe_norms(b_mat)
        q_ids = qpdf["id"].to_numpy()
        q_mat = np.stack(qpdf["vec"].to_numpy()).astype(np.float64)
        q_norm = _safe_norms(q_mat)
        cos = q_mat @ b_mat.T
        cos /= q_norm[:, None]
        cos /= b_norm[None, :]
        np.round(cos, 6, out=cos)
        cos[q_ids[:, None] == b_ids[None, :]] = -np.inf
        order = np.lexsort((b_ids[None, :].repeat(len(q_ids), 0), -cos), axis=1)
        m = min(k, cos.shape[1])
        top = order[:, :m]
        out = pd.DataFrame(
            {
                "vec_id": np.repeat(q_ids, m),
                "nbr": b_ids[top].ravel(),
                "cos_sim": np.take_along_axis(cos, top, 1).ravel(),
            }
        )
        return out[out["cos_sim"] != -np.inf]

    pair_schema = StructType(
        [
            StructField("vec_id", id_type, True),
            StructField("nbr", id_type, True),
            StructField("cos_sim", DoubleType(), True),
        ]
    )
    scored = (
        routed_q.groupBy("cell")
        .cogroup(index.groupBy("cell"))
        .applyInPandas(lambda left, right: score(left, right), pair_schema)
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("nbr"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


def append_to_ivf_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
) -> None:
    """Incrementally add members to an existing index: new rows route
    against the PERSISTED centroids (the quantizer is frozen — the
    production contract for serving indexes; re-quantizing would silently
    invalidate every cached probe) and append into their cell partitions.
    One narrow map + an append-mode partitioned write; existing files are
    untouched. Periodic rebuild (write_ivf_index) re-balances cells when
    drift makes the frozen quantizer a bad fit."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    cent_rows = (
        spark.read.parquet(path + "/_centroids").orderBy("cell").collect()
    )
    cent = np.stack([np.asarray(r["vec"]) for r in cent_rows]).astype(np.float64)
    cent_norm = _safe_norms(cent)
    bc = spark.sparkContext.broadcast((cent, cent_norm))
    sdf = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))

    def route_members(batches):
        cent_, cent_norm_ = bc.value
        for pb in batches:
            if len(pb) == 0:
                continue
            mat = np.stack(pb["vec"].to_numpy()).astype(np.float64)
            nrm = _safe_norms(mat)
            qc = (mat @ cent_.T) / nrm[:, None] / cent_norm_[None, :]
            np.round(qc, 6, out=qc)
            yield pd.DataFrame(
                {
                    "cell": np.argmax(qc, axis=1).astype(np.int32),
                    "id": pb["id"].to_numpy(),
                    "vec": pb["vec"].to_numpy(),
                }
            )

    routed_schema = StructType(
        [
            StructField("cell", IntegerType(), False),
            StructField("id", sdf.schema["id"].dataType, True),
            StructField("vec", sdf.schema["vec"].dataType, True),
        ]
    )
    sdf.mapInPandas(route_members, routed_schema).write.mode(
        "append"
    ).partitionBy("cell").parquet(path)
