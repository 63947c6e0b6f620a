"""Vector-column schema inference for Parquet embedding tables.

Reference counterpart: ``is_vector_field`` / ``select_column``
(dataset.py:1167-1268) — probe a candidate-name list (``emb``,
``embedding``, ``vector``, …) against the Arrow schema, accepting
list<float> / fixed_size_list<float> / struct{values: list<float>}
shapes.  Spark gives declared schemas, so the probe inspects
``df.schema`` instead of Arrow types; struct-wrapped embeddings are
unwrapped with a column expression (zero-copy in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

VECTOR_COLUMN_CANDIDATES = [
    "emb",
    "embedding",
    "embeddings",
    "vector",
    "vec",
    "features",
    "passage_embedding",
    "query_embedding",
]

ID_COLUMN_CANDIDATES = ["id", "vec_id", "doc_id", "passage_id", "qid", "query_id"]


def _is_numeric_array(dt: T.DataType) -> bool:
    return isinstance(dt, T.ArrayType) and isinstance(
        dt.elementType, (T.FloatType, T.DoubleType)
    )


def find_vector_column(df: DataFrame) -> tuple[str, bool]:
    """(column_name, is_struct_wrapped) of the embedding column.

    Checks candidate names first (reference precedence), then any
    numeric-array column, then struct children named ``values``.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    for name in VECTOR_COLUMN_CANDIDATES:
        if name in fields:
            dt = fields[name]
            if _is_numeric_array(dt):
                return name, False
            if isinstance(dt, T.StructType):
                inner = {f.name: f.dataType for f in dt.fields}
                if "values" in inner and _is_numeric_array(inner["values"]):
                    return name, True
    for name, dt in fields.items():
        if _is_numeric_array(dt):
            return name, False
        if isinstance(dt, T.StructType):
            inner = {f.name: f.dataType for f in dt.fields}
            if "values" in inner and _is_numeric_array(inner["values"]):
                return name, True
    raise ValueError(
        f"no vector column found; schema: {df.schema.simpleString()}"
    )


def find_id_column(df: DataFrame) -> str | None:
    fields = {f.name: f.dataType for f in df.schema.fields}
    for name in ID_COLUMN_CANDIDATES:
        if name in fields and isinstance(
            fields[name], (T.LongType, T.IntegerType, T.ShortType)
        ):
            return name
    return None


def load_vector_table(
    df: DataFrame, id_col: str = "id", vec_col: str = "vec"
) -> DataFrame:
    """Normalize any supported embedding table to (id, vec: array<float>).

    Missing id column → stable ids from a deterministic hash-ordered
    row_number over the vector bytes (only for ad-hoc tables; real
    pipelines carry ids).
    """
    src_vec, wrapped = find_vector_column(df)
    vec_expr = F.col(f"{src_vec}.values") if wrapped else F.col(src_vec)
    vec_expr = F.transform(vec_expr, lambda x: x.cast("float")).alias(vec_col)
    src_id = find_id_column(df)
    if src_id is not None:
        return df.select(F.col(src_id).cast("long").alias(id_col), vec_expr)
    from vectordb_retrieval_spark.operators.text_retrieval import global_rank

    # distributed rank assignment over the vector-bytes hash — no
    # unpartitioned row_number window (the hash string doubles as the
    # tie-break so the order is total).
    key = F.xxhash64(F.concat_ws(",", F.col(vec_col)))
    ranked = global_rank(df.select(vec_expr), [key])
    return ranked.select(
        (F.col("rank") - 1).cast("long").alias(id_col), vec_col
    )
