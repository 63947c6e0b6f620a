"""MS MARCO-style TF-IDF corpus pipeline.

Reference counterpart: ``_process_msmarco_tfidf`` (dataset.py:668-856):
stream passages structs, keep selected passages, canonicalize + dedup
text first-writer-wins, TF-IDF vectorize (max 512 features, 1-2 grams),
vectorize queries in the same space, positives-based ground truth.

Spark-first: explode + filter + dropDuplicates are single-shuffle
built-ins; vectorization is MLlib (``CountVectorizer`` fit over unigrams
+ bigrams, then ``IDF``), which distributes both the vocabulary fit and
the transform.  The fitted model applies identically to docs and
queries, mirroring scikit-learn's fit-on-corpus/transform-queries in
the reference (dataset.py:832-845).
"""

from __future__ import annotations

from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    CountVectorizerModel,
    NGram,
    RegexTokenizer,
)
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def select_passages(
    raw: DataFrame,
    passages_col: str = "passages",
    text_field: str = "passage_text",
    selected_field: str = "is_selected",
) -> DataFrame:
    """Explode MS MARCO ``passages`` structs → one selected, canonical,
    deduplicated passage row each: (doc_id, text).  Parity:
    dataset.py:723-741 (selected filter, strip/empty→null, first-writer
    dedup)."""
    exploded = raw.select(
        F.posexplode(
            F.arrays_zip(
                F.col(f"{passages_col}.{text_field}").alias("t"),
                F.col(f"{passages_col}.{selected_field}").alias("s"),
            )
        ).alias("pos", "p")
    ).select(
        F.col("p.t").alias("text_raw"), F.col("p.s").alias("is_selected")
    )
    canon = (
        exploded.filter(F.col("is_selected") == 1)
        .select(F.nullif(F.trim(F.col("text_raw")), F.lit("")).alias("text"))
        .filter(F.col("text").isNotNull())
        .dropDuplicates(["text"])
    )
    from vectordb_retrieval_spark.operators.text_retrieval import global_rank

    # hash-ordered ids WITHOUT an unpartitioned row_number window —
    # global_rank is range-sorted + per-partition offsets, so id
    # assignment never funnels the corpus through one task.
    ranked = global_rank(canon, [F.xxhash64("text"), F.col("text")])
    return ranked.select(
        (F.col("rank") - 1).cast("long").alias("doc_id"), "text"
    )


class TfidfVectorizer:
    """Fit-on-corpus / transform-anything TF-IDF in a fixed feature
    space (max_features dims, word 1-2 grams), emitting dense
    ``array<float>`` embeddings ready for every ANN operator."""

    def __init__(self, max_features: int = 512, min_df: int = 1):
        self.max_features = max_features
        self.min_df = min_df
        self.cv_model = None
        self.idf_model = None

    @staticmethod
    def _terms(df: DataFrame, text_col: str) -> DataFrame:
        tok = RegexTokenizer(
            inputCol=text_col, outputCol="_tokens", pattern=r"\W+", toLowercase=True
        )
        toks = tok.transform(df)
        bi = NGram(n=2, inputCol="_tokens", outputCol="_bigrams")
        with_bi = bi.transform(toks)
        return with_bi.withColumn(
            "_terms", F.concat(F.col("_tokens"), F.col("_bigrams"))
        )

    def fit(
        self,
        corpus: DataFrame,
        text_col: str = "text",
        deterministic: bool = False,
    ) -> "TfidfVectorizer":
        """Fit vocabulary + IDF weights on the corpus.

        ``deterministic=True`` pins the vocabulary to the top
        ``max_features`` terms by (document frequency DESC, term ASC) —
        a total order, so the fitted space is bit-reproducible across
        runs and engines (CountVectorizer's own frequency ordering
        breaks ties arbitrarily).  One extra distributed agg; the
        vocabulary itself (≤ max_features strings) is driver-side."""
        terms = self._terms(corpus, text_col)
        if deterministic:
            vocab_rows = (
                terms.select(F.explode(F.array_distinct("_terms")).alias("term"))
                .groupBy("term")
                .agg(F.count("*").alias("df"))
                .filter(F.col("df") >= self.min_df)
                .orderBy(F.desc("df"), "term")
                .limit(self.max_features)
                .collect()
            )
            self.cv_model = CountVectorizerModel.from_vocabulary(
                [r["term"] for r in vocab_rows], inputCol="_terms", outputCol="_tf"
            )
        else:
            cv = CountVectorizer(
                inputCol="_terms",
                outputCol="_tf",
                vocabSize=self.max_features,
                minDF=self.min_df,
            )
            self.cv_model = cv.fit(terms)
        tf = self.cv_model.transform(terms)
        self.idf_model = IDF(inputCol="_tf", outputCol="_tfidf").fit(tf)
        return self

    def transform(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        out_id: str = "id",
        vec_col: str = "vec",
        vec_dtype: str = "float32",
    ) -> DataFrame:
        if self.cv_model is None:
            raise RuntimeError("fit must run before transform")
        terms = self._terms(df, text_col)
        tf = self.cv_model.transform(terms)
        tfidf = self.idf_model.transform(tf)
        # MLlib sparse vector → dense array (float32 = the engine's ANN
        # contract; float64 keeps full precision for oracle checks),
        # densified JVM-side by vector_to_array — no Python UDF
        return tfidf.select(
            F.col(id_col).cast("long").alias(out_id),
            vector_to_array(F.col("_tfidf"), vec_dtype).alias(vec_col),
        )


def tfidf_dataset(
    docs: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    max_features: int = 512,
    gt_k: int = 10,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(train, test, gt): TF-IDF embed docs + queries in one fitted
    space; ground truth = the positives mapping (query_id → doc_id)
    capped at gt_k per query, rank-ordered by doc_id (parity:
    positives-based GT, dataset.py:796-827)."""
    vec = TfidfVectorizer(max_features).fit(docs)
    train = vec.transform(docs, id_col="doc_id")
    test = vec.transform(queries, id_col="query_id", out_id="qid")
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy("id")
    gt = (
        positives.select(
            F.col("query_id").cast("long").alias("qid"),
            F.col("doc_id").cast("long").alias("id"),
        )
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= gt_k)
    )
    return train, test, gt
