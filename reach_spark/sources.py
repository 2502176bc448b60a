"""Input connectors: DSV/CSV and plaintext → the `documents` table
(SURVEY §2.1 S2; reference PaperReader.scala:102-137 + utils/DSVParser.scala).

Every source lands on the same interleaved-documents schema
(doc_id, spans array<struct<kind,text,media_ref,offset>>), so the rest of
the pipeline is source-agnostic. All transforms are built-in column
expressions — the csv/text scans stay fully JVM-side with pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _to_documents(df: DataFrame, id_col, text_col) -> DataFrame:
    span = F.struct(
        F.lit("text").alias("kind"),
        F.coalesce(text_col.cast("string"), F.lit("")).alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    )
    return df.select(id_col.cast("string").alias("doc_id"),
                     F.array(span).alias("spans"))


def read_dsv(spark: SparkSession, path: str, id_col: str = "doc_id",
             text_col: str = "text", sep: str = "\t",
             header: bool = True) -> DataFrame:
    """TSV/CSV of (id, text, ...) → documents (DSVParser semantics:
    one FriesEntry per row, PaperReader.scala:102-137)."""
    df = spark.read.option("sep", sep).option("header", header) \
        .option("multiLine", True).option("escape", '"').csv(path)
    return _to_documents(df, F.col(id_col), F.col(text_col))


def read_plaintext(spark: SparkSession, path: str) -> DataFrame:
    """Directory of .txt files → documents, one doc per file (the
    PaperReader plaintext branch); doc_id = file name."""
    df = (spark.read.text(path, wholetext=True)
          .withColumn("doc_id",
                      F.regexp_extract(F.input_file_name(),
                                       r"([^/]+?)(\.txt)?$", 1)))
    return _to_documents(df, F.col("doc_id"), F.col("value"))
