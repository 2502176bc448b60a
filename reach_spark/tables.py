"""Catalog-table materialization of the knowledge graph.

The north rule targets *named, partitioned Iceberg tables* for the output
graph (triples, entities), not bare parquet paths. This module is that
sink: `materialize` writes a DataFrame to a catalog table partitioned on
the given columns, and `materialize_graph` lays down the standard table set
the batch driver produces (reference output layout: export/.../arizona/
ArizonaOutputter.scala:14-62 rows → our `triples`; the entity side has no
reference analog — it is the canonicalized grounding table of SURVEY §2.6).

Catalog dispatch, not format branching:

- If the table's catalog is a **plugged V2 catalog** (an entry under
  `spark.sql.catalog.<name>` — how Iceberg/Delta register), writes go
  through the DataFrameWriterV2 API: `df.writeTo(t).partitionedBy(...)
  .createOrReplace()` / `.append()`. With the Iceberg runtime on the
  cluster classpath this is the real Iceberg write — snapshot-isolated
  commits, hidden partitioning, time travel — and NOTHING in this module
  changes: the submitter sets
      --conf spark.sql.catalog.kg=org.apache.iceberg.spark.SparkCatalog
      --conf spark.sql.catalog.kg.type=hadoop --conf ...warehouse=<path>
  and passes table names like `kg.db.triples`.
- Otherwise (this sandbox: no Iceberg jar, session catalog only) the same
  logical table is written through the V1 `saveAsTable` path with an
  identical layout: named catalog table, hive-style `pred=<v>` partition
  directories, partition-pruned scans. The V1 session catalog accepts
  partitioned `create`/`overwrite`/`append` for parquet; what it lacks vs
  Iceberg is transactional snapshots — documented, not simulated.

Either way the reader is `spark.table(name)` and partition pruning is a
plan fact (asserted in tests/test_tables.py): a `WHERE pred = 'X'` scan
reads only that partition's files.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def uses_v2_catalog(spark: SparkSession, table: str) -> bool:
    """True when `table`'s catalog component names a plugged V2 catalog
    (i.e. `spark.sql.catalog.<name>` is configured — Iceberg, Delta, or any
    TableCatalog implementation). The bare session catalog (`spark_catalog`
    without a plugin, or an unqualified table name) is V1."""
    cat = table.split(".")[0] if table.count(".") >= 2 else None
    if cat is None:
        return False
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{cat}")
    except Exception:
        return False
    # Spark 4 reports the unplugged session catalog as the literal
    # 'builtin' — that is the V1 path, not a TableCatalog plugin class
    return bool(impl) and impl != "builtin"


def materialize(df: DataFrame, table: str,
                partition_by: Sequence[str] = (),
                mode: str = "overwrite") -> None:
    """Write `df` to catalog table `table`, partitioned by `partition_by`.

    mode: 'overwrite' replaces the table (schema + data), 'append' adds
    rows (creating the table on first write). Dispatches V2 writeTo vs V1
    saveAsTable per `uses_v2_catalog` — same logical layout either way.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    spark = df.sparkSession
    if uses_v2_catalog(spark, table):
        w = df.writeTo(table)
        if partition_by:
            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            w.createOrReplace()
        elif not spark.catalog.tableExists(table):
            w.create()
        else:
            df.writeTo(table).append()
        return
    w1 = df.write.format("parquet").mode(mode)
    if partition_by:
        w1 = w1.partitionBy(*partition_by)
    w1.saveAsTable(table)


def materialize_graph(results: Mapping[str, DataFrame],
                      prefix: str = "kg",
                      mode: str = "overwrite") -> dict[str, str]:
    """Materialize the standard graph table set from an
    `extract_dataframe` result dict:

      <prefix>_triples   — assembled EER table, partitioned by `pred`
                           (downstream graph queries filter on predicate;
                           partition pruning makes that a file skip)
      <prefix>_entities  — canonical entity table (vocabulary-bounded;
                           unpartitioned — at its cardinality a partition
                           column would just make small files)

    Returns {logical name: table name} for the tables written.
    """
    out: dict[str, str] = {}
    tri = f"{prefix}_triples"
    materialize(results["triples"], tri, partition_by=("pred",), mode=mode)
    out["triples"] = tri
    ents = results.get("canonical_entities")
    if ents is not None:
        ent = f"{prefix}_entities"
        materialize(ents, ent, mode=mode)
        out["entities"] = ent
    return out


def graphml_lines(triples: DataFrame) -> DataFrame:
    """GraphML serialization of the materialized KG as ordered text
    lines — the hand-off to Gephi/Cytoscape/NetworkX (no reference
    counterpart: Reach's exporters stop at row formats; the graph-viz
    consumer of the DARPA pipeline sat outside the repo).

    Output: (section, sort_key, line) where `section` is 0=header,
    1=nodes, 2=edges, 3=footer and `sort_key` orders within a section —
    a consumer writes `orderBy(section, sort_key)` as text and gets a
    valid GraphML document. Emitting (section, sort_key) instead of a
    global line number keeps the build fully distributed (a dense global
    row_number would be a single-partition window; a write-time range
    sort is the standard distributed text-sink pattern).

    Every line is a pure column expression (XML-escaping as chained
    replace, & first); edges carry pred/seen/negated as <data> keys,
    negated classes included — an export carries the whole graph, the
    asserted-only view is the reader's filter."""
    from pyspark.sql import functions as F

    def esc(c):
        e = F.regexp_replace(c.cast("string"), "&", "&amp;")
        e = F.regexp_replace(e, "<", "&lt;")
        e = F.regexp_replace(e, ">", "&gt;")
        return F.regexp_replace(e, '"', "&quot;")

    hdr = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '<key id="pred" for="edge" attr.name="pred" attr.type="string"/>',
        '<key id="seen" for="edge" attr.name="seen" attr.type="long"/>',
        '<key id="negated" for="edge" attr.name="negated"'
        ' attr.type="boolean"/>',
        '<graph id="kg" edgedefault="directed">',
    ]
    spark = triples.sparkSession
    header = spark.createDataFrame(
        [(0, f"{i:02d}", ln) for i, ln in enumerate(hdr)],
        "section int, sort_key string, line string")
    footer = spark.createDataFrame(
        [(3, "00", "</graph>"), (3, "01", "</graphml>")],
        "section int, sort_key string, line string")
    t = triples.where(F.col("subj").isNotNull() & F.col("obj").isNotNull())
    nodes = (t.select(F.col("subj").alias("n"))
             .union(t.select(F.col("obj").alias("n")))
             .distinct()
             .select(F.lit(1).alias("section"),
                     F.col("n").alias("sort_key"),
                     F.concat(F.lit('<node id="'), esc(F.col("n")),
                              F.lit('"/>')).alias("line")))
    edges = t.select(
        F.lit(2).alias("section"),
        F.concat_ws("|", "subj", "pred", "obj",
                    F.col("negated").cast("string")).alias("sort_key"),
        F.concat(
            F.lit('<edge source="'), esc(F.col("subj")),
            F.lit('" target="'), esc(F.col("obj")),
            F.lit('"><data key="pred">'), esc(F.col("pred")),
            F.lit('</data><data key="seen">'),
            F.col("seen").cast("string"),
            F.lit('</data><data key="negated">'),
            F.col("negated").cast("string"),
            F.lit("</data></edge>")).alias("line"))
    return header.unionByName(nodes).unionByName(edges) \
        .unionByName(footer)
