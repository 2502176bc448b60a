"""reach_spark — a from-scratch PySpark-native knowledge-graph construction
engine with the extraction semantics of clulab/reach (reference studied at
/root/reference, cited by file:line in docstrings; no code copied).

Architecture (Spark-first, see SURVEY.md §7):
  documents (interleaved text+media spans)            -- input table
    -> sentences (explode + Arrow-batched annotate)   -- reach_spark.annotate
    -> entity mentions (broadcast-dict NER + entity grammar, mapInPandas)
    -> grounding (key-transform expansion + broadcast hash join + rank-1)
    -> event mentions (sentence-local rule cascade, mapInPandas)
    -> filters (groupBy/argmax completeness, negation parity)
    -> context (Window.rangeBetween(-3, +3))
    -> coref (doc-local sieve, applyInPandas)
    -> canonical entities (connected components over alias edges)
    -> triples (subj, pred, obj, ...) partitioned write
"""

__version__ = "0.1.0"
