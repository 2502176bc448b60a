"""Table schemas (SURVEY.md §1). Everything is StructType/ArrayType over
string/int/boolean — the reference's extraction semantics use no other types
(SURVEY §1.5)."""

from __future__ import annotations

from pyspark.sql import types as T

# input: interleaved text + media documents (BASELINE.json input_hint)
SPAN = T.StructType([
    T.StructField("kind", T.StringType(), False),       # 'text' | 'media'
    T.StructField("text", T.StringType(), True),        # '' for media spans
    T.StructField("media_ref", T.StringType(), True),   # '' for text spans
    T.StructField("offset", T.IntegerType(), False),    # order within doc
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("spans", T.ArrayType(SPAN), False),
])

# one row per sentence after annotation (reference Sentence parallel arrays,
# ReachDocument.scala:5-31)
DEP = T.StructType([
    T.StructField("src", T.IntegerType(), False),
    T.StructField("dst", T.IntegerType(), False),
    T.StructField("label", T.StringType(), False),
])

SENTENCES = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("sent_idx", T.IntegerType(), False),
    T.StructField("sent_text", T.StringType(), False),
    T.StructField("words", T.ArrayType(T.StringType()), False),
    T.StructField("start_offsets", T.ArrayType(T.IntegerType()), False),
    T.StructField("end_offsets", T.ArrayType(T.IntegerType()), False),
    T.StructField("tags", T.ArrayType(T.StringType()), False),
    T.StructField("lemmas", T.ArrayType(T.StringType()), False),
    T.StructField("entities", T.ArrayType(T.StringType()), False),  # BIO
    T.StructField("deps", T.ArrayType(DEP), False),
])

ARG = T.StructType([
    T.StructField("role", T.StringType(), False),
    T.StructField("mention_id", T.StringType(), False),
    T.StructField("text", T.StringType(), False),
    # denormalized at extraction time (sentence-local, zero cost there) so
    # the triple builder never equi-joins the full mentions table to
    # itself: `canonical` keys the tiny grounding map; `target_label` is
    # the referenced mention's event/entity label (for the pred arrow and
    # PTM suffix). mention_id stays for lineage/queryability.
    T.StructField("canonical", T.StringType(), True),
    T.StructField("target_label", T.StringType(), True),
])

MOD = T.StructType([
    T.StructField("kind", T.StringType(), False),   # PTM|Mutant|EventSite|Negation|Hypothesis|KDtrigger|...
    T.StructField("label", T.StringType(), True),
    T.StructField("evidence_text", T.StringType(), True),
    T.StructField("site_text", T.StringType(), True),
    T.StructField("negated", T.BooleanType(), False),
])

# flat mention rows; event-arg recursion via mention_id adjacency
# (SURVEY §1.2 Spark mapping)
MENTIONS = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("sent_idx", T.IntegerType(), False),
    T.StructField("mention_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),    # tbm | event | relation
    T.StructField("label", T.StringType(), False),
    T.StructField("labels", T.ArrayType(T.StringType()), False),
    T.StructField("start", T.IntegerType(), False),  # token interval
    T.StructField("end", T.IntegerType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("trigger_start", T.IntegerType(), True),
    T.StructField("trigger_end", T.IntegerType(), True),
    T.StructField("trigger_text", T.StringType(), True),
    T.StructField("args", T.ArrayType(ARG), False),
    T.StructField("mods", T.ArrayType(MOD), False),
    T.StructField("is_direct", T.BooleanType(), False),
    T.StructField("found_by", T.StringType(), False),
    T.StructField("keep", T.BooleanType(), False),
    # dictionary canonical key for entity mentions (grounding join key)
    T.StructField("canonical", T.StringType(), True),
    # sentence-local truth: this event is the controlled arg of some
    # regulation (lets the triple builder skip a corpus-wide anti-join)
    T.StructField("is_controlled", T.BooleanType(), False),
])

# the append-safe triple LOG: one row per event occurrence
TRIPLE_OCCURRENCES = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("sent_idx", T.IntegerType(), False),
    T.StructField("event_id", T.StringType(), False),
    T.StructField("subj", T.StringType(), True),      # CONTROLLER text::ns:id
    T.StructField("pred", T.StringType(), False),     # EVENT LABEL
    T.StructField("obj", T.StringType(), False),      # INPUT/OUTPUT text::ns:id
    T.StructField("negated", T.BooleanType(), False),
    T.StructField("hypothesis", T.BooleanType(), False),
    T.StructField("is_direct", T.BooleanType(), False),
    T.StructField("trigger", T.StringType(), True),
    T.StructField("found_by", T.StringType(), False),
    T.StructField("context_species", T.ArrayType(T.StringType()), True),
])

# the deduped EER table (assemble_triples): one row per equivalence class
TRIPLES = T.StructType([
    T.StructField("subj", T.StringType(), True),
    T.StructField("pred", T.StringType(), False),
    T.StructField("obj", T.StringType(), False),
    T.StructField("negated", T.BooleanType(), False),
    T.StructField("hypothesis", T.BooleanType(), False),
    T.StructField("is_direct", T.BooleanType(), False),
    T.StructField("trigger", T.StringType(), True),
    T.StructField("found_by", T.StringType(), False),
    T.StructField("seen", T.LongType(), False),
    T.StructField("seen_in", T.ArrayType(T.StringType()), False),
])
