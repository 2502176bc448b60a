"""BioPAX Level 3 element exporter over the EER triples table.

Reference parity note: the reference checkout reserves the sink package
(`export/src/main/scala/org/clulab/reach/export/biopax/` — present but
EMPTY, no implementation shipped), so like `bel.py` this is a skeleton
built from the PUBLIC BioPAX Level 3 specification (the OWL model used
by Pathway Commons), matching the repo's other exporters' shape: pure
column expressions over the assembled triples — no Python in the plan,
one narrow projection per row, trivially scan-parallel at any scale.

Mapping (BioPAX L3 core classes):
  * simple modification events (Phosphorylation, Ubiquitination, …) →
    `BiochemicalReaction` (left = unmodified entity, right = modified
    entity; De-* events swap the direction).
  * Binding → `ComplexAssembly` (left = both participants, right = the
    complex).
  * Translocation / Secretion → `Transport`.
  * Transcription / IncreaseAmount / DecreaseAmount →
    `TemplateReaction` (the L3 class for expression-level changes).
  * wrapped `Reg->Inner` predicates and activations → a `Catalysis`
    (positive) or `Control` (negative) element whose `controller` is the
    subject and whose `controlled` is the inner reaction, with
    `controlType` SPECIFICATION 'ACTIVATION' / 'INHIBITION'; the De-*
    inner flips the sign exactly as the cascade's wrapper-sign
    composition does.
  * physical entities typed by namespace: `Protein` (default),
    `SmallMolecule` (chebi/pubchem), `Rna` (Transcription objects);
    entity references carry an identifiers.org `UnificationXref` URI —
    the public URI convention BioPAX exporters use.

BioPAX has no negation/hypothesis slots — both survive as columns so a
downstream OWL document writer can route them to `Evidence` comments,
plus `seen` as the evidence count (one `Evidence` per EER class).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# event label → BioPAX interaction class for the un-wrapped inner
_CHEM_NS = ("chebi", "pubchem")

_TEMPLATE = ("Transcription", "IncreaseAmount", "DecreaseAmount")
_TRANSPORT = ("Translocation", "Secretion")


def _nsid(col: Column) -> tuple[Column, Column]:
    """(ns, id) from 'TEXT::ns:id[.modsuffix]'."""
    nsid = F.substring_index(col, "::", -1)
    ns = F.substring_index(nsid, ":", 1)
    ident = F.substring_index(
        F.substring(nsid, F.length(ns) + F.lit(2), F.lit(2048)), ".", 1)
    return ns, ident


def _entity_uri(col: Column) -> Column:
    """identifiers.org URI for the entity's UnificationXref (the public
    convention: http://identifiers.org/<ns>/<id>)."""
    ns, ident = _nsid(col)
    return F.concat(F.lit("http://identifiers.org/"), ns, F.lit("/"),
                    ident)


def _entity_class(col: Column, is_template_obj: Column) -> Column:
    ns, _ = _nsid(col)
    return (F.when(ns.isin(*_CHEM_NS), "SmallMolecule")
            .when(is_template_obj, "Rna")
            .otherwise("Protein"))


def biopax_elements(triples: DataFrame) -> DataFrame:
    """EER triples (subj, pred, obj, negated, hypothesis, seen) → one row
    per triple with the BioPAX L3 element decomposition:

      (interaction_class, control_class, control_type,
       controller_uri, controller_class,
       left_uri, left_class, right_uri, right_class,
       negated, hypothesis, seen)

    `interaction_class` is the controlled reaction's class;
    `control_class`/`control_type`/`controller_*` are null for
    un-regulated events. One narrow projection — no shuffle, no UDF.
    """
    pred = F.col("pred")
    subj, obj = F.col("subj"), F.col("obj")

    is_wrapped = pred.contains("->")
    outer = F.when(is_wrapped, F.substring_index(pred, "->", 1)) \
        .otherwise(pred)
    inner = F.when(is_wrapped, F.substring_index(pred, "->", -1)) \
        .otherwise(pred)
    is_de = inner.startswith("De") & ~inner.isin("DecreaseAmount")

    is_activation = inner.isin("Positive_activation",
                               "Negative_activation")
    # an activation's "inner reaction" is the object's activity itself —
    # BioPAX models it as Control over a degenerate BiochemicalReaction
    inner_class = (
        F.when(inner == "Binding", "ComplexAssembly")
        .when(inner.isin(*_TRANSPORT), "Transport")
        .when(inner.isin(*_TEMPLATE), "TemplateReaction")
        .otherwise("BiochemicalReaction"))

    # ---- control element (regulations, activations) ---------------------
    neg_outer = outer.isin("Negative_regulation", "Negative_activation") \
        | (outer == "DecreaseAmount")
    inner_neg = is_de | (is_wrapped & (inner == "Negative_activation"))
    sign_flip = F.when(is_wrapped, neg_outer != inner_neg) \
        .otherwise(neg_outer | inner_neg)
    has_control = subj.isNotNull() & (is_wrapped | is_activation |
                                      outer.isin("Positive_regulation",
                                                 "Negative_regulation"))
    control_type = F.when(has_control,
                          F.when(sign_flip, "INHIBITION")
                          .otherwise("ACTIVATION"))
    # TemplateReactionRegulation controls TemplateReactions; Catalysis is
    # the positive-control subclass over conversions (BioPAX L3 §Control)
    control_class = F.when(
        has_control,
        F.when(inner_class == "TemplateReaction",
               "TemplateReactionRegulation")
        .when(sign_flip, "Control").otherwise("Catalysis"))

    is_template_obj = inner == "Transcription"
    obj_uri = _entity_uri(obj)
    obj_class = _entity_class(obj, is_template_obj)

    return (triples
            .select(inner_class.alias("interaction_class"),
                    control_class.alias("control_class"),
                    control_type.alias("control_type"),
                    F.when(has_control, _entity_uri(subj))
                     .alias("controller_uri"),
                    F.when(has_control,
                           _entity_class(subj, F.lit(False)))
                     .alias("controller_class"),
                    obj_uri.alias("left_uri"),
                    obj_class.alias("left_class"),
                    # right side: the modified / complexed / relocated
                    # form of the same entity (BioPAX conversions are
                    # left→right over entity STATES; the EER table's
                    # suffix convention carries the state change)
                    F.concat(obj_uri, F.lit("#"),
                             F.lower(F.when(is_de,
                                            F.lit("unmodified"))
                                     .when(inner == "Binding",
                                           F.lit("complex"))
                                     .otherwise(inner)))
                     .alias("right_uri"),
                    F.when(inner == "Binding", F.lit("Complex"))
                     .otherwise(obj_class).alias("right_class"),
                    "negated", "hypothesis", "seen"))


class Fragmenter:
    """Typed views over a BioPAX element table (reference
    fragmenter/Fragmenter.scala:14-76 — paxtools model accessors
    `interactions`/`conversions`/`controls`/per-class sets +
    `getEntityReferenceById` over UnificationXrefs), re-expressed as
    lazy filtered DataFrames over `biopax_elements` output instead of an
    in-memory OWL object graph. Each accessor is a predicate over the
    columnar element table — at corpus scale the "model" stays
    distributed and every per-class view is one pushed-down filter."""

    #: conversion subclasses (Fragmenter.scala:27-32)
    CONVERSION_CLASSES = ("BiochemicalReaction", "ComplexAssembly",
                          "Transport")
    #: control subclasses (:34-37)
    CONTROL_CLASSES = ("Catalysis", "Control",
                       "TemplateReactionRegulation")

    def __init__(self, elements: DataFrame):
        self.elements = elements

    # ---- interaction-level views (:21-25) -----------------------------
    @property
    def interactions(self) -> DataFrame:
        """Every interaction row: the reaction itself plus its control
        wrapper when present."""
        return self.elements

    @property
    def conversions(self) -> DataFrame:
        return self.elements.where(
            F.col("interaction_class").isin(*self.CONVERSION_CLASSES))

    @property
    def controls(self) -> DataFrame:
        return self.elements.where(F.col("control_class").isNotNull())

    def get_objects(self, cls: str) -> DataFrame:
        """getObjects[T] analog (:39-42): rows whose interaction OR
        control class equals `cls`."""
        return self.elements.where(
            (F.col("interaction_class") == cls) |
            (F.col("control_class") == cls))

    # ---- per-class shortcuts (:27-37) ---------------------------------
    @property
    def biochemical_reactions(self) -> DataFrame:
        return self.get_objects("BiochemicalReaction")

    @property
    def complex_assemblies(self) -> DataFrame:
        return self.get_objects("ComplexAssembly")

    @property
    def transports(self) -> DataFrame:
        return self.get_objects("Transport")

    @property
    def template_reactions(self) -> DataFrame:
        return self.get_objects("TemplateReaction")

    @property
    def catalysis(self) -> DataFrame:
        return self.get_objects("Catalysis")

    # ---- xrefs (:38,44-48) -------------------------------------------
    @property
    def unification_xrefs(self) -> DataFrame:
        """Distinct entity URIs across every participant slot with
        (db, id) parsed from the identifiers.org path — the
        UnificationXref set."""
        uris = None
        for c, cls in (("controller_uri", "controller_class"),
                       ("left_uri", "left_class"),
                       ("right_uri", "right_class")):
            part = (self.elements
                    .where(F.col(c).isNotNull())
                    .select(F.col(c).alias("uri"),
                            F.col(cls).alias("entity_class")))
            uris = part if uris is None else uris.unionByName(part)
        parsed = uris.distinct().select(
            "uri", "entity_class",
            F.element_at(F.split("uri", "/"), -2).alias("db"),
            F.element_at(F.split(F.element_at(F.split("uri", "/"), -1),
                                 "#"), 1).alias("xref_id"))
        return parsed

    def get_entity_reference_by_id(self, xref_id: str) -> DataFrame:
        """getEntityReferenceById (:44-48): xref id → the entity rows
        that unify on it."""
        return self.unification_xrefs.where(F.col("xref_id") == xref_id)

    def class_counts(self) -> DataFrame:
        """One row per (interaction_class, control_class) with count —
        the model census the reference builds its lazy sets for."""
        return (self.elements
                .groupBy("interaction_class", "control_class")
                .count())
