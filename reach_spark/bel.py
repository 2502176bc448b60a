"""BEL (Biological Expression Language 1.0) statement exporter over the
EER triples table.

Reference parity note: the reference checkout reserves the sink package
(`export/src/main/scala/org/clulab/reach/export/bel/` — present but
EMPTY, no implementation shipped), so this is a skeleton built from the
public OpenBEL 1.0 language spec, matching the repo's other exporters'
shape (fries.py): pure column expressions over the assembled triples —
no Python in the plan, one projection per row, trivially scan-parallel
at any scale.

Mapping (OpenBEL 1.0):
  * entity term: `p(NS:ID)` for protein-ish namespaces, `a(NS:ID)` for
    chemical ones (chebi/pubchem), `r(NS:ID)` for Transcription objects.
    The triple's `TEXT::ns:id` string supplies NS:ID; PTM/mutant suffixes
    the triple formatter appends after the id (`P31749.acet`) are
    stripped — BEL carries the modification on the STATEMENT (pmod), not
    the identifier.
  * simple modification events → `<subj term> directlyIncreases
    p(OBJ, pmod(X))` with the BEL 1.0 pmod one-letter codes; De-* events
    flip to directlyDecreases of the same modified form. Subject-less
    events degrade to a bare term statement (BEL has no agentless
    relation).
  * Positive/Negative_activation → directlyIncreases/Decreases
    `act(<obj term>)`; bare regulations → increases/decreases (indirect).
  * `Reg->Inner` wrapped predicates → increases/decreases of the INNER
    object term, with the De-* inner flipping the sign (the same
    wrapper-sign composition as the cascade).
  * Binding → the BEL complex term statement `complex(A, B)` (operands
    in lexical order, the spec's canonical form).
  * Translocation/Secretion → `tloc(...)` / `sec(...)`; Amount /
    DecreaseAmount → abundance term statements (with increases/decreases
    when a controller exists).

BEL cannot express negation or hypothesis — both survive as columns
(`negated`, `hypothesis`) so a downstream BEL document writer can route
them to annotations, plus `seen` as the evidence count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# BEL 1.0 protein-modification one-letter codes
_PMOD = {
    "Phosphorylation": "P", "Acetylation": "A", "Farnesylation": "F",
    "Glycosylation": "G", "Hydroxylation": "H", "Methylation": "M",
    "Ribosylation": "R", "Sumoylation": "S", "Ubiquitination": "U",
}

_NS_KEYWORD = {
    "uniprot": "UP", "chebi": "CHEBI", "go": "GOBP", "pubchem": "PUBCHEM",
    "interpro": "INTERPRO", "pfam": "PFAM", "mesh": "MESH", "uaz": "UAZ",
}

_CHEM_NS = ("chebi", "pubchem")


def _ns(col: Column) -> Column:
    return F.substring_index(F.substring_index(col, "::", -1), ":", 1)


def _entity_parts(col: Column) -> tuple[Column, Column]:
    """(ns_keyword, id) from 'TEXT::ns:id[.modsuffix]'."""
    nsid = F.substring_index(col, "::", -1)
    ns = F.substring_index(nsid, ":", 1)
    ident = F.substring_index(
        F.substring(nsid, F.length(ns) + F.lit(2), F.lit(2048)), ".", 1)
    kw = ns
    for k, v in _NS_KEYWORD.items():
        kw = F.when(ns == k, v).otherwise(kw)
    return F.upper(kw), ident


def _term(col: Column, fn: Column | None = None) -> Column:
    """BEL abundance term for an entity string: p()/a() by namespace, or
    the explicit function name in `fn` (e.g. 'r' for transcription)."""
    ns_raw = _ns(col)
    kw, ident = _entity_parts(col)
    f_default = F.when(ns_raw.isin(*_CHEM_NS), F.lit("a")) \
        .otherwise(F.lit("p"))
    f_name = fn if fn is not None else f_default
    return F.concat(f_name, F.lit("("), kw, F.lit(":"), ident, F.lit(")"))


def _pmod_term(obj: Column, code: Column) -> Column:
    kw, ident = _entity_parts(obj)
    return F.concat(F.lit("p("), kw, F.lit(":"), ident,
                    F.lit(", pmod("), code, F.lit("))"))


def bel_statements(triples: DataFrame) -> DataFrame:
    """EER triples (subj, pred, obj, negated, hypothesis, seen) →
    (statement, relation, negated, hypothesis, seen). One narrow
    projection — no shuffle, no UDF."""
    pred = F.col("pred")
    subj, obj = F.col("subj"), F.col("obj")

    is_wrapped = pred.contains("->")
    outer = F.when(is_wrapped, F.substring_index(pred, "->", 1)) \
        .otherwise(pred)
    inner = F.when(is_wrapped, F.substring_index(pred, "->", -1)) \
        .otherwise(pred)
    is_de = inner.startswith("De") & ~inner.isin("DecreaseAmount")

    # pmod code for (de-)modification inners
    code = F.lit(None).cast("string")
    for name, c in _PMOD.items():
        code = F.when((inner == name) | (inner == "De" + name.lower()) |
                      (inner == "De" + name[0].lower() + name[1:]),
                      F.lit(c)).otherwise(code)

    # ---- object-side BEL term ------------------------------------------
    obj_term = F.when(code.isNotNull(), _pmod_term(obj, code)) \
        .when(inner == "Transcription", _term(obj, F.lit("r"))) \
        .when(inner.isin("Positive_activation", "Negative_activation") &
              is_wrapped, F.concat(F.lit("act("), _term(obj), F.lit(")"))) \
        .when(inner.isin("Translocation"),
              F.concat(F.lit("tloc("), _term(obj), F.lit(")"))) \
        .when(inner == "Secretion",
              F.concat(F.lit("sec("), _term(obj), F.lit(")"))) \
        .when(inner == "Binding",
              F.concat(F.lit("complex("), _term(obj), F.lit(")"))) \
        .otherwise(_term(obj))

    # ---- relation -------------------------------------------------------
    # direct for unwrapped modification/activation statements, indirect
    # (increases/decreases) for regulations; De-* inner flips the sign.
    neg_outer = outer.isin("Negative_regulation", "Negative_activation") \
        | (outer == "DecreaseAmount")
    inner_neg = is_de | (is_wrapped & (inner == "Negative_activation"))
    # wrapper-sign composition (same rule as the cascade): the statement
    # decreases the base form iff exactly one of (outer, inner) is negative
    sign_flip = F.when(is_wrapped, neg_outer != inner_neg) \
        .otherwise(neg_outer | inner_neg)
    direct = ~is_wrapped & (code.isNotNull() | (inner == "Transcription") |
                            inner.isin("Positive_activation",
                                       "Negative_activation"))
    act_obj = (~is_wrapped &
               inner.isin("Positive_activation", "Negative_activation"))
    relation = F.when(sign_flip,
                      F.when(direct, "directlyDecreases")
                      .otherwise("decreases")) \
        .otherwise(F.when(direct, "directlyIncreases")
                   .otherwise("increases"))

    # unwrapped activation objects wrap in act(...)
    obj_term = F.when(act_obj,
                      F.concat(F.lit("act("), _term(obj), F.lit(")"))) \
        .otherwise(obj_term)

    subj_term = _term(subj)

    # ---- statement ------------------------------------------------------
    # Binding (unwrapped) is the BEL complex TERM statement with operands
    # in lexical order; everything else is subject relation object, or a
    # bare object term when there is no subject.
    both = subj.isNotNull() & obj.isNotNull()
    complex_stmt = F.concat(
        F.lit("complex("),
        F.least(subj_term, _term(obj)), F.lit(", "),
        F.greatest(subj_term, _term(obj)), F.lit(")"))
    statement = F.when((pred == "Binding") & both, complex_stmt) \
        .when(subj.isNotNull(),
              F.concat(subj_term, F.lit(" "), relation, F.lit(" "),
                       obj_term)) \
        .otherwise(obj_term)

    return (triples
            .select(statement.alias("statement"),
                    F.when(subj.isNotNull() & (pred != "Binding"),
                           relation).alias("relation"),
                    "negated", "hypothesis", "seen"))
