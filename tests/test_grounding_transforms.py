"""G2 key-transform unit tests ported from the reference
TestKBKeyTransforms.scala (grounding/ReachKBKeyTransforms.scala semantics).
No Spark needed — the transforms are pure functions mirrored by the
column expressions in reach_spark.grounding._candidate_keys.
"""

import pytest

from reach_spark.resources import canonical_key


# canonicalKey cases, TestKBKeyTransforms.scala:18-37
@pytest.mark.parametrize("text,expected", [
    ("identical", "identical"),
    ("A-B and/or C", "abandorc"),
    ("MAN_human", "man_human"),
    ("WO-MAN", "woman"),
    ("K-Ras", "kras"),
    ("MCF-7", "mcf7"),
])
def test_canonical_key(text, expected):
    assert canonical_key(text) == expected


def test_canonical_key_non_identical():
    # "a non-identical" must change (space/hyphen stripped),
    # TestKBKeyTransforms.scala:23-25
    assert canonical_key("a non-identical") != "a non-identical"


def test_canonical_groups_unify():
    # the TestGrounding.scala:12 contract relies on alias unification
    assert canonical_key("K-Ras") == canonical_key("KRas")
    assert canonical_key("MCF-7") == canonical_key("MCF7")


def test_ras_isoform_accessions_distinct():
    """ggp7 contract (reference TestOverrides.scala:40-41): the three Ras
    isoforms ground to distinct authoritative UniProt accessions; generic
    'Ras' must NOT share any of them."""
    from reach_spark.resources import kb_rows
    uni = {key: kid for (label, key, ns, kid, *_rest) in kb_rows()
           if ns == "uniprot"}
    assert uni["kras"] == "P01116"
    assert uni["hras"] == "P01112"
    assert uni["nras"] == "P01111"
    assert uni["ras"] not in {"P01116", "P01112", "P01111"}
