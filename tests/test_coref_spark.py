"""Doc-level coref through the SPARK path (not the sentence harness):
multi-span documents where the anaphor and its antecedent live in
DIFFERENT sentences, resolved by the sieve cascade + Coref.resolve rewrite
(reach_spark.coref; reference darpa/DarpaLinks.scala + Coref.scala)."""

from pyspark.sql import Row, functions as F

from reach_spark.pipeline import extract_dataframe


def _doc(spark, doc_id, sentences):
    return spark.createDataFrame([Row(doc_id=doc_id, spans=[
        Row(kind="text", text=t, media_ref="", offset=i)
        for i, t in enumerate(sentences)])])


def test_cross_sentence_pronoun_theme(spark):
    """'It is phosphorylated.' with the antecedent in the PREVIOUS
    sentence: pronominalMatch links It→ASPP2 (leftmost of the nearest
    prior sentence, LinearSelector), resolve rewrites the theme, and the
    triple materializes (DarpaLinks.scala:171-260)."""
    docs = _doc(spark, "p1", ["ASPP2 binds Ras.", "It is phosphorylated."])
    res = extract_dataframe(spark, docs, with_coref=True)
    links = res["coref_links"].collect()
    assert any(r["sieve"] == "pronominalMatch" for r in links)
    occ = res["triple_occurrences"].collect()
    phos = [t for t in occ if t["pred"] == "Phosphorylation"]
    assert len(phos) == 1
    assert phos[0]["obj"].startswith("ASPP2::")


def test_cross_sentence_pronoun_unresolved_pruned(spark):
    """No antecedent anywhere → the generic-theme event is pruned
    (argsComplete, Coref.scala:92-100): no Phosphorylation triple."""
    docs = _doc(spark, "p2", ["It is phosphorylated."])
    res = extract_dataframe(spark, docs, with_coref=True)
    occ = res["triple_occurrences"].collect()
    assert not [t for t in occ if t["pred"] == "Phosphorylation"]


def test_simple_event_match_cross_sentence(spark):
    """'ASPP1 promotes this phosphorylation.' after 'MEK phosphorylates
    Ras.' → simpleEventMatch resolves the Generic_event to the prior
    Phosphorylation(Ras) and the regulation triple materializes
    (DarpaLinks.scala:364-420)."""
    docs = _doc(spark, "se1", ["MEK phosphorylates Ras.",
                               "ASPP1 promotes this phosphorylation."])
    res = extract_dataframe(spark, docs, with_coref=True)
    links = res["coref_links"].collect()
    assert any(r["sieve"] == "simpleEventMatch" for r in links)
    occ = res["triple_occurrences"].collect()
    regs = [t for t in occ
            if t["pred"] == "Positive_regulation->Phosphorylation"
            and t["subj"] and t["subj"].startswith("ASPP1::")]
    assert len(regs) == 1
    assert regs[0]["obj"].startswith("Ras::")
    assert regs[0]["obj"].endswith(".phos")


def test_mutant_protein_match_cross_sentence(spark):
    """'The mutant binds GTP.' after 'ASPP1 K341L is common.' →
    mutantProteinMatch resolves the generic mutant to ASPP1(K341L) and
    the binding materializes (DarpaLinks.scala:77-110)."""
    docs = _doc(spark, "m1", ["ASPP1 K341L is common.",
                              "The mutant binds GTP."])
    res = extract_dataframe(spark, docs, with_coref=True)
    links = res["coref_links"].collect()
    assert any(r["sieve"] == "mutantProteinMatch" for r in links)
    occ = res["triple_occurrences"].collect()
    binds = [t for t in occ if t["pred"] == "Binding"]
    assert len(binds) == 1
    texts = {binds[0]["subj"].split("::")[0], binds[0]["obj"].split("::")[0]}
    assert texts == {"ASPP1", "GTP"}


def test_mutant_anaphor_no_antecedent_pruned(spark):
    """'The mutant binds GTP.' with a mutant-less antecedent sentence →
    no binding (TestCoreference sent33b at doc level)."""
    docs = _doc(spark, "m2", ["ASPP1 is common.", "The mutant binds GTP."])
    res = extract_dataframe(spark, docs, with_coref=True)
    occ = res["triple_occurrences"].collect()
    assert not [t for t in occ if t["pred"] == "Binding"]


def test_plural_pronoun_expands(spark):
    """'They are ubiquitinated.' after 'MEK binds ASPP2.' → plural
    anaphor takes BOTH antecedents (combineArgs cross-product,
    Coref.scala:64-86) → one Ubiquitination per antecedent."""
    docs = _doc(spark, "pl1", ["MEK binds ASPP2.",
                               "They are ubiquitinated."])
    res = extract_dataframe(spark, docs, with_coref=True)
    occ = res["triple_occurrences"].collect()
    ubiq = sorted(t["obj"].split("::")[0] for t in occ
                  if t["pred"] == "Ubiquitination")
    assert ubiq == ["ASPP2", "MEK"]


def test_cross_sentence_pronoun_controller(spark):
    """'MEK is common. It phosphorylates Ras.' — the pronoun SUBJECT mints
    a generic controller that pronominalMatch resolves to MEK; the
    regulation triple materializes. Standalone 'It phosphorylates Ras.'
    (sent6 semantics) keeps the Phosphorylation and drops only the
    regulation."""
    docs = _doc(spark, "ctl1", ["MEK is common.", "It phosphorylates Ras."])
    res = extract_dataframe(spark, docs, with_coref=True)
    occ = res["triple_occurrences"].collect()
    regs = [t for t in occ
            if t["pred"] == "Positive_regulation->Phosphorylation"]
    assert len(regs) == 1 and regs[0]["subj"].startswith("MEK::")
    docs2 = _doc(spark, "ctl2", ["It phosphorylates Ras."])
    res2 = extract_dataframe(spark, docs2, with_coref=True)
    occ2 = res2["triple_occurrences"].collect()
    assert [t["pred"] for t in occ2] == ["Phosphorylation"]
    assert occ2[0]["obj"].startswith("Ras::")


def test_pronoun_skips_context_entities(spark):
    """PossibleController gating (DarpaLinks.scala:206-234 +
    taxonomy.yml:25-80): a context-type entity (Species/CellLine/...) is
    never a pronominal antecedent. With only 'human' (Species) preceding,
    'It' stays unresolved and the generic-theme event is pruned; with a
    GGP preceding, the same shape resolves."""
    docs = _doc(spark, "pc1",
                ["This was observed in human cells.",
                 "It is phosphorylated."])
    res = extract_dataframe(spark, docs, with_coref=True)
    occ = res["triple_occurrences"].collect()
    assert not [t for t in occ if t["pred"] == "Phosphorylation"], occ
    # positive control: identical structure, GGP antecedent resolves
    docs2 = _doc(spark, "pc2",
                 ["MEK is overexpressed in cells.",
                  "It is phosphorylated."])
    res2 = extract_dataframe(spark, docs2, with_coref=True)
    occ2 = res2["triple_occurrences"].collect()
    phos = [t for t in occ2 if t["pred"] == "Phosphorylation"]
    assert len(phos) == 1 and phos[0]["obj"].startswith("MEK::")


def test_np_anaphor_label_compatibility(spark):
    """nounPhraseMatch label gating (DarpaLinks.scala:309-327 label-subset
    analog): 'this protein' requires a MacroMolecule-class antecedent —
    a preceding Simple_chemical (GTP) does not qualify, a GGP does."""
    docs = _doc(spark, "np1",
                ["GTP was added to the culture.",
                 "This protein is phosphorylated."])
    res = extract_dataframe(spark, docs, with_coref=True)
    occ = res["triple_occurrences"].collect()
    assert not [t for t in occ if t["pred"] == "Phosphorylation"], occ
    docs2 = _doc(spark, "np2",
                 ["ASPP2 was added to the culture.",
                  "This protein is phosphorylated."])
    res2 = extract_dataframe(spark, docs2, with_coref=True)
    occ2 = res2["triple_occurrences"].collect()
    phos = [t for t in occ2 if t["pred"] == "Phosphorylation"]
    assert len(phos) == 1 and phos[0]["obj"].startswith("ASPP2::")


def test_coref_off_prunes_generics(spark):
    """with_coref=False: generic placeholders are pruned, never emitted
    as triples (the flagship configuration stays deterministic)."""
    docs = _doc(spark, "off1", ["ASPP2 binds Ras.", "It is phosphorylated."])
    res = extract_dataframe(spark, docs, with_coref=False)
    occ = res["triple_occurrences"].collect()
    assert not [t for t in occ if t["pred"] == "Phosphorylation"]
    assert not [t for t in occ if "Generic" in (t["subj"] or "") or
                "Generic" in t["obj"]]
