"""Golden fixture corpus ported from the reference regression tests.

Each case: (case_id, sentence, expected) where expected is a list of event
expectations in the reference TestUtils helper vocabulary
(main/src/test/scala/org/clulab/reach/TestUtils.scala:119-257):
  ("event", label, [arg_texts...])            hasEventWithArguments
  ("!event", label, [arg_texts...])           must NOT be present
  ("posreg", controller, controlled_label, [arg_texts...])
  ("negreg", controller, controlled_label, [arg_texts...])
  ("!posreg"/"!negreg", ...)
  ("posact", controller, controlled)          hasPositiveActivation
  ("negact", controller, controlled)
  ("!posact"/"!negact", ...)
  ("count", label, n)                         exact count of label
  ("entity", text)                            hasEntity
  ("negated", label)                          event carries a Negation mod
  ("hypothesis", label)                       event carries a Hypothesis mod
  ("grounded_same", text1, text2)             two mentions share grounding id
  ("grounded", text)                          mention has non-failsafe grounding

Sentences quoted verbatim from the reference test files (file:line in each
case id comment). These drive pytest parametrization AND the deterministic
synthetic `documents` generator (FIXTURES.md §1 synthesis recipe).
"""

from __future__ import annotations

# (id, source file:line, sentence, [expectations])
CASES: list[tuple[str, str, str, list[tuple]]] = [
    # ------------- TestRegulationEvents.scala -------------
    ("reg1", "TestRegulationEvents.scala:13",
     "Phosphorylation of ASPP2 by MAPK is required for RAS induced increased "
     "binding to p53 and increased transactivation of pro-apoptotic genes.",
     [("event", "Phosphorylation", ["ASPP2"]),
      ("posreg", "MAPK", "Phosphorylation", ["ASPP2"])]),
    ("reg2", "TestRegulationEvents.scala:24",
     "The ubiquitinated Ras protein phosphorylates AKT.",
     [("event", "Phosphorylation", ["AKT"]),
      ("posreg", "Ras", "Phosphorylation", ["AKT"])]),
    ("reg3", "TestRegulationEvents.scala:37",
     "Interestingly, we observed two conserved putative MAPK phosphorylation "
     "sites in ASPP1 and ASPP2",
     [("entity", "MAPK"), ("entity", "ASPP1"), ("entity", "ASPP2"),
      ("event", "Phosphorylation", ["ASPP1"]),
      ("event", "Phosphorylation", ["ASPP2"]),
      ("posreg", "MAPK", "Phosphorylation", ["ASPP1"]),
      ("posreg", "MAPK", "Phosphorylation", ["ASPP2"])]),
    ("reg4", "TestRegulationEvents.scala:51",
     "We thus tested whether RAS activation may regulate ASPP2 phosphorylation",
     [("event", "Phosphorylation", ["ASPP2"]),
      ("!posreg", "RAS", "Phosphorylation", ["ASPP2"])]),
    ("reg5", "TestRegulationEvents.scala:59",
     "MAPK1 was clearly able to phosphorylate the ASPP2 fragment in vitro",
     [("event", "Phosphorylation", ["ASPP2"]),
      ("posreg", "MAPK1", "Phosphorylation", ["ASPP2"])]),
    ("reg6", "TestRegulationEvents.scala:66",
     "Under the same conditions, ASPP2 (693-1128) fragment phosphorylated by "
     "AKT1 had very low levels of incorporated 32P",
     [("event", "Phosphorylation", ["ASPP2"]),
      ("posreg", "AKT1", "Phosphorylation", ["ASPP2"])]),
    ("reg8", "TestRegulationEvents.scala:79",
     "Hence ASPP2 can be phosphorylated at serine 827 by MAPK1 in vitro.",
     [("event", "Phosphorylation", ["ASPP2"]),
      ("posreg", "MAPK1", "Phosphorylation", ["ASPP2"])]),
    ("reg10", "TestRegulationEvents.scala:86",
     "ASPP1 fails to upregulate the phosphorylation of ASPP2.",
     [("event", "Phosphorylation", ["ASPP2"]),
      ("posreg", "ASPP1", "Phosphorylation", ["ASPP2"]),
      ("negated", "Positive_regulation")]),
    ("reg11", "TestRegulationEvents.scala:94",
     "ASPP1 fails to downregulate the phosphorylation of ASPP2.",
     [("event", "Phosphorylation", ["ASPP2"]),
      ("negreg", "ASPP1", "Phosphorylation", ["ASPP2"])]),
    ("reg12", "TestRegulationEvents.scala:102",
     "ASPP1 downregulates the phosphorylation of ASPP2.",
     [("event", "Phosphorylation", ["ASPP2"]),
      ("negreg", "ASPP1", "Phosphorylation", ["ASPP2"])]),
    ("reg13", "TestRegulationEvents.scala:110",
     "The inhibition of ASPP1 increases the phosphorylation of ASPP2.",
     [("negreg", "ASPP1", "Phosphorylation", ["ASPP2"]),
      ("!posreg", "ASPP1", "Phosphorylation", ["ASPP2"])]),
    ("reg14", "TestRegulationEvents.scala:118",
     "the phosphorylation of ASPP2 is increased by the inhibition of ASPP1.",
     [("negreg", "ASPP1", "Phosphorylation", ["ASPP2"]),
      ("!posreg", "ASPP1", "Phosphorylation", ["ASPP2"])]),

    ("reg15", "TestRegulationEvents.scala:125",
     "We observed increased ERBB3 binding to PI3K following MEK inhibition "
     "(Figure 1D).",
     [("negreg", "MEK", "Binding", ["ERBB3", "PI3K"]),
      ("count", "Negative_activation", 0),
      ("count", "Positive_activation", 0)]),
    ("reg16", "TestRegulationEvents.scala:134",
     "the inhibition of ASPP1 decreases ASPP2 phosphorylation.",
     [("posreg", "ASPP1", "Phosphorylation", ["ASPP2"]),
      ("!negreg", "ASPP1", "Phosphorylation", ["ASPP2"]),
      ("count", "Positive_activation", 0),
      ("count", "Negative_activation", 0)]),
    ("reg17", "TestRegulationEvents.scala:142",
     "ASPP1 is an activator of the ubiquitination of ASPP2",
     [("posreg", "ASPP1", "Ubiquitination", ["ASPP2"]),
      ("!negreg", "ASPP1", "Ubiquitination", ["ASPP2"]),
      ("count", "Positive_activation", 0),
      ("count", "Negative_activation", 0)]),
    ("reg18", "TestRegulationEvents.scala:150",
     "ASPP1 is an inhibitor of the ubiquitination of ASPP2",
     [("negreg", "ASPP1", "Ubiquitination", ["ASPP2"]),
      ("!posreg", "ASPP1", "Ubiquitination", ["ASPP2"]),
      ("count", "Positive_activation", 0),
      ("count", "Negative_activation", 0)]),
    ("reg19", "TestRegulationEvents.scala:158",
     "The phosphorylation of ASPP1 inhibits the ubiquitination of ASPP2",
     [("negreg", "ASPP1", "Ubiquitination", ["ASPP2"]),
      ("event", "Ubiquitination", ["ASPP2"])]),
    ("reg21", "TestRegulationEvents.scala:191",
     "Human deoxycytidine kinase is phosphorylated by ASPP2 on serine 128.",
     [("count", "Positive_regulation", 1),
      ("event", "Phosphorylation", ["deoxycytidine kinase"]),
      ("posreg", "ASPP2", "Phosphorylation", ["deoxycytidine kinase"])]),

    # ------------- TestActivationEvents.scala -------------
    ("act1", "TestActivationEvents.scala:13",
     "Nucleotide free Ras inhibits PI3KC2Beta activity.",
     [("count", "Negative_activation", 1)]),
    ("act1b", "TestActivationEvents.scala:14",
     "Nucleotide free Ras inhibits PI3KC2Beta.",
     [("count", "Negative_activation", 1)]),
    ("act1c", "TestActivationEvents.scala:15",
     "Nucleotide free Ras inhibits activation of PI3KC2Beta.",
     [("count", "Negative_activation", 1)]),
    ("act1d", "TestActivationEvents.scala:16",
     "Addition of Ras inhibits PI3KC2Beta.",
     [("count", "Negative_activation", 1)]),
    ("act1e", "TestActivationEvents.scala:17",
     "Increase of Ras dose inhibits PI3KC2Beta.",
     [("count", "Negative_activation", 1)]),
    ("act2", "TestActivationEvents.scala:36",
     "Ubiquitinated Ras activates Raf and PI3K.",
     [("count", "Positive_activation", 2),
      ("posact", "Ras", "Raf"), ("posact", "Ras", "PI3K")]),
    ("act3", "TestActivationEvents.scala:46",
     "the phosphorylation of Ras promotes the ubiquitination of MEK",
     [("count", "Positive_activation", 0),
      ("count", "Positive_regulation", 1)]),
    ("act5", "TestActivationEvents.scala:53",
     "the suppression of ASPP1 decreases ASPP2.",
     [("posact", "ASPP1", "ASPP2"), ("!negact", "ASPP1", "ASPP2"),
      ("count", "Positive_regulation", 0),
      ("count", "Negative_regulation", 0)]),
    ("act6", "TestActivationEvents.scala:62",
     "ASPP1 is an activator of ASPP2",
     [("posact", "ASPP1", "ASPP2"), ("!negact", "ASPP1", "ASPP2"),
      ("count", "Positive_regulation", 0),
      ("count", "Negative_regulation", 0)]),
    ("act7", "TestActivationEvents.scala:70",
     "ASPP1 is an inhibitor of ASPP2",
     [("negact", "ASPP1", "ASPP2"), ("!posact", "ASPP1", "ASPP2"),
      ("count", "Positive_regulation", 0),
      ("count", "Negative_regulation", 0)]),
    ("act8", "TestActivationEvents.scala:78",
     "The ASPP2-binding activity of CREB is, in most cases, constitutive.",
     [("event", "Binding", ["ASPP2", "CREB"]),
      ("count", "Positive_activation", 0),
      ("count", "Negative_activation", 0),
      ("count", "Positive_regulation", 0),
      ("count", "Negative_regulation", 0)]),

    # ------------- TestTemplaticSimpleEvents.scala -------------
    ("se1", "TestTemplaticSimpleEvents.scala:12",
     "The phosphorylation on AKT was great.",
     [("!event", "Phosphorylation", ["AKT"])]),
    ("se2", "TestTemplaticSimpleEvents.scala:19",
     "JAK3 phosphorylates three HuR residues (Y63, Y68, Y200)",
     [("count", "Phosphorylation", 3),
      ("count", "Positive_regulation", 3)]),
    ("se3", "TestTemplaticSimpleEvents.scala:30",
     "The deubiquitination of ASPP2 is promoted by optineurin.",
     [("event", "Deubiquitination", ["ASPP2"]),
      ("!event", "Ubiquitination", ["ASPP2"])]),
    ("se4", "TestTemplaticSimpleEvents.scala:38",
     "The dephosphorylation of ASPP2 is promotted by optineurin.",
     [("event", "Dephosphorylation", ["ASPP2"]),
      ("!event", "Phosphorylation", ["ASPP2"])]),
    ("se5", "TestTemplaticSimpleEvents.scala:44",
     "In contrast, the EGFR T669A mutant increased both basal EGFR and ERBB3 "
     "tyrosine phosphorylation that was not augmented by MEK inhibition",
     [("event", "Phosphorylation", ["EGFR"]),
      ("event", "Phosphorylation", ["ERBB3"]),
      ("count", "Phosphorylation", 2)]),
    ("se7", "TestTemplaticSimpleEvents.scala (ubiq)",
     "MEK ubiquitinates Ras.",
     [("event", "Ubiquitination", ["Ras"]),
      ("posreg", "MEK", "Ubiquitination", ["Ras"])]),
    ("se8", "synthetic passive site",
     "AKT1 is acetylated at lysine 163.",
     [("event", "Acetylation", ["AKT1"])]),
    ("se9", "synthetic nominal",
     "The methylation of p53 by PKC is rapid.",
     [("event", "Methylation", ["p53"]),
      ("posreg", "PKC", "Methylation", ["p53"])]),
    ("se10", "TestTemplaticSimpleDeEvents-style",
     "Optineurin dephosphorylates ASPP2.",
     [("event", "Dephosphorylation", ["ASPP2"]),
      ("!event", "Phosphorylation", ["ASPP2"])]),

    # ------------- auto events (TestTemplaticAutoEvents-style) -------------
    ("auto1", "TestTemplaticAutoEvents-style",
     "EGFR autophosphorylates upon ligand binding.",
     [("event", "Phosphorylation", ["EGFR"]),
      ("posreg", "EGFR", "Phosphorylation", ["EGFR"])]),

    # ------------- TestBindingEvents.scala-style -------------
    ("bind1", "TestBindingEvents-style verbal",
     "MEK binds to Ras.",
     [("event", "Binding", ["MEK", "Ras"])]),
    ("bind2", "TestBindingEvents-style nominal",
     "The interaction between p53 and Mdm2 is disrupted.",
     [("event", "Binding", ["p53", "Mdm2"])]),
    ("bind3", "TestBindingEvents-style",
     "Grb2 associates with Sos and SHC.",
     [("event", "Binding", ["Grb2", "Sos"]),
      ("event", "Binding", ["Grb2", "SHC"])]),
    ("bind4", "ubiquitin guard (DarpaActions.scala:153-162)",
     "Ras binds to ubiquitin.",
     [("!event", "Binding", ["Ras", "ubiquitin"])]),
    ("bind5", "TestBindingEvents.scala:18 sent1",
     "The ubiquitinated Ras binds AKT and ASPP2.",
     [("count", "Binding", 2),
      ("event", "Binding", ["Ras", "AKT"]),
      ("event", "Binding", ["Ras", "ASPP2"])]),
    ("bind6", "TestBindingEvents.scala:35 sent2",
     "The ubiquitinated Ras protein binds AKT.",
     [("count", "Binding", 1),
      ("event", "Binding", ["Ras", "AKT"])]),
    ("bind7", "TestBindingEvents.scala sent3 (same-entity guard)",
     "AKT binds AKT.",
     [("count", "Binding", 0)]),
    ("bind8", "TestBindingEvents.scala sent5",
     "Raf and PI3K bind to ubiquitinated Ras.",
     [("event", "Binding", ["Raf", "Ras"]),
      ("event", "Binding", ["PI3K", "Ras"])]),
    ("bind9", "TestBindingEvents.scala sent18",
     "Nucleotide free Ras binds to MEK",
     [("event", "Binding", ["Ras", "MEK"])]),
    ("bind10", "TestBindingEvents.scala sent19",
     "The dimerization of cRaf with BRaf helps something.",
     [("event", "Binding", ["cRaf", "BRaf"])]),
    ("bind11", "TestBindingEvents.scala sent10 (hyphen pair)",
     "Moreover, the RAS-ASPP interaction enhances the transcription "
     "function of p53 in cancer cells.",
     [("event", "Binding", ["RAS", "ASPP"])]),

    # ------------- TestHyphenedEvents.scala + TestTranslocationEvents ----
    ("hyph1", "TestHyphenedEvents.scala:9",
     "The KRas-inducing TFs (TWIST1, SNAIL1, SLUG, ZEB1, and FOXC2) in the "
     "CD45 - cells were determined using qRT-PCR.",
     [("posact", "TWIST1", "KRas"), ("posact", "SNAIL1", "KRas"),
      ("posact", "SLUG", "KRas"), ("posact", "ZEB1", "KRas"),
      ("posact", "FOXC2", "KRas")]),
    ("tl2", "TestTranslocationEvents.scala:28 sent2",
     "ASPP2 is transported from the membrane to the nucleus and cytosol",
     [("event", "Translocation", ["ASPP2", "membrane", "cytosol"]),
      ("event", "Translocation", ["ASPP2", "membrane", "nucleus"])]),

    # ------------- TestGrounding.scala -------------
    ("gr1", "TestGrounding.scala:12",
     "p65 and NF-kappaB p65 are the same entity.",
     [("grounded_same", "p65", "p65")]),
    ("gr3", "TestGrounding.scala:38",
     "MEK phosphorylates Ras.",
     [("grounded", "MEK"), ("grounded", "Ras"),
      ("event", "Phosphorylation", ["Ras"]),
      ("posreg", "MEK", "Phosphorylation", ["Ras"])]),

    # ------------- TestModifications.scala-style -------------
    ("mod1", "TestModifications-style PTM",
     "The ubiquitinated Ras protein phosphorylates AKT.",
     [("entity", "Ras"), ("entity", "AKT")]),
    ("mod2", "mutant (TestModifications / se5 pattern)",
     "The EGFR T669A mutant phosphorylates ERBB3.",
     [("event", "Phosphorylation", ["ERBB3"]),
      ("posreg", "EGFR", "Phosphorylation", ["ERBB3"])]),

    # ------------- negation / hypothesis handlers -------------
    # negation transfers from the simple event to the created regulation
    # (splitSimpleEvents, DarpaActions.scala:334-368)
    ("neg1", "NegationTests-style",
     "MEK does not phosphorylate Ras.",
     [("event", "Phosphorylation", ["Ras"]),
      ("negated", "Positive_regulation")]),
    ("hyp1", "HypothesisTests-style",
     "We hypothesized that MEK phosphorylates Ras.",
     [("event", "Phosphorylation", ["Ras"]),
      ("hypothesis", "Phosphorylation")]),

    # ------------- transcription / amount / translocation -------------
    ("tx1", "TestTranscriptionEvents-style",
     "p53 is transcribed in HeLa cells.",
     [("event", "Transcription", ["p53"])]),
    ("tl1", "TestTranslocationEvents-style",
     "ERK translocates to the nucleus.",
     [("event", "Translocation", ["ERK"])]),
    ("am1", "TestAmountEvents-style",
     "We observed increased levels of p53.",
     [("event", "IncreaseAmount", ["p53"])]),
]


def fixture_sentences() -> list[str]:
    return [c[2] for c in CASES]
