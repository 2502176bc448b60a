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

    ("se11", "TestTemplaticSimpleEvents.scala:82 sent8",
     "We next considered the effect of Ras monoubiquitination on "
     "GAP-mediated hydrolysis",
     [("event", "Ubiquitination", ["Ras"])]),
    ("se12", "TestTemplaticSimpleEvents.scala:88 sent9",
     "The effects of monoubiquitination on Ras are not isoform-specific.",
     [("event", "Ubiquitination", ["Ras"])]),
    ("se13", "TestTemplaticSimpleEvents.scala:111 sent13",
     "Indicating that p38 SAPK is not an efficient kinase for ASPP2 "
     "phosphorylation.",
     [("event", "Phosphorylation", ["ASPP2"])]),
    ("se14a", "TestTemplaticSimpleEvents.scala:117 sent14a",
     "Experiments revealed ubiquitination at Lys residues 104 and 147 of "
     "K-Ras",
     [("count", "Ubiquitination", 2)]),
    ("se14b", "TestTemplaticSimpleEvents.scala:123 sent14b",
     "Experiments revealed ubiquitination at Lys residues 117, 147, and "
     "170 for H-Ras.",
     [("count", "Ubiquitination", 3)]),
    ("hyd1", "TestTemplaticSimpleEvents testHydrolysisPass1",
     "Ras-GDP is hydrolyzed by 26S proteasome without ubiquitination.",
     [("event", "Hydrolysis", ["Ras-GDP"])]),
    ("hyd2", "TestTemplaticSimpleEvents testHydrolysisSubjNom1",
     "MEK hydrolysis of Ras-GDP increased.",
     [("event", "Hydrolysis", ["Ras-GDP"]),
      ("posreg", "MEK", "Hydrolysis", ["Ras-GDP"])]),
    ("hyd3", "TestTemplaticSimpleEvents testHydrolysisObjNom1",
     "Ras-GDP hydrolysis by MEK increased.",
     [("event", "Hydrolysis", ["Ras-GDP"]),
      ("posreg", "MEK", "Hydrolysis", ["Ras-GDP"])]),
    ("hyd4", "TestTemplaticSimpleEvents testHydrolysisSubjectRel1",
     "Its many abnormal phenotypes can be rescued via Pde2, which "
     "specifically hydrolyzes Ras-GDP.",
     [("event", "Hydrolysis", ["Ras-GDP"]),
      ("posreg", "Pde2", "Hydrolysis", ["Ras-GDP"])]),
    ("hyd5", "TestTemplaticSimpleEvents testHydrolysisSubjectRel2",
     "Pde2, which has been found to hydrolyze Ras-GDP, activates MEK.",
     [("event", "Hydrolysis", ["Ras-GDP"])]),
    ("hyd6", "TestTemplaticSimpleEvents testHydrolysisObjectRel1",
     "We measured transcription activation in the presence of MEK, which "
     "is hydrolyzed by CRP.",
     [("event", "Hydrolysis", ["MEK"])]),
    ("ph_decl1", "TestTemplaticSimpleEvents testPhosphorylationDecl1",
     "Ras is phosphorylating ASPP2.",
     [("event", "Phosphorylation", ["ASPP2"]),
      ("posreg", "Ras", "Phosphorylation", ["ASPP2"])]),
    ("ph_pass1", "TestTemplaticSimpleEvents testPhosphorylationPass1",
     "ASPP2 is phosphorylated by Ras.",
     [("event", "Phosphorylation", ["ASPP2"]),
      ("posreg", "Ras", "Phosphorylation", ["ASPP2"])]),
    ("ph_subjnom1", "TestTemplaticSimpleEvents testPhosphorylationSubjNom1",
     "Ras phosphorylation of ASPP2 increased.",
     [("event", "Phosphorylation", ["ASPP2"]),
      ("posreg", "Ras", "Phosphorylation", ["ASPP2"])]),
    ("ph_objnom1", "TestTemplaticSimpleEvents testPhosphorylationObjNom1",
     "ASPP2 phosphorylation by Ras increased.",
     [("event", "Phosphorylation", ["ASPP2"]),
      ("posreg", "Ras", "Phosphorylation", ["ASPP2"])]),
    ("ph_rel1", "TestTemplaticSimpleEvents testPhosphorylationSubjectRel1",
     "Its many abnormal phenotypes can be rescued via Ras, which "
     "specifically phosphorylates ASPP2.",
     [("event", "Phosphorylation", ["ASPP2"]),
      ("posreg", "Ras", "Phosphorylation", ["ASPP2"])]),

    # --------- TestTemplaticSimpleEvents.scala sent10-sent44 tail ---------
    ("se_s10", "TestTemplaticSimpleEvents.scala:93 sent10",
     "We measured the rate of GAP-mediated GTP hydrolysis and observed "
     "that the response of Ras ligated to Ubiquitin was identical",
     [("!event", "Binding", ["Ras", "Ubiquitin"]),
      ("event", "Ubiquitination", ["Ras"])]),
    ("se_s15", "TestTemplaticSimpleEvents.scala:335 sent15",
     "ASPP2 phosphorylates p53 at serine 125 and serine 126.",
     [("count", "Phosphorylation", 2),
      ("count", "Positive_regulation", 2),
      ("event", "Phosphorylation", ["p53"]),
      ("posreg", "ASPP2", "Phosphorylation", ["p53"])]),
    ("se_s16", "TestTemplaticSimpleEvents.scala:348 sent16",
     "ASPP2 phosphorylates p53 at serine 125, 126, and 127.",
     [("count", "Phosphorylation", 3),
      ("count", "Positive_regulation", 3),
      ("event", "Phosphorylation", ["p53"]),
      ("posreg", "ASPP2", "Phosphorylation", ["p53"])]),
    ("se_s17", "TestTemplaticSimpleEvents.scala:361 sent17",
     "Its many abnormal phenotypes can be rescued via Pde2, which does "
     "not hydrolyze Ras-GDP.",
     [("count", "Hydrolysis", 1),
      ("event", "Hydrolysis", ["Ras-GDP"]),
      ("posreg", "Pde2", "Hydrolysis", ["Ras-GDP"])]),
    ("se_s18", "TestTemplaticSimpleEvents.scala:370 sent18",
     "Ras does not phosphorylate ASPP2.",
     [("count", "Phosphorylation", 1),
      ("event", "Phosphorylation", ["ASPP2"]),
      ("posreg", "Ras", "Phosphorylation", ["ASPP2"])]),
    ("se_s20", "TestTemplaticSimpleEvents.scala:388 sent20",
     "We measured transcription activation in the presence of ASPP2, "
     "which is not ubiquitinated by Ras.",
     [("count", "Ubiquitination", 1),
      ("event", "Ubiquitination", ["ASPP2"]),
      ("posreg", "Ras", "Ubiquitination", ["ASPP2"])]),
    ("se_s21", "TestTemplaticSimpleEvents.scala:397 sent21",
     "phosphorylation of HuR at Y200 influences the response of immune "
     "cells to cytokines",
     [("count", "Phosphorylation", 1),
      ("event", "Phosphorylation", ["HuR", "Y200"])]),
    ("se_s22", "TestTemplaticSimpleEvents.scala:405 sent22",
     "CK2 phosphorylation of XRCC1 stimulates binding to either PNK or "
     "aprataxin",
     [("event", "Phosphorylation", ["XRCC1"]),
      ("!event", "Phosphorylation", ["CK2"]),
      ("posreg", "CK2", "Phosphorylation", ["XRCC1"])]),
    ("se_s23", "TestTemplaticSimpleEvents.scala:413 sent23",
     "Shown in Figure     is a Western blot detecting the phosphorylation "
     "of the mTOR substrate, 4EBP1.",
     [("event", "Phosphorylation", ["4EBP1"]),
      ("!event", "Phosphorylation", ["mTOR"])]),
    ("se_s24", "TestTemplaticSimpleEvents.scala:421 sent24",
     "We found that XRCC1 can be phosphorylated on S371 by DNA-PK",
     [("event", "Phosphorylation", ["XRCC1", "S371"]),
      ("posreg", "DNA-PK", "Phosphorylation", ["XRCC1", "S371"])]),
    ("se_s25", "TestTemplaticSimpleEvents.scala:428 sent25",
     "We found that XRCC1 R399Q can be phosphorylated on S371 by DNA-PK",
     [("event", "Phosphorylation", ["XRCC1", "S371"]),
      ("!event", "Phosphorylation", ["XRCC1", "R399Q"])]),
    ("se_s25b", "TestTemplaticSimpleEvents.scala:435 sent25b",
     "We found that R399Q-XRCC1 mutant can be phosphorylated on S371 by "
     "DNA-PK",
     [("event", "Phosphorylation", ["XRCC1", "S371"]),
      ("!event", "Phosphorylation", ["XRCC1", "R399Q"])]),
    ("se_s26", "TestTemplaticSimpleEvents.scala:442 sent26",
     "The BRCT1 domain of XRCC1 is phosphorylated in vitro by DNA-PK",
     [("event", "Phosphorylation", ["XRCC1", "BRCT1 domain"]),
      ("posreg", "DNA-PK", "Phosphorylation", ["XRCC1", "BRCT1 domain"])]),
    ("se_s27", "TestTemplaticSimpleEvents.scala:449 sent27",
     "The study reveals that XRCC1 is phosphorylated by the "
     "co-immunoprecipitated DNA-PK.",
     [("event", "Phosphorylation", ["XRCC1"]),
      ("posreg", "DNA-PK", "Phosphorylation", ["XRCC1"])]),
    ("se_s29", "TestTemplaticSimpleEvents.scala:465 sent29",
     "Figure 5 shows that only the K650M and K650E mutants caused "
     "significant STAT5(Y694) phosphorylation",
     [("event", "Phosphorylation", ["STAT5", "Y694"])]),
    ("se_s30", "TestTemplaticSimpleEvents.scala:472 sent30",
     "we found slight STAT1(Y701) phosphorylation induced by wild-type "
     "FGFR3.",
     [("event", "Phosphorylation", ["STAT1", "Y701"]),
      ("posreg", "FGFR3", "Phosphorylation", ["STAT1", "Y701"])]),
    ("se_s31", "TestTemplaticSimpleEvents.scala:479 sent31",
     "We found that endogenous K-Ras and H-Ras underwent "
     "mono-ubiquitination in HEK293T cells.",
     [("event", "Ubiquitination", ["K-Ras"]),
      ("event", "Ubiquitination", ["H-Ras"])]),
    ("se_s32", "TestTemplaticSimpleEvents.scala:486 sent32",
     "The K650M, K660M, and K650E-FGFR3 mutants are phosphorylated on "
     "Y123 and T546",
     [("count", "Phosphorylation", 6),
      ("event", "Phosphorylation", ["FGFR3", "Y123"]),
      ("event", "Phosphorylation", ["FGFR3", "T546"])]),
    ("se_s33", "TestTemplaticSimpleEvents.scala:494 sent33",
     "blot analysis of in vitro p53-acetylation",
     [("entcount", "Gene_or_gene_product", 1),
      ("count", "Acetylation", 1),
      ("event", "Acetylation", ["p53"])]),
    ("se_s34", "TestTemplaticSimpleEvents.scala:502 sent34",
     "p35 regulation of GSK3betaser9 phosphorylation",
     [("!event", "Phosphorylation", ["p35"])]),
    ("se_s35a", "TestTemplaticSimpleEvents.scala:509 sent35a",
     "E3 ubiquitin ligase ubiquitinates beta-catenin.",
     [("posreg", "E3 ubiquitin ligase", "Ubiquitination",
       ["beta-catenin"])]),
    ("se_s35b", "TestTemplaticSimpleEvents.scala:515 sent35b",
     "Beta-catenin ubiquitinates E3 ubiquitin ligase.",
     [("posreg", "Beta-catenin", "Ubiquitination",
       ["E3 ubiquitin ligase"])]),
    ("se_s35c", "TestTemplaticSimpleEvents.scala:521 sent35c",
     "Ubiquitin ubiquitinates beta-catenin.",
     [("!posreg", "E3 ubiquitin ligase", "Ubiquitination",
       ["beta-catenin"])]),
    ("se_s35d", "TestTemplaticSimpleEvents.scala:527 sent35d",
     "Beta-catenin ubiquitinates ubiquitin.",
     [("!posreg", "Beta-catenin", "Ubiquitination",
       ["E3 ubiquitin ligase"])]),
    ("se_s39", "TestTemplaticSimpleEvents.scala:580 sent39",
     "However, while MEK5D phosphorylated a kinase dead mutant of ERK5 "
     "(ERK5-KD) at its TEY site",
     [("!event", "Phosphorylation", ["MEK5D"])]),
    ("se_s40", "TestTemplaticSimpleEvents.scala:585 sent40",
     "MEK5D phosphorylated ERK5.",
     [("event", "Phosphorylation", ["ERK5"]),
      ("posreg", "MEK5D", "Phosphorylation", ["ERK5"])]),
    ("se_s41", "TestTemplaticSimpleEvents.scala:591 sent41",
     "However, while MEK5D phosphorylated a kinase dead ERK5.",
     [("!event", "Phosphorylation", ["MEK5D"])]),
    ("se_s42", "TestTemplaticSimpleEvents.scala:597 sent42",
     "Expression of SIRT1, SIRT2, and acetylated (Ac)-p53 in gastric "
     "cancer cell lines.",
     [("!event", "Acetylation", ["SIRT1"])]),
    ("se_s43", "TestTemplaticSimpleEvents.scala:603 sent43",
     "SIRT1 ubiquitylates MEK5D",
     [("event", "Ubiquitination", ["MEK5D"])]),
    ("se_s44", "TestTemplaticSimpleEvents.scala:609 sent44",
     "Activated Akt phosphorylates FoxO3a protein at Ser-318 and Ser-321 "
     "and Ser 253",
     [("count", "Phosphorylation", 3),
      ("count", "Positive_regulation", 3)]),

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
      ("posact", "FOXC2", "KRas"), ("posact", "CD45", "KRas")]),
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

    # ------------- TestModifications.scala PTM templates -------------
    ("mod_ubiqJJ", "TestModifications.scala:18",
     "The ubiquitinated Ras binds AKT and ASPP2.",
     [("ptm", "Ras", "Ubiquitination"),
      ("!event", "Ubiquitination", ["Ras"])]),
    ("mod_ubiqJJSite", "TestModifications.scala:19",
     "The ubiquitinated Ras at Ser16 binds AKT and ASPP2.",
     [("ptm", "Ras", "Ubiquitination", "Ser16")]),
    ("mod_ubiqInterceding", "TestModifications.scala:20",
     "The ubiquitinated Ras protein at Ser16 binds AKT and ASPP2.",
     [("ptm", "Ras", "Ubiquitination", "Ser16")]),
    ("mod_ubiqThatIs", "TestModifications.scala:23",
     "Src tyrosyl binds Ras that is ubiquitinated at serine 286.",
     [("ptm", "Ras", "Ubiquitination", "serine 286"),
      ("!event", "Ubiquitination", ["Ras"])]),
    ("mod_phosVBN", "TestModifications.scala:30",
     "Phosphorylated Ras binds AKT and ASPP2.",
     [("ptm", "Ras", "Phosphorylation"),
      ("event", "Binding", ["Ras", "AKT"])]),
    ("mod_phosThatIs", "TestModifications.scala:33",
     "Src tyrosyl binds Ras that is phosphorylated at serine 286.",
     [("ptm", "Ras", "Phosphorylation", "serine 286")]),
    ("mod_farneJJ", "TestModifications.scala:36",
     "The farnesylated Ras binds AKT and ASPP2.",
     [("ptm", "Ras", "Farnesylation")]),
    ("mod_aceVBNSite", "TestModifications.scala:69",
     "Acetylated Ras at Ser16 binds AKT and ASPP2.",
     [("ptm", "Ras", "Acetylation", "Ser16")]),

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

    # ------------- TestTranscriptionEvents.scala -------------
    ("tx_s1", "TestTranscriptionEvents.scala:15",
     "expression of NRF2 by Kras",
     [("event", "Transcription", ["NRF2"]),
      ("posreg", "Kras", "Transcription", ["NRF2"])]),
    ("tx_s2", "TestTranscriptionEvents.scala:22",
     "ErbB3 gene transcription",
     [("event", "Transcription", ["ErbB3"])]),
    ("tx_s3", "TestTranscriptionEvents.scala:28",
     "Transcription of Kras",
     [("event", "Transcription", ["Kras"])]),
    ("tx_s4", "TestTranscriptionEvents.scala:34",
     "PTEN protein expression was detectable by Western blot in all cell "
     "lines.",
     [("event", "Transcription", ["PTEN"])]),
    ("tx_s6", "TestTranscriptionEvents.scala:40",
     "Indeed, EGFR is overexpressed by Mek in 30%-85% patients with CRC.",
     [("event", "Transcription", ["EGFR"]),
      ("posreg", "Mek", "Transcription", ["EGFR"])]),
    ("tx_s7", "TestTranscriptionEvents.scala:47",
     "We went on to examine the levels of MCL-1 and BIM expressed in "
     "several uveal melanoma cell lines",
     [("event", "Transcription", ["BIM"]),
      ("event", "Transcription", ["MCL-1"])]),
    ("tx_s8", "TestTranscriptionEvents.scala:54",
     "Ets-1 upregulates MMP-9 expression",
     [("event", "Transcription", ["MMP-9"]),
      ("posreg", "Ets-1", "Transcription", ["MMP-9"]),
      ("count", "Positive_activation", 0),
      ("count", "Negative_activation", 0)]),

    # ------------- TestAmountEvents.scala -------------
    ("am_s1", "TestAmountEvents.scala:9",
     "We tested the level of neurofibromin present in the sample.",
     [("event", "Amount", ["neurofibromin"])]),
    ("am_s2", "TestAmountEvents.scala:15",
     "Ets-1 upregulates the loss of MMP-9.",
     [("event", "DecreaseAmount", ["MMP-9"])]),

    # ------------- TestTranslocationEvents.scala -------------
    ("tl_t1", "TestTranslocationEvents.scala:63 testTranslocation1",
     "Phosphorylation leads the plasma membrane to release p53 to the "
     "cytosol.",
     [("event", "Translocation", ["p53", "plasma membrane", "cytosol"])]),
    ("tl_t2", "TestTranslocationEvents.scala:68 testTranslocation2",
     "Recruitment of p53 from the cytosol to the plasma membrane increases "
     "with phosphorylation.",
     [("event", "Translocation", ["p53", "plasma membrane", "cytosol"])]),
    ("tl_t3", "TestTranslocationEvents.scala:73 testTranslocation3",
     "With increased phosphorylation, p53 is exported from the plasma "
     "membrane to the cytosol.",
     [("event", "Translocation", ["p53", "plasma membrane", "cytosol"])]),
    ("tl_t4", "TestTranslocationEvents.scala:78 testTranslocation4",
     "ASPP2, a protein which is translocated from the membrane to the "
     "nucleus, is subsequently phosphorylated.",
     [("count", "Translocation", 1),
      ("count", "Phosphorylation", 1),
      ("event", "Translocation", ["ASPP2", "membrane", "nucleus"])]),
    ("tl_t5", "TestTranslocationEvents.scala:85 testTranslocation5",
     "ASPP2, a protein which translocates Pde2 from the membrane to the "
     "nucleus, is subsequently phosphorylated.",
     [("count", "Translocation", 1),
      ("count", "Phosphorylation", 1),
      ("event", "Translocation", ["Pde2", "membrane", "nucleus"]),
      ("posreg", "ASPP2", "Translocation", ["Pde2", "membrane", "nucleus"])]),
    ("tl_t6", "TestTranslocationEvents.scala:93 testTranslocation6",
     "KRAS translocation to the cytosol and nucleus",
     [("count", "Translocation", 2),
      ("event", "Translocation", ["KRAS", "cytosol"]),
      ("event", "Translocation", ["KRAS", "nucleus"])]),
    ("tl_t7", "TestTranslocationEvents.scala:100 testTranslocation7",
     "ASPP2, a protein which is translocated from the membrane to the "
     "nucleus by ASPP1, is subsequently phosphorylated",
     [("count", "Translocation", 1),
      ("event", "Translocation", ["ASPP2", "membrane", "nucleus"]),
      ("posreg", "ASPP1", "Translocation",
       ["ASPP2", "membrane", "nucleus"])]),

    # ------------- TestBindingEvents.scala (batch 2) -------------
    ("b_sent3b", "TestBindingEvents.scala:59",
     "binding to the L858R EGFR",
     [("count", "Binding", 0)]),
    ("b_sent4", "TestBindingEvents.scala:70",
     "The AKT binding was successful.",
     [("count", "Binding", 0)]),
    ("b_sent9", "TestBindingEvents.scala:126",
     "Mechanistically ASPP1 and ASPP2 bind RAS-GTP and potentiates RAS "
     "signalling to enhance p53 mediated apoptosis",
     [("entity", "RAS-GTP"), ("entity", "ASPP1"), ("entity", "ASPP2"),
      ("event", "Binding", ["ASPP1", "RAS-GTP"]),
      ("event", "Binding", ["ASPP2", "RAS-GTP"])]),
    ("b_sent11", "TestBindingEvents.scala:146",
     "As expected based on previous studies, wild-type K-Ras bound "
     "primarily 32P-GDP, while G12V-Ras bound 32P-GTP (Fig.2, A and B).",
     [("event", "Binding", ["K-Ras", "32P-GDP"]),
      ("event", "Binding", ["G12V-Ras", "32P-GTP"])]),
    ("b_sent12", "TestBindingEvents.scala:154",
     "GTP loaded Ras induces multiple signaling pathways by binding to "
     "its numerous effectors such as Raf and PI3K.",
     [("event", "Binding", ["Ras", "Raf"]),
      ("event", "Binding", ["Ras", "PI3K"])]),
    ("b_sent13", "TestBindingEvents.scala:164",
     "ERK negatively regulates the epidermal growth factor mediated "
     "interaction of Gab1 and the phosphatidylinositol 3-kinase.",
     [("event", "Binding", ["Gab1", "phosphatidylinositol 3-kinase"])]),
    ("b_sent16", "TestBindingEvents.scala:176",
     "We observed increased ERBB3 binding to PI3K following MEK inhibition "
     "(Figure 1D), and accordingly, MEK inhibition substantially increased "
     "tyrosine phosphorylated ERBB3 levels (Figure 1A).",
     [("event", "Binding", ["PI3K", "ERBB3"])]),
    ("b_decl1", "TestBindingEvents.scala testBindingDecl1",
     "Mechanistically, ASPP1 and ASPP2 bind RAS-GTP.",
     [("event", "Binding", ["ASPP1", "RAS-GTP"]),
      ("event", "Binding", ["ASPP2", "RAS-GTP"])]),
    ("b_decl2", "TestBindingEvents.scala testBindingDecl2",
     "Mechanistically, ASPP1 and ASPP2 bind with RAS-GTP.",
     [("event", "Binding", ["ASPP1", "RAS-GTP"]),
      ("event", "Binding", ["ASPP2", "RAS-GTP"])]),
    ("b_pass1", "TestBindingEvents.scala testBindingPass1",
     "Mechanistically, ASPP1 and ASPP2 are bound by RAS-GTP.",
     [("event", "Binding", ["ASPP1", "RAS-GTP"]),
      ("event", "Binding", ["ASPP2", "RAS-GTP"])]),
    ("b_prepnom1", "TestBindingEvents.scala testBindingPrepNom1",
     "We detected elevated binding of p53 to K-Ras.",
     [("event", "Binding", ["p53", "K-Ras"])]),
    ("b_prepnom2", "TestBindingEvents.scala testBindingPrepNom2",
     "We detected elevated binding of p53 and K-Ras.",
     [("event", "Binding", ["p53", "K-Ras"])]),
    ("b_prepnom3", "TestBindingEvents.scala testBindingPrepNom3",
     "We detected elevated binding of p53 with K-Ras.",
     [("event", "Binding", ["p53", "K-Ras"])]),
    ("b_subjnom1", "TestBindingEvents.scala testBindingSubjNom1",
     "We detected elevated p53 binding to K-Ras.",
     [("event", "Binding", ["p53", "K-Ras"])]),
    ("b_objnom1", "TestBindingEvents.scala testBindingObjNom1",
     "We detected elevated K-Ras binding by p53.",
     [("event", "Binding", ["p53", "K-Ras"])]),
    ("b_subjrel1", "TestBindingEvents.scala testBindingSubjRel1",
     "We detected elevated phosphorylation of K-Ras, a protein that "
     "subsequently binds p53.",
     [("event", "Binding", ["p53", "K-Ras"]),
      ("event", "Phosphorylation", ["K-Ras"])]),
    ("b_objrel1", "TestBindingEvents.scala testBindingObjRel1",
     "We detected elevated phosphorylation of K-Ras, a protein that is "
     "subsequently bound by p53.",
     [("event", "Binding", ["p53", "K-Ras"])]),
    ("b_gerund1", "TestBindingEvents.scala testBindingGerund1",
     "IKKgamma appears capable of binding linear polyubiquitin.",
     [("event", "Binding", ["IKKgamma", "polyubiquitin"])]),
    ("b_sent20", "TestBindingEvents.scala sent20",
     "MEK binds with MEK.",
     [("count", "Binding", 0)]),
    ("b_sent21", "TestBindingEvents.scala sent21",
     "Highly purified DNA-PKcs, Ku70/Ku80 heterodimer and the two "
     "documented XRCC1 binding partners LigIII and DNA polbeta were "
     "dot-blotted",
     [("event", "Binding", ["Ku70", "Ku80"])]),
    ("b_sent23", "TestBindingEvents.scala sent23",
     "The complex Ku70/Ku80 is awesome",
     [("event", "Binding", ["Ku70", "Ku80"])]),
    ("b_sent24", "TestBindingEvents.scala sent24",
     "That Ku70/Ku80 complex is awesome",
     [("event", "Binding", ["Ku70", "Ku80"])]),

    # ------------- TestActivationEvents.scala (batch 2) -------------
    ("act_s10", "TestActivationEvents.scala:91",
     "The suppression of ASPP1 increases the inhibition of ASPP2.",
     [("count", "Positive_activation", 1),
      ("count", "Negative_activation", 0)]),
    ("act_s11", "TestActivationEvents.scala:99",
     "MEK activates MEK.",
     [("count", "Positive_activation", 0)]),
    ("act_s13", "TestActivationEvents.scala:112",
     "mTOR activator Rapamycin",
     [("posact", "Rapamycin", "mTOR")]),
    ("act_s14", "TestActivationEvents.scala:118",
     "Rapamycin, an inhibitor of the mTOR kinase,",
     [("negact", "Rapamycin", "mTOR")]),
    ("act_s15", "TestActivationEvents.scala:124",
     "Rapamycin, an activator of the mTOR kinase,",
     [("posact", "Rapamycin", "mTOR")]),
    ("act_s16", "TestActivationEvents.scala:130",
     "Inhibition of mTOR by rapamycin has been standard treatment",
     [("negact", "rapamycin", "mTOR")]),
    ("act_s17", "TestActivationEvents.scala:136",
     "XRCC1 stimulates DNA-PK enzymatic activity",
     [("posact", "XRCC1", "DNA-PK")]),
    ("act_s18", "TestActivationEvents.scala:142",
     "Reciprocally, XRCC1 stimulates the kinase activity of DNA-PK on "
     "serine 15 of p53 in vitro",
     [("posact", "XRCC1", "DNA-PK")]),
    ("act_s19", "TestActivationEvents.scala:148",
     "XRCC1 stimulates DNA-PK catalytic activity in vitro",
     [("posact", "XRCC1", "DNA-PK")]),
    ("act_s20", "TestActivationEvents.scala:154",
     "Taken together, these data indicate that XRCC1 strongly stimulates "
     "DNA-PK activity and that this stimulatory effect is weakened in the "
     "mutant S371D that mimics a phosphorylated status of the BRCT1 domain.",
     [("posact", "XRCC1", "DNA-PK")]),
    ("act_s21", "TestActivationEvents.scala:160",
     "The phosphorylation of MEK activates K-Ras.",
     [("count", "Positive_activation", 1),
      ("posact", "MEK", "K-Ras")]),
    ("act_s22", "TestActivationEvents.scala:167",
     "The phosphorylation of MEK deactivates K-Ras.",
     [("count", "Negative_activation", 1),
      ("count", "Positive_activation", 0),
      ("negact", "MEK", "K-Ras")]),
    ("act_s24", "TestActivationEvents.scala:185",
     "Ubiquitinated Ras activates Raf and PI3K more than non-ubiquitinated "
     "Ras",
     [("posact", "Ras", "Raf"), ("posact", "Ras", "PI3K")]),
    ("act_s25", "TestActivationEvents.scala:192",
     "Figure 2 shows that only the K650M and K650E ASPP1 mutants activated "
     "STAT1 in 293T and RCS cells.",
     [("posact", "ASPP1", "STAT1")]),
    ("act_s26", "TestActivationEvents.scala:201",
     "ERK phosphorylation in lysates from A375 expressing indicated ORFs "
     "following shRNA mediated C-RAF depletion (shCRAF).",
     [("count", "Positive_activation", 0)]),
    ("act_s27", "TestActivationEvents.scala:208",
     "Interacting proteins that facilitate FGFR3 mediated STAT1 activation "
     "could exist in cells.",
     [("count", "Positive_activation", 1)]),
    ("act_s28", "TestActivationEvents.scala:216",
     "The basal levels of EGFR downstream signaling, shown by the levels "
     "of activation specific phosphorylation of Akt, ERK, and STAT3, were "
     "not consistently associated with the HER family expression levels or "
     "EGFR sequence coding status in a positive or negative manner among "
     "the cell lines.",
     [("count", "Positive_regulation", 0),
      ("count", "Negative_regulation", 0),
      ("count", "Positive_activation", 0),
      ("count", "Negative_activation", 0)]),
    ("act_s30", "TestActivationEvents.scala:236",
     "In some cases, the presence of Ras inhibits autophagy.",
     [("count", "Negative_activation", 1),
      ("negact", "Ras", "autophagy")]),
    ("act_s33", "TestActivationEvents.scala:243",
     "We found that prolonged expression of active Ras resulted in "
     "up-regulation of the MKP3 gene.",
     [("count", "Transcription", 1),
      ("count", "Positive_activation", 1),
      ("count", "Positive_regulation", 0)]),
    ("act_s34", "TestActivationEvents.scala:250",
     "We found that prolonged expression of active Ras resulted in "
     "up-regulation of the MKP3 gene via the PI3K/Akt pathway.",
     [("count", "Transcription", 1),
      ("count", "Positive_activation", 1),
      ("count", "Positive_regulation", 0)]),
    ("act_s36", "TestActivationEvents.scala:258",
     "Apoptosis activated p53.",
     [("count", "Positive_activation", 0),
      ("count", "Negative_activation", 0)]),

    # ------------- TestRegulationEvents.scala (batch 2) -------------
    ("reg_s20", "TestRegulationEvents.scala:176",
     "The binding of ASPP1 and ASPP2 promotes the phosphorylation of MEK",
     [("count", "Positive_regulation", 1),
      ("event", "Binding", ["ASPP1", "ASPP2"]),
      ("event", "Phosphorylation", ["MEK"])]),
    ("reg_s22", "TestRegulationEvents.scala:217",
     "Human deoxycytidine kinase is phosphorylated on serine 128 by ASPP2.",
     [("count", "Positive_regulation", 1),
      ("event", "Phosphorylation", ["deoxycytidine kinase", "serine 128"]),
      ("posreg", "ASPP2", "Phosphorylation", ["deoxycytidine kinase"])]),
    ("reg_s23", "TestRegulationEvents.scala:237",
     "histone 2B phosphorylated by AKT1 had high levels of incorporated "
     "32P, suggesting that AKT1 was active; while under the same "
     "conditions, ASPP2 (693-1128) fragment",
     [("count", "Positive_regulation", 1),
      ("count", "Phosphorylation", 1),
      ("posreg", "AKT1", "Phosphorylation", ["histone 2B"])]),
    ("reg_s24", "TestRegulationEvents.scala:245",
     "The binding of BS1 and BS2 promotes the phosphorylation of MEK",
     [("count", "Positive_regulation", 1),
      ("event", "Binding", ["BS1", "BS2"]),
      ("event", "Phosphorylation", ["MEK"])]),
    ("reg_s25", "TestRegulationEvents.scala:263",
     "ASPP1 aids in the translocation of Kras to the membrane",
     [("posreg", "ASPP1", "Translocation", ["Kras"])]),
    ("reg_s27", "TestRegulationEvents.scala:276",
     "rapamycin blocked the serum-stimulated phosphorylation of ERK",
     [("negreg", "rapamycin", "Phosphorylation", ["ERK"])]),
    ("reg_s28", "TestRegulationEvents.scala:282",
     "rapamycin inhibition of the phosphorylation of ERK",
     [("negreg", "rapamycin", "Phosphorylation", ["ERK"])]),
    ("reg_s29", "TestRegulationEvents.scala:288",
     "B-Raf phosphorylates MEK2 and MEK1 on Ser221 and Ser217",
     [("count", "Positive_regulation", 4),
      ("count", "Phosphorylation", 4)]),
    ("reg_s30", "TestRegulationEvents.scala:295",
     "Note that only K650M and K650E-FGFR3 mutants cause STAT1 "
     "phosphorylation",
     [("count", "Phosphorylation", 1),
      ("posreg", "FGFR3", "Phosphorylation", ["STAT1"]),
      # TestModifications.scala:781 asserts 2 FGFR3 copies (F8 split),
      # carrying K650M and K650E respectively
      ("mutations", "FGFR3", 2),
      ("mutations", "FGFR3", 2, "K650M"),
      ("mutations", "FGFR3", 2, "K650E")]),
    ("reg_s32", "TestRegulationEvents.scala:311",
     "p53-phosphorylation of ERK",
     [("count", "Positive_regulation", 1),
      ("count", "Phosphorylation", 1),
      ("posreg", "p53", "Phosphorylation", ["ERK"])]),
    ("reg_s36", "TestRegulationEvents.scala:349",
     "Taken together , these data suggest that decreased PTPN13 "
     "expression enhances EphrinB1 and Erk1 and phosphorylation in "
     "epithelial cells .",
     [("count", "Negative_regulation", 2)]),
    ("reg_s38", "TestRegulationEvents.scala:366",
     "These data are consistent with EphrinB1 being a PTPN13 phosphatase "
     "substrate and suggest that decreased PTPN13 expression in BL breast "
     "cancer cell lines increases phosphorylation of EphrinB1 .",
     [("count", "Negative_regulation", 1)]),
    ("reg_s41", "TestRegulationEvents.scala:389",
     "Our model, in which E2-induced SRC-3 phosphorylation occurs in a "
     "complex with ER",
     [("count", "Positive_regulation", 1),
      ("count", "Phosphorylation", 1),
      ("posreg", "E2", "Phosphorylation", ["SRC-3"])]),
    ("reg_s42", "TestRegulationEvents.scala:397",
     "Cells expressing ErbB3 show tyrosine phosphorylation in response to "
     "treatment with RAS",
     [("count", "Positive_regulation", 1),
      ("count", "Phosphorylation", 1),
      ("posreg", "RAS", "Phosphorylation", ["ErbB3"])]),
    ("reg_s43", "TestRegulationEvents.scala:405",
     "Cells expressing ErbB3 show tyrosine phosphorylation in response to "
     "RAS treatment",
     [("count", "Positive_regulation", 1),
      ("count", "Phosphorylation", 1),
      ("posreg", "RAS", "Phosphorylation", ["ErbB3"])]),
    ("reg_s44", "TestRegulationEvents.scala:413",
     "Cells expressing ErbB3 show tyrosine phosphorylation in response to "
     "RAS inhibition",
     [("count", "Negative_regulation", 1),
      ("count", "Phosphorylation", 1),
      ("negreg", "RAS", "Phosphorylation", ["ErbB3"])]),
    ("reg_s45", "TestRegulationEvents.scala:421",
     "Together these data demonstrate that E2-induced SRC-3 "
     "phosphorylation is dependent on a direct interaction between SRC-3 "
     "and ERalpha and can occur outside of the nucleus.",
     [("count", "Positive_regulation", 1),
      ("count", "Phosphorylation", 1),
      ("count", "Binding", 1),
      ("posreg", "E2", "Phosphorylation", ["SRC-3"])]),
]


CASES.extend([
    # ------------- TestCoreference.scala (sentence-local anaphora) -------
    ("coref_s1", "TestCoreference.scala:14",
     "ASPP2 is even more common than BEF, and it is often ubiquitinated.",
     [("event", "Ubiquitination", ["ASPP2"]),
      ("!event", "Ubiquitination", ["BEF"])]),
    ("coref_s2", "TestCoreference.scala:25",
     "Even more than BEF, ASPP2 is common, as is their phosphorylation.",
     [("event", "Phosphorylation", ["BEF"]),
      ("event", "Phosphorylation", ["ASPP2"]),
      ("count", "Phosphorylation", 2)]),
    ("coref_s3", "TestCoreference.scala:33",
     "Even more than BEF, ASPP2 is common, as is their binding.",
     [("event", "Binding", ["BEF", "ASPP2"]),
      ("count", "Binding", 1)]),
    ("coref_s4", "TestCoreference.scala:40",
     "ASPP2 is common, even more than BEF and Mek, and so is its binding "
     "to them.",
     [("event", "Binding", ["BEF", "ASPP2"]),
      ("event", "Binding", ["Mek", "ASPP2"]),
      ("!event", "Binding", ["Mek", "BEF"]),
      ("count", "Binding", 2)]),
    ("coref_s5", "TestCoreference.scala:48",
     "To address the effect of BEF ubiquitination on its binding to PI3K "
     "and Raf family members, either total G12V-K-BEF or the "
     "ubiquitinated subfraction of G12V-K-BEF was immunoprecipitated and "
     "the immunoprecipitates were probed with antibodies to detect "
     "associated BEF effector molecules.",
     [("event", "Ubiquitination", ["BEF"]),
      ("event", "Binding", ["BEF", "Raf"]),
      ("event", "Binding", ["PI3K", "BEF"])]),
    ("coref_s6", "TestCoreference.scala:59",
     "It phosphorylates BEF.",
     [("count", "Positive_regulation", 0),
      ("event", "Phosphorylation", ["BEF"])]),
    ("coref_s7", "TestCoreference.scala:67",
     "BEF phosphorylates it.",
     [("count", "Phosphorylation", 0),
      ("count", "Positive_regulation", 0)]),
    ("coref_s8", "TestCoreference.scala:74",
     "ASPP2 is common, it is well known, and BEF sumoylates it.",
     [("event", "Sumoylation", ["ASPP2"]),
      ("posreg", "BEF", "Sumoylation", ["ASPP2"])]),
    ("coref_s10", "TestCoreference.scala:99",
     "BEF and Mek are in proximity, and they phosphorylate ASPP2.",
     [("event", "Phosphorylation", ["ASPP2"]),
      ("count", "Positive_regulation", 2),
      ("posreg", "BEF", "Phosphorylation", ["ASPP2"]),
      ("posreg", "Mek", "Phosphorylation", ["ASPP2"])]),
    ("coref_s10a", "TestCoreference.scala:107",
     "BEF and Mek are in proximity, and they upregulate the "
     "phosphorylation of ASPP2.",
     [("event", "Phosphorylation", ["ASPP2"]),
      ("count", "Positive_regulation", 2),
      ("posreg", "BEF", "Phosphorylation", ["ASPP2"]),
      ("posreg", "Mek", "Phosphorylation", ["ASPP2"])]),
    ("coref_s11", "TestCoreference.scala:116",
     "BEF and Mek are in proximity, and ASPP2 phosphorylates them.",
     [("count", "Phosphorylation", 2),
      ("event", "Phosphorylation", ["BEF"]),
      ("event", "Phosphorylation", ["Mek"]),
      ("count", "Positive_regulation", 2)]),
    ("coref_s12", "TestCoreference.scala:128",
     "BEF is in proximity, and it activates ASPP2.",
     [("count", "Positive_activation", 1),
      ("posact", "BEF", "ASPP2")]),
    ("coref_s13", "TestCoreference.scala:136",
     "Mek is in proximity, and ASPP2 activates it.",
     [("count", "Positive_activation", 1),
      ("posact", "ASPP2", "Mek")]),
    ("coref_s14", "TestCoreference.scala:144",
     "ASPP1 is common, and this protein binds GTP.",
     [("event", "Binding", ["ASPP1", "GTP"])]),
    ("coref_s14b", "TestCoreference.scala:152",
     "This protein binds GTP.",
     [("count", "Binding", 0)]),
    ("coref_s15", "TestCoreference.scala:160",
     "BEF is common, and a mouse binds GTP.",
     [("count", "Binding", 0),
      ("count", "Positive_activation", 0)]),
    ("coref_s17", "TestCoreference.scala:174",
     "ASPP2 is common, and BEF binds the Mek protein.",
     [("event", "Binding", ["BEF", "Mek"]),
      ("!event", "Binding", ["BEF", "ASPP2"]),
      ("count", "Binding", 1)]),
    ("coref_s18", "TestCoreference.scala:183",
     "ASPP2 and BEF are common, as is its binding.",
     [("count", "Binding", 0)]),
    ("coref_s18a", "TestCoreference.scala:184",
     "ASPP2 and BEF are common, as is their activation.",
     [("count", "Positive_activation", 0),
      ("count", "Positive_regulation", 0)]),
    ("coref_s18b", "TestCoreference.scala:185",
     "The phosphorylation of ASPP2 and BEF is common, as is their "
     "upregulation.",
     [("count", "Phosphorylation", 2),
      ("event", "Phosphorylation", ["ASPP2"]),
      ("event", "Phosphorylation", ["BEF"]),
      ("count", "Positive_activation", 0),
      ("count", "Positive_regulation", 0)]),
    ("coref_s19", "TestCoreference.scala:205",
     "ASPP1 is common, and it binds Mek and BEF",
     [("count", "Binding", 2),
      ("event", "Binding", ["ASPP1", "Mek"]),
      ("event", "Binding", ["ASPP1", "BEF"])]),
    ("coref_s20", "TestCoreference.scala:214",
     "We also monitored how siRNA-induced loss of LMTK2 influenced "
     "phosphorylation of PP1Cthr320. Four different LMTK2 siRNAs all "
     "markedly reduced LMTK2 levels and this led to a corresponding "
     "decrease in PP1Cthr320 phosphorylation.",
     [("!posact", "LMTK2", "LMTK2")]),
    ("coref_s23", "TestCoreference.scala:241",
     "Most efforts at understanding Ras mediated transformation have "
     "centered on identifying those targets that bind RasGTP . However , "
     "our data raise the possibility that there is a class of proteins , "
     "such as PI3KC2beta , that bind nucleotide-free Ras and are "
     "negatively regulated by this interaction .",
     [("count", "Positive_regulation", 0),
      ("count", "Negative_regulation", 0)]),
    ("coref_s25", "TestCoreference.scala:248",
     "Another example can be given with mutated p53. The pivotal role of "
     "p53 as a tumor suppressor is illustrated by the fact that this "
     "protein is found mutated in ∼50% of human cancers.",
     [("entity", "p53")]),

    # ------------- NegationTests.scala -------------
    ("neg_sen1", "NegationTests.scala:16",
     "RAS does not phosphorylate MEK",
     [("count", "Positive_regulation", 1),
      ("count", "Phosphorylation", 1),
      ("negated", "Positive_regulation"),
      ("!negated", "Phosphorylation")]),
    ("neg_sen2", "NegationTests.scala:33",
     "RAS doesn't phosphorylate MEK",
     [("count", "Positive_regulation", 1),
      ("negated", "Positive_regulation"),
      ("!negated", "Phosphorylation")]),
    ("neg_sen3", "NegationTests.scala:50",
     "RAS is not phosphorylating MEK",
     [("count", "Positive_regulation", 1),
      ("negated", "Positive_regulation"),
      ("!negated", "Phosphorylation")]),
    ("neg_sen4", "NegationTests.scala:66",
     "RAS isn't phosphorylating MEK",
     [("count", "Positive_regulation", 1),
      ("negated", "Positive_regulation"),
      ("!negated", "Phosphorylation")]),
    ("neg_sen5", "NegationTests.scala:84",
     "RAS wasn't phosphorylated",
     [("count", "Phosphorylation", 1),
      ("count", "Positive_regulation", 0),
      ("negated", "Phosphorylation")]),
    ("neg_sen6", "NegationTests.scala:95",
     "RAS fails to phosphorylate MEK",
     [("count", "Positive_regulation", 1),
      ("negated", "Positive_regulation"),
      ("!negated", "Phosphorylation")]),
    ("neg_sen7", "NegationTests.scala:111",
     "RAS fails phosphorylating MEK",
     [("count", "Positive_regulation", 1),
      ("negated", "Positive_regulation"),
      ("!negated", "Phosphorylation")]),
    ("neg_sen8", "NegationTests.scala:127",
     "RAS plays no role in the phosphorylation of MEK",
     [("count", "Positive_regulation", 1),
      ("count", "Phosphorylation", 1),
      ("negated", "Positive_regulation"),
      ("!negated", "Phosphorylation")]),
    ("neg_sen9", "NegationTests.scala:143",
     "RAS plays little role in the phosphorylation of MEK",
     [("count", "Positive_regulation", 1),
      ("negated", "Positive_regulation"),
      ("!negated", "Phosphorylation")]),
    ("neg_sen10", "NegationTests.scala:161",
     "RAS phosphorylates MEK",
     [("count", "Positive_regulation", 1),
      ("count", "Phosphorylation", 1),
      ("!negated", "Positive_regulation"),
      ("!negated", "Phosphorylation")]),
    ("neg_sen11", "NegationTests.scala:177",
     "RAS doesn't fail to phosphorylate MEK",
     [("count", "Positive_regulation", 1),
      ("!negated", "Positive_regulation"),
      ("!negated", "Phosphorylation")]),
    ("neg_sen12", "NegationTests.scala:194",
     "RAS fails not to phosphorylate MEK",
     [("count", "Positive_regulation", 1),
      ("!negated", "Positive_regulation"),
      ("!negated", "Phosphorylation")]),
    ("neg_sen13", "NegationTests.scala:211",
     "decreased PTPN13 expression increases phosphorylation of EphrinB1",
     [("count", "Positive_regulation", 0),
      ("count", "Negative_regulation", 1)]),
    ("neg_sen14", "NegationTests.scala:223",
     "Dominant negative IL-6 impaired the function of ASPP2",
     [("count", "Positive_activation", 1),
      ("count", "Negative_activation", 0)]),

    # ------------- HypothesisTests.scala -------------
    ("hyp_sen1", "HypothesisTests.scala:15",
     "RAS suggests the phosphorylation of MEK",
     [("event", "Phosphorylation", ["MEK"]),
      ("hypothesis", "Phosphorylation")]),
    ("hyp_sen2", "HypothesisTests.scala:23",
     "After extensive experimentation, the process hints that RAS "
     "phosphorylates MEK",
     [("event", "Phosphorylation", ["MEK"]),
      ("hypothesis", "Phosphorylation")]),
    ("hyp_sen3", "HypothesisTests.scala:32",
     "Now, we hypothesize that RAS phosphorylates MEK",
     [("event", "Phosphorylation", ["MEK"]),
      ("hypothesis", "Phosphorylation")]),
    ("hyp_sen4", "HypothesisTests.scala:41",
     "The presence of p53 indicates the phosphorylation of MEK",
     [("event", "Phosphorylation", ["MEK"]),
      ("hypothesis", "Phosphorylation")]),

    # ------------- TestConversionEvents.scala -------------
    ("conv_1a", "TestConversionEvents.scala:14",
     "The initial stage is the conversion of β-D-galactose to "
     "α-D-galactose by the enzyme, mutarotase (GALM).",
     [("count", "Conversion", 1)]),
    ("conv_1b", "TestConversionEvents.scala:17",
     "a high conversion of pyruvate to lactate.",
     [("count", "Conversion", 1)]),
    ("conv_1c", "TestConversionEvents.scala:18",
     "In most organisms, the conversion of β-d-galactose to the more "
     "metabolically useful glucose 1-phosphate is accomplished by the "
     "action of four enzymes that constitute the Leloir pathway.",
     [("count", "Conversion", 1)]),
    ("conv_2a", "TestConversionEvents.scala:23",
     "Tumor cells often convert pyruvate to lactate.",
     [("count", "Conversion", 1)]),
    ("conv_2b", "TestConversionEvents.scala:24",
     "Cancer cells, like normal cells, use glycolysis to convert glucose "
     "to pyruvate.",
     [("count", "Conversion", 1)]),
    ("conv_2c", "TestConversionEvents.scala:26",
     "To proceed in glycolysis the enzyme 6-phosphofructo-1-kinase "
     "(PFK-1) converts F-6-P to fructose-1,6-bisphosphate (F-1,6-P2).",
     [("count", "Conversion", 1)]),
    ("conv_2d", "TestConversionEvents.scala:29",
     "Finally, UDP-galactose 4-epimerase recycles the UDP-galactose to "
     "UDP-glucose for the transferase reaction.",
     [("count", "Conversion", 1)]),
    ("conv_2e", "TestConversionEvents.scala:31",
     "Additionally, phosphoglucomutase converts the D-glucose 1-phosphate "
     "to D-glucose 6-phosphate.",
     [("count", "Conversion", 1)]),
    ("conv_3a", "TestConversionEvents.scala:35",
     "Warburg observed that in cancer cells pyruvate is converted to "
     "lactate.",
     [("count", "Conversion", 1)]),
    ("conv_3b", "TestConversionEvents.scala:37",
     "The glucose-1-phosphate generated by the Leloir pathway can then be "
     "converted to glucose-6-phosphate by phosphoglucomutases.",
     [("count", "Conversion", 1)]),
    ("conv_3c", "TestConversionEvents.scala:39",
     "In the first step of this pathway, β-d-galactose is epimerized to "
     "α-d-galactose by galactose mutarotase.",
     [("count", "Conversion", 1)]),
    ("conv_3d", "TestConversionEvents.scala:41",
     "To complete the pathway, UDP-galactose is converted to UDP-glucose "
     "by UDP-galactose 4-epimerase.",
     [("count", "Conversion", 1)]),
    ("conv_3e", "TestConversionEvents.scala:43",
     "Next, α-D-galactose is phosphorylated by galactokinase to galactose "
     "1-phosphate.",
     [("count", "Conversion", 1)]),
    ("conv_4a", "TestConversionEvents.scala:46",
     "In the first step, galactose mutarotase facilitates the conversion "
     "of β-D-galactose to α-D-galactose since this is the active form in "
     "the pathway.",
     [("count", "Conversion", 1)]),
    ("conv_5", "TestConversionEvents.scala:50",
     "ACE2 catalyzes the conversion of angiotensin-I into angiotensin-II",
     [("count", "Conversion", 1)]),

    # ------------- TestTemplaticAutoEvents.scala -------------
    ("auto_ex1", "TestTemplaticAutoEvents.scala:9",
     "EGFR autophosphorylates on a tyrosine residue.",
     [("count", "AutoPhosphorylation", 1),
      ("event", "AutoPhosphorylation", ["EGFR", "tyrosine"]),
      ("posreg", "EGFR", "AutoPhosphorylation", ["EGFR"])]),
    ("auto_ex2", "TestTemplaticAutoEvents.scala:28",
     "EGFR phosphorylates itself.",
     [("count", "AutoPhosphorylation", 1),
      ("event", "AutoPhosphorylation", ["EGFR"]),
      ("posreg", "EGFR", "AutoPhosphorylation", ["EGFR"])]),
    ("auto_ex3", "TestTemplaticAutoEvents.scala:47",
     "However, stimulation with EGF for varying time intervals revealed "
     "no significant differences in the levels of autophosphorylation of "
     "EGFR in cells expressing wild type Gab1 versus the Gab1 "
     "F446/472/589 mutant.",
     [("count", "AutoPhosphorylation", 1),
      ("event", "AutoPhosphorylation", ["EGFR"]),
      ("posreg", "EGFR", "AutoPhosphorylation", ["EGFR"])]),
    ("auto_ex4", "TestTemplaticAutoEvents.scala:66",
     "As has been previously reported, recruitment of Shp2 by Gab1 does "
     "not alter the magnitude or kinetics of tyrosine autophosphorylation "
     "of EGFR.",
     [("count", "AutoPhosphorylation", 1),
      ("event", "AutoPhosphorylation", ["EGFR"]),
      ("posreg", "EGFR", "AutoPhosphorylation", ["EGFR"])]),
    ("auto_ex5", "TestTemplaticAutoEvents.scala:85",
     "Levels of EGFR autophosphorylation are represented linearly "
     "following quantitation by densitometry and normalization for "
     "protein expression levels.",
     [("count", "AutoPhosphorylation", 1),
      ("event", "AutoPhosphorylation", ["EGFR"]),
      ("posreg", "EGFR", "AutoPhosphorylation", ["EGFR"])]),
    ("auto_ex6", "TestTemplaticAutoEvents.scala:104",
     "Because the substrates of Shp2 are for the most part unknown, we "
     "were additionally interested in examining the state of EGFR "
     "tyrosine phosphorylation following treatment with EGF in order to "
     "determine if the failure of Gab1 to bind p85, and potentially "
     "recruit Shp2, would influence levels of EGFR autophosphorylation.",
     [("count", "AutoPhosphorylation", 1),
      ("event", "AutoPhosphorylation", ["EGFR"]),
      ("posreg", "EGFR", "AutoPhosphorylation", ["EGFR"])]),
    # ------------- TestEntities.scala -------------
    ("ent_sent2", "TestEntities.scala:64",
     "It has recently been shown that oncogenic RAS can enhance the "
     "apoptotic function of p53 via ASPP1 and ASPP2",
     [("entity", "RAS"), ("entity", "p53"),
      ("entity", "ASPP1"), ("entity", "ASPP2")]),
    ("ent_sent3", "TestEntities.scala:73",
     "We hypothesized that MEK inhibition activates AKT by inhibiting ERK "
     "activity, which blocks an inhibitory threonine phosphorylation on "
     "the JM domains of EGFR and HER2, thereby increasing ERBB3 "
     "phosphorylation.",
     [("entity", "ERK"), ("entity", "EGFR"),
      ("entity", "HER2"), ("entity", "ERBB3")]),
    ("ent_sent4", "TestEntities.scala:82",
     "To test this hypothesis, we transiently transfected CHO-KI cells, "
     "which do not express ERBB receptors endogenously, with wildtype "
     "ERBB3 with either wild-type EGFR or EGFR T669A.",
     [("entity", "ERBB receptors"), ("entity", "ERBB3"),
      ("entity", "EGFR")]),
    ("ent_sent5", "TestEntities.scala:91",
     "See Figure S31 and Table R15",
     [("entcount", "Site", 0)]),
    ("ent_sent6", "TestEntities.scala:97",
     "The K-Ras substrate and mTOR substrates shouldn't be found.",
     [("entcount", "BioEntity", 0)]),
    ("ent_sent7", "TestEntities.scala:104",
     "In some cases, the presence of Ras inhibits autophagy.",
     [("entcount", "BioProcess", 1)]),
    ("ent_sent8", "TestEntities.scala:138",
     "Our model, in which E2-induced SRC-3 phosphorylation occurs in a "
     "complex with ER",
     [("entcount", "Site", 0),
      ("entcount", "Simple_chemical", 1)]),
    ("ent_sent9a", "TestEntities.scala:147",
     "Ras inhibitor was added to the solution.",
     [("entcount", "Simple_chemical", 1),
      ("entcount", "Gene_or_gene_product", 0),
      ("entcount", "Family", 0)]),
    ("ent_sent9b", "TestEntities.scala:148",
     "Akt inhibitor was added to the solution.",
     [("entcount", "Simple_chemical", 1),
      ("entcount", "Gene_or_gene_product", 0)]),
    ("ent_sent9c", "TestEntities.scala:149",
     "Adenylate cyclase inhibitor was added to the solution.",
     [("entcount", "BioProcess", 1),
      ("entcount", "Simple_chemical", 0)]),
    ("ent_sent9d", "TestEntities.scala:150",
     "Vascular endothelial cell growth inhibitor was added to solution.",
     [("entcount", "Gene_or_gene_product", 1),
      ("entcount", "Simple_chemical", 0)]),

    # ------------- TestNERLabeling.scala -------------
    ("ner_bioprocess", "TestNERLabeling.scala:16",
     "apoptosis, autophagic cell death, quiescence, hematopoiesis, or "
     "complex assembly cause cancer.",
     [("entcount", "BioProcess", 5)]),
    ("ner_cellline", "TestNERLabeling.scala:17",
     "MPanc-96, mast, Hyssop, CEM/TART, and ZR75-1 cause cancer.",
     [("entcount", "CellLine", 4),
      ("entcount", "Gene_or_gene_product", 1)]),
    ("ner_celltype", "TestNERLabeling.scala:18",
     "apud cell, AV nodal myocyte, An1 B Cell, xanthoblast, and zygospore "
     "cause cancer",
     [("entcount", "CellType", 5)]),
    ("ner_celltypes", "TestNERLabeling.scala:19",
     "apud cells, AV nodal myocytes, An1 B Cells, xanthoblasts, and "
     "zygospores cause cancer",
     [("entcount", "CellType", 5)]),
    ("ner_cellcomp", "TestNERLabeling.scala:21",
     "A bands, C zones, F bouton, H zones, I bands, Z lines, CVT "
     "vesicles, telomeres, Symplasts, and Host periplasms cause cancer.",
     [("entcount", "Cellular_component", 10)]),
    ("ner_families", "TestNERLabeling.scala:23",
     "CDC73_N, RcsD-ABL domain, zinc-ribbon domain, Rho_RNA_bind, "
     "RasGAP_C, zwf, PTHR10856:SF10, GLHYDRLASE27, Ras guanyl-releasing "
     "protein 1, and Jiraiya cause cancer.",
     [("entcount", "Family", 10)]),
    ("ner_ggp", "TestNERLabeling.scala:25",
     "CK-40, ZZANK2, MCH-1R, RAS1, and hemAT cause cancer.",
     [("entcount", "Gene_or_gene_product", 5)]),
    ("ner_organ", "TestNERLabeling.scala:29",
     "Acetabulum, Visceral Pericardium, malleolar bone, Vena cava sinus, "
     "and zygopodium cause cancer",
     [("entcount", "Organ", 5)]),
    ("ner_chemical", "TestNERLabeling.scala:30",
     "endoxifen sulfate, Juvamine, Adenosine-phosphate, Xitix, and "
     "okadaic acid cause cancer",
     [("entcount", "Simple_chemical", 5)]),
    ("ner_species", "TestNERLabeling.scala:31",
     "Potato, wheat, Yerba-mate, Danio rerio, zebrafish, Rats, Gallus "
     "gallus, and chickens cause cancer",
     [("entcount", "Species", 8)]),
    ("ner_drug", "TestNERLabeling.scala:33",
     "Alvocidib, Anacardic acid, L-779450, Masitinib, and  Withaferin A "
     "are known drugs. ",
     [("entcount", "Simple_chemical", 5)]),

    ("auto_ex7", "TestTemplaticAutoEvents.scala:123",
     "The experiment presented in Fig shows that all cell lines exhibit "
     "EGFR autophosphorylation in response to EGF treatment, while only "
     "cells expressing the ectopically introduced ErbB3 protein show "
     "ErbB3 tyrosine phosphorylation in response to EGF stimulation.",
     [("count", "AutoPhosphorylation", 1),
      ("event", "AutoPhosphorylation", ["EGFR"]),
      ("posreg", "EGFR", "AutoPhosphorylation", ["EGFR"])]),
])

# ---------------------------------------------------------------------------
# Templatic frame generation, mirroring the reference's own rule templating
# (simple-event_template.yml instantiated per event type in
# events_master.yml:17-510; test sentences from
# TestTemplaticSimpleEvents.scala:170-420 / TestTemplaticSimpleDeEvents.scala,
# which repeat the same ~7 syntactic frames for every PTM type).
# ---------------------------------------------------------------------------

_TEMPLATE_TYPES: dict[str, tuple[str, str]] = {
    # label -> (verb stem, noun)
    "Phosphorylation": ("phosphorylat", "phosphorylation"),
    "Ubiquitination": ("ubiquitinat", "ubiquitination"),
    "Sumoylation": ("sumoylat", "sumoylation"),
    "Glycosylation": ("glycosylat", "glycosylation"),
    "Acetylation": ("acetylat", "acetylation"),
    "Farnesylation": ("farnesylat", "farnesylation"),
    "Ribosylation": ("ribosylat", "ribosylation"),
    "Methylation": ("methylat", "methylation"),
    "Hydroxylation": ("hydroxylat", "hydroxylation"),
    "Hydrolysis": ("hydrolyz", "hydrolysis"),
}


def _templatic_cases() -> list[tuple[str, str, str, list[tuple]]]:
    out: list[tuple[str, str, str, list[tuple]]] = []
    src = "TestTemplaticSimpleEvents.scala (templated frames)"
    de_src = "TestTemplaticSimpleDeEvents.scala (templated frames)"
    for label, (v, noun) in _TEMPLATE_TYPES.items():
        ving, ved, v3, vbase = v + "ing", v + "ed", v + "es", v + "e"
        ev = ("event", label, ["ASPP2"])
        pr = ("posreg", "Ras", label, ["ASPP2"])
        frames = [
            ("decl1", f"Ras is {ving} ASPP2.", [ev, pr]),
            ("pass1", f"ASPP2 is {ved} by Ras.", [ev, pr]),
            ("subjnom1", f"Ras {noun} of ASPP2 increased.", [ev, pr]),
            ("objnom1", f"ASPP2 {noun} by Ras increased.", [ev, pr]),
            ("subjrel1",
             "Its many abnormal phenotypes can be rescued via Ras, "
             f"which specifically {v3} ASPP2.", [ev, pr]),
            ("subjrel2",
             f"Ras, which has been found to {vbase} ASPP2, activates MEK.",
             [ev, pr]),
            ("objrel1",
             "We measured transcription activation in the presence of "
             f"ASPP2, which is {ved} by Ras.", [ev, pr]),
        ]
        for fid, sent, exps in frames:
            out.append((f"tmpl_{label.lower()}_{fid}", src, sent, exps))
        if label == "Hydrolysis":
            continue  # no De- variant in the reference taxonomy
        de_label = "De" + label.lower()
        dev, denoun = "de" + v, "de" + noun
        de_ev = ("event", de_label, ["ASPP2"])
        de_not = ("!event", label, ["ASPP2"])
        de_pr = ("posreg", "Ras", de_label, ["ASPP2"])
        de_frames = [
            ("decl1", f"Ras is {dev}ing ASPP2.", [de_ev, de_not, de_pr]),
            ("pass1", f"ASPP2 is {dev}ed by Ras.", [de_ev, de_not, de_pr]),
            ("subjnom1", f"Ras {denoun} of ASPP2 increased.",
             [de_ev, de_not, de_pr]),
            ("objnom1", f"ASPP2 {denoun} by Ras increased.",
             [de_ev, de_not, de_pr]),
        ]
        for fid, sent, exps in de_frames:
            out.append((f"tmpl_{de_label.lower()}_{fid}", de_src, sent, exps))
    return out


CASES.extend([
    # ------------- TestCoreference.scala (batch 3) -------------
    ("coref_s26", "TestCoreference.scala:263",
     "Many RTKs interact directly with Grb2, some rely on Shc family "
     "adaptors to recruit Grb2, and others do both . While direct "
     "Grb2/RTK interactions involve binding of the Grb2 SH2 domain to "
     "pYXNX motifs, Shc proteins interact with RTKs primarily through the "
     "binding of their N-terminal PTB domain to NPXpY motifs.",
     [("entity", "Grb2")]),
    ("coref_s28a", "TestCoreference.scala:320",
     "ASPP1 is common, and a protein is phosphorylated.",
     [("count", "Event", 0)]),
    ("coref_s28b", "TestCoreference.scala:321",
     "ASPP1 is common, and a cistron phosphorylates ASPP2.",
     [("count", "ComplexEvent", 0),
      ("event", "Phosphorylation", ["ASPP2"])]),
    ("coref_s29", "TestCoreference.scala:333",
     "Liver is delicious, and it phosphorylates Raf.",
     [("count", "ComplexEvent", 0)]),
    ("coref_s30", "TestCoreference.scala:334",
     "Humans are numerous, and they are sometimes activated by Raf.",
     [("count", "Event", 0)]),

    # ------------- TestCoreference.scala alias/grounding-share -----------
    ("al_s37a", "TestCoreference.scala:414",
     "BEF4H protein (hereafter referred to as BEF) is phosphorylated.",
     [("entcount", "Gene_or_gene_product", 2),
      ("same_canonical", "BEF4H", "BEF")]),
    ("al_s37b", "TestCoreference.scala:421",
     "BEF (hereafter referred to as BEF4H) is phosphorylated.",
     [("entcount", "Gene_or_gene_product", 2),
      ("same_canonical", "BEF4H", "BEF")]),
    ("al_s38", "TestCoreference.scala:429",
     "Ras (hereafter referred to as S135) is phosphorylated.",
     [("!same_canonical", "Ras", "S135")]),
    ("al_s40", "TestCoreference.scala:443",
     "BEF4H, sometimes called BEF, phosphorylates Akt.",
     [("same_canonical", "BEF4H", "BEF")]),
    ("al_s41", "TestCoreference.scala:452",
     "BEF4H (alias BEF) phosphorylates Akt.",
     [("same_canonical", "BEF4H", "BEF")]),
    ("al_s42", "TestCoreference.scala:461",
     "Akt1 (a.k.a. Akt334, AktTR, or Akt4H) is phosphorylated.",
     [("entcount", "Gene_or_gene_product", 4),
      ("same_canonical", "Akt1", "Akt334"),
      ("same_canonical", "Akt1", "AktTR"),
      ("same_canonical", "Akt1", "Akt4H")]),
    ("al_s43", "TestCoreference.scala:470",
     "Akt1 (a.k.a. Akt334 and Akt4H) is phosphorylated.",
     [("entcount", "Gene_or_gene_product", 3),
      ("!same_canonical", "Akt1", "Akt334"),
      ("!same_canonical", "Akt1", "Akt4H")]),
    ("al_s44a", "TestCoreference.scala:479",
     "Akt (also called Akt334, AktTR, or Akt4H) is phosphorylated. AktTR "
     "is also ubiquitinated.",
     [("same_canonical", "Akt", "AktTR"),
      ("event", "Ubiquitination", ["AktTR"])]),

    # -------- TestCoreference.scala batch 2: pronouns, homologs ----------
    ("coref_s16", "TestCoreference.scala:168",
     "BEF is common. This is an intervening sentence. It binds Mek.",
     [("event", "Binding", ["BEF", "Mek"])]),
    ("coref_s46", "TestCoreference.scala:509",
     "This sentence has no mentions.",
     [("entcount", "Entity", 0), ("count", "Event", 0)]),
    ("coref_s47", "TestCoreference.scala:516",
     "We analyzed sporadic CRCs in Omani (of African origin, N = 61), "
     "Iranian (of Caucasian origin, N = 53) and African American (N = 95) "
     "patients for microsatellite instability, expression status of "
     "mismatched repair genes (hMLH1, hMSH2) and presence of the BRAF "
     "(V600E) mutation. In the Omani group, all tumors with BRAF mutations "
     "were located in the left side of the colon, and for African "
     "Americans, 88% of tumors with BRAF mutations were found in the right "
     "side of the colon.",
     [("entity", "BRAF")]),
    ("coref_s48", "TestCoreference.scala:525",
     "Since EGFR mutation is known to be associated with sensitivity to "
     "erlotinib, and KRas mutations are associated with resistance, we "
     "focused on the group of wild-type EGFR/KRas cell lines. We found "
     "that the half maximal inhibitory concentration (IC50) for erlotinib "
     "was significantly higher in cell lines that segregated to clusters "
     "with methylated SRAMs compared to those that segregated to clusters "
     "with unmethylated SRAMs",
     [("entity", "EGFR")]),
    ("coref_s55", "TestCoreference.scala:549",
     "Gab1 mutant protein enhances EGF induced activation of the PI-3",
     [("posact", "EGF", "PI-3"),
      ("count", "Positive_regulation", 1),
      ("count", "Positive_activation", 1)]),
    ("coref_s56a", "TestCoreference.scala:561",
     "Akta and HSP20 are common. It phosphorylates Akta.",
     [("posreg", "HSP20", "Phosphorylation", ["Akta"])]),
    ("coref_s56b", "TestCoreference.scala:569",
     "ASPP1 binds Mek. It then binds KIAA0771.",
     [("event", "Binding", ["ASPP1", "Mek"]),
      ("event", "Binding", ["Mek", "KIAA0771"])]),
    ("al_s50", "TestCoreference.scala:534",
     "Akt (hereafter referred to as diacylglycerol) is phosphorylated.",
     [("entcount", "Entity", 2),
      ("!same_canonical", "Akt", "diacylglycerol")]),
    ("al_s51", "TestCoreference.scala:541",
     "Diacylglycerol (hereafter referred to as S135) functions as a "
     "second messenger signaling lipid.",
     [("!same_canonical", "Diacylglycerol", "S135")]),
    ("al_s58", "TestCoreference.scala:587",
     "ASPP1 (better known as ASPP2) is a common protein.",
     [("entcount", "Gene_or_gene_product", 2), ("count", "Alias", 1)]),
    ("al_s59", "TestCoreference.scala:598",
     "ASPP1 (better known as 23peM) is a common protein.",
     [("entcount", "Gene_or_gene_product", 2),
      ("same_canonical", "ASPP1", "23peM")]),
    ("al_s60", "TestCoreference.scala:610",
     "23peM (ASPP1) is a common protein.",
     [("entcount", "Gene_or_gene_product", 2),
      ("same_canonical", "ASPP1", "23peM")]),
    ("al_s62a", "TestCoreference.scala:633",
     "We studied the effects of the Pax6 homologs eyeless and eyegone.",
     [("entcount", "Gene_or_gene_product", 3),
      ("same_canonical", "Pax6", "eyeless"),
      ("same_canonical", "Pax6", "eyegone")]),
    ("al_s62b", "TestCoreference.scala:645",
     "The Pax6 homologs eyeless, eyefull, and eyegone were found in "
     "established lines.",
     [("entcount", "Gene_or_gene_product", 4),
      ("same_canonical", "Pax6", "eyeless"),
      ("same_canonical", "Pax6", "eyefull"),
      ("same_canonical", "Pax6", "eyegone")]),
    ("al_s63", "TestCoreference.scala:659",
     "Eyeless and eyegone, homologs of Pax6, are the subject of this work.",
     [("entcount", "Gene_or_gene_product", 3),
      ("same_canonical", "Pax6", "Eyeless"),
      ("same_canonical", "Pax6", "eyegone")]),

    # -------- TestRegulationEvents.scala batch 3: nesting + response -----
    ("reg_s31", "TestRegulationEvents.scala:298",
     "Note that only K650M, K660M, and K650E-FGFR3 mutants cause STAT1 "
     "phosphorylation on Y123 and T546",
     [("count", "Positive_regulation", 6),
      ("count", "Phosphorylation", 2),
      ("posreg", "FGFR3", "Phosphorylation", ["STAT1", "Y123"]),
      ("posreg", "FGFR3", "Phosphorylation", ["STAT1", "T546"])]),
    ("reg_s46", "TestRegulationEvents.scala:424",
     "Akt inhibits the phosphorylation of AFT by BEF.",
     [("count", "Positive_regulation", 1),
      ("count", "Negative_regulation", 1),
      ("posreg", "BEF", "Phosphorylation", ["AFT"])]),
    ("reg_s47", "TestRegulationEvents.scala:434",
     "The phosphorylation of AFT by BEF is inhibited by the "
     "ubiquitination of Akt.",
     [("count", "Positive_regulation", 1),
      ("count", "Negative_regulation", 1),
      ("posreg", "BEF", "Phosphorylation", ["AFT"]),
      ("event", "Ubiquitination", ["Akt"])]),
    ("reg_s48", "TestRegulationEvents.scala:447",
     "We first assayed the ability of the endogenous EGFR to be tyrosine "
     "autophosphorylated in response to EGF",
     [("posreg", "EGF", "AutoPhosphorylation", ["EGFR"])]),
    ("reg_s49", "TestRegulationEvents.scala:456",
     "the ability of the exogenous ErbB3 receptor to be tyrosine "
     "phosphorylated in response to stimulation with either EGF or "
     "neuregulin (NRG)",
     [("count", "Positive_regulation", 2),
      ("count", "Phosphorylation", 1),
      ("posreg", "EGF", "Phosphorylation", ["ErbB3"]),
      ("posreg", "neuregulin", "Phosphorylation", ["ErbB3"])]),
    ("reg_s50", "TestRegulationEvents.scala:465",
     "Both Gab1 and Gab1 F446/472/589 are tyrosine phosphorylated in "
     "response to EGF treatment",
     [("posreg", "EGF", "Phosphorylation", ["Gab1"])]),
    ("reg_s51", "TestRegulationEvents.scala:473",
     "The endogenous EGFR is tyrosine phosphorylated in response to EGF "
     "in all cell lines.",
     [("posreg", "EGF", "Phosphorylation", ["EGFR"])]),
    ("reg_s52", "TestRegulationEvents.scala:482",
     "As shown in Figure, the endogenous Gab1 present in WT MEFs is "
     "tyrosine phosphorylated in response to EGF treatment.",
     [("posreg", "EGF", "Phosphorylation", ["Gab1"])]),
    ("reg_s53", "TestRegulationEvents.scala:490",
     "We first assayed the ability of the mutant Gab1 proteins to become "
     "tyrosine phosphorylated in response to EGF.",
     [("posreg", "EGF", "Phosphorylation", ["Gab1"])]),
    ("reg_s54", "TestRegulationEvents.scala:500",
     "The phosphorylation of AKT1 following MEK activation.",
     [("posreg", "MEK", "Phosphorylation", ["AKT1"])]),
    ("reg_s54c", "TestRegulationEvents.scala:510",
     "The phosphorylation of AKT1 following inhibition of MEK.",
     [("negreg", "MEK", "Phosphorylation", ["AKT1"])]),
    ("reg_s55", "TestRegulationEvents.scala:519",
     "Apoptosis promotes the phosphorylation of p53.",
     [("count", "Regulation", 0),
      ("event", "Phosphorylation", ["p53"])]),

    # -------- TestBindingEvents.scala batch 2 ----------------------------
    ("bind_s19", "TestBindingEvents.scala:268",
     "The dimerization of cRaf with BRaf helps something.",
     [("event", "Binding", ["cRaf", "BRaf"])]),
    ("bind_s20", "TestBindingEvents.scala:274",
     "MEK binds with MEK.",
     [("count", "Binding", 0)]),
    ("bind_s21", "TestBindingEvents.scala:280",
     "Highly purified DNA-PKcs, Ku70/Ku80 heterodimer and the two "
     "documented XRCC1 binding partners LigIII and DNA polbeta were "
     "dot-blotted",
     [("event", "Binding", ["Ku70", "Ku80"])]),
    ("bind_s23", "TestBindingEvents.scala:291",
     "The complex Ku70/Ku80 is awesome",
     [("event", "Binding", ["Ku70", "Ku80"])]),
    ("bind_s24", "TestBindingEvents.scala:297",
     "That Ku70/Ku80 complex is awesome",
     [("event", "Binding", ["Ku70", "Ku80"])]),
    ("bind_s27", "TestBindingEvents.scala:319",
     "Once bound to RAD51, the DNA-PK holoenzyme facilitates the "
     "recruitment...",
     [("event", "Binding", ["DNA-PK", "RAD51"])]),
    ("bind_s28", "TestBindingEvents.scala:327",
     "To confirm whether XRCC1 and DNA-PK coexist in a common complex, we "
     "carried out co-immunoprecipitation experiments in HeLa nuclear "
     "extracts.",
     [("event", "Binding", ["DNA-PK", "XRCC1"])]),
    ("bind_s29", "TestBindingEvents.scala:333",
     "We found that the three subunits of DNA-PK co-purified only with "
     "BRCT1 containing XRCC1-fusion proteins             confirming that "
     "XRCC1 and DNA-PK are present in a complex. ",
     [("event", "Binding", ["DNA-PK", "XRCC1"])]),
    ("bind_s30", "TestBindingEvents.scala:339",
     "Figure 3. Raf and PI3K bind more to ubiquitinated Ras than to "
     "non-ubiquitinated Ras",
     [("event", "Binding", ["Raf", "Ras"]),
      ("event", "Binding", ["PI3K", "Ras"])]),
    ("bind_s31", "TestBindingEvents.scala:346",
     "We observed that endogenous PLC, Afadin, Calmodulin and Tubulin "
     "bind with Sos.",
     [("event", "Binding", ["PLC", "Sos"]),
      ("event", "Binding", ["Afadin", "Sos"]),
      ("event", "Binding", ["Calmodulin", "Sos"]),
      ("event", "Binding", ["Tubulin", "Sos"])]),
    ("bind_s33", "TestBindingEvents.scala:362",
     "As expected based on previous studies, wild-type K-Ras bound "
     "primarily 32P-GDP, while G12V-Ras bound 32P-GTP (Fig.2, A and B).",
     [("event", "Binding", ["K-Ras", "32P-GDP"])]),
    ("bind_s36", "TestBindingEvents.scala:386",
     "Lower: purified wild-type and mutant p32, but not recombinant ASPP2 "
     "and GST proteins, bind to Mek.",
     [("count", "Binding", 3),
      ("event", "Binding", ["p32", "Mek"]),
      ("event", "Binding", ["ASPP2", "Mek"]),
      ("event", "Binding", ["GST", "Mek"]),
      ("!event", "Binding", ["p32", "ASPP2"]),
      ("!event", "Binding", ["p32", "GST"])]),
    ("bind_s37a", "TestBindingEvents.scala:398",
     "Src tyrosyl phosphorylates Ras that is GTP bound",
     [("event", "Phosphorylation", ["Ras"])]),

    # -------- TestEntities.scala: protein fragments + figure negatives ---
    ("ent_s10a", "TestEntities.scala:172",
     "p13 BID is a protein fragment",
     [("entity", "p13 BID"), ("entcount", "Entity", 1)]),
    ("ent_s10b", "TestEntities.scala:173",
     "Abeta is a protein fragment",
     [("entity", "Abeta"), ("entcount", "Entity", 1)]),
    ("ent_s10c", "TestEntities.scala:174",
     "inactivated P-factor is a protein fragment",
     [("entity", "inactivated P-factor"), ("entcount", "Entity", 1)]),
    ("ent_s10d", "TestEntities.scala:175",
     "interleukin-1 alpha proteolytic cleavage product is a protein "
     "fragment",
     [("entity", "interleukin-1 alpha proteolytic cleavage product"),
      ("entcount", "Entity", 1)]),
    ("ent_s10e", "TestEntities.scala:176",
     "Non-structural protein 5 is a protein fragment",
     [("entity", "Non-structural protein 5"), ("entcount", "Entity", 1)]),
    ("ent_s10f", "TestEntities.scala:177",
     "preM is a protein fragment",
     [("entity", "preM"), ("entcount", "Entity", 1)]),
    ("ent_s11a", "TestEntities.scala:215",
     "Similarly, we showed that wild-type p53 was polyubiquitinated by "
     "Pirh2 but not by Pirh2-DN and Pirh2-ΔRING (Fig. 5C, compare lane 3 "
     "with lanes 4 and 5).",
     [("!entity", "Fig. 5C"), ("!entity", "5C")]),
    ("ent_s11d", "TestEntities.scala:218",
     "MG132 treatment rescued the NSC59984-mediated down-regulation of "
     "mutant p53 (figure 4A).",
     [("!entity", "figure 4A"), ("!entity", "4A"), ("entity", "p53")]),

    # -------- TestModifications.scala: PTM-vs-event + paren lists --------
    ("mod_sent1", "TestModifications.scala:675",
     "The phosphorylated AKT binds to ASPP2.",
     [("count", "Phosphorylation", 0),
      ("ptm", "AKT", "Phosphorylation"),
      ("event", "Binding", ["AKT", "ASPP2"])]),
    ("mod_sent1b", "TestModifications.scala:676",
     "The ubiquitinated AKT binds to ASPP2.",
     [("count", "Ubiquitination", 0),
      ("ptm", "AKT", "Ubiquitination"),
      ("event", "Binding", ["AKT", "ASPP2"])]),
    ("mod_sent4", "TestModifications.scala:721",
     "Phosphorylated Mek binds to GTP.",
     [("count", "Phosphorylation", 0),
      ("ptm", "Mek", "Phosphorylation"),
      ("event", "Binding", ["Mek", "GTP"])]),
    ("mod_sent11", "TestModifications.scala:793",
     "Note that only FGFR3 K650M causes STAT1 phosphorylation",
     [("mutations", "FGFR3", 1),
      ("event", "Phosphorylation", ["STAT1"])]),
    ("mod_sent12", "TestModifications.scala:801",
     "Note that only the K650M-FGFR3 mutant causes STAT1 phosphorylation",
     [("mutations", "FGFR3", 1, "K650M"),
      ("event", "Phosphorylation", ["STAT1"])]),
    ("mod_sent5", "TestModifications.scala:728",
     "Ligation of ASPP2 to hydroxylated RAS-GTP promotes apoptosis.",
     [("count", "Hydroxylation", 0),
      ("ptm", "RAS-GTP", "Hydroxylation")]),
    ("mod_sent6", "TestModifications.scala:735",
     "Optineurin regulates NF-kappaB activation by mediating interaction "
     "of CYLD with ubiquitinated RIP.",
     [("count", "Ubiquitination", 0)]),
    ("mod_sent9", "TestModifications.scala:770",
     "The phosphorylated p53 by ASPP2 is doing something...",
     [("event", "Phosphorylation", ["p53"]),
      ("posreg", "ASPP2", "Phosphorylation", ["p53"])]),
    ("mod_sent13", "TestModifications.scala:809",
     "monoubiquitinated K-Ras is less sensitive than the unmodified "
     "protein to GAP-mediated GTP hydrolysis",
     [("count", "Ubiquitination", 0),
      ("!event", "Ubiquitination", ["K-Ras"]),
      ("ptm", "K-Ras", "Ubiquitination")]),
    ("mod_sent14", "TestModifications.scala:825",
     "all six FGFR3 mutants induced activatory ERK(T202/Y204) "
     "phosphorylation (Fig. 2).",
     [("count", "Phosphorylation", 2),
      ("event", "Phosphorylation", ["ERK", "T202"]),
      ("event", "Phosphorylation", ["ERK", "Y204"]),
      ("count", "Positive_regulation", 2)]),
    ("mod_sent15", "TestModifications.scala:844",
     "all six FGFR3 mutants induced activatory ERK(K156M/H204M) "
     "phosphorylation (Fig. 2).",
     [("count", "Positive_regulation", 2)]),
    ("mod_sent16", "TestModifications.scala:853",
     "all six FGFR3 mutants induced activatory ERK(K156M, H204M) "
     "phosphorylation (Fig. 2).",
     [("count", "Positive_regulation", 2)]),

    # -------- TestCoreference.scala batch 3: robustness negatives --------
    ("coref_s20", "TestCoreference.scala:215",
     "We also monitored how siRNA-induced loss of LMTK2 influenced "
     "phosphorylation of PP1Cthr320. Four different LMTK2 siRNAs all "
     "markedly reduced LMTK2 levels and this led to a corresponding "
     "decrease in PP1Cthr320 phosphorylation.",
     [("!posact", "LMTK2", "LMTK2")]),
    ("coref_s21", "TestCoreference.scala:223",
     "Inhibition of mTOR kinase is feasible with the macrolide natural "
     "product rapamycin (aka: sirolimus, RAPA, Rapamune, AY-22989, and "
     "NSC-226080). Rapamycin is an FDA-approved agent used as "
     "immunosuppressive therapy post organ transplant .",
     [("entity", "rapamycin"), ("entity", "mTOR")]),
    ("coref_s23", "TestCoreference.scala:247",
     "Most efforts at understanding Ras mediated transformation have "
     "centered on identifying those targets that bind RasGTP . However , "
     "our data raise the possibility that there is a class of proteins , "
     "such as PI3KC2beta , that bind nucleotide-free Ras and are "
     "negatively regulated by this interaction .",
     [("count", "Regulation", 0)]),
    ("coref_s25", "TestCoreference.scala:255",
     "Another example can be given with mutated p53. The pivotal role of "
     "p53 as a tumor suppressor is illustrated by the fact that this "
     "protein is found mutated in ~50% of human cancers. In most cases, "
     "mutations in p53 greatly increase the otherwise short half life of "
     "this protein and cause it to accumulate in tumor cells.",
     [("entity", "p53")]),
    ("coref_s26", "TestCoreference.scala:263",
     "Many RTKs interact directly with Grb2, some rely on Shc family "
     "adaptors to recruit Grb2, and others do both    . While direct "
     "Grb2/RTK interactions involve binding of the Grb2 SH2 domain to "
     "pYXNX motifs, Shc proteins interact with RTKs primarily through the "
     "binding of their N-terminal PTB domain to NPXpY motifs.",
     [("entity", "Grb2")]),

    # ------------- TestPolarity.scala (non-ignored cases) ----------------
    ("pol_sen9", "TestPolarity.scala:74",
     "Biliverdin reductase-A functions as a scaffold protein for the "
     "activation of ERK by MEK1/2 and of Elk1 by ERK.",
     [("posact", "MEK1/2", "ERK")]),
    ("pol_sen10", "TestPolarity.scala:77",
     "Potential downstream targets of activated TAK1 include MKK4 and JNKK "
     "and MKK3 and MAPKK6, which directly activate c-Jun N-terminal kinase "
     "(JNK) and p38 MAP kinase, respectively [XREF_BIBR, XREF_BIBR]",
     [("posact", "MKK4", "c-Jun N-terminal kinase")]),
    ("pol_sen12", "TestPolarity.scala:83",
     "The protein kinase mammalian target of rapamycin (mTOR) regulates "
     "mRNA translation and is inhibited by rapamycin.",
     [("negact", "rapamycin", "mammalian target of rapamycin")]),
    ("pol_sen13", "TestPolarity.scala:86",
     "Of these, 6 involved wortmannin or LY-294002 (inhibitors of "
     "phosphoinositide 3-kinase (PI3K)) or rapamycin (an inhibitor of the "
     "mammalian target of rapamycin complex 1 (mTORC1)).",
     [("negact", "rapamycin", "mammalian target of rapamycin")]),
    ("pol_sen18", "TestPolarity.scala:102",
     "The Wip1 gene is frequently amplified or overexpressed in human "
     "cancers, promoting tumor growth by switching off major checkpoint "
     "kinases and p53.",
     [("negact", "Wip1", "p53")]),
    ("pol_sen19", "TestPolarity.scala:105",
     "The TSC2 and TSC1 tuberous sclerosis complex, acting downstream of "
     "AKT, negatively regulates mTORC1 by inhibiting the GTPase activity "
     "of Rheb (Ras Homolog Enriched in Brain), which is a positive "
     "regulator of mTORC1.",
     [("negact", "TSC2", "Rheb")]),
    ("pol_sen22", "TestPolarity.scala:120",
     "Insulin inhibits adipocyte hormone sensitive lipase and activates "
     "lipoprotein lipase [XREF_BIBR, XREF_BIBR].",
     [("posact", "Insulin", "lipoprotein lipase")]),
    ("pol_sen34", "TestPolarity.scala:157",
     "Unexpectedly co-misexpression of Trbl and Akt in the fat body led "
     "to a significant reduction in total FoxO levels (XREF_FIG), "
     "suggesting that Trbl and Akt might act combinatorially to direct "
     "FoxO turnover.",
     [("negact", "Akt", "FoxO")]),
    ("pol_sen37", "TestPolarity.scala:166",
     "Inhibition of neutral endopeptidase protects endogenous ANP, and "
     "inhibition of angiotensin converting enzyme blocks angiotensin II "
     "production, whereas inhibition of both peptidases is required to "
     "protect endogenous bradykinin (BK).",
     [("posact", "angiotensin converting enzyme", "angiotensin II")]),
    ("pol_sen40", "TestPolarity.scala:176",
     "Negatively regulating IRFs include IRF4 that competitively inhibits "
     "IRF5 from binding to TLR, thereby inhibiting inflammatory responses.",
     [("negact", "IRF4", "IRF5")]),
])


def _event_anaphor_cases() -> list[tuple[str, str, str, list[tuple]]]:
    """TestCoreference.scala:271-317 sent27a/b: event anaphora with
    definite-determiner gating, templated over 8 simple-event types."""
    out = []
    types = [(lab, v + "es", noun) for lab, (v, noun) in
             _TEMPLATE_TYPES.items() if lab not in ("Hydrolysis",
                                                    "Glycosylation")]
    for lab, vb, noun in types:
        out.append((
            f"coref_s27a_{lab.lower()}", "TestCoreference.scala:305",
            f"We found that ASPP1 {vb} ASPP2, and this {noun} upregulates "
            "STAT1.",
            [("count", "ActivationEvent", 1),
             ("event", lab, ["ASPP2"]),
             ("posact", "ASPP2", "STAT1")]))
        out.append((
            f"coref_s27b_{lab.lower()}", "TestCoreference.scala:311",
            f"We found that ASPP1 {vb} ASPP2, and {noun} upregulates "
            "STAT1.",
            [("count", "ActivationEvent", 0),
             ("event", lab, ["ASPP2"])]))
    return out


CASES.extend(_event_anaphor_cases())


def _modification_cases() -> list[tuple[str, str, str, list[tuple]]]:
    """TestModifications.scala / TestDeModifications.scala frame corpus:
    9 PTM types × 7 syntactic frames (JJ / VBN / interceding / that-is,
    each ± site), verbatim sentence shapes from the reference test file
    (TestModifications.scala:17-100)."""
    out: list[tuple[str, str, str, list[tuple]]] = []
    types = {k: v for k, v in _TEMPLATE_TYPES.items() if k != "Hydrolysis"}
    for label, (v, _) in types.items():
        for prefix, lab, src in (
                ("", label, "TestModifications.scala"),
                ("de", "De" + label.lower(), "TestDeModifications.scala")):
            ved = prefix + v + "ed"
            ptm = ("ptm", "Ras", lab)
            ptm_s16 = ("ptm", "Ras", lab, "Ser16")
            ptm_s286 = ("ptm", "Ras", lab, "serine 286")
            frames = [
                ("jj", f"The {ved} Ras binds AKT and ASPP2.", [ptm]),
                ("jj_site", f"The {ved} Ras at Ser16 binds AKT and ASPP2.",
                 [ptm_s16]),
                ("jj_interceding",
                 f"The {ved} Ras protein at Ser16 binds AKT and ASPP2.",
                 [ptm_s16]),
                ("vbn", f"{ved.capitalize()} Ras binds AKT and ASPP2.",
                 [ptm]),
                ("vbn_site",
                 f"{ved.capitalize()} Ras at Ser16 binds AKT and ASPP2.",
                 [ptm_s16]),
                ("vbn_interceding",
                 f"{ved.capitalize()} Ras proteins at Ser16 binds AKT and "
                 "ASPP2.", [ptm_s16]),
                ("that_is",
                 f"Src tyrosyl binds Ras that is {ved} at serine 286.",
                 [ptm_s286, ("!event", lab, ["Ras"])]),
            ]
            for fid, sent, exps in frames:
                out.append((f"modt_{lab.lower()}_{fid}", src, sent, exps))
    return out


CASES.extend(_templatic_cases())
CASES.extend(_modification_cases())

# ------------- round-2 dep-fidelity gap closures -------------
# mutantProteinMatch sieve cases (darpa/DarpaLinks.scala:77-110,
# compatibleMutants CorefUtils.scala:105-117)
CASES.extend([
    ("coref_s31a", "TestCoreference.scala:344",
     "ASPP1 K341L is common, and this mutant ASPP1 binds GTP.",
     [("event", "Binding", ["ASPP1", "GTP"])]),
    ("coref_s31b", "TestCoreference.scala:345",
     "ASPP2 K341L is common, and this mutant ASPP1 binds GTP.",
     [("event", "Binding", ["ASPP1", "GTP"])]),
    ("coref_s32a", "TestCoreference.scala:363",
     "ASPP1 K341L is common, and the K341L mutant binds GTP.",
     [("event", "Binding", ["ASPP1", "GTP"])]),
    ("coref_s32b", "TestCoreference.scala:364",
     "ASPP1 K341M is common, and the K341L mutant binds GTP.",
     [("count", "Binding", 0)]),
    ("coref_s33a", "TestCoreference.scala:376",
     "ASPP1 K341L is common, and the mutant binds GTP.",
     [("event", "Binding", ["ASPP1", "GTP"])]),
    ("coref_s33b", "TestCoreference.scala:377",
     "ASPP1 is common, and the mutant binds GTP.",
     [("count", "Binding", 0)]),
    ("coref_s33c", "TestCoreference.scala:378",
     "ASPP1 K341L is common, and the protein binds GTP.",
     [("count", "Binding", 0)]),
    ("bind_s22", "TestBindingEvents.scala:286",
     "The heterodimer Ku70-DNA ligase IV is awesome",
     [("event", "Binding", ["Ku70", "DNA ligase IV"])]),
    ("pol_s42", "TestPolarity.scala:182",
     "Moreover, the demonstration that silencing TAK1 in TNFalpha "
     "stimulated non malignant epithelial cells suppresses MUC1-C-mediated "
     "activation of IKKbeta and NF-kappaB, indicated that MUC1-C and TAK1 "
     "are functionally linked in the inflammatory response.",
     [("posact", "TAK1", "IKKbeta")]),
    ("secr_1", "secretion_events.yml:5 ('INF-gamma secretion' shape)",
     "EGF secretion is observed in tumor cells.",
     [("event", "Secretion", ["EGF"])]),
    ("secr_2", "secretion_events.yml:5",
     "The secretion of EGF increased.",
     [("event", "Secretion", ["EGF"])]),
    ("secr_3", "secretion_events.yml (passive verbal form)",
     "EGF is secreted by HeLa cells.",
     [("event", "Secretion", ["EGF"]),
      ("count", "Positive_regulation", 0)]),
    ("ner_shape_unseen", "CRFNER.scala (N5 shape recall)",
     "ZZANK9 phosphorylates Ras, and hemQT is ubiquitinated.",
     # names NOT in any dictionary: the shape NER must still yield
     # entities that participate in events (the CRF recall function)
     [("entity", "ZZANK9"), ("entity", "hemQT"),
      ("event", "Phosphorylation", ["Ras"]),
      ("posreg", "ZZANK9", "Phosphorylation", ["Ras"]),
      ("event", "Ubiquitination", ["hemQT"])]),
    ("coref_s57", "TestCoreference.scala:575",
     "It is possible that the effects of HSP20 on AKT might differ between "
     "normal cardiomyocytes or mesenchymal stem cells and HCC cells. The "
     "binding partner(s) of HSP20 and their interaction(s) might be "
     "dependent on the cell types.",
     # 'their' resolves to BOTH AKT and HSP20 (plural pronominal,
     # DarpaLinks sent57 contract) → the interaction materializes over the
     # resolved pair
     [("event", "Binding", ["HSP20", "AKT"])]),
    ("coref_s22", "TestCoreference.scala:233",
     "Second, STAT1 accumulates and shows nuclear localization in the "
     "cartilage of TD-affected human fetuses as well as in mice carrying "
     "the K644E-FGFR3 mutation (homologous to human K650E)     ,     . "
     "Finally, two experimental studies show that the loss of STAT1 "
     "partially rescues the growth-inhibitory action of FGF signaling in "
     "chondrocytes     ,     , both suggesting the role of STAT1 in the "
     "growth-inhibitory FGFR3 action in cartilage.",
     # the reference contract: never an activation whose controlled is the
     # garbled cross-clause span (an activation-of-activation artifact)
     [("!posact", "STAT1",
       "STAT1 partially rescues the growth-inhibitory action of FGF"),
      ("event", "DecreaseAmount", ["STAT1"])]),
    ("reg_s35", "TestRegulationEvents.scala:333",
     "p53 can be acetylated by p300 and CBP at multiple lysine residues "
     "( K164 , 370 , 372 , 373 , 381 , 382 and 386 ) .",
     [("count", "Positive_regulation", 16),
      ("count", "Acetylation", 8),
      ("posreg", "p300", "Acetylation", ["p53"]),
      ("posreg", "CBP", "Acetylation", ["p53"])]),
])


def fixture_sentences() -> list[str]:
    return [c[2] for c in CASES]

# ------------- round-3 fixture tail: activation/binding/regulation/
# translocation/negation batches (TestActivationEvents sent30-50,
# TestBindingEvents sent25-48, NegationTests sent15-17,
# TestRegulationEvents sent7-64, TestTranslocationEvents sent3b/c,
# TestEntities sent11b/c) -------------
CASES.extend([
 ("act_s37", "TestActivationEvents.scala:264", "Cell aging increases apoptosis",
  [("posact", "Cell aging", "apoptosis")]),
 ("act_s38", "TestActivationEvents.scala:270", "EGFR silencing deactivates MAPK1",
  [("posact", "EGFR", "MAPK1")]),
 ("act_s39", "TestActivationEvents.scala:275", "EGFR deletion deactivates MAPK1",
  [("posact", "EGFR", "MAPK1")]),
 ("act_s41", "TestActivationEvents.scala:288",
  "AKT1 expression results in subsequent activation of MEK",
  [("count", "Transcription", 1), ("count", "Positive_activation", 1)]),
 ("act_s42", "TestActivationEvents.scala:295",
  "AKT1 expression results in subsequent MEK activation",
  [("count", "Transcription", 1), ("count", "Positive_activation", 1)]),
 ("act_s43", "TestActivationEvents.scala:302",
  "GAPDH catalyzes the conversion of glyceraldehyde-3-phosphate to 1,3-bisphosphoglycerate.",
  [("count", "Positive_activation", 0)]),
 ("act_s44", "TestActivationEvents.scala:308", "AR function increases docetaxel sensitivity.",
  [("count", "Positive_activation", 0)]),
 ("act_s45", "TestActivationEvents.scala:314",
  "The consequences of increased AR function might then increase docetaxel resistance via increasing p21 expression.",
  [("count", "Positive_activation", 0)]),
 ("act_s46", "TestActivationEvents.scala:320", "BRAF inhibition in NF1 deficient cells",
  [("count", "Negative_activation", 0)]),
 ("act_s47", "TestActivationEvents.scala:326",
  "Here we present a case of a patient with metastatic CMM positive for the BRAF-V600E mutation who was treated with vemurafenib.",
  [("!posact", "vemurafenib", "BRAF")]),
 ("act_s48", "TestActivationEvents.scala:332",
  "Our group previously reported the case of a patient with a recurrent BRAF V600E mutant brainstem ganglioglioma successfully treated with vemurafenib and vinblastine.",
  [("!posact", "vemurafenib", "BRAF")]),
 ("act_s49", "TestActivationEvents.scala:338",
  "This drug, vemurafenib, selectively targets V600E mutant BRAF and it is unknown how this drug may affect autophagic flux.",
  [("!posact", "vemurafenib", "BRAF")]),
 ("act_s50", "TestActivationEvents.scala:344", "the Rac1 activator TIAM1",
  [("!posact", "Rac1", "TIAM1"), ("posact", "TIAM1", "Rac1")]),
 ("neg_s15", "NegationTests.scala:234", "IL-6 knockdown impaired the function of ASPP2",
  [("count", "Positive_activation", 1), ("count", "Negative_activation", 0)]),
 ("neg_s17", "NegationTests.scala:259", "Silencing IL-6 impaired the function of ASPP2",
  [("count", "Positive_activation", 1), ("count", "Negative_activation", 0)]),
 ("reg_s7", "TestRegulationEvents.scala:72",
  "The phosphorylated ASPP2 fragment by MAPK1 was digested by trypsin and fractioned on a high performance liquid chromatography.",
  [("event", "Phosphorylation", ["ASPP2"]), ("posreg", "MAPK1", "Phosphorylation", ["ASPP2"])]),
 ("reg_s54b", "TestRegulationEvents.scala:503",
  "We observed the phosphorylation of AKT1 following activation by MEK.",
  [("posreg", "MEK", "Phosphorylation", ["AKT1"])]),
 ("reg_s56", "TestRegulationEvents.scala:525", "RAS1 activates AKT-induced apoptosis",
  [("posreg", "RAS1", "Positive_activation", ["AKT", "apoptosis"])]),
 ("reg_s57", "TestRegulationEvents.scala:531",
  "Indeed, expression of RARbeta2 has been shown to restore retinoic acid induced apoptosis",
  [("count", "Transcription", 1), ("count", "Positive_activation", 1)]),
 ("reg_s59", "TestRegulationEvents.scala:547",
  "Up-regulation of MKP3 expression by active Ras expression",
  [("count", "Transcription", 2), ("count", "Positive_regulation", 1),
   ("count", "Positive_activation", 0)]),
 ("reg_s60", "TestRegulationEvents.scala:555", "ATP reduced GSH depletion",
  [("count", "Positive_activation", 1)]),
 ("reg_s61", "TestRegulationEvents.scala:561", "ATP can deplete GSH in cells",
  [("count", "Negative_activation", 1)]),
 ("reg_s62", "TestRegulationEvents.scala:567", "ATP depletes GSH rapidly in cells",
  [("count", "Negative_activation", 1)]),
 ("reg_s63", "TestRegulationEvents.scala:573", "glucose triggers insulin release",
  [("count", "Secretion", 1)]),
 ("reg_s64", "TestRegulationEvents.scala:579", "SRF induces TAZ transcription",
  [("count", "Transcription", 1), ("count", "Positive_regulation", 1)]),
 ("bind_s25", "TestBindingEvents.scala:306",
  "Identification by mass spectroscopy of DNA-PKcs associated with XRCC1",
  [("event", "Binding", ["DNA-PKcs", "XRCC1"])]),
 ("bind_s26", "TestBindingEvents.scala:311",
  "Our assumption is that DNA-PKcs is associated with  XRCC1",
  [("event", "Binding", ["DNA-PKcs", "XRCC1"])]),
 ("bind_s32", "TestBindingEvents.scala:356",
  "Something increases the fraction of GTP-bound Ras",
  [("event", "Binding", ["GTP", "Ras"])]),
 ("bind_s34", "TestBindingEvents.scala:370",
  "Recruitment of p53 to the p21 or PUMA promoter was normalized to input.",
  [("count", "Binding", 2), ("event", "Binding", ["p53", "p21"]),
   ("event", "Binding", ["p53", "PUMA"])]),
 ("bind_s37b", "TestBindingEvents.scala:399",
  "Ras that is GTP bound is phosphorylated by Src tyrosyl",
  [("event", "Binding", ["Ras", "GTP"]), ("!event", "Binding", ["Src", "GTP"]),
   ("!event", "Binding", ["Ras", "Src"])]),
 ("bind_s38", "TestBindingEvents.scala:413", "Only Smad3LC and Smad3C were able to bind APC10.",
  [("count", "Binding", 2), ("event", "Binding", ["Smad3LC", "APC10"]),
   ("event", "Binding", ["Smad3C", "APC10"]), ("!event", "Binding", ["Smad3C", "Smad3LC"])]),
 ("bind_s39", "TestBindingEvents.scala:422",
  "Only Smad3LC and Smad3C exhibited the ability to bind APC10.",
  [("count", "Binding", 2), ("event", "Binding", ["Smad3LC", "APC10"]),
   ("event", "Binding", ["Smad3C", "APC10"]), ("!event", "Binding", ["Smad3C", "Smad3LC"])]),
 ("bind_s40", "TestBindingEvents.scala:431",
  "Complex formation between Gab1 and the protein tyrosine phosphatase Shp2 negatively regulates Gab1 phosphorylation",
  [("count", "Binding", 1), ("event", "Binding", ["Gab1", "Shp2"])]),
 ("bind_s42", "TestBindingEvents.scala:445",
  "Point mutations made are listed along with their impact on binding to RAC1 and CDC42",
  [("count", "Binding", 0)]),
 ("bind_s43", "TestBindingEvents.scala:451", "We analyze the Mek-Ras-Akt1 complex.",
  [("count", "Binding", 1), ("event", "Binding", ["Mek", "Ras", "Akt1"])]),
 ("bind_s46", "TestBindingEvents.scala:472",
  "We analyze the associations between KRAS and BRAF mutations and patients ' clinicopathological characteristics.",
  [("count", "Binding", 0)]),
 ("bind_s47", "TestBindingEvents.scala:478", "RB1 binds the BCL2 promoter",
  [("count", "Binding", 0)]),
 ("bind_s48", "TestBindingEvents.scala:484", "RB1 binds the promoter of BCL2",
  [("count", "Binding", 0)]),
 ("ent_s11b", "TestEntities.scala:216",
  "In contrast, the levels of IRP2 and TfR1 were increased, whereas the level of FTH1 was decreased, by ectopic mutant p53 (Fig. 4f, compare lanes 3-4 with 1-2, respectively).",
  [("!entity", "Fig. 4f"), ("!entity", "4f")]),
 ("ent_s11c", "TestEntities.scala:217",
  "In addition, knockout of IRP2 led to decreased expression of TfR1 and increased expression of FTH1 (Fig. 5a), consistent with previous report [41].",
  [("!entity", "Fig. 5a"), ("!entity", "5a")]),
 ("transloc_s3b", "TestTranslocationEvents.scala:37",
  "ASPP1 is common, and its release from the plasma membrane and nuclear membrane increases with its phosphorylation.",
  [("count", "Translocation", 2),
   ("event", "Translocation", ["ASPP1", "plasma membrane"]),
   ("event", "Translocation", ["ASPP1", "nuclear membrane"])]),
 ("transloc_s3c", "TestTranslocationEvents.scala:38",
  "ASPP1 is common, and its release from the plasma membrane and nuclear membrane to the cytosol increases with its phosphorylation.",
  [("count", "Translocation", 2),
   ("event", "Translocation", ["ASPP1", "plasma membrane", "cytosol"]),
   ("event", "Translocation", ["ASPP1", "nuclear membrane", "cytosol"])]),
])

# ------------- round-3 fixture tail batch 2: De-event templates, PTM
# frames, model entities, overrides, alias canonization
# (TestTemplaticSimpleDeEvents, TestDeModifications head,
# TestModelEntities, TestOverrides, TestCoreference sent9/49-53) ---------
CASES.extend([
 # ---- TestTemplaticSimpleDeEvents ----
 ("sde_s1", "TestTemplaticSimpleDeEvents.scala:10",
  "The dephosphorylation on AKT was great.",
  [("count", "Dephosphorylation", 0)]),
 ("sde_s2", "TestTemplaticSimpleDeEvents.scala:17",
  "JAK3 dephosphorylates three HuR residues (Y63, Y68, Y200)",
  [("count", "Dephosphorylation", 3), ("count", "Positive_regulation", 3)]),
 ("sde_s3", "TestTemplaticSimpleDeEvents.scala:27",
  "The ubiquitination of ASPP2 is promoted by optineurin.",
  [("count", "Deubiquitination", 0)]),
 ("sde_s4", "TestTemplaticSimpleDeEvents.scala:34",
  "The phosphorylation of ASPP2 is promotted by optineurin.",
  [("count", "Dephosphorylation", 0)]),
 ("sde_s5", "TestTemplaticSimpleDeEvents.scala:42",
  "In contrast, the EGFR T669A mutant increased both basal EGFR and ERBB3 tyrosine dephosphorylation that was not augmented by MEK inhibition",
  [("count", "Dephosphorylation", 2),
   ("event", "Dephosphorylation", ["EGFR"]),
   ("event", "Dephosphorylation", ["ERBB3"])]),
 ("sde_s6", "TestTemplaticSimpleDeEvents.scala:53",
  "We hypothesized that MEK inhibition activates AKT by inhibiting ERK activity, which blocks an inhibitory threonine dephosphorylation on the JM domains of EGFR and HER2, thereby increasing ERBB3 dephosphorylation.",
  [("count", "Dephosphorylation", 3),
   ("event", "Dephosphorylation", ["EGFR"]),
   ("event", "Dephosphorylation", ["HER2"]),
   ("event", "Dephosphorylation", ["ERBB3"])]),
 ("sde_s7", "TestTemplaticSimpleDeEvents.scala:66",
  "The ubiquitinated Ras protein dephosphorylates AKT.",
  [("event", "Dephosphorylation", ["AKT"]),
   ("posreg", "Ras", "Dephosphorylation", ["AKT"])]),
 ("sde_s10", "TestTemplaticSimpleDeEvents.scala:81",
  "We measured the rate of GAP-mediated GTP hydrolysis and observed that the response of Ras ligated to Ubiquitin was identical",
  [("!event", "Binding", ["Ras", "Ubiquitin"]),
   ("event", "Ubiquitination", ["Ras"])]),
 ("sde_s14a", "TestTemplaticSimpleDeEvents.scala:96",
  "Experiments revealed deubiquitination at Lys residues 104 and 147 of K-Ras",
  [("count", "Deubiquitination", 2)]),
 ("sde_s14b", "TestTemplaticSimpleDeEvents.scala:102",
  "Experiments revealed deubiquitination at Lys residues 117, 147, and 170 for H-Ras.",
  [("count", "Deubiquitination", 3)]),
 ("sde_dehyd1", "TestTemplaticSimpleDeEvents.scala:108",
  "Ras-GDP is dehydrolyzed by 26S proteasome without ubiquitination.",
  [("event", "Dehydrolysis", ["Ras-GDP"])]),
 ("sde_dehyd2", "TestTemplaticSimpleDeEvents.scala:113",
  "MEK dehydrolysis of Ras-GDP increased.",
  [("event", "Dehydrolysis", ["Ras-GDP"])]),
 ("sde_dehyd3", "TestTemplaticSimpleDeEvents.scala:118",
  "Ras-GDP dehydrolysis by MEK increased.",
  [("event", "Dehydrolysis", ["Ras-GDP"])]),
 ("sde_dehyd4", "TestTemplaticSimpleDeEvents.scala:123",
  "Its many abnormal phenotypes can be rescued via Pde2, which specifically dehydrolyzes Ras-GDP.",
  [("event", "Dehydrolysis", ["Ras-GDP"])]),
 ("sde_dehyd5", "TestTemplaticSimpleDeEvents.scala:128",
  "Pde2, which has been found to dehydrolyze Ras-GDP, activates MEK.",
  [("event", "Dehydrolysis", ["Ras-GDP"])]),
 # ---- TestDeModifications head ----
 ("demod_s1", "TestDeModifications.scala:676",
  "The dephosphorylated AKT binds to ASPP2.",
  [("count", "Dephosphorylation", 0), ("event", "Binding", ["AKT", "ASPP2"]),
   ("ptm", "AKT", "Dephosphorylation")]),
 ("demod_s1b", "TestDeModifications.scala:677",
  "The deubiquitinated AKT binds to ASPP2.",
  [("count", "Deubiquitination", 0), ("event", "Binding", ["AKT", "ASPP2"]),
   ("ptm", "AKT", "Deubiquitination")]),
 ("demod_s4", "TestDeModifications.scala:720",
  "Dephosphorylated Mek binds to GTP.",
  [("count", "Dephosphorylation", 0), ("event", "Binding", ["Mek", "GTP"])]),
 ("demod_s5", "TestDeModifications.scala:727",
  "Ligation of ASPP2 to dehydroxylated RAS-GTP promotes apoptosis.",
  [("count", "Dehydroxylation", 0)]),
 ("demod_s6", "TestDeModifications.scala:734",
  "Optineurin regulates NF-kappaB activation by mediating interaction of CYLD with deubiquitinated RIP.",
  [("count", "Deubiquitination", 0)]),
 ("demod_s7", "TestDeModifications.scala:741",
  "The deubiquitinated Ras protein dephosphorylates AKT.",
  [("ptm", "Ras", "Deubiquitination"),
   ("event", "Dephosphorylation", ["AKT"]),
   ("posreg", "Ras", "Dephosphorylation", ["AKT"])]),
 # ---- TestModelEntities ----
 ("mdl_s1", "TestModelEntities.scala:17", "BRAF, EGF, EGFR, and GRB2 are proteins.",
  [("entcount", "Gene_or_gene_product", 4)]),
 ("mdl_s2", "TestModelEntities.scala:18", "HRAS, KRAS, NRAS, and NF1 are proteins.",
  [("entcount", "Gene_or_gene_product", 4)]),
 ("mdl_s2a", "TestModelEntities.scala:19", "H-RAS, K-RAS, N-RAS, and B-Raf are proteins.",
  [("entcount", "Gene_or_gene_product", 4)]),
 ("mdl_s3", "TestModelEntities.scala:20", "MAPK1, MAPK3, MEK1, and MEK2 are proteins.",
  [("entcount", "Gene_or_gene_product", 4)]),
 ("mdl_s4", "TestModelEntities.scala:21", "RASA1, RASA2, RASA3, and SOS1 are proteins.",
  [("entcount", "Gene_or_gene_product", 4)]),
 ("mdl_s5", "TestModelEntities.scala:22", "p110alpha, p110beta, and p110delta are proteins.",
  [("entcount", "Gene_or_gene_product", 3)]),
 ("mdl_s6", "TestModelEntities.scala:23", "p55gamma, p85alpha, and p85beta are proteins.",
  [("entcount", "Gene_or_gene_product", 3)]),
 ("mdl_s7", "TestModelEntities.scala:24", "SAPK is a family.",
  [("entcount", "Family", 1)]),
 # ---- TestOverrides ----
 ("ovr_ggp4", "TestOverrides.scala:25", "MAP2K2, MAZ, MEK1, MEK2, MEK3, MEK4 are GGPs.",
  [("entcount", "Gene_or_gene_product", 6)]),
 ("ovr_ggp5", "TestOverrides.scala:26", "MEK5, MEK6, MEK7, and NRAS are GGPs.",
  [("entcount", "Gene_or_gene_product", 4)]),
 ("ovr_ggp6", "TestOverrides.scala:27", "p53, RAC1, RhoA, ROCK1, and SAF-1 GGPs.",
  [("entcount", "Gene_or_gene_product", 5)]),
 ("ovr_estros", "TestOverrides.scala:137", "Estrone E1 and estradiol E2 do not cause cancer.",
  [("entcount", "Simple_chemical", 4)]),
 # ---- diacylglycerol alias cases ----
 ("al_s49a", "TestCoreference.scala:679",
  "Diacylglycerol (hereafter referred to as DAG) functions as a second messenger signaling lipid.",
  [("entcount", "Simple_chemical", 2), ("same_canonical", "Diacylglycerol", "DAG")]),
 ("al_s49b", "TestCoreference.scala:687",
  "DAG (hereafter referred to as diacylglycerol) functions as a second messenger signaling lipid.",
  [("entcount", "Simple_chemical", 2), ("same_canonical", "DAG", "diacylglycerol")]),
 ("al_s52", "TestCoreference.scala:694",
  "Diacylglycerol, sometimes called DAG, functions as a second messenger signaling lipid.",
  [("entcount", "Simple_chemical", 2), ("same_canonical", "Diacylglycerol", "DAG")]),
 ("al_s53", "TestCoreference.scala:701",
  "Diacylglycerol (alias DAG) functions as a second messenger signaling lipid.",
  [("entcount", "Simple_chemical", 2), ("same_canonical", "Diacylglycerol", "DAG")]),
 # ---- TestCoreference sent9, sent20 ----
 ("coref_s9", "TestCoreference.scala:89",
  "Much work has been done on ASPP2. It is known that BEF binds it.",
  [("count", "ComplexEvent", 0), ("event", "Binding", ["BEF", "ASPP2"])]),
 ("coref_s20b", "TestCoreference.scala:215",
  "We also monitored how siRNA-induced loss of LMTK2 influenced phosphorylation of PP1Cthr320. Four days after treatment with LMTK2 siRNA, lysates were probed with phospho-PP1Cthr320 antibody.",
  [("!posact", "LMTK2", "LMTK2")]),
])
