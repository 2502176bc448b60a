"""Static resources: taxonomy, trigger lexicons, entity dictionaries, mini-KB.

All of these are broadcast-side data (SURVEY.md §1.3-§1.4): the taxonomy is a
label lattice (reference: biogrammar/taxonomy.yml), trigger lexicons come from
the event grammar templates (reference: biogrammar/events_master.yml:5-7 and
the per-event templates), and the KB mirrors the TSV knowledge-base shape of
grounding/TsvIMKBFactory.scala:34-53. Everything here is derived from the
reference's *behavior* and public biology naming conventions — no reference
code is copied.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

# ---------------------------------------------------------------------------
# Taxonomy (single-inheritance label lattice, reference biogrammar/taxonomy.yml)
# A mention's `labels` column is the hypernym closure of its `label`;
# `matches(X)` == array_contains(labels, X)  (SURVEY.md §1.4).
# ---------------------------------------------------------------------------

_TAXONOMY_PARENT: dict[str, str | None] = {
    "Alias": None,
    "ModificationTrigger": None,
    "Site": None,
    "Context": None,
    "Species": "Context",
    "CellLine": "Context",
    "Organ": "Context",
    "CellType": "Context",
    "Cellular_component": "Context",
    "TissueType": "Context",
    "Modification": None,
    "PTM": "Modification",
    "Mutant": "Modification",
    "EventSite": "Modification",
    "Negation": "Modification",
    "PossibleController": None,
    "Event": "PossibleController",
    "SimpleEvent": "Event",
    "Binding": "SimpleEvent",
    "Conversion": "SimpleEvent",
    "Generic_event": "SimpleEvent",
    "Translocation": "SimpleEvent",
    "Amount": "SimpleEvent",
    "IncreaseAmount": "Amount",
    "Transcription": "IncreaseAmount",
    "Secretion": "IncreaseAmount",
    "DecreaseAmount": "Amount",
    "AdditionEvent": "SimpleEvent",
    "RemovalEvent": "SimpleEvent",
    "ComplexEvent": "Event",
    "Regulation": "ComplexEvent",
    "Positive_regulation": "Regulation",
    "Negative_regulation": "Regulation",
    "ActivationEvent": "ComplexEvent",
    "Positive_activation": "ActivationEvent",
    "Negative_activation": "ActivationEvent",
    "Entity": "PossibleController",
    "BioEntity": "Entity",
    "Disease": "BioEntity",
    "BioProcess": "BioEntity",
    "BioChemicalEntity": "BioEntity",
    "Generic_entity": "BioChemicalEntity",
    "Simple_chemical": "BioChemicalEntity",
    "Equivalable": "BioChemicalEntity",
    "Family": "Equivalable",
    "MacroMolecule": "Equivalable",
    "Protein": "MacroMolecule",
    "Gene_or_gene_product": "MacroMolecule",
    "Complex": "MacroMolecule",
    "GENE": "MacroMolecule",
}

_ADDITION_EVENTS = [
    "Acetylation", "Farnesylation", "Glycosylation", "Hydrolysis",
    "Hydroxylation", "Methylation", "Phosphorylation", "Ribosylation",
    "Sumoylation", "Ubiquitination",
]
for _e in _ADDITION_EVENTS:
    _TAXONOMY_PARENT[_e] = "AdditionEvent"
    _TAXONOMY_PARENT["De" + _e.lower()] = "RemovalEvent"
_TAXONOMY_PARENT["AutoPhosphorylation"] = "Phosphorylation"


@lru_cache(maxsize=None)
def label_closure(label: str) -> tuple[str, ...]:
    """Hypernym closure (label first) — the mention `labels` array."""
    out = []
    cur: str | None = label
    while cur is not None:
        out.append(cur)
        cur = _TAXONOMY_PARENT.get(cur)
    return tuple(out)


def matches(labels: list[str] | tuple[str, ...], label: str) -> bool:
    return label in labels


# ---------------------------------------------------------------------------
# Trigger lexicons (reference events_master.yml:5-7, templates under
# biogrammar/events/*). Stored as stem lists; matching is prefix-on-lemma.
# ---------------------------------------------------------------------------

# positive / negative regulation-and-activation trigger lexicons and the
# binding/translocation/transcription/degradation/conversion family
# vocabularies are DATA: loaded below from rules/complex_events.yml (the
# analog of events_master.yml:3-15 vars + per-family grammar imports).
# Python-side assignment happens in _install_complex_event_rules().


def _load_rule_yaml(name: str, path: str | None = None) -> dict:
    """Read a rules/*.yml file through pkgutil so it loads identically
    from a checkout AND from reach_spark.zip under spark-submit
    --py-files (plain open() cannot read inside a zipimport package)."""
    import yaml
    if path is None:
        import pkgutil
        raw = pkgutil.get_data(__package__ or "reach_spark",
                               f"rules/{name}")
        return yaml.safe_load(raw)
    with open(path) as f:
        return yaml.safe_load(f)


def load_complex_event_rules(path: str | None = None) -> dict:
    """Parse rules/complex_events.yml → {regulation: {...}, families:
    {...}} with every list normalized to a tuple of lowered strings."""
    doc = _load_rule_yaml("complex_events.yml", path)

    def tup(seq):
        return tuple(str(s).lower() for s in seq)

    reg = {k: tup(v) for k, v in doc["regulation"].items()}
    fams = {name: {k: tup(v) for k, v in spec.items()}
            for name, spec in doc["families"].items()}
    return {"regulation": reg, "families": fams}


def _install_complex_event_rules(rules: dict) -> None:
    """Bind the loaded rule data to the module-level lexicon names the
    cascade consumes, and drop the extractor's per-token memo caches that
    derive from them (runtime re-registration support)."""
    g = globals()
    reg = rules["regulation"]
    g["POS_TRIGGER_STEMS"] = reg["posTriggerStems"]
    g["NEG_TRIGGER_STEMS"] = reg["negTriggerStems"]
    g["POS_NOUN_WRAPPERS"] = reg["posNounWrappers"]
    g["NEG_NOUN_WRAPPERS"] = reg["negNounWrappers"]
    g["POS_AGENT_NOUNS"] = reg["posAgentNouns"]
    g["NEG_AGENT_NOUNS"] = reg["negAgentNouns"]
    fams = rules["families"]
    g["BINDING_VERB_STEMS"] = fams["Binding"]["verbalStems"]
    g["BINDING_NOUNS"] = fams["Binding"]["nominalTriggers"]
    g["TRANSLOCATION_STEMS"] = fams["Translocation"]["verbalStems"]
    g["TRANSCRIPTION_STEMS"] = fams["Transcription"]["verbalStems"]
    g["DEGRADATION_STEMS"] = fams["Degradation"]["verbalStems"]
    g["CONVERSION_STEMS"] = fams["Conversion"]["verbalStems"]
    import sys
    extract = sys.modules.get("reach_spark.extract")
    # invalidate stem-derived memo caches; getattr-guarded because during
    # the initial circular import (extract → resources) the extract module
    # exists in sys.modules but its caches are not defined yet (and there
    # is nothing to invalidate then)
    for cache_name in ("_sign_of_stem", "_is_binding_verb",
                       "_match_trigger_cached", "_ptm_participle_label",
                       # pass-level token gates are derived from the same
                       # lexicons (union-of-branch-guards memos)
                       "_reg_token_gate", "_conv_token_gate",
                       "_binding_token_gate"):
        fn = getattr(extract, cache_name, None)
        if fn is not None:
            fn.cache_clear()


_COMPLEX_EVENT_RULES = load_complex_event_rules()
_install_complex_event_rules(_COMPLEX_EVENT_RULES)


def register_trigger_stems(kind: str, stems: list[str]) -> None:
    """Runtime extension of a complex-event lexicon as pure data — `kind`
    is a rules/complex_events.yml key path: 'posTriggerStems',
    'negTriggerStems', 'posNounWrappers', 'negNounWrappers',
    'posAgentNouns', 'negAgentNouns', or '<Family>.verbalStems' /
    '<Family>.nominalTriggers' (e.g. 'Binding.verbalStems')."""
    rules = _COMPLEX_EVENT_RULES
    add = tuple(s.lower() for s in stems)
    if "." in kind:
        fam, key = kind.split(".", 1)
        spec = rules["families"][fam]
        spec[key] = tuple(dict.fromkeys(spec[key] + add))
    else:
        reg = rules["regulation"]
        reg[kind] = tuple(dict.fromkeys(reg[kind] + add))
    _install_complex_event_rules(rules)


def unregister_trigger_stems(kind: str, stems: list[str]) -> None:
    rules = _COMPLEX_EVENT_RULES
    drop = {s.lower() for s in stems}
    if "." in kind:
        fam, key = kind.split(".", 1)
        spec = rules["families"][fam]
        spec[key] = tuple(s for s in spec[key] if s not in drop)
    else:
        reg = rules["regulation"]
        reg[kind] = tuple(s for s in reg[kind] if s not in drop)
    _install_complex_event_rules(rules)

# simple-event (PTM) verb/noun stems: event label -> (verb stem, noun stem)
# ---------------------------------------------------------------------------
# [O5] Data-driven simple-event rules: the families are DATA, loaded from
# reach_spark/rules/simple_events.yml — the analog of the reference's Odin
# master-file template instantiation (events_master.yml:60-180 instantiates
# simple-event_template.yml once per family with vars; loader
# RuleReader.scala:12-53). Adding an event family is a YAML edit or a
# register_event_family() call — no code change.
# ---------------------------------------------------------------------------

def load_simple_event_rules(path: str | None = None
                            ) -> tuple[dict[str, tuple[str, str]],
                                       dict[str, str]]:
    """Parse the declarative rule file → (stems, ptm_suffixes).

    stems:  eventName -> (verbal trigger stem, nominal trigger stem)
    ptm_suffixes: eventName (and its De- counterpart) -> Arizona-export
    output suffix (AssemblyExporter event-type abbreviations).

    The default file is read through pkgutil so it loads identically from
    a checkout AND from reach_spark.zip under spark-submit --py-files
    (plain open() cannot read inside a zipimport package)."""
    doc = _load_rule_yaml("simple_events.yml", path)
    stems: dict[str, tuple[str, str]] = {}
    suffixes: dict[str, str] = {}
    alts: dict[str, str] = {}
    for rule in doc["rules"]:
        v = rule["vars"]
        name = v["eventName"]
        stems[name] = (v["verbalTriggerStem"], v["nominalTriggerStem"])
        sfx = v.get("ptmSuffix")
        if sfx:
            suffixes[name] = sfx
            # De-events derive mechanically: Dephosphorylation -> dephos
            suffixes["De" + name.lower()] = "de" + sfx
        # alias spellings (the reference writes these as lemma-regex
        # alternations, e.g. ubiquit(in|yl)ate, events_master.yml:93):
        # alias stem substring -> canonical stem, normalized on the
        # lowered token before trigger matching
        alts.update(v.get("altStems") or {})
    return stems, suffixes, alts


SIMPLE_EVENT_STEMS, PTM_SUFFIXES, ALT_TRIGGER_STEMS = \
    load_simple_event_rules()


def register_event_family(event_name: str, verbal_stem: str,
                          nominal_stem: str,
                          ptm_suffix: str | None = None) -> None:
    """Runtime registration of a NEW simple-event family (the user-facing
    half of O5): extends the trigger tables and invalidates the extractor's
    per-token trigger memo so the cascade picks the family up immediately.
    Sentence-local semantics (verbal/nominal/passive/De-/auto- forms, PTM
    modifiers, regulations over the event) all follow from the stems."""
    SIMPLE_EVENT_STEMS[event_name] = (verbal_stem, nominal_stem)
    if ptm_suffix:
        PTM_SUFFIXES[event_name] = ptm_suffix
        PTM_SUFFIXES["De" + event_name.lower()] = "de" + ptm_suffix
    from . import extract
    extract._match_trigger_cached.cache_clear()


def unregister_event_family(event_name: str) -> None:
    SIMPLE_EVENT_STEMS.pop(event_name, None)
    PTM_SUFFIXES.pop(event_name, None)
    PTM_SUFFIXES.pop("De" + event_name.lower(), None)
    from . import extract
    extract._match_trigger_cached.cache_clear()

# BINDING_VERB_STEMS / BINDING_NOUNS / TRANSLOCATION_STEMS /
# TRANSCRIPTION_STEMS / DEGRADATION_STEMS / CONVERSION_STEMS are loaded
# from rules/complex_events.yml by _install_complex_event_rules above.

# entity labels that denote context, never PTM-event themes
# (taxonomy.yml: context branch vs BioChemicalEntity branch)
CONTEXT_ENTITY_LABELS = frozenset({
    "Cellular_component", "Species", "Organ", "CellLine", "CellType",
    "TissueType"})

# Single-token surface forms never marked as entities when lowercase —
# common-English collisions with KB synonyms (mechanism mirror of the
# reference ner_stoplist, bioresources/.../kb/ner_stoplist.txt; entries are
# our own, covering the same collision classes)
NER_STOPLIST = frozenset(
    "acid alpha beta cell cells damage face fact fast fate gamma light "
    "major minor not via anti arm blot bite white young lobe killer "
    "top tip task rod mask pool".split())

# negation cues (reference darpa/NegationHandler.scala:10-112)
NEGATION_SINGLE = ("not", "no", "neither", "nor", "without", "unable",
                   "fail", "fails", "failed", "failure", "cannot", "never",
                   "absent", "absence", "lack", "lacks", "lacking")
NEGATION_BIGRAMS = (("play", "no"), ("is", "not"), ("was", "not"),
                    ("be", "insufficient"), ("are", "not"), ("does", "not"),
                    ("did", "not"), ("do", "not"))

# hypothesis cues (reference darpa/HypothesisHandler.scala:16-43)
HYPOTHESIS_CUES = ("hints", "hint", "hinted", "indicates", "indicate",
                   "indicated",
                   "hypothesize", "hypothesized", "hypothesis", "whether",
                   "may", "might", "possibly", "possible", "suggest",
                   "suggests", "suggested", "propose", "proposed", "test",
                   "tested", "investigate", "investigated", "examine",
                   "examined", "address", "addressed", "ask", "asked",
                   "speculate", "speculated", "predict", "predicted",
                   "putative", "perhaps", "likely", "unclear", "unknown")

# regulation-type keywords (reference darpa/RegulationHandler.scala:19-172)
REGTYPE_KEYWORDS = {
    "KDtrigger": ("knockdown", "knock-down", "sirna", "shrna", "silencing"),
    "KOtrigger": ("knockout", "knock-out", "deletion", "-/-"),
    "DNtrigger": ("dominant-negative", "dominant negative"),
    "OEtrigger": ("overexpression", "overexpressing", "overexpressed"),
    "CHEMtrigger": ("inhibitor", "agonist", "antagonist", "treatment",
                    "treated"),
}

# amino-acid names for Site detection (public biochemistry nomenclature)
AMINO_ACIDS = {
    "alanine": "A", "arginine": "R", "asparagine": "N", "aspartate": "D",
    "cysteine": "C", "glutamine": "Q", "glutamate": "E", "glycine": "G",
    "histidine": "H", "isoleucine": "I", "leucine": "L", "lysine": "K",
    "methionine": "M", "phenylalanine": "F", "proline": "P", "serine": "S",
    "threonine": "T", "tryptophan": "W", "tyrosine": "Y", "valine": "V",
}
AA_SHORT = {"ala": "A", "arg": "R", "asn": "N", "asp": "D", "cys": "C",
            "gln": "Q", "glu": "E", "gly": "G", "his": "H", "ile": "I",
            "leu": "L", "lys": "K", "met": "M", "phe": "F", "pro": "P",
            "ser": "S", "thr": "T", "trp": "W", "tyr": "Y", "val": "V"}

# pronouns handled by the coref pronominalMatch sieve
# (reference darpa/DarpaLinks.scala:171-260)
PRONOUNS_SINGULAR = ("it", "its", "this", "that")
PRONOUNS_PLURAL = ("they", "them", "their", "these", "those", "both")

# generic NP heads for nounPhraseMatch ("the protein", "this enzyme")
GENERIC_NP_HEADS = ("protein", "proteins", "gene", "genes", "enzyme",
                    "enzymes", "kinase", "kinases", "molecule", "molecules",
                    "receptor", "receptors", "factor", "factors", "complex")

# ---------------------------------------------------------------------------
# Entity dictionary (the rule/lexicon-NER workhorse, SURVEY §2.2 N6) and
# mini-KB (grounding target, SURVEY §2.6). Names cover every entity in the
# ported regression fixtures (FIXTURES.md §2) plus common aliases; IDs are
# deterministic placeholders in uniprot-like style.
# ---------------------------------------------------------------------------

_GGP_NAMES = [
    "Ras", "RAS", "K-Ras", "KRAS", "H-Ras", "HRAS", "N-Ras", "NRAS",
    "MAPK", "MAPK1", "MAPK3", "MAPK14", "ASPP1", "ASPP2", "AKT", "AKT1",
    "AKT2", "MEK", "MEK1", "MEK2", "ERK", "ERK1", "ERK2", "JAK3", "JAK2",
    "HuR", "EGFR", "ERBB3", "HER2", "ERBB2", "PI3K", "PI3KC2Beta",
    "PI3KC2beta", "Raf", "RAF1", "B-Raf", "BRAF", "optineurin", "OPTN",
    "p53", "TP53", "NF-kappaB", "p65", "RelA", "CREB", "mTOR", "PTEN",
    "STAT3", "SMAD2", "SMAD3", "SMAD4", "TGFBR2", "GSK3", "GSK3beta",
    "IGF-1R", "IRS-1", "Sos", "SOS1", "Grb2", "SHC", "cortactin", "CTTN",
    "Gab1", "PIK3CA", "S6K", "S6K1", "4E-BP1", "4EBP1", "EIF4EBP1",
    "eIF4E", "Bcl-2", "Bax",
    "caspase-3", "PARP", "Rho", "RhoA", "Rac1", "Cdc42", "PKC", "PKA",
    "CaMKII", "cyclin D1", "CDK4", "CDK6", "Rb", "E2F1", "Myc", "c-Myc",
    "Jun", "c-Jun", "Fos", "c-Fos", "ATF2", "Elk-1", "beta-catenin",
    "E-cadherin", "vimentin", "Snail", "Slug", "Twist", "ZEB1", "trypsin",
    "insulin", "EGF", "TGF-beta", "TNF-alpha", "IL-6", "VEGF", "HIF-1alpha",
    "p38", "JNK", "JNK1", "IKK", "IkB", "IkBalpha", "XIAP", "Mdm2", "MDM2",
    "p21", "p27", "FOXO1", "FOXO3", "BAD", "Bim", "Puma", "Noxa", "ASPP",
    "Pin1", "PP2A", "PP1", "SHP2", "Src", "Fyn", "Lck", "Abl", "BCR-ABL",
    "TWIST1", "SNAIL1", "FOXC2", "CD45", "cRaf", "CRAF", "BRaf",
    "deoxycytidine kinase", "PI3KC2β", "Pde2",
    "NRF2", "MCL-1", "Ets-1", "MMP-9", "neurofibromin", "BIM", "Kras",
    "ErbB3", "ERK-1", "HDAC", "SIRT1", "ASPP", "p100", "p105",
    "Ku70", "Ku80", "DNA-PK", "XRCC1", "IKKgamma", "MKP3", "C-RAF",
    "STAT1", "FGFR3", "RAD51", "phosphatidylinositol 3-kinase",
    "BS1", "BS2", "histone 2B", "PTPN13", "EphrinB1", "p300", "CBP",
    "PI-3", "HSP20", "Akta", "KIAA0771", "Pax6",
    # TestPolarity.scala entities
    "MEK1/2", "MKK4", "JNKK", "MKK3", "MAPKK6", "TAK1",
    "c-Jun N-terminal kinase", "p38 MAP kinase",
    "mammalian target of rapamycin", "mammalian target of rapamycin "
    "complex 1", "mTORC1", "Wip1", "TSC2", "TSC1", "Rheb",
    "lipoprotein lipase", "hormone sensitive lipase", "Trbl", "FoxO",
    "angiotensin converting enzyme", "neutral endopeptidase",
    "bradykinin", "ANP", "IRF4", "IRF5", "TLR",
    "IKKbeta", "MUC1-C", "Elk1", "Biliverdin reductase-A", "Skp2",
    "EGF receptor", "Hand2", "CDK5",
    # TestBindingEvents.scala entities
    "PLC", "Afadin", "Calmodulin", "Tubulin", "p32", "GST", "DNA-PKcs",
    "LigIII", "DNA polbeta", "DNA ligase IV", "AFT", "neuregulin", "NRG",
    # protein-fragments KB entries (TestEntities.scala:172-215; reference
    # bioresources protein fragment ontology)
    "p13 BID", "Abeta", "inactivated P-factor",
    "interleukin-1 alpha proteolytic cleavage product",
    "Non-structural protein 5", "preM",
    "SRC-3", "ER", "ERalpha", "GSK-3", "LRP5", "BEF", "LMTK2",
    "mutarotase", "GALM", "phosphoglucomutase", "phosphoglucomutases",
    "galactokinase", "galactose mutarotase", "UDP-galactose 4-epimerase",
    "ACE2", "PFK-1", "6-phosphofructo-1-kinase", "p85", "Shp2",
    # TestNERLabeling.scala:25 GGPs (+ "mast", a protein despite the
    # cell-line-looking name, TestNERLabeling.scala:51)
    "CK-40", "ZZANK2", "MCH-1R", "RAS1", "hemAT", "mast",
    "ADAM17", "Casp8", "ERK5", "GSK3alpha", "IGF-1", "MAP2K1", "JNK1",
    "Vascular endothelial cell growth inhibitor",
    # round-3 fixture tail (TestRegulationEvents sent59-64, TestBindingEvents
    # sent25-48, TestActivationEvents sent37-50, TestCoreference tail)
    "SRF", "TAZ", "AR", "Smad3LC", "Smad3C", "APC10", "RB1", "BCL2",
    "RARbeta2", "NF1", "TIAM1", "GAPDH", "RECK", "FGFR2", "IRP2", "TfR1",
    "FTH1", "c-FOS", "HOXB7", "UbiquitinC77", "UbiquitinG76C",
    # TestModelEntities (MITRE RAS model dictionary rows) + TestOverrides
    "RASA1", "RASA2", "RASA3", "p110alpha", "p110beta", "p110delta",
    "p55gamma", "p85alpha", "p85beta", "MAZ", "SAF-1", "ROCK1",
    "CYLD", "RIP",
]
_FAMILY_NAMES = ["Ras family", "MAPK family", "AKT family", "ERK family",
                 # TestNERLabeling.scala:23 (PFAM/InterPro-style names)
                 "CDC73_N", "RcsD-ABL domain", "zinc-ribbon domain",
                 "Rho_RNA_bind", "RasGAP_C", "zwf", "PTHR10856 : SF10",
                 "GLHYDRLASE27", "Ras guanyl-releasing protein 1",
                 "Jiraiya", "ERBB receptors",
                 "PI3K family", "STAT family", "caspase family",
                 "Rho family", "14-3-3", "E3 ubiquitin ligase",
                 # "SAPK is a family" (TestModelEntities.scala:24 s7 —
                 # stress-activated protein kinases, a Bioentities family)
                 "SAPK",
                 # Ras-binding domain (TestBindingEvents sent17: 'the RBD
                 # of PI3KC2β binds ... Ras' — Family + 3-arg binding)
                 "RBD"]
_CHEMICAL_NAMES = ["GTP", "GDP", "ATP", "ADP", "AMP", "cAMP", "NADPH",
                   "ubiquitin", "polyubiquitin", "rapamycin", "Rapamycin",
                   "diacylglycerol", "Diacylglycerol",
                   "wortmannin", "LY294002",
                   "U0126", "PD98059", "staurosporine", "calcium", "Ca2+",
                   "glucose", "phosphate", "32P", "E2",
                   "pyruvate", "lactate", "β-D-galactose", "α-D-galactose",
                   "glucose 1-phosphate", "glucose-1-phosphate",
                   "glucose-6-phosphate", "glucose 6-phosphate", "F-6-P",
                   "fructose-1,6-bisphosphate", "UDP-galactose",
                   "UDP-glucose", "D-glucose 1-phosphate",
                   "D-glucose 6-phosphate", "galactose 1-phosphate",
                   # both surface forms of the angiotensin peptides live
                   # HERE (not in the GGP list): the canonical key strips
                   # hyphens, so "angiotensin II"/"angiotensin-II" must
                   # share one label or one canonical grounds to two gids
                   "angiotensin-I", "angiotensin-II",
                   "angiotensin I", "angiotensin II",
                   # TestNERLabeling.scala:30 chemicals + :33 drugs
                   "endoxifen sulfate", "Juvamine", "Adenosine-phosphate",
                   "Xitix", "okadaic acid", "Alvocidib", "Anacardic acid",
                   "L-779450", "Masitinib", "Withaferin A",
                   # round-3 fixture tail
                   "GSH", "docetaxel", "DAG", "retinoic acid",
                   "vemurafenib", "vinblastine", "trichostatin A",
                   # TestOverrides estrogens (chemical overrides beat the
                   # Site shape pattern for E1/E2/E3)
                   "Estrone", "estradiol", "estriol", "E1", "E3"]
_BIOPROCESS_NAMES = ["apoptosis", "autophagy", "proliferation", "angiogenesis",
                     "transactivation", "cell cycle", "cell death",
                     "tumorigenesis", "metastasis", "differentiation",
                     # TestNERLabeling.scala:16 coverage names
                     "autophagic cell death", "quiescence", "hematopoiesis",
                     "complex assembly", "glycolysis",
                     "adenylate cyclase inhibitor",
                     # TestActivationEvents sent37 (bio_process.tsv rows)
                     "cell aging", "Cell aging"]
_SPECIES_NAMES = ["human", "mouse", "rat", "murine", "bovine", "yeast",
                  # TestNERLabeling.scala:31
                  "Potato", "wheat", "Yerba-mate", "Danio rerio", "Rats",
                  "Gallus gallus", "chickens", "mice",
                  "E. coli", "Drosophila", "zebrafish", "Xenopus"]
_ORGAN_NAMES = ["liver", "breast", "lung", "brain", "kidney", "pancreas",
                # TestNERLabeling.scala:29
                "Acetabulum", "Visceral Pericardium", "malleolar bone",
                "Vena cava sinus", "zygopodium", "cartilage",
                "colon", "prostate", "skin", "heart"]
_CELLLINE_NAMES = ["HeLa", "HEK293", "HEK293T", "MCF-7", "MCF7", "A549",
                   "U2OS", "NIH3T3", "COS-7", "Jurkat", "K562", "PC12",
                   # TestNERLabeling.scala:17
                   "MPanc-96", "Hyssop", "CEM/TART", "ZR75-1", "293T"]
_CELLTYPE_NAMES = ["fibroblast", "fibroblasts", "lymphocyte", "lymphocytes",
                   "macrophage", "macrophages", "neuron", "neurons",
                   "hepatocyte", "hepatocytes", "T cell", "T cells",
                   "B cell", "B cells", "epithelial cells", "keratinocytes",
                   # TestNERLabeling.scala:18-19 (singular + plural)
                   "apud cell", "apud cells", "AV nodal myocyte",
                   "AV nodal myocytes", "An1 B Cell", "An1 B Cells",
                   "xanthoblast", "xanthoblasts", "zygospore", "zygospores"]
_CELLCOMP_NAMES = ["nucleus", "cytoplasm", "cytosol", "membrane",
                   # TestNERLabeling.scala:21 (UniProt/GO subcellular)
                   "A bands", "C zones", "F bouton", "H zones", "I bands",
                   "Z lines", "CVT vesicles", "telomeres", "Symplasts",
                   "Host periplasms",
                   "plasma membrane", "nuclear membrane",
                   "mitochondria", "mitochondrion",
                   "endoplasmic reticulum", "Golgi", "lysosome", "endosome",
                   "chromatin", "ribosome"]

ENTITY_DICT_LABELS: dict[str, list[str]] = {
    "Gene_or_gene_product": _GGP_NAMES,
    "Family": _FAMILY_NAMES,
    "Simple_chemical": _CHEMICAL_NAMES,
    "BioProcess": _BIOPROCESS_NAMES,
    "Species": _SPECIES_NAMES,
    "Organ": _ORGAN_NAMES,
    "CellLine": _CELLLINE_NAMES,
    "CellType": _CELLTYPE_NAMES,
    "Cellular_component": _CELLCOMP_NAMES,
}

# canonical-group map: surface aliases that share a grounding id
# (the TestGrounding.scala:12-47 contract: "p65" == "NF-kappaB p65")
# variants are canonical_key forms (spaces/hyphens already stripped)
_CANON_GROUPS: dict[str, list[str]] = {
    # kras/hras/nras are distinct genes with distinct UniProt accessions
    # (TestOverrides.scala:40-41 ggp7) — one canonical group each; generic
    # "Ras" stays its own group with a synthetic (non-authoritative) id
    "KRAS": ["kras"],
    "HRAS": ["hras"],
    "NRAS": ["nras"],
    "RAS": ["ras"],
    "MAPK1": ["mapk1", "erk2"],
    "ERK1": ["erk1", "mapk3"],
    "AKT1": ["akt1"],
    "RELA": ["p65", "rela", "nfkappabp65"],
    "ERBB2": ["her2", "erbb2"],
    # "DAG" and "diacylglycerol" share one ChEBI grounding
    # (TestCoreference.scala:679-717 sent49-54)
    "DAG": ["dag", "diacylglycerol"],
    "OPTN": ["optineurin", "optn"],
    "TP53": ["p53", "tp53"],
    "RAF1": ["raf", "raf1", "craf"],
    "BRAF": ["braf"],
    "MYC": ["myc", "cmyc"],
    "JUN": ["jun", "cjun"],
    "FOS": ["fos", "cfos"],
    "CTTN": ["cortactin", "cttn"],
    "MTOR": ["mtor"],
}

# Authoritative UniProt accessions for override names (mirror of the
# reference NER-Grounding-Override KB checked by TestOverrides.scala:22-40;
# accessions are public UniProt facts). Keyed by canonical group id.
_UNIPROT_OVERRIDES: dict[str, str] = {
    "ADAM17": "P78536", "AKT1": "P31749", "AKT2": "P31751",
    "ASPP1": "Q96KQ4", "ASPP2": "Q13625", "CASP8": "Q14790",
    "EGF": "P01133", "EGFR": "P00533", "ERK5": "Q13164",
    "GSK3BETA": "P49841", "KRAS": "P01116", "HRAS": "P01112",
    "NRAS": "P01111", "IGF1": "P05019",
    "JNK1": "P45983", "MAP2K1": "Q02750", "TP53": "P04637",
    "MEK": "Q02750", "RAF1": "P04049", "BRAF": "P15056",
    "MAPK1": "P28482", "ERK1": "P27361", "RELA": "Q04206",
    "MTOR": "P42345", "PTEN": "P60484", "STAT3": "P40763",
    "MDM2": "Q00987", "ERBB2": "P04626", "ERBB3": "P21860",
    "MYC": "P01106", "JUN": "P05412", "FOS": "P01100",
}

_NS_FOR_LABEL = {
    "Gene_or_gene_product": "uniprot",
    "Family": "pfam",
    "Simple_chemical": "pubchem",
    "BioProcess": "go",
    "Species": "taxonomy",
    "Organ": "uberon",
    "CellLine": "cellosaurus",
    "CellType": "cl",
    "Cellular_component": "go",
}
_KB_PRIORITY = {ns: i for i, ns in enumerate(
    ["uniprot", "pfam", "pubchem", "go", "taxonomy", "uberon",
     "cellosaurus", "cl"], start=1)}


def _stable_id(ns: str, key: str) -> str:
    h = hashlib.sha1(f"{ns}:{key}".encode()).hexdigest()[:6].upper()
    return {"uniprot": "P", "pfam": "PF", "pubchem": "CID", "go": "GO:",
            "taxonomy": "TX", "uberon": "UBERON:", "cellosaurus": "CVCL_",
            "cl": "CL:"}.get(ns, "X") + h


def canonical_key(text: str) -> str:
    """Canonical KB key (reference canonicalKey,
    grounding/ReachKBKeyTransforms.scala:20-40): lower, then strip spaces,
    hyphens, slashes, periods and quotes — 'A-B and/or C' → 'abandorc',
    'WO-MAN' → 'woman'; underscores are kept ('MAN_human' → 'man_human').
    Applied identically at KB load and lookup, so K-Ras/KRAS/kras unify."""
    t = text.lower().strip()
    for ch in "'\"/.- ":
        t = t.replace(ch, "")
    return t


def kb_rows() -> list[tuple[str, str, str, str, str, int, bool, bool]]:
    """(label, key, ns, id, species, kb_priority, is_protein_kb, is_family_kb)
    — the broadcast KB union table (SURVEY §1.3)."""
    canon_of: dict[str, str] = {}
    for gid, variants in _CANON_GROUPS.items():
        for v in variants:
            canon_of[v] = gid
    rows = []
    seen = set()
    special_species = {"human": "TX9606", "mouse": "TX10090", "rat": "TX10116"}
    for label, names in ENTITY_DICT_LABELS.items():
        ns = _NS_FOR_LABEL[label]
        for name in names:
            key = canonical_key(name)
            group = canon_of.get(key, key.upper().replace(" ", "_"))
            if label == "Species" and name in special_species:
                kid = special_species[name]
            elif ns == "uniprot" and group in _UNIPROT_OVERRIDES:
                kid = _UNIPROT_OVERRIDES[group]
            else:
                kid = _stable_id(ns, group)
            species = "human" if ns == "uniprot" else ""
            row = (label, key, ns, kid, species, _KB_PRIORITY[ns],
                   ns == "uniprot", ns == "pfam")
            if (label, key) not in seen:
                seen.add((label, key))
                rows.append(row)
    return rows


class EntityDict(dict):
    """NER dictionary + its multi-word first-token index: the longest-match
    scanner probes n-grams (n>1) only at tokens that START some multi-word
    entry, which drops the per-token probe count from max_ngram joins to
    one set lookup — the property that keeps the scan flat when the
    dictionary grows to bioresources scale.

    The index is computed lazily so it survives the pickle boundary into
    mapInPandas workers (dict-subclass pickling restores items but not
    slot state — each worker process rebuilds the frozenset once)."""

    __slots__ = ("_fw",)

    @property
    def first_words(self) -> frozenset:
        fw = getattr(self, "_fw", None)
        if fw is None:
            fw = frozenset(k.split(" ", 1)[0] for k in self if " " in k)
            self._fw = fw
        return fw


# abbreviation surfaces that canonicalize to their expansion at dictionary
# level (the reference grounds both surfaces to one ChEBI/UniProt id):
# "DAG" == "diacylglycerol" (TestCoreference.scala:679-717)
_CANONICAL_ALIASES = {"dag": "diacylglycerol"}


def entity_dictionary() -> EntityDict:
    """key (lowercased, possibly multi-word) -> (label, canonical key).

    The broadcast longest-match dictionary for rule NER (reference
    processors/.../ner/KBLoader.scala:51-67). Keys are token-joined lowercase.
    """
    d: dict[str, tuple[str, ...]] = {}
    for label, names in ENTITY_DICT_LABELS.items():
        for name in names:
            canon = canonical_key(name)
            d[name.lower()] = (label, _CANONICAL_ALIASES.get(canon, canon))
    return EntityDict(d)
