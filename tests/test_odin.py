"""[O1] Token-pattern compiler semantics — patterns shaped like the
reference's `biogrammar/entities/entities.yml` / `mutants.yml` token rules
(Odin TokenPattern surface syntax) against hand-checked sentences."""

from reach_spark.odin import TokenRule, TokenRuleEngine, _compile_pattern, _run


def F(words, **extra):
    """Build per-token field dicts from parallel arrays."""
    n = len(words)
    rows = []
    for i in range(n):
        row = {"word": words[i]}
        for k, arr in extra.items():
            row[k] = arr[i]
        rows.append(row)
    return rows


def matches(pattern, fields):
    prog, start = _compile_pattern(pattern)
    n = len(fields)
    out = []
    for s in range(n):
        e = _run(prog, start, fields, s, n)
        if e is not None and e > s:
            out.append((s, e))
    return out


def test_single_token_regex():
    f = F(["MEK", "phosphorylates", "ASPP2"])
    assert matches("[word=/(?i)^mek$/]", f) == [(0, 1)]
    assert matches("/ASPP/", f) == [(2, 3)]          # partial-match semantics


def test_string_literal_and_sequence():
    f = F(["the", "RBD", "domain"])
    assert matches('"RBD"', f) == [(1, 2)]
    assert matches('"RBD" "domain"', f) == [(1, 3)]
    assert matches('"rbd"', f) == []                 # literals are exact


def test_optional_quantifier_longest_match():
    # site_long shape: aa-name + acid? + residue? + number?
    pat = ('[word=/(?i)^(serine|threonine)$/] [word=/(?i)^residue$/]? '
           '[word=/^\\d+$/]?')
    assert matches(pat, F(["serine", "residue", "312"])) == [(0, 3)]
    assert matches(pat, F(["serine", "312"])) == [(0, 2)]
    assert matches(pat, F(["serine", "binds"])) == [(0, 1)]


def test_star_plus_and_range_quantifiers():
    f = F(["A", "A", "A", "B"])
    assert matches('"A"+', f) == [(0, 3), (1, 3), (2, 3)]
    assert matches('"A"{2}', f) == [(0, 2), (1, 2 + 1)]
    assert matches('"A"{1,2} "B"', f) == [(1, 4), (2, 4)]
    assert matches('"B" "A"*', f) == [(3, 4)]


def test_alternation_groups():
    f = F(["Ser", "-", "312"])
    pat = '([word=/^(Ser|Thr)$/] | [word=/^(Tyr)$/]) "-"? [word=/^\\d+$/]'
    assert matches(pat, f) == [(0, 3)]


def test_negative_lookbehind_figure_guard():
    # site_1letter_a: (?<! [word=/(?i)^(table|figure|delta)/]) [word=/^[STY]\d+$/]
    pat = ('(?<! [word=/(?i)^(table|figure|delta)/]) '
           '[word=/(?i)^[ACDEFGHIKLMNQRSTVWY]\\d+$/]')
    assert matches(pat, F(["phosphorylated", "S31"])) == [(1, 2)]
    assert matches(pat, F(["Figure", "S31"])) == []
    assert matches(pat, F(["S31"])) == [(0, 1)]      # sentence start passes


def test_negative_lookahead():
    # site_3letter: [word=/^(Ser|...)\-?\d+$/] (?! [lemma=mutant])
    pat = '[word=/(?i)^(Ser|Thr|Tyr)\\-?\\d+$/] (?! [lemma=mutant])'
    f = F(["Ser785", "mutant"], lemma=["ser785", "mutant"])
    assert matches(pat, f) == []
    f2 = F(["Ser785", "binds"], lemma=["ser785", "bind"])
    assert matches(pat, f2) == [(0, 1)]


def test_positive_lookbehind_site_number():
    # site_number: (?<= [word=/(?i)^site$/]) [word=/^\d+$/]
    pat = '(?<= [word=/(?i)^site$/]) [word=/^\\d+$/]'
    assert matches(pat, F(["on", "site", "853"])) == [(2, 3)]
    assert matches(pat, F(["on", "page", "853"])) == []


def test_multi_token_lookbehind():
    pat = '(?<= "in" "the") [word=/^nucleus$/]'
    assert matches(pat, F(["in", "the", "nucleus"])) == [(2, 3)]
    assert matches(pat, F(["the", "nucleus"])) == []


def test_constraint_conjunction_negation_mention_field():
    # [word=/^\d+[STY]$/ & !mention=/^(Family|Gene_or_gene_product)$/]
    pat = ('[word=/(?i)^\\d+[ACDEFGHIKLMNQRSTVWY]$/ '
           '& !mention=/^(Family|Gene_or_gene_product)$/]')
    f = F(["14C"], mention=[{"Gene_or_gene_product"}])
    assert matches(pat, f) == []
    f2 = F(["14C"], mention=[set()])
    assert matches(pat, f2) == [(0, 1)]


def test_constraint_disjunction():
    pat = "[word=alpha | word=beta]"
    f = F(["alpha", "gamma", "beta"])
    assert matches(pat, f) == [(0, 1), (2, 3)]


def test_site_fragment_rule_shape():
    # ("(" | "-LRB-") /^\d+-\d+$/ (")" | "-RRB-") "fragment"
    pat = '("(" | "-LRB-") /^\\d+-\\d+$/ (")" | "-RRB-") "fragment"'
    f = F(["ASPP2", "(", "693-1128", ")", "fragment"])
    assert matches(pat, f) == [(1, 5)]


def test_engine_file_order_and_claiming():
    r1 = TokenRule(name="two", label="Site",
                   pattern_src='[word=/^(Ser|Thr)$/] [word=/^\\d+$/]')
    r2 = TokenRule(name="one", label="Site", pattern_src='[word=/^\\d+$/]')
    eng = TokenRuleEngine([r1, r2])
    f = F(["Ser", "312", "and", "99"])
    hits = [(r.name, s, e) for r, s, e in eng.match_sentence(f)]
    # r1 claims 0-2, so r2 only fires on the unclaimed 99
    assert hits == [("two", 0, 2), ("one", 3, 4)]


def test_nonconsuming_rule_overlaps():
    r1 = TokenRule(name="two", label="Site",
                   pattern_src='[word=/^(Ser)$/] [word=/^\\d+$/]')
    r2 = TokenRule(name="one", label="Site", pattern_src='[word=/^\\d+$/]',
                   consume=False)
    eng = TokenRuleEngine([r1, r2])
    hits = [(r.name, s, e) for r, s, e in eng.match_sentence(F(["Ser", "312"]))]
    assert ("two", 0, 2) in hits and ("one", 1, 2) in hits


def test_unbounded_star_is_safe_on_nullable():
    # a pathological nullable body must not loop the VM
    assert matches('([word=/x/]?)* "end"', F(["x", "x", "end"])) \
        == [(0, 3), (1, 3), (2, 3)]


def test_load_rules_from_yaml(tmp_path):
    p = tmp_path / "rules.yml"
    p.write_text("""
# comment
rules:
  - name: site_3letter
    label: Site
    priority: 1
    type: token
    action: mk_site
    pattern: |
      [word=/(?i)^(Ala|Ser|Thr)\\-?\\d+$/]
      (?! [lemma=mutant])

  - name: site_known_domain
    label: Site
    priority: 1
    type: token
    pattern: |
      "RBD"
""")
    from reach_spark.odin import load_rules
    eng = load_rules(str(p))
    assert [r.name for r in eng.rules] == ["site_3letter", "site_known_domain"]
    assert eng.rules[0].action == "mk_site"
    f = F(["Ser-785", "binds", "RBD"], lemma=["ser-785", "bind", "rbd"])
    hits = [(r.name, s, e) for r, s, e in eng.match_sentence(f)]
    assert hits == [("site_3letter", 0, 1), ("site_known_domain", 2, 3)]


class TestO1QuerySurface:
    def test_o1_rows_shared_code_path(self):
        from reach_spark.extract import o1_rows
        from reach_spark.resources import entity_dictionary
        rows = o1_rows(
            "MEK phosphorylates ERK at serine 125 and threonine 202.",
            entity_dictionary())
        assert ("site-aa-num", "Site", 4, 6, "serine 125", "S125") in rows
        assert ("site-aa-num", "Site", 7, 9, "threonine 202", "T202") \
            in rows

    def test_o1_rows_only_token_rule_mentions(self):
        from reach_spark.extract import o1_rows
        from reach_spark.resources import entity_dictionary
        rows = o1_rows("MEK activates ERK.", entity_dictionary())
        assert rows == []  # dictionary NER + events are not O1 output
