"""Interactive shell (ReachShell.scala / `ashell` analog): the REPL core
drives the full extraction pipeline on typed text and renders the
displayMentions sentence blocks; menu commands mirror the reference's
Help/Exit items plus the triples/format toggles."""

import json

import pytest

from reach_spark.shell import _HELP, ReachShell


@pytest.fixture(scope="module")
def shell(spark):
    return ReachShell(spark)


def test_help_and_unknown_and_exit(shell):
    assert shell.handle(":help") == (True, _HELP)
    keep, out = shell.handle(":frobnicate now")
    assert keep and "unknown command ':frobnicate'" in out
    assert shell.handle("") == (True, "")
    assert shell.handle(":exit") == (False, "exiting...")


def test_default_action_extracts_and_displays(shell):
    keep, out = shell.handle("MEK1 phosphorylates ERK2.")
    assert keep
    assert "sentence #0" in out
    assert "TEXT:   MEK1 phosphorylates ERK2." in out
    assert "EVENTS:" in out and "Phosphorylation" in out
    assert "TRIPLES" not in out           # off by default


def test_triples_toggle(shell):
    assert shell.handle(":triples on") == (True, "triples on")
    _, out = shell.handle("MEK1 phosphorylates ERK2.")
    assert "TRIPLES: " in out
    assert "Positive_regulation->Phosphorylation" in out
    assert shell.handle(":triples off") == (True, "triples off")
    assert shell.handle(":triples maybe")[1] == "usage: :triples on|off"


def test_format_mode_roundtrips_api_formats(shell):
    assert shell.handle(":format bel")[1] == "format bel"
    _, out = shell.handle("MEK1 phosphorylates ERK2.")
    stmts = json.loads(out)["statements"]
    assert stmts and any("increases" in s["statement"] and
                         "pmod(P)" in s["statement"] for s in stmts)
    assert shell.handle(":format off")[1] == "format off (mention display)"
    assert "usage: :format" in shell.handle(":format nope")[1]
