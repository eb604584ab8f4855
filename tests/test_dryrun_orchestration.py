"""Artifact-shape tests for the multichip dryrun orchestration.

MULTICHIP_r04.json was rc:124/ok:false with an EMPTY tail: the old
single-child wrapper buffered all output (``capture_output=True``) and
the driver's timeout discarded ~20 minutes of green results. Round 5
splits the run into one streamed child per (path, stage) under a budget
(``__graft_entry__._dryrun_orchestrate``); these tests pin the
machine-readable contract — the per-stage DRYRUN_JSON lines and the
final one-line summary — without spawning real children.
"""

import json

import pytest

import __graft_entry__ as ge


def _results(**overrides):
    base = {
        p: {"live": True, "equiv": "ok", "div": 1.0e-9} for p in ge._PATH_ORDER
    }
    for k, v in overrides.items():
        base[k.replace("_", "-")].update(v)
    return base


def _final_line(capsys):
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    d = json.loads(lines[-1])  # the LAST line is the machine contract
    return d


def test_final_json_ok_roundtrip(capsys):
    ge._print_final_json(8, _results(), 12.3)
    d = _final_line(capsys)
    assert d["ok"] is True
    assert d["dryrun_multichip"] == 8
    assert d["max_div"] == 1.0e-9
    assert d["tol"] == ge.EQUIV_GRAD_TOL
    assert set(d["paths"]) == set(ge._PATH_ORDER)
    assert d["wall_s"] == 12.3


def test_final_json_single_physical_line(capsys):
    ge._print_final_json(8, _results(), 1.0)
    out = capsys.readouterr().out.strip()
    assert "\n" not in out
    # must fit a driver tail window alongside the per-path OK lines
    assert len(out) < 600


def test_budget_skip_markers_keep_ok(capsys):
    """Equivalence skipped for budget is an OK outcome (the liveness
    evidence landed; the skip is recorded, not hidden)."""
    ge._print_final_json(
        8, _results(mis_align={"equiv": "skipped (budget: 10s left < ~360s estimate)", "div": None}), 5.0
    )
    d = _final_line(capsys)
    assert d["ok"] is True
    assert d["paths"]["mis-align"]["equiv"].startswith("skipped")
    assert d["max_div"] == 1.0e-9  # over the paths that DID run


def test_failed_equiv_is_not_ok(capsys):
    ge._print_final_json(
        8, _results(inversion={"equiv": "failed (rc=1)", "div": None}), 5.0
    )
    assert _final_line(capsys)["ok"] is False


def test_dead_liveness_is_not_ok(capsys):
    ge._print_final_json(
        8, _results(sg1_case2={"live": False, "equiv": "not-run", "div": None}), 5.0
    )
    assert _final_line(capsys)["ok"] is False


def test_explicit_ok_override_wins(capsys):
    # the orchestrator passes ok=not failures (covers liveness children
    # that exited 0 without an OK line)
    ge._print_final_json(8, _results(), 5.0, ok=False)
    assert _final_line(capsys)["ok"] is False


def test_path_estimates_cover_all_paths():
    assert set(ge._EQUIV_EST_S) == set(ge._PATH_ORDER)


def test_emit_path_json_parses(capsys):
    ge._emit_path_json("sg1-case2", "equiv", ok=True, div=3.0e-13)
    line = capsys.readouterr().out.strip()
    assert line.startswith("DRYRUN_JSON ")
    d = json.loads(line[len("DRYRUN_JSON "):])
    assert d == {"path": "sg1-case2", "stage": "equiv", "ok": True, "div": 3.0e-13}
