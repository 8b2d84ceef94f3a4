"""tools/server_loadtest.py — concurrent-client service-plane harness."""

import importlib
import json
import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))

server_loadtest = importlib.import_module("server_loadtest")


def test_loadtest_end_to_end(monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", [
        "server_loadtest.py", "--clients", "2", "--rounds", "5",
        "--size", "64", "--backend", "xla",
    ])
    server_loadtest.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(out)
    assert rep["metric"] == "server_requests_per_s"
    assert rep["value"] > 0
    d = rep["detail"]
    assert d["protocol_errors"] == 0
    assert d["verbs"]["compute_path"]["n"] == 2 * 5
    assert d["verbs"]["get_cell"]["p50_ms"] > 0
