"""Unit test for the scale-growth tripwire (tools/growth_check.py)."""

from __future__ import annotations

import json
import subprocess
import sys


def test_growth_check_flags_superlinear_and_applies(tmp_path):
    lo = {"sf": 1.0, "queries": {"lin": 2.0, "bad": 2.0, "tiny": 0.1, "amort": 3.0}}
    hi = {
        "sf": 3.0,
        "queries": {
            "lin": 6.0,      # growth 1.0 — linear
            "bad": 12.0,     # growth 2.0 — flagged
            "tiny": 0.9,     # growth 3.0 but < 1 s hi — reported, not flagged
            "amort": 4.5,    # growth 0.5 — amortizing
        },
    }
    a, b = tmp_path / "lo.json", tmp_path / "hi.json"
    a.write_text(json.dumps(lo))
    b.write_text(json.dumps(hi))
    out = subprocess.run(
        [sys.executable, "tools/growth_check.py", str(a), str(b), "--apply"],
        capture_output=True,
        text=True,
        check=True,
    )
    assert "SUPER-LINEAR" in out.stdout
    applied = json.loads(b.read_text())
    assert applied["superlinear"] == ["bad"]
    assert applied["growth"]["lin"] == 1.0
    assert applied["growth"]["amort"] == 0.5
    assert "tiny" in applied["growth"] and "tiny" not in applied["superlinear"]
