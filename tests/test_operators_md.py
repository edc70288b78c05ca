"""OPERATORS.md currency gate: the committed index must match what the
generator produces from the live registry — a new/renamed/moved query
lands red here until `python scripts/gen_operators_md.py > OPERATORS.md`
is re-run."""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "scripts"))


def test_operators_md_is_current():
    import gen_operators_md

    with open(os.path.join(_ROOT, "OPERATORS.md")) as f:
        committed = f.read()
    assert committed == gen_operators_md.render(), (
        "OPERATORS.md is stale — regenerate with "
        "`python scripts/gen_operators_md.py > OPERATORS.md`"
    )
