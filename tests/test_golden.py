"""Golden-file regression suites (the runtest.sh analog, SURVEY §4)."""
from pathlib import Path

import pytest

from hypre_tpu.testing.runtest import check_suite

GOLDEN = Path(__file__).parent / "golden"


@pytest.mark.parametrize("name", [p.stem for p in GOLDEN.glob("*.jobs")])
def test_golden_suite(name):
    fails = check_suite(GOLDEN / f"{name}.jobs", GOLDEN / f"{name}.saved")
    assert not fails, "\n".join(fails)
