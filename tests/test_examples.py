"""Examples must run (the TEST_examples suite analog)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent / "examples"))


def test_ex5():
    import ex5

    res = ex5.main(n=20)
    assert float(res.relres) < 1e-7


def test_ex11():
    import ex11

    res = ex11.main(n=16, m=2)
    assert res.resnorms.max() < 1e-6


def test_ex_struct():
    import ex_struct

    res = ex_struct.main(n=16)
    assert float(res.relres) < 1e-7


def test_ex3_pfmg():
    import ex3_pfmg

    assert ex3_pfmg.main(n=32) < 40


def test_ex15_ams():
    import ex15_ams

    assert ex15_ams.main(n=6) < 60


def test_ex9_systems():
    import ex9_systems

    it24 = ex9_systems.main(n=24)
    it48 = ex9_systems.main(n=48)
    # mesh-independent systems-AMG convergence
    assert it48 <= it24 + 4


def test_ex_lobpcg():
    import ex_lobpcg

    ex_lobpcg.main(n=16, nev=3)


def test_ex6_multibox():
    import ex6_multibox

    iters, rel = ex6_multibox.main(n=12)
    assert rel < 1e-7


def test_ex_capi():
    import ex_capi

    assert ex_capi.main(n=20) < 40
