"""The lint gate's type pass catches real drift (the mypy-gate role,
reference Makefile:8-10): seeded bad code must be flagged, clean code not.
"""

import importlib.util
import sys
import textwrap
from pathlib import Path

ROOT = Path(__file__).parent.parent


def _check_module():
    spec = importlib.util.spec_from_file_location(
        "check_gate_under_test", ROOT / "scripts" / "check.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_type_pass(tmp_name: str, source: str):
    """Write a seed module under tests/ (inside ROOT so the checker can
    form a module name) and run check_types on just that file."""
    check = _check_module()
    seed = ROOT / "tests" / tmp_name
    seed.write_text(textwrap.dedent(source))
    try:
        return check.check_types([seed])
    finally:
        seed.unlink()
        sys.modules.pop(f"tests.{tmp_name[:-3]}", None)


def test_method_signature_drift_is_caught():
    issues = _run_type_pass("_lint_seed_bad.py", """\
        from audiocraft_tpu.codec.encodec import EncodecModel

        def f(model: EncodecModel, params, x):
            return model.encode(params, x, bogus_kw_that_never_existed=1)
    """)
    assert any("EncodecModel.encode" in i and "bogus_kw" in i
               for i in issues), issues


def test_unknown_method_is_caught():
    issues = _run_type_pass("_lint_seed_attr.py", """\
        from audiocraft_tpu.cond.conditioners import LUTConditioner

        def f(cond: LUTConditioner):
            return cond.enocde_typo()
    """)
    assert any("no attribute 'enocde_typo'" in i for i in issues), issues


def test_local_constructor_inference():
    issues = _run_type_pass("_lint_seed_local.py", """\
        from audiocraft_tpu.patterns import DelayedPatternProvider

        def f():
            p = DelayedPatternProvider(4)
            return p.get_pattern(timesteps=5, bogus=2)
    """)
    assert any("get_pattern" in i for i in issues), issues


def test_clean_calls_pass():
    issues = _run_type_pass("_lint_seed_ok.py", """\
        from audiocraft_tpu.codec.encodec import EncodecModel
        from audiocraft_tpu.patterns import DelayedPatternProvider

        def f(model: EncodecModel, params, x):
            codes, scale = model.encode(params, x)
            out = model.decode(params, codes, scale)
            p = DelayedPatternProvider(4)
            pat = p.get_pattern(5)
            return out, pat
    """)
    assert issues == [], issues


def test_whole_package_gate_is_clean():
    """`make check`'s type pass over the real package stays at zero —
    the gate is only useful if the baseline is clean."""
    check = _check_module()
    paths = [p for p in sorted((ROOT / "audiocraft_tpu").rglob("*.py"))
             if "__pycache__" not in p.parts]
    issues = check.check_types(paths)
    assert issues == [], issues
