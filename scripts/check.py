"""Static checks for audiocraft_tpu — the lint gate.

The reference ships flake8+mypy (its Makefile:8-10); neither exists in this
environment, so this is a self-contained checker covering the failure modes
that actually bite in this codebase:

* every source byte-compiles (syntax);
* unused imports (module scope);
* mutable default arguments;
* duplicate top-level definitions in a module;
* bare ``except:`` clauses;
* f-strings with no placeholders (usually a forgotten format);
* (type pass, the mypy-shaped slice) every ``from X import Y`` anywhere in
  ``audiocraft_tpu`` — including the codebase's pervasive lazy in-function
  imports, which plain importing never exercises — resolves to a real
  attribute of the real module; and every call to a project function made
  through an imported name binds against its actual signature (unknown
  keyword / too many positionals).

Exit code 0 = clean.  Run via ``make check`` or directly.
"""

from __future__ import annotations

import ast
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
PACKAGES = ['audiocraft_tpu', 'tests', 'scripts']
# imports that exist for side effects or re-export
IMPORT_ALLOW = {'__future__', 'audiocraft_tpu'}


def _used_names(tree: ast.AST) -> set:
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    return used


def check_file(path: pathlib.Path) -> list:
    issues = []
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:
        return [f"{path}:{exc.lineno}: syntax error: {exc.msg}"]

    used = _used_names(tree)
    rel = path.relative_to(ROOT)
    lines = src.splitlines()

    def suppressed(lineno: int) -> bool:
        line = lines[lineno - 1] if lineno - 1 < len(lines) else ''
        return '# noqa' in line or '# re-export' in line

    # unused module-scope imports (skip __init__.py: re-export idiom)
    for node in [] if path.name == '__init__.py' else tree.body:
        if isinstance(node, ast.Import):
            for alias in node.names:
                name = (alias.asname or alias.name).split('.')[0]
                if (name not in used and alias.name not in IMPORT_ALLOW
                        and not suppressed(node.lineno)):
                    issues.append(f"{rel}:{node.lineno}: unused import "
                                  f"'{alias.name}'")
        elif isinstance(node, ast.ImportFrom):
            if node.module in IMPORT_ALLOW:
                continue
            for alias in node.names:
                name = alias.asname or alias.name
                if (name != '*' and name not in used
                        and not suppressed(node.lineno)):
                    issues.append(f"{rel}:{node.lineno}: unused import "
                                  f"'{name}' from '{node.module}'")

    # duplicate top-level defs
    seen: dict = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            if node.name in seen:
                issues.append(f"{rel}:{node.lineno}: duplicate definition "
                              f"'{node.name}' (first at line "
                              f"{seen[node.name]})")
            seen[node.name] = node.lineno

    # format-spec JoinedStrs (the ".2f" in f"{x:.2f}") are nested JoinedStr
    # nodes with no placeholders of their own — not findings
    spec_ids = {id(fv.format_spec) for fv in ast.walk(tree)
                if isinstance(fv, ast.FormattedValue) and fv.format_spec}
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in node.args.defaults + node.args.kw_defaults:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    issues.append(f"{rel}:{default.lineno}: mutable default "
                                  f"argument in '{node.name}'")
        elif isinstance(node, ast.ExceptHandler) and node.type is None:
            issues.append(f"{rel}:{node.lineno}: bare 'except:'")
        elif isinstance(node, ast.JoinedStr) and id(node) not in spec_ids:
            if not any(isinstance(v, ast.FormattedValue) for v in node.values):
                issues.append(f"{rel}:{node.lineno}: f-string without "
                              f"placeholders")
    return issues


# --------------------------------------------------------------- type pass

def _module_name(path: pathlib.Path) -> str:
    rel = path.relative_to(ROOT).with_suffix('')
    parts = list(rel.parts)
    if parts[-1] == '__init__':
        parts = parts[:-1]
    return '.'.join(parts)


def _resolve_relative(module: str, node: ast.ImportFrom, is_pkg: bool) -> str:
    """Absolute module path for an ImportFrom seen inside `module`."""
    if node.level == 0:
        return node.module or ''
    base = module.split('.')
    # a package's __init__ counts as one level shallower
    drop = node.level - (1 if is_pkg else 0)
    if drop > 0:
        base = base[:-drop]
    if node.module:
        base = base + node.module.split('.')
    return '.'.join(base)


def check_types(paths: list) -> list:
    """Import-resolution + call-signature checks over audiocraft_tpu.

    Covers the mypy bug class the reference gates on (Makefile:8-10):
    a renamed/removed function referenced by a lazy in-function import, or a
    call that passes a keyword the target no longer accepts, fails here
    instead of at runtime.
    """
    import importlib
    import inspect

    if str(ROOT) not in sys.path:  # `python scripts/check.py` puts scripts/
        sys.path.insert(0, str(ROOT))  # on sys.path, not the repo root

    try:  # never let the lint gate claim the TPU
        import jax
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    issues = []
    modules: dict = {}

    def load(name: str):
        if name in modules:
            return modules[name]
        try:
            mod = importlib.import_module(name)
        except Exception:
            # Only audiocraft_tpu.* names reach here (callers filter), and
            # every package module must import on a bare CPU env — optional
            # deps are lazy inside functions — so None is flagged as an
            # issue by the caller.
            mod = None
        modules[name] = mod
        return mod

    for path in paths:
        mod_name = _module_name(path)
        is_pkg = path.name == '__init__.py'
        rel = path.relative_to(ROOT)
        try:
            tree = ast.parse(path.read_text(), filename=str(path))
        except SyntaxError:
            continue  # reported by check_file

        # name -> (object, import lineno) for call-signature checking
        imported: dict = {}
        for node in ast.walk(tree):
            if not isinstance(node, ast.ImportFrom):
                continue
            target = _resolve_relative(mod_name, node, is_pkg)
            if not target.startswith('audiocraft_tpu'):
                continue
            mod = load(target)
            if mod is None:
                issues.append(f"{rel}:{node.lineno}: cannot import module "
                              f"'{target}'")
                continue
            for alias in node.names:
                if alias.name == '*':
                    continue
                if not hasattr(mod, alias.name):
                    # submodule import (from pkg import submod)
                    if load(f"{target}.{alias.name}") is not None:
                        continue
                    issues.append(
                        f"{rel}:{node.lineno}: '{target}' has no attribute "
                        f"'{alias.name}'")
                    continue
                imported[alias.asname or alias.name] = getattr(mod, alias.name)

        for node in ast.walk(tree):
            if not (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Name)
                    and node.func.id in imported):
                continue
            fn = imported[node.func.id]
            if not (inspect.isfunction(fn) or inspect.isbuiltin(fn)):
                continue  # classes/dataclasses: constructor churn too noisy
            try:
                sig = inspect.signature(fn)
            except (TypeError, ValueError):
                continue
            if any(a for a in node.args if isinstance(a, ast.Starred)) or \
                    any(kw.arg is None for kw in node.keywords):
                continue  # *args / **kwargs at the call site: not static
            try:
                sig.bind_partial(
                    *[None] * len(node.args),
                    **{kw.arg: None for kw in node.keywords})
            except TypeError as exc:
                issues.append(f"{rel}:{node.lineno}: call to "
                              f"'{node.func.id}' does not match its "
                              f"signature: {exc}")
    return issues


def main() -> int:
    issues = []
    pkg_paths = []
    for pkg in PACKAGES:
        for path in sorted((ROOT / pkg).rglob('*.py')):
            if '__pycache__' in path.parts:
                continue
            issues.extend(check_file(path))
            if pkg == 'audiocraft_tpu':
                pkg_paths.append(path)
    issues.extend(check_types(pkg_paths))
    for issue in issues:
        print(issue)
    print(f"{'FAIL' if issues else 'OK'}: {len(issues)} issue(s)")
    return 1 if issues else 0


if __name__ == '__main__':
    sys.exit(main())
