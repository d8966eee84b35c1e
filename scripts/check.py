"""Static checks for audiocraft_tpu — the lint gate.

The reference ships flake8+mypy (its Makefile:8-10); neither exists in this
environment, so this is a self-contained checker covering the failure modes
that actually bite in this codebase:

* every source byte-compiles (syntax);
* unused imports (module scope);
* mutable default arguments;
* duplicate top-level definitions in a module;
* bare ``except:`` clauses;
* f-strings with no placeholders (usually a forgotten format).

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


def main() -> int:
    issues = []
    for pkg in PACKAGES:
        for path in sorted((ROOT / pkg).rglob('*.py')):
            if '__pycache__' in path.parts:
                continue
            issues.extend(check_file(path))
    for issue in issues:
        print(issue)
    print(f"{'FAIL' if issues else 'OK'}: {len(issues)} issue(s)")
    return 1 if issues else 0


if __name__ == '__main__':
    sys.exit(main())
