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

        issues.extend(_check_method_calls(tree, rel, imported,
                                          load(mod_name), inspect))
    return issues


def _check_method_calls(tree, rel, imported, mod_self, inspect) -> list:
    """Method-call binding on project classes (mypy-shaped slice 2).

    Resolves ``obj.method(...)`` where ``obj``'s class is statically
    known — a parameter annotation, a single-class local
    ``obj = ClassName(...)`` assignment, or ``self`` inside a class
    body — then (a) flags attributes that don't exist on the class and
    (b) binds the call against the method's real signature.  The
    dominant call pattern in this codebase (frozen dataclass modules:
    ``model.encode(params, x)``) is exactly this shape.
    """
    issues = []

    def resolve_class(name):
        obj = imported.get(name)
        if obj is None and mod_self is not None:
            obj = getattr(mod_self, name, None)
        return obj if inspect.isclass(obj) else None

    def class_of_expr(expr):
        if isinstance(expr, ast.Call) and isinstance(expr.func, ast.Name):
            return resolve_class(expr.func.id)
        return None

    def annotation_class(ann):
        if isinstance(ann, ast.Name):
            return resolve_class(ann.id)
        if isinstance(ann, ast.Constant) and isinstance(ann.value, str):
            return resolve_class(ann.value)
        return None

    def check_call(cls, call, var, meth):
        fields = getattr(cls, '__dataclass_fields__', {})
        attr = getattr(cls, meth, None)
        if attr is None:
            # unknown-attribute flagging only where instance attrs are
            # statically knowable: a dataclass without dynamic-attr escape
            # hatches (__post_init__ object.__setattr__ caches, __getattr__
            # delegation, custom __init__)
            init = vars(cls).get('__init__')
            custom_init = (init is not None and getattr(
                getattr(init, '__code__', None), 'co_filename', '<string>')
                != '<string>')  # dataclass-generated __init__ is exec'd
            dynamic = (not fields or meth in fields
                       or hasattr(cls, '__getattr__')
                       or '__post_init__' in vars(cls)
                       or custom_init)
            if dynamic:
                return
            issues.append(f"{rel}:{call.lineno}: '{cls.__name__}' (type of "
                          f"'{var}') has no attribute '{meth}'")
            return
        if isinstance(attr, property) or not callable(attr):
            return  # value through a property/field: signature unknown
        if any(isinstance(a, ast.Starred) for a in call.args) or \
                any(kw.arg is None for kw in call.keywords):
            return
        try:
            sig = inspect.signature(attr)
        except (TypeError, ValueError):
            return
        raw = inspect.getattr_static(cls, meth, None)
        args = [None] * len(call.args)
        if inspect.isfunction(attr) and not isinstance(
                raw, (staticmethod, classmethod)):
            args = [None] + args  # unbound instance method: self slot
        try:
            sig.bind_partial(*args,
                             **{kw.arg: None for kw in call.keywords})
        except TypeError as exc:
            issues.append(f"{rel}:{call.lineno}: call to "
                          f"'{cls.__name__}.{meth}' does not match its "
                          f"signature: {exc}")

    # map method FunctionDefs -> enclosing class (for `self.x(...)`)
    self_class: dict = {}
    for cnode in ast.walk(tree):
        if not isinstance(cnode, ast.ClassDef):
            continue
        cls = resolve_class(cnode.name)
        if cls is None:
            continue
        for child in cnode.body:
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                deco = {d.id for d in child.decorator_list
                        if isinstance(d, ast.Name)}
                if 'staticmethod' in deco or 'classmethod' in deco:
                    continue
                if child.args.args and child.args.args[0].arg == 'self':
                    self_class[id(child)] = cls

    for fn_node in ast.walk(tree):
        if not isinstance(fn_node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        local: dict = {}
        if id(fn_node) in self_class:
            local['self'] = self_class[id(fn_node)]
        a = fn_node.args
        for arg in a.posonlyargs + a.args + a.kwonlyargs:
            cls = annotation_class(arg.annotation) if arg.annotation else None
            if cls is not None:
                local[arg.arg] = cls
        # a name survives only if every assignment in the function gives it
        # the same statically-known class (reassignment -> unknown)
        assigned: dict = {}
        for sub in ast.walk(fn_node):
            if isinstance(sub, ast.Assign):
                for tgt in sub.targets:
                    for leaf in ast.walk(tgt):
                        if isinstance(leaf, ast.Name):
                            cls = (class_of_expr(sub.value)
                                   if tgt is leaf else None)
                            if leaf.id in assigned and \
                                    assigned[leaf.id] is not cls:
                                assigned[leaf.id] = None
                            else:
                                assigned[leaf.id] = cls
            elif isinstance(sub, (ast.AugAssign, ast.AnnAssign,
                                  ast.NamedExpr)):
                tgt = getattr(sub, 'target', None)
                if isinstance(tgt, ast.Name):
                    assigned[tgt.id] = None
            elif isinstance(sub, (ast.For, ast.AsyncFor)):
                for leaf in ast.walk(sub.target):
                    if isinstance(leaf, ast.Name):
                        assigned[leaf.id] = None
            elif isinstance(sub, (ast.withitem,)) and sub.optional_vars:
                for leaf in ast.walk(sub.optional_vars):
                    if isinstance(leaf, ast.Name):
                        assigned[leaf.id] = None
        for name, cls in assigned.items():
            if cls is None:
                local.pop(name, None)
            else:
                local[name] = cls

        if not local:
            continue
        for sub in ast.walk(fn_node):
            if (isinstance(sub, ast.Call)
                    and isinstance(sub.func, ast.Attribute)
                    and isinstance(sub.func.value, ast.Name)
                    and sub.func.value.id in local):
                check_call(local[sub.func.value.id], sub,
                           sub.func.value.id, sub.func.attr)
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
