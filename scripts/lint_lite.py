"""Minimal in-image Python linter (no ruff/flake8 in the environment).

Checks, per file:
  - syntax (ast.parse)
  - unused imports (module + function scope; ``# noqa`` on the import line
    or re-export via ``__all__`` / package ``__init__`` escapes)
  - bare ``except:``
  - trailing whitespace and hard tabs
  - f-strings with no placeholders

The reference enforces ``cargo fmt --check`` + ``clippy -D warnings`` in CI
(/root/reference/.github/workflows/ci.yml:26-46); this is the in-image
equivalent gate, wired into scripts/check.sh.
"""

from __future__ import annotations

import ast
import sys


def _imported_names(tree):
    """Yield (name-as-bound, node) for every import binding."""
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                bound = a.asname or a.name.split(".")[0]
                yield bound, node
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                yield a.asname or a.name, node


def _used_names(tree):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # catch module.attr chains rooted at a Name via the Name node
            pass
    # names referenced inside string annotations / __all__ entries
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.add(node.value)
    return used


def lint_file(path: str) -> list[str]:
    errs = []
    with open(path, "rb") as f:
        src = f.read()
    try:
        text = src.decode("utf-8")
    except UnicodeDecodeError as e:
        return [f"{path}: not utf-8: {e}"]
    lines = text.split("\n")
    for i, ln in enumerate(lines, 1):
        if ln != ln.rstrip():
            errs.append(f"{path}:{i}: trailing whitespace")
        if "\t" in ln:
            errs.append(f"{path}:{i}: hard tab")
    try:
        tree = ast.parse(text, filename=path)
    except SyntaxError as e:
        return errs + [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    noqa_lines = {
        i for i, ln in enumerate(lines, 1) if "noqa" in ln.split("#", 1)[-1]
    }
    used = _used_names(tree)
    is_init = path.endswith("__init__.py")
    for name, node in _imported_names(tree):
        if is_init or name == "_":
            continue
        if node.lineno in noqa_lines:
            continue
        if name not in used:
            errs.append(f"{path}:{node.lineno}: unused import '{name}'")
    # JoinedStr nodes that are format specs of an outer f-string are
    # constant-only by construction; exclude them from the placeholder rule
    spec_ids = {
        id(n.format_spec)
        for n in ast.walk(tree)
        if isinstance(n, ast.FormattedValue) and n.format_spec is not None
    }
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            errs.append(f"{path}:{node.lineno}: bare 'except:'")
        if isinstance(node, ast.JoinedStr) and id(node) not in spec_ids:
            if not any(
                isinstance(v, ast.FormattedValue) for v in node.values
            ):
                errs.append(
                    f"{path}:{node.lineno}: f-string without placeholders"
                )
    return errs


def main(paths):
    all_errs = []
    for p in paths:
        all_errs.extend(lint_file(p))
    for e in all_errs:
        print(e)
    return 1 if all_errs else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
