#!/usr/bin/env python
"""Dependency-free linter for the CI lint stage.

ruff/pyflakes are not installable in this image (no network egress), so this
vendors the highest-signal pyflakes-class checks as a single AST pass:

  F401  unused module-scope import
  F811  import shadowed by a later import of the same name
  E711  comparison to None with ==/!=        (use is / is not)
  E712  comparison to True/False with ==/!=  (use is / implicit truth)
  F632  `is` comparison against a str/int/tuple literal
  F631  assertion on a non-empty tuple (always true)
  B006  mutable default argument (list/dict/set literal)

plus a compile pass with SyntaxWarning promoted to error (catches W605
invalid escape sequences and `is` literal warnings at parse time).

`# noqa` (optionally `# noqa: CODE[,CODE]`) on the flagged line suppresses.
Imports in `__init__.py` and names in `__all__` count as used (re-export
surface). Exit 1 if any finding survives.
"""
from __future__ import annotations

import ast
import sys
import warnings
from pathlib import Path

CHECK_NAME = {
    "F401": "unused import",
    "F811": "redefinition of import",
    "E711": "comparison to None should be 'is'/'is not'",
    "E712": "comparison to True/False should not use ==/!=",
    "F632": "'is' comparison with a literal",
    "F631": "assertion on a non-empty tuple is always true",
    "B006": "mutable default argument",
}


def _noqa_lines(source: str) -> dict[int, set[str] | None]:
    """line -> None (blanket noqa) or set of codes."""
    out: dict[int, set[str] | None] = {}
    for i, line in enumerate(source.splitlines(), start=1):
        if "# noqa" not in line:
            continue
        _, _, tail = line.partition("# noqa")
        tail = tail.strip()
        if tail.startswith(":"):
            # tolerate trailing prose after the codes ("# noqa: F401  (why)")
            codes = {c.strip().split()[0].upper()
                     for c in tail[1:].split(",") if c.strip()}
            out[i] = codes
        else:
            out[i] = None
    return out


class _Visitor(ast.NodeVisitor):
    def __init__(self, is_init: bool) -> None:
        self.is_init = is_init
        # name -> (lineno, bound-inside-try) for module-scope imports
        self.imports: dict[str, tuple[int, bool]] = {}
        self.used: set[str] = set()
        self.findings: list[tuple[int, str, str]] = []
        self._scope_depth = 0
        self._try_depth = 0

    # -- imports (module scope only; function-local imports are deliberate
    # lazy imports throughout this codebase) --------------------------------
    def _bind_import(self, name: str, lineno: int, redundant_alias: bool) -> None:
        if self._scope_depth > 0:
            return
        if name in self.imports:
            # pyflakes semantics: only a redefinition of an UNUSED name is a
            # finding, and try/except fallback imports (either binding inside
            # a Try) are the alternative-branch idiom, not shadowing
            prev_in_try = self.imports[name][1]
            if (name not in self.used and not prev_in_try
                    and self._try_depth == 0):
                self.findings.append(
                    (lineno, "F811", f"redefinition of import '{name}'"))
        # `import x as x` / `from m import x as x` is the explicit
        # re-export idiom — exempt, as ruff does
        if self.is_init or redundant_alias:
            self.used.add(name)
        self.imports[name] = (lineno, self._try_depth > 0)

    def visit_Import(self, node: ast.Import) -> None:
        for alias in node.names:
            bound = alias.asname or alias.name.split(".")[0]
            self._bind_import(bound, node.lineno,
                              alias.asname == alias.name)

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        if node.module == "__future__":
            return
        for alias in node.names:
            if alias.name == "*":
                continue
            bound = alias.asname or alias.name
            self._bind_import(bound, node.lineno,
                              alias.asname == alias.name)

    # -- usage ---------------------------------------------------------------
    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.generic_visit(node)

    def _enter_scope(self, node: ast.AST) -> None:
        self._scope_depth += 1
        self.generic_visit(node)
        self._scope_depth -= 1

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        self._check_defaults(node)
        self._enter_scope(node)

    def visit_AsyncFunctionDef(self, node: ast.AsyncFunctionDef) -> None:
        self._check_defaults(node)
        self._enter_scope(node)

    def visit_Lambda(self, node: ast.Lambda) -> None:
        self._enter_scope(node)

    def visit_ClassDef(self, node: ast.ClassDef) -> None:
        self._enter_scope(node)

    def visit_Try(self, node: ast.Try) -> None:
        self._try_depth += 1
        self.generic_visit(node)
        self._try_depth -= 1

    # -- comparisons ----------------------------------------------------------
    def visit_Compare(self, node: ast.Compare) -> None:
        for op, comparator in zip(node.ops, node.comparators):
            operands = [node.left, comparator]
            if isinstance(op, (ast.Eq, ast.NotEq)):
                for operand in operands:
                    if isinstance(operand, ast.Constant):
                        if operand.value is None:
                            self.findings.append(
                                (node.lineno, "E711", CHECK_NAME["E711"]))
                        elif operand.value is True or operand.value is False:
                            self.findings.append(
                                (node.lineno, "E712", CHECK_NAME["E712"]))
            if isinstance(op, (ast.Is, ast.IsNot)):
                for operand in operands:
                    if (isinstance(operand, ast.Constant)
                            and not isinstance(operand.value, bool)
                            and isinstance(operand.value,
                                           (str, int, float, bytes))):
                        self.findings.append(
                            (node.lineno, "F632", CHECK_NAME["F632"]))
        self.generic_visit(node)

    def visit_Assert(self, node: ast.Assert) -> None:
        if isinstance(node.test, ast.Tuple) and node.test.elts:
            self.findings.append((node.lineno, "F631", CHECK_NAME["F631"]))
        self.generic_visit(node)

    def _check_defaults(self, node: ast.FunctionDef | ast.AsyncFunctionDef) -> None:
        for default in list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None]:
            if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                self.findings.append(
                    (default.lineno, "B006", CHECK_NAME["B006"]))


def lint_file(path: Path) -> list[str]:
    source = path.read_text()
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error", SyntaxWarning)
            tree = ast.parse(source, filename=str(path))
    except SyntaxWarning as w:  # e.g. W605 invalid escape sequence
        return [f"{path}:{getattr(w, 'lineno', 0)}: W605 {w}"]
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 {e.msg}"]

    visitor = _Visitor(is_init=path.name == "__init__.py")
    visitor.visit(tree)

    # names exported via __all__ count as used
    for node in tree.body:
        targets: list[ast.expr] = []
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, ast.AugAssign):
            targets = [node.target]
        if any(isinstance(t, ast.Name) and t.id == "__all__" for t in targets):
            value = node.value
            if isinstance(value, (ast.List, ast.Tuple)):
                for elt in value.elts:
                    if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                        visitor.used.add(elt.value)

    findings = list(visitor.findings)
    for name, (lineno, _in_try) in visitor.imports.items():
        if name not in visitor.used:
            findings.append((lineno, "F401", f"'{name}' imported but unused"))

    noqa = _noqa_lines(source)
    out = []
    for lineno, code, msg in sorted(findings):
        if lineno in noqa:
            codes = noqa[lineno]
            if codes is None or code in codes:
                continue
        out.append(f"{path}:{lineno}: {code} {msg}")
    return out


def main(argv: list[str]) -> int:
    roots = [Path(a) for a in argv] or [Path("keisei_tpu")]
    files: list[Path] = []
    for root in roots:
        if root.is_dir():
            files.extend(sorted(root.rglob("*.py")))
        elif root.suffix == ".py":
            files.append(root)
    all_findings: list[str] = []
    for f in files:
        all_findings.extend(lint_file(f))
    for line in all_findings:
        print(line)
    print(f"lint: {len(files)} files checked, {len(all_findings)} findings")
    return 1 if all_findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
