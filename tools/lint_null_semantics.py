#!/usr/bin/env python
"""Standing lint for the round-7 data-loss class: negated membership
predicates over potentially-nullable columns.

`~col.isin(...)` and `col != x` are NULL (not False) when `col` is NULL, so
a row-dropping filter built from them silently deletes NULL-keyed rows —
the exact mechanism behind five real round-7 bugs (purge_keys survivor
filter, upsert-sink partition scoping, …). SQL three-valued logic makes the
pattern easy to reintroduce: it looks correct, passes every non-NULL test,
and loses the anonymous rows in production.

The rule this lint enforces over the engine source
(`dataengineering_londonhousingmap_spark/**/*.py`):

  every `~X.isin(...)` (anywhere), and every `!=` comparison inside a
  DataFrame `.filter(...)` / `.where(...)` argument, must either

    (a) sit in a statement that ALSO handles NULL explicitly — an
        `.isNull()` arm (NULL rows survive) or an `.isNotNull()` arm
        (NULL rows excluded deliberately) in the same statement, or
    (b) carry a `# null-audited: <why>` pragma on one of the statement's
        lines, stating why NULL cannot reach the column (non-null vintage
        invariant, derived non-null expression, oracle-symmetric
        predicate, …).

  and (round 8) every `collect_list(...)` / `collect_set(...)` call —
  Spark DROPS NULL inputs while DuckDB's `list()` keeps them, so an
  unguarded collect over a nullable column diverges element counts the
  moment a NULL arrives (the r04 q_ewma/q_window_median class). Same
  escape hatch: an isNull()/isNotNull() arm in the statement or a
  `# null-audited:` pragma. A direct `F.struct(...)` argument is exempt
  (struct constructors are never NULL).

  and (round 9) every broad exception swallow (`except: pass` /
  `except Exception: pass`) — the r07 upsert-sink bare-except turned a
  transient read failure into silent data loss. Name the expected
  exception class, or carry a `# swallow-audited: <why>` pragma.

Array higher-order filters (`F.filter(col, lambda …)`) are exempt: they
drop NULL *elements* symmetrically on both engines and never delete rows.

Exits 1 listing violations; tests/test_null_audit_sweep.py runs it in CI
and pins that a bare reintroduction of the purge_keys pattern fails.
"""

from __future__ import annotations

import ast
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "dataengineering_londonhousingmap_spark")
PRAGMA = "# null-audited"


def _stmt_spans(tree: ast.AST) -> list[tuple[int, int]]:
    return [
        (node.lineno, node.end_lineno)
        for node in ast.walk(tree)
        if isinstance(node, ast.stmt)
    ]


def _enclosing_span(spans: list[tuple[int, int]], line: int) -> tuple[int, int]:
    best = (1, 10**9)
    for lo, hi in spans:
        if lo <= line <= hi and (hi - lo) < (best[1] - best[0]):
            best = (lo, hi)
    return best


def _has_null_arm(node: ast.AST) -> bool:
    for sub in ast.walk(node):
        if (
            isinstance(sub, ast.Call)
            and isinstance(sub.func, ast.Attribute)
            and sub.func.attr in ("isNull", "isNotNull")
        ):
            return True
    return False


def _is_hof_receiver(call: ast.Call) -> bool:
    """True for F.filter(...) — the array higher-order function, not a
    DataFrame row filter."""
    return (
        isinstance(call.func, ast.Attribute)
        and isinstance(call.func.value, ast.Name)
        and call.func.value.id == "F"
    )


def lint_source(src: str, filename: str = "<src>") -> list[tuple[int, str]]:
    """Returns (line, message) violations for one module's source."""
    tree = ast.parse(src, filename=filename)
    lines = src.splitlines()
    spans = _stmt_spans(tree)

    def pragma_in_stmt(line: int) -> bool:
        lo, hi = _enclosing_span(spans, line)
        return any(PRAGMA in lines[i - 1] for i in range(lo, min(hi, len(lines)) + 1))

    def stmt_has_null_arm(line: int) -> bool:
        lo, hi = _enclosing_span(spans, line)
        for node in ast.walk(tree):
            if isinstance(node, ast.stmt) and (node.lineno, node.end_lineno) == (lo, hi):
                return _has_null_arm(node)
        return False

    out: list[tuple[int, str]] = []

    for node in ast.walk(tree):
        # 1) ~X.isin(...) anywhere
        if (
            isinstance(node, ast.UnaryOp)
            and isinstance(node.op, ast.Invert)
            and isinstance(node.operand, ast.Call)
            and isinstance(node.operand.func, ast.Attribute)
            and node.operand.func.attr == "isin"
        ):
            if not (stmt_has_null_arm(node.lineno) or pragma_in_stmt(node.lineno)):
                out.append(
                    (
                        node.lineno,
                        "~isin() without an isNull()/isNotNull() arm or "
                        "'# null-audited:' pragma — NULL keys silently drop",
                    )
                )
        # 2) != inside df.filter()/df.where() args
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in ("filter", "where")
            and not _is_hof_receiver(node)
        ):
            for arg in node.args:
                if _has_null_arm(arg):
                    continue
                for sub in ast.walk(arg):
                    if isinstance(sub, ast.Compare) and any(
                        isinstance(op, ast.NotEq) for op in sub.ops
                    ):
                        if not pragma_in_stmt(sub.lineno):
                            out.append(
                                (
                                    sub.lineno,
                                    "'!=' in a row filter without an isNull()/"
                                    "isNotNull() arm or '# null-audited:' pragma "
                                    "— NULL values silently drop",
                                )
                            )
        # 4) silent exception swallows: `except: pass` / `except Exception:
        # pass` hide REAL errors behind best-effort intent (the r07
        # upsert-sink bare-except turned transient read failures into data
        # loss). A swallow must either name the expected exception class or
        # carry a '# swallow-audited: <why any error is safe>' pragma.
        if isinstance(node, ast.ExceptHandler):
            broad = node.type is None or (
                isinstance(node.type, ast.Name) and node.type.id == "Exception"
            )
            body_is_pass = len(node.body) == 1 and isinstance(node.body[0], ast.Pass)
            if broad and body_is_pass:
                lo, hi = node.lineno, node.body[0].end_lineno or node.body[0].lineno
                has_pragma = any(
                    "# swallow-audited" in lines[i - 1]
                    for i in range(lo, min(hi, len(lines)) + 1)
                )
                if not has_pragma:
                    out.append(
                        (
                            node.lineno,
                            "broad 'except: pass' swallow — name the expected "
                            "exception class or add a '# swallow-audited: "
                            "<why>' pragma",
                        )
                    )
        # 3) collect_list/collect_set anywhere — Spark drops NULL inputs,
        # DuckDB list() keeps them (r04 divergence class)
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in ("collect_list", "collect_set")
        ):
            arg = node.args[0] if node.args else None
            struct_arg = (
                isinstance(arg, ast.Call)
                and isinstance(arg.func, ast.Attribute)
                and arg.func.attr == "struct"
            )
            if not struct_arg and not (
                stmt_has_null_arm(node.lineno) or pragma_in_stmt(node.lineno)
            ):
                out.append(
                    (
                        node.lineno,
                        f"{node.func.attr}() without an isNull()/isNotNull() "
                        "arm or '# null-audited:' pragma — Spark drops NULL "
                        "inputs, DuckDB list() keeps them",
                    )
                )
    return sorted(set(out))


def main() -> int:
    violations = []
    for dirpath, _dirnames, filenames in os.walk(PKG):
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, ROOT)
            with open(path) as fh:
                src = fh.read()
            for line, msg in lint_source(src, filename=rel):
                violations.append(f"{rel}:{line}: {msg}")
    if violations:
        print("NULL-SEMANTICS LINT FAILED — negated membership over a")
        print("potentially-nullable column needs an explicit NULL arm or a")
        print("'# null-audited: <why>' pragma:")
        for v in violations:
            print(f"  {v}")
        return 1
    print("null-semantics lint: clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
