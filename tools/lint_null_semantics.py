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

  and (round 9) every higher-order-function lambda (`F.transform` /
  `F.aggregate` / `F.zip_with` / …) whose body captures an outer name
  bound to an expression that is not provably O(1) per element — HOF
  lambdas re-evaluate captured subtrees PER ELEMENT, so a captured
  `F.split`/`tokens(...)` re-runs the tokenization once per array element:
  the r09 bigrams O(n²) bug (105× on 1.5k-token docs). Cheap captures
  (F.col / F.lit / F.size-of-a-column-ref / arithmetic) pass; anything
  else needs restructuring (pass it as the HOF argument, zip_with sliced
  copies) or a `# hof-capture-audited: <why O(1)>` pragma.

  and (round 10) every `X.union(Y)` / `X.unionByName(Y)` whose receiver
  and argument chain off the SAME frame variable — the union gives the
  plan two consumers of that frame, and when it is un-materialized Spark
  REPLAYS its whole subtree once per branch (the r09 orientation-replay
  class: q_fuzzy_join's swap union re-ran the block join + Levenshtein DP,
  ~2× on the 10× lane; r10 found the same shape replaying the near-dup
  edge pipeline inside connected_components). Emit both orientations with
  `both_orientations()` (one explode pass), or materialize the shared
  frame and carry a `# union-audited: <why the shared frame is cheap or
  materialized>` pragma.

  and (round 11) every `Column.isin(...)` / `F.lit(...)` whose element
  list is DATA-DEPENDENT (a runtime variable, a comprehension, a
  `list(...)` over runtime data — anything that does not resolve to a
  code-time literal of constants) — each element costs one py4j
  round-trip (~0.4 ms) while the plan is BUILT on the driver: the r10
  storm was a 45k-id `isin` spending 20 s in pure plan construction.
  Bounded driver data above ~128 elements must ship as ONE
  `createDataFrame` LocalRelation + broadcast join instead. Escape
  hatch: a `# py4j-audited: <why the element count is bounded>` pragma.

Array higher-order filters (`F.filter(col, lambda …)`) are exempt from the
NULL rule: they drop NULL *elements* symmetrically on both engines and
never delete rows.

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
        # 5) HOF lambda capturing an expensive outer expression (the r09
        # bigrams O(n²) class): higher-order-function lambdas re-evaluate
        # captured subtrees PER ELEMENT, so a lambda body referencing an
        # outer name bound to e.g. F.split(...)/tokens(...) re-runs that
        # computation once per array element — O(n²) per row. Cheap
        # captures (F.col/F.lit/F.size/arithmetic of those) are fine.
        # Escape hatch: '# hof-capture-audited: <why O(1) per element>'.
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id == "F"
            and node.func.attr in _HOFS
        ):
            for arg in node.args:
                if not isinstance(arg, ast.Lambda):
                    continue
                for name in _expensive_captures(arg, _assignments(tree, node)):
                    lo, hi = _enclosing_span(spans, node.lineno)
                    if not any(
                        "# hof-capture-audited" in lines[i - 1]
                        for i in range(lo, min(hi, len(lines)) + 1)
                    ):
                        out.append(
                            (
                                node.lineno,
                                f"F.{node.func.attr} lambda captures outer "
                                f"expression '{name}' that is not provably "
                                "O(1)-per-element — HOF lambdas re-evaluate "
                                "captured subtrees PER ELEMENT (the r09 "
                                "bigrams O(n²) bug). Pass it as the HOF "
                                "argument / zip_with sliced copies, or add "
                                "'# hof-capture-audited: <why>'",
                            )
                        )
        # 6) union/unionByName whose receiver and argument chain off the
        # SAME frame variable — two consumers of one (possibly
        # un-materialized) subtree, replayed once per branch (the r09
        # orientation-replay class). both_orientations() or a
        # '# union-audited: <why>' pragma.
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in ("union", "unionByName")
            and node.args
        ):
            recv = _base_frame(node.func.value)
            arg0 = _base_frame(node.args[0])
            if recv is not None and recv == arg0:
                lo, hi = _enclosing_span(spans, node.lineno)
                if not any(
                    "# union-audited" in lines[i - 1]
                    for i in range(lo, min(hi, len(lines)) + 1)
                ):
                    out.append(
                        (
                            node.lineno,
                            f".{node.func.attr}() with both branches "
                            f"chained off '{recv}' — Spark replays the "
                            "shared un-materialized subtree once per "
                            "branch (the r09 orientation-replay class). "
                            "Use both_orientations()' single explode, or "
                            "materialize the shared frame and add "
                            "'# union-audited: <why>'",
                        )
                    )
        # 7) py4j literal storms (r10 lesson): Column.isin(<runtime list>)
        # and F.lit(<runtime list>) build one py4j round-trip PER ELEMENT
        # while constructing the plan on the driver (~0.4ms each; a 45k-id
        # isin measured 20s of pure plan build). Code-time literals of
        # constants are bounded by the source itself and pass; anything
        # data-dependent (variables, comprehensions, list(...) over runtime
        # data) must carry a '# py4j-audited: <bounded why>' pragma or ship
        # as a LocalRelation.
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "isin"
            and node.args
        ):
            env7 = _resolve_env(tree, node)
            if not all(_is_static_values(a, env7) for a in node.args):
                lo, hi = _enclosing_span(spans, node.lineno)
                if not any(
                    "# py4j-audited" in lines[i - 1]
                    for i in range(lo, min(hi, len(lines)) + 1)
                ):
                    out.append(
                        (
                            node.lineno,
                            "isin() over a data-dependent element list — one "
                            "py4j round-trip PER ELEMENT at plan-build time "
                            "(the r10 45k-id/20s storm). Ship bounded driver "
                            "data as ONE createDataFrame LocalRelation + "
                            "broadcast join, or add '# py4j-audited: <why "
                            "the count is bounded>'",
                        )
                    )
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id == "F"
            and node.func.attr == "lit"
            and node.args
        ):
            arg = node.args[0]
            env7 = _resolve_env(tree, node)
            if isinstance(arg, ast.Name) and arg.id in env7:
                arg = env7[arg.id]
            container = isinstance(
                arg,
                (ast.List, ast.Tuple, ast.Set, ast.ListComp, ast.SetComp,
                 ast.GeneratorExp),
            ) or (
                isinstance(arg, ast.Call)
                and isinstance(arg.func, ast.Name)
                and arg.func.id in ("list", "tuple", "set", "sorted")
            )
            if container and not _is_static_values(node.args[0], env7):
                lo, hi = _enclosing_span(spans, node.lineno)
                if not any(
                    "# py4j-audited" in lines[i - 1]
                    for i in range(lo, min(hi, len(lines)) + 1)
                ):
                    out.append(
                        (
                            node.lineno,
                            "F.lit() of a data-dependent container — one py4j "
                            "round-trip PER ELEMENT (~2.2ms nested) at "
                            "plan-build time (the r10 storm class). Ship "
                            "bounded driver data as ONE createDataFrame "
                            "LocalRelation, or add '# py4j-audited: <why the "
                            "count is bounded>'",
                        )
                    )
    return sorted(set(out))


def _module_assignments(tree: ast.AST) -> dict[str, ast.AST]:
    """name -> value for simple assignments at MODULE level only (constants
    like _STOPWORDS = [...])."""
    out: dict[str, ast.AST] = {}
    body = tree.body if isinstance(tree, ast.Module) else []
    for node in body:
        if isinstance(node, ast.Assign) and len(node.targets) == 1 and isinstance(
            node.targets[0], ast.Name
        ):
            out[node.targets[0].id] = node.value
    return out


def _resolve_env(tree: ast.AST, site: ast.AST) -> dict[str, ast.AST]:
    """Module-level constants overlaid with the enclosing function's simple
    assignments (function bindings shadow module ones)."""
    env = _module_assignments(tree)
    env.update(_assignments(tree, site))
    return env


def _is_static_values(expr: ast.AST, env: dict[str, ast.AST], depth: int = 0) -> bool:
    """True when the expression's element count is fixed by the SOURCE CODE
    (a literal of constants, possibly behind list()/sorted() wrappers or a
    resolvable Name) — the py4j cost is then bounded at code-review time,
    not data-dependent."""
    if depth > 6:
        return False
    if isinstance(expr, ast.Constant):
        return True
    if isinstance(expr, ast.Starred):
        return _is_static_values(expr.value, env, depth + 1)
    if isinstance(expr, (ast.List, ast.Tuple, ast.Set)):
        return all(_is_static_values(e, env, depth + 1) for e in expr.elts)
    if isinstance(expr, ast.Name) and expr.id in env:
        return _is_static_values(
            env[expr.id], {k: v for k, v in env.items() if k != expr.id}, depth + 1
        )
    if (
        isinstance(expr, ast.Call)
        and isinstance(expr.func, ast.Name)
        and expr.func.id in ("list", "tuple", "set", "sorted")
        and len(expr.args) == 1
    ):
        return _is_static_values(expr.args[0], env, depth + 1)
    return False


def _base_frame(expr: ast.AST) -> str | None:
    """The variable name at the base of a DataFrame method chain —
    ``candidates.select(...).filter(...)`` → ``'candidates'``. Returns None
    when the chain bottoms out in a bare function call (``f(...)``: ``f``
    is a function, not a frame) or anything other than a simple Name."""
    node = expr
    while True:
        if isinstance(node, ast.Call):
            if isinstance(node.func, ast.Attribute):
                node = node.func.value
                continue
            return None
        if isinstance(node, ast.Attribute):
            node = node.value
            continue
        if isinstance(node, ast.Name):
            return node.id
        return None


_HOFS = {"transform", "aggregate", "reduce", "filter", "exists", "forall", "zip_with"}

# attribute-call names considered O(1) per evaluation when captured
_CHEAP_CALLS = {"col", "lit", "size", "greatest", "least", "coalesce", "cast", "alias"}


def _assignments(tree: ast.AST, site: ast.AST) -> dict[str, ast.AST]:
    """name -> value for simple assignments in the function enclosing
    ``site`` (nearest FunctionDef whose span contains it)."""
    best = None
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and (
            node.lineno <= site.lineno <= (node.end_lineno or node.lineno)
        ):
            if best is None or node.lineno > best.lineno:
                best = node
    scope = best if best is not None else tree
    out: dict[str, ast.AST] = {}
    for node in ast.walk(scope):
        if isinstance(node, ast.Assign) and len(node.targets) == 1 and isinstance(
            node.targets[0], ast.Name
        ):
            out[node.targets[0].id] = node.value
    return out


def _is_cheap_expr(expr: ast.AST, env: dict[str, ast.AST], depth: int = 0) -> bool:
    """Conservatively true when evaluating ``expr`` once per array element
    cannot be super-constant work: constants, attribute references, F.col /
    F.lit / F.size and arithmetic over cheap parts. Any other Call —
    including local helpers like tokens() — is treated as expensive."""
    if depth > 6:
        return False
    for sub in ast.walk(expr):
        if isinstance(sub, ast.Call):
            fn = sub.func
            if isinstance(fn, ast.Attribute) and fn.attr in _CHEAP_CALLS:
                continue
            return False
        if isinstance(sub, ast.Name) and sub.id in env:
            if not _is_cheap_expr(env[sub.id], {k: v for k, v in env.items() if k != sub.id}, depth + 1):
                return False
    return True


def _expensive_captures(lam: ast.Lambda, env: dict[str, ast.AST]) -> list[str]:
    params = {a.arg for a in lam.args.args}
    for sub in ast.walk(lam.body):
        if isinstance(sub, ast.Lambda):
            params |= {a.arg for a in sub.args.args}
    out = []
    for sub in ast.walk(lam.body):
        if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Load):
            if sub.id in params or sub.id not in env:
                continue  # param, module alias, or non-local — not resolvable
            if not _is_cheap_expr(env[sub.id], {k: v for k, v in env.items() if k != sub.id}):
                out.append(sub.id)
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
