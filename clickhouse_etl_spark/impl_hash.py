"""Mechanical staleness detection for the query registry (VERDICT r5 #1/#3).

``_STALE_SIGNED`` in ``queries.py`` marks registry entries whose
implementing code changed after their last driver-signed CORRECTNESS
row, so the rotation re-signs them first. Until r5 that set was
maintained by hand from per-function git diffs — a human-error-prone
invariant. This module makes it mechanical:

- ``impl_hash(fn)`` computes a sha256 over the *transitive* source of a
  registry wrapper: the wrapper's own source plus the source of every
  function/class defined inside ``clickhouse_etl_spark`` that the
  wrapper (or anything it reaches) references by name. The walk
  resolves identifiers against each function's module globals, so it
  follows ``from .dataops.x import f`` imports and module-level helper
  calls alike.
- ``scripts/snapshot_impl_hashes.py`` freezes ``registry_hashes()`` to
  ``clickhouse_etl_spark/impl_hashes_signed.json`` at signing time
  (i.e. at the commit the driver's CORRECTNESS run certified).
- ``tests/test_rotation.py`` asserts that every entry whose current
  hash differs from the snapshot is either never-driver-checked
  (priority 0 already) or listed in ``_STALE_SIGNED`` — editing an
  implementing function without updating the stale set fails the fast
  suite immediately.

The hash is deliberately conservative in the safe direction: it may
flag an entry whose behaviour didn't change (docstring edit in a shared
helper), which merely spends rotation budget; it cannot *miss* a change
to any function the entry actually executes, as long as that function
is reachable by name from the wrapper (lambdas stored in data
structures are included via their enclosing definition's source).
"""

from __future__ import annotations

import hashlib
import inspect
import json
import re
from pathlib import Path

_PKG = "clickhouse_etl_spark"
_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")

SNAPSHOT_PATH = Path(__file__).with_name("impl_hashes_signed.json")


def _in_pkg(obj) -> bool:
    mod = getattr(obj, "__module__", None)
    return bool(mod) and (mod == _PKG or mod.startswith(_PKG + "."))


def _source_of(obj) -> str | None:
    try:
        return _strip_docstrings(inspect.getsource(obj))
    except (OSError, TypeError):
        return None


def _strip_docstrings(src: str) -> str:
    """Remove def/class docstrings from a source snippet — both for
    hashing (a docstring edit does not change behavior and must not
    burn rotation budget) and for identifier extraction (a
    ``:func:`other_entry``` cross-reference in prose must not make the
    walker treat ``other_entry`` as an implementation dependency).
    Non-docstring string literals (SQL templates, constants) are kept —
    they ARE behavior. Falls back to the raw source if it does not
    parse standalone (decorated/indented edge cases)."""
    import ast
    import textwrap

    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return src
    spans = []
    for node in ast.walk(tree):
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            body = node.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                spans.append((body[0].lineno, body[0].end_lineno))
    if not spans:
        return src
    lines = textwrap.dedent(src).splitlines(keepends=True)
    drop = {
        i
        for lo, hi in spans
        for i in range(lo - 1, min(hi, len(lines)))
    }
    return "".join(l for i, l in enumerate(lines) if i not in drop)


def _reachable(fn) -> dict[str, str]:
    """Map of ``module.qualname -> source`` for fn plus every package
    function/class transitively referenced by name from its source."""
    seen: dict[str, str] = {}
    stack = [fn]
    while stack:
        obj = stack.pop()
        obj = inspect.unwrap(obj)
        key = f"{getattr(obj, '__module__', '?')}.{getattr(obj, '__qualname__', getattr(obj, '__name__', '?'))}"
        if key in seen:
            continue
        src = _source_of(obj)
        if src is None:
            continue
        seen[key] = src
        mod = inspect.getmodule(obj)
        namespace = dict(getattr(mod, "__dict__", {}))
        # function-LOCAL imports (`from .dataops.x import f` inside the
        # body) never reach module globals — resolve them explicitly or
        # the walk silently stops at the wrapper (missed-staleness hole
        # found in r6: docs_incremental_dedup was not flagged after a
        # dedup_against change)
        namespace.update(_local_imports(src, getattr(mod, "__name__", _PKG)))
        # methods resolve against their class too
        cls = getattr(obj, "__self__", None)
        for name in set(_IDENT.findall(src)):
            target = namespace.get(name)
            if target is None and cls is not None:
                target = getattr(type(cls), name, None)
            if target is None:
                continue
            if inspect.ismodule(target) and _in_pkg_module(target):
                # referenced as module.attr — pull the attrs used
                for attr in _module_attrs_used(src, name):
                    t2 = getattr(target, attr, None)
                    if t2 is not None and _hashable_target(t2):
                        stack.append(t2)
                continue
            if _hashable_target(target):
                stack.append(target)
    return seen


def _import_from_nodes(src: str) -> list[tuple[int, str, list[tuple[str, str]]]]:
    """AST-extract ``from X import a, b as c`` statements from ``src`` as
    ``(level, module, [(name, alias), ...])`` tuples. AST parsing (vs the
    r6 regex) is what makes parenthesized multi-line imports — ``from .x
    import (\\n a,\\n b)`` — resolve; the regex captured only ``(`` and
    silently dropped every dep behind such an import (ADVICE r6 high:
    emb_ivf_pq_ann_topk reached zero of its similarity deps)."""
    import ast
    import textwrap

    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return []
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            out.append(
                (
                    node.level,
                    node.module or "",
                    [(a.name, a.asname or a.name) for a in node.names],
                )
            )
    return out


def _local_imports(src: str, from_module: str) -> dict:
    """Resolve ``from .x import a, b`` statements in ``src`` against the
    package, including relative forms, returning {name: object}."""
    import importlib

    out: dict = {}
    for level, modname, names in _import_from_nodes(src):
        if level > 0:
            # resolve relative to the defining module's package
            pkg = from_module.rsplit(".", 1)[0] if "." in from_module else from_module
            base_parts = pkg.split(".")
            if level > 1:
                base_parts = base_parts[: len(base_parts) - (level - 1)]
            target = ".".join(base_parts + ([modname] if modname else []))
        else:
            target = modname
        if not (target == _PKG or target.startswith(_PKG + ".")):
            continue
        try:
            mod = importlib.import_module(target)
        except ImportError:
            continue
        for name, alias in names:
            obj = getattr(mod, name, None)
            if obj is not None:
                out[alias] = obj
    return out


def _in_pkg_module(mod) -> bool:
    name = getattr(mod, "__name__", "")
    return name == _PKG or name.startswith(_PKG + ".")


def _module_attrs_used(src: str, modname: str) -> set[str]:
    return set(re.findall(rf"\b{re.escape(modname)}\.([A-Za-z_][A-Za-z0-9_]*)", src))


def _hashable_target(obj) -> bool:
    return (inspect.isfunction(obj) or inspect.isclass(obj)) and _in_pkg(obj)


def impl_hash(fn) -> str:
    parts = _reachable(fn)
    h = hashlib.sha256()
    for key in sorted(parts):
        h.update(key.encode())
        h.update(b"\x00")
        h.update(parts[key].encode())
        h.update(b"\x01")
    return h.hexdigest()[:16]


def registry_hashes() -> dict[str, str]:
    from . import queries

    return {name: impl_hash(qd.fn) for name, qd in queries.QUERIES.items()}


def load_snapshot() -> dict[str, str]:
    if not SNAPSHOT_PATH.exists():
        return {}
    return json.loads(SNAPSHOT_PATH.read_text())


def changed_entries() -> list[str]:
    """Registry entries whose implementing source differs from the
    signed snapshot (new entries — absent from the snapshot — are NOT
    listed; they are priority 0 by virtue of never being checked)."""
    snap = load_snapshot()
    if not snap:
        return []
    cur = registry_hashes()
    return sorted(n for n, h in cur.items() if n in snap and snap[n] != h)
