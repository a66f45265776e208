"""Per-entry code fingerprints for the correctness-gate archive.

An archived green CORRECTNESS row only remains valid while the code that
produced it is unchanged. Each gate entry gets an md5 fingerprint over the
exact code it can reach:

- the entry callable's source, plus every module-level helper of the entry
  module it (transitively) references by name;
- the source of every scipi_spark function/class reachable from there,
  resolved through each function's ``__globals__`` AND through import
  statements inside the function body (v4 — function-local
  ``from scipi_spark.sources.io import write_csv`` binds locals, not
  globals, so v3 kept a stale archived stamp when io.py changed:
  the round-9 write_csv null/empty edit left ``sink_roundtrip``
  archived), followed transitively ACROSS modules (so an edit to
  ``functions/text.py`` invalidates an entry that only names
  ``ingest``), at FUNCTION granularity — appending a new operator to a
  module does NOT invalidate the module's other entries (file-level
  hashing re-fronted 40+ entries per round, defeating the archive);
- module-level constants reachable the same way (regex strings, schemas,
  thresholds): names matching ``^[A-Z][A-Z_0-9]*$`` hashed by repr (sets
  are sorted first — their repr order is hash-randomized). Leading
  underscore names are skipped on purpose: runtime caches like
  ``_CENTROID_CACHE`` would make fingerprints nondeterministic;
- for pyspark UDF objects (v6): the wrapped kernel's source PLUS the
  UDF's returnType/evalType/deterministic flag, which live in
  module-level statements outside any reachable function source;
- the entry's DuckDB oracle SQL.

Sources are hashed in BEHAVIOR-NORMALIZED form (v3): parsed, docstrings
dropped, re-serialized from the AST — so docstring, comment and
formatting edits do not change a fingerprint (none can change results),
while any executable change still does. The name scan that discovers
reachable code runs over the same normalized source, so a docstring
word can never create a dependency edge (round-6 finding: entries whose
docstrings contained the bare word ``entry`` were re-fronted whenever
any entry was added).

ALGO_VERSION: bump when this algorithm changes. Regeneration of past
rounds' stamps is automatic since round 6: ``archived_green_entries``
drops mismatched-version stamps and re-stamps each archive against its
git-worktree'd snapshot tree (tools/stamp_round.py).
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import re
import textwrap

ALGO_VERSION = 6

_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")
_ATTR_RE = re.compile(r"\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)")
_CONST_RE = re.compile(r"^[A-Z][A-Z_0-9]*$")


def _stable_repr(obj) -> str:
    if isinstance(obj, (set, frozenset)):
        return "set:" + repr(sorted(map(repr, obj)))
    r = repr(obj)
    if " at 0x" in r:  # address-bearing default reprs are not stable
        return "unstable:" + type(obj).__name__
    return r


def _behavior_source(src: str) -> str:
    """AST-normalized source: docstrings removed, comments/formatting
    gone by construction (they are not in the AST). Falls back to the
    raw text when the fragment does not parse standalone."""
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return src
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(
                node,
                (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
            )
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            node.body = body[1:] or [ast.Pass()]
    return ast.unparse(tree)


def _source_of(fn) -> str:
    try:
        return _behavior_source(inspect.getsource(fn))
    except (OSError, TypeError):
        return "nosource:" + getattr(fn, "__name__", repr(type(fn)))


def _is_traceable(obj) -> bool:
    mod = getattr(obj, "__module__", "") or ""
    return (inspect.isfunction(obj) or inspect.isclass(obj)) and (
        mod.startswith("scipi_spark") or mod == "__spark_entry__"
    )


def _unwrap_udf(obj):
    """The engine function wrapped inside a UDF-like object (pyspark
    ``UserDefinedFunction`` / ``pandas_udf`` results keep it as ``.func``)
    — v5: without this, a module-level ``_X_UDF = pandas_udf(kernel, ...)``
    hides ``kernel`` from the closure, so editing the kernel leaves every
    archived stamp of entries that execute it green (the r12 Arrow-ingest
    kernels hit exactly this blind spot). v6 (r12 advice): only objects
    that are actually pyspark UDFs unwrap — gated on ``evalType``, which
    every UserDefinedFunction and ``_wrapped()`` result carries. Without
    the gate a ``functools.partial`` of an engine function matched too,
    and its BOUND ARGUMENTS (previously hashed by the _CONST_RE /
    _stable_repr branch) silently dropped out of the fingerprint."""
    if not hasattr(obj, "evalType"):
        return None
    inner = getattr(obj, "func", None)
    return inner if inner is not None and _is_traceable(inner) else None


def _udf_meta(obj) -> str:
    """Behavior-bearing UDF state that lives OUTSIDE the kernel's source
    (v6, r12 advice): returnType decides Arrow casts, evalType decides
    scalar-vs-pandas execution, and the deterministic flag is
    load-bearing for plan shape (a removed ``asNondeterministic()``
    re-duplicates the kernel below pushed filters). All three are set by
    module-level statements the reachable-source walk cannot see."""
    return "udf:" + repr(
        (
            str(getattr(obj, "returnType", None)),
            getattr(obj, "evalType", None),
            bool(getattr(obj, "deterministic", True)),
        )
    )


def reachable_sources(fn) -> str:
    """Concatenated (sorted, deduped) sources of the scipi_spark
    functions/classes and the reprs of the CONSTANT values reachable from
    ``fn`` by word-level name references, following ``__globals__``
    transitively across modules."""
    seen = _reach(fn)
    return "".join(seen[k] for k in sorted(seen))


def reachable_keys(fn) -> set[str]:
    """The module-qualified names :func:`reachable_sources` hashes for
    ``fn`` — exposed for the registry-stability guard test: an entry
    whose closure reaches the registry functions themselves (``queries``
    / ``oracle_sql`` / ...) gets a new fingerprint every time ANY entry
    is added, silently re-fronting it (round-6 finding: a local variable
    or docstring word is enough, since matching is name-based)."""
    return set(_reach(fn))


def _local_import_bindings(src: str) -> dict[str, object]:
    """Name -> object bindings created by import statements INSIDE
    ``src``, for engine modules (scipi_spark / __spark_entry__) only.
    Function-local imports bind locals, which ``__globals__`` cannot
    see — without this pass, an entry doing
    ``from scipi_spark.sources.io import write_csv`` in its body keeps
    its archived green stamp when io.py changes (the v3 blind spot)."""
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return {}
    import importlib

    out: dict[str, object] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            modname = node.module or ""
            if not (
                modname.startswith("scipi_spark") or modname == "__spark_entry__"
            ):
                continue
            try:
                m = importlib.import_module(modname)
            except Exception:
                continue
            for a in node.names:
                obj = getattr(m, a.name, None)
                if obj is None:
                    # ``from scipi_spark.operators import multimodal``:
                    # a package attribute for a submodule exists only
                    # once that submodule is imported somewhere — getattr
                    # alone made the closure depend on process import
                    # state (nondeterministic fingerprints). Import it.
                    try:
                        obj = importlib.import_module(
                            f"{modname}.{a.name}"
                        )
                    except Exception:
                        obj = None
                if obj is not None:
                    out[a.asname or a.name] = obj
        elif isinstance(node, ast.Import):
            for a in node.names:
                if not a.name.startswith("scipi_spark"):
                    continue
                try:
                    m = importlib.import_module(a.name)
                except Exception:
                    continue
                if a.asname:  # plain ``import a.b.c`` binds ``a`` — the
                    out[a.asname] = m  # dotted chain is beyond the regex
    return out


def _reach(fn) -> dict[str, str]:
    seen: dict[str, str] = {}
    stack = [fn]
    visited: set[int] = set()
    while stack:
        f = stack.pop()
        if id(f) in visited:
            continue
        visited.add(id(f))
        src = _source_of(f)
        key = f"{getattr(f, '__module__', '?')}.{getattr(f, '__name__', '?')}"
        seen[key] = src
        g = getattr(f, "__globals__", None)
        if g is None:  # classes: use their module's namespace
            import sys as _sys

            m = _sys.modules.get(getattr(f, "__module__", ""), None)
            g = vars(m) if m is not None else {}
        locally_imported = _local_import_bindings(src)
        if locally_imported:
            g = {**g, **locally_imported}
        for name in set(_NAME_RE.findall(src)):
            if name not in g:
                continue
            obj = g[name]
            # UDF check FIRST: a pandas_udf result is a functools.wraps
            # wrapper that PASSES _is_traceable (isfunction, copied
            # __module__/__name__) but whose source is pyspark's generic
            # wrapper body — visiting it would shadow the real kernel
            # under the kernel's own key and the closure would stop there
            inner = _unwrap_udf(obj)
            if inner is not None:
                stack.append(inner)
                seen[
                    "udfmeta:"
                    f"{getattr(inner, '__module__', '?')}"
                    f".{getattr(inner, '__name__', '?')}"
                ] = _udf_meta(obj)
            elif _is_traceable(obj):
                stack.append(obj)
            elif _CONST_RE.match(name) and not inspect.ismodule(obj):
                seen[f"const:{name}"] = _stable_repr(obj)
        # module-attribute references (``ingest.parse_oag``,
        # ``textops.MAX_TOPIC_LEN``): resolve the attr through the module
        for base, attr in set(_ATTR_RE.findall(src)):
            mod = g.get(base)
            if not inspect.ismodule(mod):
                continue
            if not (mod.__name__ or "").startswith("scipi_spark"):
                continue
            obj = getattr(mod, attr, None)
            inner = _unwrap_udf(obj) if obj is not None else None
            if inner is not None:
                stack.append(inner)
                seen[
                    "udfmeta:"
                    f"{getattr(inner, '__module__', '?')}"
                    f".{getattr(inner, '__name__', '?')}"
                ] = _udf_meta(obj)
            elif _is_traceable(obj):
                stack.append(obj)
            elif (
                obj is not None
                and _CONST_RE.match(attr)
                and not inspect.ismodule(obj)
            ):
                seen[f"const:{mod.__name__}.{attr}"] = _stable_repr(obj)
    return seen


def entry_fingerprints(entries: dict, oracles: dict) -> dict[str, str]:
    """md5 fingerprint per gate entry (see module docstring)."""
    out: dict[str, str] = {}
    for name, fn in entries.items():
        try:
            h = hashlib.md5(f"v{ALGO_VERSION}:".encode())
            h.update(reachable_sources(fn).encode())
            h.update(oracles.get(name, "").encode())
            out[name] = h.hexdigest()
        except Exception:
            out[name] = "unfingerprintable"  # never matches a stamp → fresh
    return out
