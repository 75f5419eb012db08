"""Propose the next driver-attestation window (see parity._ATTEST_WINDOW).

The driver's correctness gate samples the FIRST 50 ``queries()`` entries
per round. This tool reads every CORRECTNESS_r*.json in the repo root and
prints the next 50-entry window, prioritized:

    rotating sentinels  >  never-attested oracle-paired  >  STALE re-attests

Staleness (the honesty guard): a past green driver row only proves the
code AS OF THAT ROUND was correct. For every attested entry we compare its
implementation between the graded tree (the parent of the ``round N:
verdict/...`` artifact commit that added its green CORRECTNESS file) and
HEAD:

- the entry's own ``@_register(...)`` block in plans/parity.py (decorators
  included, so the oracle SQL counts), extracted by AST, AUGMENTED with the
  source of every parity-local helper/constant the block references
  (load_views, _punct_docs, TOKS_SQL, _QUALITY_CTE, ... — constants matter
  because the oracle f-strings expand them at import time), and compared
  whitespace-normalized; and
- every engine file the entry's block references through ANY of parity's
  relative imports — module-level aliases (DD., KNN., TS., ...) and
  function-local imports (SRC., VectorPipeline, CAT., ...) alike, derived
  automatically from parity's AST — PLUS each such module's own one-level
  relative-import deps (dedup -> functions/hashing & functions/text, ...),
  compared by file bytes.

If any of that changed since the entry's LATEST green row, the attestation
is stale and the entry re-enters the window (newest-green last, so the
oldest stale attestations re-verify first). This is deliberately
conservative: a comment-only edit to operators/dedup.py re-attests every
dedup entry — cheap, and it means "driver-green" always refers to code the
driver has actually seen. Remaining limitation (documented, not hidden):
the engine-module walk is one import level deep — a change in a
second-level dep reached ONLY through another engine module (none exist
today; functions/* have no further relative fan-out) would be missed.

Sentinels rotate: 3 slots picked deterministically from the non-stale
green pool by round index, so over rounds the driver re-confirms old
greens instead of re-checking the same three forever.

Paste the output over parity._ATTEST_WINDOW at the start of a round, run
`python tools/check_parity.py /root/testdata/sf0.01 <window names>` to
pre-verify.

Usage: python tools/next_window.py [--no-stale]
"""

from __future__ import annotations

import ast
import glob
import json
import re
import subprocess
import sys

sys.path.insert(0, "/root/repo")

from auto_vectordb_spark.plans.parity import REGISTRY  # noqa: E402

WINDOW = 50
N_SENTINELS = 3
PARITY_PATH = "auto_vectordb_spark/plans/parity.py"

PKG = "auto_vectordb_spark"


def import_map(parity_source: str) -> dict[str, tuple[str, str]]:
    """name/alias -> (repo-relative file, kind) for EVERY relative import in
    parity.py — module-level AND function-local (the roundtrip/staging
    entries import sources/files, pipeline, catalog, ... inside their
    bodies; a static alias table silently missed those and their
    attestations could never go stale). kind: "module" aliases are matched
    as ``alias.``, "symbol" imports (functions/classes) as bare words."""
    import os

    out: dict[str, tuple[str, str]] = {}
    for node in ast.walk(ast.parse(parity_source)):
        if not isinstance(node, ast.ImportFrom) or node.level != 2:
            continue
        base = f"{PKG}/{node.module.replace('.', '/')}" if node.module else PKG
        for a in node.names:
            name = a.asname or a.name
            mod_file = f"{base}/{a.name}.py"
            if os.path.exists(f"/root/repo/{mod_file}"):
                out[name] = (mod_file, "module")
            else:
                out[name] = (f"{base}.py", "symbol")
    return out


def _git_show(commit: str, path: str) -> str | None:
    r = subprocess.run(
        ["git", "-C", "/root/repo", "show", f"{commit}:{path}"],
        capture_output=True,
        text=True,
    )
    return r.stdout if r.returncode == 0 else None


def _graded_commit(correctness_path: str) -> str | None:
    """The tree the driver graded = parent of the commit that ADDED the
    round's CORRECTNESS artifact.

    That derivation is only sound if the artifact commit contains NO
    engine/parity/tooling changes — otherwise staleness would be computed
    against a tree the driver never saw, and a changed entry could keep a
    green attestation it no longer deserves. Verified here, loudly: a mixed
    artifact commit aborts the tool rather than silently mis-fingerprinting.
    """
    r = subprocess.run(
        ["git", "-C", "/root/repo", "log", "--format=%H", "--diff-filter=A", "--", correctness_path],
        capture_output=True,
        text=True,
    )
    lines = r.stdout.split()
    if not lines:
        # Round-6 verdict #3: an on-disk but UNCOMMITTED ledger has no ADD
        # commit, so every entry it freshly attested would silently be
        # mis-counted as stale (r6 saw 137 reported vs 87 true) — and a
        # window rotated over that output would squander its slots
        # re-attesting already-green entries. Refuse loudly instead.
        raise SystemExit(
            f"{correctness_path} exists on disk but git has no commit adding "
            "it: the round's ledger is uncommitted, so staleness output would "
            "be wrong. Commit the artifact (artifact-only commit) first, "
            "then re-run."
        )
    commit = lines[-1]
    touched = subprocess.run(
        ["git", "-C", "/root/repo", "show", "--name-only", "--format=", commit],
        capture_output=True,
        text=True,
    ).stdout.split()
    code = [
        p for p in touched
        if p.startswith((f"{PKG}/", "tools/", "tests/", "__spark_entry__", "bench.py"))
    ]
    if code:
        raise SystemExit(
            f"artifact commit {commit[:12]} (adds {correctness_path}) also "
            f"touches code {code}: the graded-tree derivation (parent of the "
            "artifact commit) is unsound for this round — inspect the commit "
            "and fix the derivation before trusting staleness output"
        )
    return f"{commit}^"


def entry_blocks(parity_source: str) -> dict[str, str]:
    """name -> whitespace-normalized source of the @_register block
    (decorators included, so oracle SQL + doc changes count)."""
    tree = ast.parse(parity_source)
    out: dict[str, str] = {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.FunctionDef):
            continue
        for dec in node.decorator_list:
            if (
                isinstance(dec, ast.Call)
                and isinstance(dec.func, ast.Name)
                and dec.func.id == "_register"
                and dec.args
                and isinstance(dec.args[0], ast.Constant)
                and isinstance(dec.args[0].value, str)
            ):
                start = min(d.lineno for d in node.decorator_list) - 1
                seg = "\n".join(parity_source.splitlines()[start : node.end_lineno])
                out[dec.args[0].value] = re.sub(r"\s+", " ", seg).strip()
    return out


def referenced_alias_files(block: str, imports: dict[str, tuple[str, str]]) -> set[str]:
    out = set()
    for name, (f, kind) in imports.items():
        pat = rf"\b{re.escape(name)}\." if kind == "module" else rf"\b{re.escape(name)}\b"
        if re.search(pat, block):
            out.add(f)
    return out


def module_relative_deps(source: str, mod_file: str) -> set[str]:
    """Repo-relative files imported by an engine module via RELATIVE imports
    — the one-level transitive expansion the round-4 verdict asked for: an
    entry whose block names ``DD.`` must go stale when functions/hashing.py
    (which dedup imports) changes, not only when dedup.py itself does.
    One level deep by design: every engine module's own relative imports
    land in functions/ or sibling operators/, which have no further
    relative fan-out worth walking (and a full closure would make every
    entry depend on everything, erasing the signal)."""
    import os

    pkg_dir = mod_file.rsplit("/", 1)[0]  # e.g. auto_vectordb_spark/operators
    out: set[str] = set()
    try:
        tree = ast.parse(source)
    except SyntaxError:
        return out
    for node in ast.walk(tree):
        if not isinstance(node, ast.ImportFrom) or node.level == 0:
            continue
        base_parts = pkg_dir.split("/")
        if node.level > 1:
            base_parts = base_parts[: len(base_parts) - (node.level - 1)]
        base = "/".join(base_parts + (node.module.split(".") if node.module else []))
        for a in node.names:
            cand = f"{base}/{a.name}.py"
            if os.path.exists(f"/root/repo/{cand}"):
                out.add(cand)
            elif os.path.exists(f"/root/repo/{base}.py"):
                out.add(f"{base}.py")
    return out


def expand_transitive(files: set[str], file_bytes: dict[str, bytes]) -> set[str]:
    """files + each file's one-level relative-import deps (resolved against
    the CURRENT tree's sources in ``file_bytes``; a dep file is fingerprinted
    whenever any referencing module is)."""
    out = set(files)
    for f in files:
        src = file_bytes.get(f)
        if src is not None:
            out |= module_relative_deps(src.decode("utf-8", "replace"), f)
    return out


def local_defs(parity_source: str) -> dict[str, str]:
    """name -> normalized source of parity.py's own top-level helpers —
    plain functions (load_views, _punct_docs, ...) and constants (TOKS_SQL,
    _QUALITY_CTE, ...) that entry blocks reference. Registered entries are
    excluded (they are the blocks themselves). Constants matter because the
    oracle SQL f-strings expand them at import time: the block SOURCE shows
    ``{TOKS_SQL...}`` unchanged while the executed SQL changes."""
    lines = parity_source.splitlines()
    out: dict[str, str] = {}

    def seg(node) -> str:
        start = min(
            [node.lineno] + [d.lineno for d in getattr(node, "decorator_list", [])]
        ) - 1
        return re.sub(r"\s+", " ", "\n".join(lines[start : node.end_lineno])).strip()

    for node in ast.parse(parity_source).body:
        if isinstance(node, ast.FunctionDef):
            if any(
                isinstance(d, ast.Call)
                and isinstance(d.func, ast.Name)
                and d.func.id == "_register"
                for d in node.decorator_list
            ):
                continue
            out[node.name] = seg(node)
        elif isinstance(node, ast.Assign) and len(node.targets) == 1 and isinstance(
            node.targets[0], ast.Name
        ):
            out[node.targets[0].id] = seg(node)
    return out


def augment_block(block: str, defs: dict[str, str]) -> str:
    """Block source + the normalized sources of every parity-local helper it
    references, so a helper edit marks all its entries stale."""
    used = sorted(
        name for name in defs if re.search(rf"\b{re.escape(name)}\b", block)
    )
    return block + " || " + " || ".join(defs[n] for n in used)


def main() -> None:
    check_stale = "--no-stale" not in sys.argv

    # latest green round per entry
    green_round: dict[str, str] = {}
    files = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    for path in files:
        for name, row in json.load(open(path)).items():
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                green_round[name] = path
    n_rounds = len(files)

    head_parity = open(f"/root/repo/{PARITY_PATH}").read()
    head_blocks = entry_blocks(head_parity)
    head_defs = local_defs(head_parity)
    imports = import_map(head_parity)

    head_file_cache: dict[str, bytes | None] = {}

    def head_bytes(f: str) -> bytes | None:
        if f not in head_file_cache:
            try:
                head_file_cache[f] = open(f"/root/repo/{f}", "rb").read()
            except OSError:
                head_file_cache[f] = None
        return head_file_cache[f]

    for f, _ in imports.values():
        head_bytes(f)

    stale: list[str] = []  # ordered oldest-green first
    fresh_green: list[str] = []
    if check_stale:
        graded: dict[str, str | None] = {p: _graded_commit(p.split("/")[-1]) for p in files}
        old_blocks_cache: dict[str, dict[str, str]] = {}
        old_defs_cache: dict[str, dict[str, str]] = {}
        old_file_cache: dict[tuple[str, str], bytes | None] = {}
        for name, path in sorted(green_round.items(), key=lambda kv: kv[1]):
            commit = graded.get(path)
            if name not in REGISTRY or REGISTRY[name].sql is None:
                continue
            if commit is None:
                stale.append(name)
                continue
            if commit not in old_blocks_cache:
                src = _git_show(commit, PARITY_PATH)
                old_blocks_cache[commit] = entry_blocks(src) if src else {}
                old_defs_cache[commit] = local_defs(src) if src else {}
            raw_cur = head_blocks.get(name)
            raw_old = old_blocks_cache[commit].get(name)
            is_stale = raw_cur is None or raw_old is None
            if not is_stale:
                # parity-local helpers ride along with the block text
                cur = augment_block(raw_cur, head_defs)
                old = augment_block(raw_old, old_defs_cache[commit])
                is_stale = cur != old
            if not is_stale:
                direct = referenced_alias_files(raw_cur, imports)
                live = {f for f in direct if head_bytes(f) is not None}
                for f in sorted(expand_transitive(live, head_file_cache)):
                    key = (commit, f)
                    if key not in old_file_cache:
                        s = _git_show(commit, f)
                        old_file_cache[key] = s.encode() if s is not None else None
                    if old_file_cache[key] != head_bytes(f):
                        is_stale = True
                        break
            (stale if is_stale else fresh_green).append(name)
    else:
        fresh_green = [n for n in green_round if n in REGISTRY and REGISTRY[n].sql is not None]

    # rows-only (sql is None) entries are EXCLUDED from every window by
    # policy, not accident: the driver's hash compare records any no-oracle
    # entry as a permanent red row (the r2 ann_*/dedup_embedding_* rows —
    # see README's correctness-ledger note); their quality gates are the
    # recall/equivalence tests, so window slots go to hash-verifiable
    # entries only.
    never = [
        n for n, q in REGISTRY.items() if q.sql is not None and n not in green_round
    ]

    # rotating sentinels from the non-stale green pool, by round index
    pool = sorted(fresh_green)
    sentinels = (
        [pool[(n_rounds * N_SENTINELS + i) % len(pool)] for i in range(N_SENTINELS)]
        if pool
        else []
    )
    sentinels = list(dict.fromkeys(sentinels))

    window: list[str] = list(sentinels)
    for group in (never, stale):
        for n in group:
            if n not in window and len(window) < WINDOW:
                window.append(n)
    # The driver samples the FIRST 50 queries() entries no matter what, so
    # an under-full window just hands positions N..50 to registration
    # order. Make them deliberate instead: pad with extra sentinels from
    # the fresh-green pool, OLDEST green row first — those attestations
    # are the ones most in need of re-confirmation (contract: the window
    # is always exactly WINDOW names, tests/test_entry_contract.py).
    if len(window) < WINDOW:
        by_oldest = sorted(
            (n for n in fresh_green if n not in window),
            key=lambda n: (green_round[n], n),
        )
        window.extend(by_oldest[: WINDOW - len(window)])
    backlog = [n for n in [*never, *stale] if n not in window]

    print(
        f"# attested-green ever: {len(green_round)}; never attested (oracle-paired): "
        f"{len(never)}; stale attestations needing re-verify: {len(stale)}"
    )
    if stale:
        print(f"# stale: {stale}")
    print(f"# next window ({len(window)}): {len(sentinels)} rotating sentinels + "
          f"{min(len(never), WINDOW - len(sentinels))} never-attested + stale re-attests")
    print("_ATTEST_WINDOW = [")
    for n in window:
        print(f'    "{n}",')
    print("]")
    if backlog:
        print(f"# backlog for the round after ({len(backlog)}): {backlog}")


if __name__ == "__main__":
    main()
