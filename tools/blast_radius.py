"""Staleness blast radius: which FRESH attestations would an edit stale?

While the re-attestation backlog drains (rounds 7-8), every engine-file
edit has a cost: all currently-fresh driver attestations of entries that
(transitively) depend on the file go stale and must be re-attested,
consuming future window slots. This tool answers, BEFORE an edit:

    python tools/blast_radius.py auto_vectordb_spark/operators/bm25.py

for each named repo-relative file (or parity-local helper name, e.g.
``load_views``), the registry entries that depend on it, split into:

  - fresh  — currently-green attestations the edit would STALE (the cost)
  - stale  — already awaiting re-attest (edit is free for these)
  - window — in the CURRENT _ATTEST_WINDOW (driver re-attests this round
             anyway; free IF the edit lands before the driver runs)
  - never  — rows-only entries with no oracle attestation (free)

Uses next_window.py's own fingerprint machinery (entry blocks, alias
imports, one-level transitive deps, parity-local helper augmentation) so
the answer can't drift from the staleness gate itself.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import next_window as NW  # noqa: E402

from auto_vectordb_spark.plans.parity import (  # noqa: E402
    _ATTEST_WINDOW,
    REGISTRY,
)


def dependents(targets: set[str]) -> dict[str, set[str]]:
    """entry name -> subset of `targets` (files or helper names) it
    depends on, per the exact staleness fingerprint."""
    import re

    src = open(f"/root/repo/{NW.PARITY_PATH}").read()
    blocks = NW.entry_blocks(src)
    defs = NW.local_defs(src)
    imports = NW.import_map(src)

    file_bytes: dict[str, bytes] = {}
    for f, _ in imports.values():
        try:
            file_bytes[f] = open(f"/root/repo/{f}", "rb").read()
        except OSError:
            pass

    out: dict[str, set[str]] = {}
    for name, block in blocks.items():
        hits: set[str] = set()
        # parity-local helpers ride along with the block text
        for helper in defs:
            if helper in targets and re.search(
                rf"\b{re.escape(helper)}\b", block
            ):
                hits.add(helper)
        direct = NW.referenced_alias_files(block, imports)
        live = {f for f in direct if f in file_bytes}
        for f in NW.expand_transitive(live, file_bytes):
            if f in targets:
                hits.add(f)
        if NW.PARITY_PATH in targets:
            hits.add(NW.PARITY_PATH)  # every entry lives there
        if hits:
            out[name] = hits
    return out


def classify() -> dict[str, str]:
    """entry -> fresh | stale | window | never, reusing next_window's
    staleness pass (prints its own report; we re-derive silently)."""
    import ast
    import contextlib
    import glob
    import io
    import json

    green: dict[str, str] = {}
    files = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    for path in files:
        for name, row in json.load(open(path)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green[name] = path

    # run next_window's main() and parse its stale list from stdout —
    # single source of truth, no logic fork
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        NW.main()
    stale: set[str] = set()
    for line in buf.getvalue().splitlines():
        if line.startswith("# stale: "):
            # literal_eval, not eval: the line is our own output today, but
            # entry names are user-ish strings and the format may change —
            # never hand a report line to the interpreter (ADVICE r7).
            stale = set(ast.literal_eval(line[len("# stale: ") :]))

    out = {}
    for name in REGISTRY:
        if name in _ATTEST_WINDOW:
            out[name] = "window"
        elif name in stale:
            out[name] = "stale"
        elif name in green:
            out[name] = "fresh"
        else:
            out[name] = "never"
    return out


def main() -> None:
    targets = set(sys.argv[1:])
    if not targets:
        raise SystemExit(__doc__)
    deps = dependents(targets)
    cls = classify()
    by = {"fresh": [], "window": [], "stale": [], "never": []}
    for name in sorted(deps):
        by[cls[name]].append(name)
    print(f"dependents of {sorted(targets)}: {len(deps)} entries")
    for k in ("fresh", "window", "stale", "never"):
        tag = " <-- STALENESS COST" if k == "fresh" and by[k] else ""
        print(f"  {k:6} ({len(by[k])}): {by[k]}{tag}")


if __name__ == "__main__":
    main()
