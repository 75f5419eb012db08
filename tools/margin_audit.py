"""Rounding-boundary margin audit over every oracle-paired registry entry.

Round 4's one driver-red row (`term_drift_by_source`) failed because its
final column was ``round(<double rebuilt from a quantized int64 sum>, 6)``
and the value landed 4e-9 from its 6-decimal rounding boundary — close
enough that a different DuckDB/libm build rounds it the other way, flipping
the hash while every local gate stays green. The exposure is generic: ANY
display-rounded output column whose pre-round value sits within
engine-library skew of a boundary can flip.

This tool measures that exposure directly, per the round-4 verdict:

1. For each oracle-paired entry, rewrite the oracle SQL replacing every
   *display* round — ``round(expr, d)`` with d >= 4 — by ``(expr)``.
   Quantization rounds (one-arg ``round(x*1e9)`` / ``round(x, 0)``) are
   deliberately kept: they are parity rule 1's single sanctioned
   discretization, applied where per-item margins dwarf libm skew.
2. Run the rewritten SQL in DuckDB at the given sf dir and, for every
   column that was a top-level ``round(..., d) AS alias`` output, compute
   each value's distance to its nearest d-decimal rounding boundary:
   ``margin(v) = (|frac(v * 10^d) - 0.5|) / 10^d``.
3. Report the minimum margin per (entry, column) and flag anything under
   ``--threshold`` (default 1e-7, the verdict's suggested gate).

A flagged entry is one driver-environment library version away from a hash
flip and should be reshaped to emit the exact integer (see
term_drift_by_source / zipf_fit / bigram_lm_nll / dsir_importance_weights
for the pattern) — NOT "fixed" by chasing libm.

Usage: python tools/margin_audit.py [--json OUT.json] [--threshold 1e-7]
                                    [sf_dir] [entry ...]
"""

from __future__ import annotations

import json
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from auto_vectordb_spark.plans.parity import REGISTRY, TABLES  # noqa: E402

DEFAULT_SF = "/root/testdata/sf0.01"
MIN_DISPLAY_DECIMALS = 4  # round(x, >=4) = display round; below = semantic


def _match_paren(s: str, open_idx: int) -> int:
    """Index of the ')' closing the '(' at open_idx (no string literals with
    parens appear in the registry's SQL; quotes are still skipped defensively)."""
    depth = 0
    i = open_idx
    in_str: str | None = None
    while i < len(s):
        c = s[i]
        if in_str:
            if c == in_str:
                in_str = None
        elif c in ("'", '"'):
            in_str = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("unbalanced parens")


def _split_top_level(s: str) -> list[str]:
    parts, depth, cur, in_str = [], 0, [], None
    for c in s:
        if in_str:
            cur.append(c)
            if c == in_str:
                in_str = None
            continue
        if c in ("'", '"'):
            in_str = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(c)
    parts.append("".join(cur))
    return parts


def strip_display_rounds(sql: str) -> tuple[str, dict[str, int]]:
    """Replace every ``round(expr, d)`` with d >= MIN_DISPLAY_DECIMALS by
    ``(expr)``; return (rewritten sql, {alias: d}) for occurrences directly
    followed by ``AS alias`` (the ones whose output column we can audit)."""
    import re

    aliases: dict[str, int] = {}
    out = sql
    while True:
        m = None
        for cand in re.finditer(r"\bround\s*\(", out, flags=re.IGNORECASE):
            open_idx = out.index("(", cand.start())
            close_idx = _match_paren(out, open_idx)
            args = _split_top_level(out[open_idx + 1 : close_idx])
            if len(args) != 2:
                continue
            try:
                d = int(args[1].strip())
            except ValueError:
                continue
            if d >= MIN_DISPLAY_DECIMALS:
                m = (cand.start(), open_idx, close_idx, args[0], d)
                break
        if m is None:
            return out, aliases
        start, open_idx, close_idx, expr, d = m
        tail = out[close_idx + 1 :]
        am = re.match(r"\s+AS\s+(\w+)", tail, flags=re.IGNORECASE)
        if am:
            aliases[am.group(1)] = d
        out = f"{out[:start]}({expr}){tail}"


def margin(v: float, d: int) -> float:
    """Distance from v to its nearest d-decimal rounding boundary."""
    f = v * 10.0**d
    return abs(f - math.floor(f) - 0.5) / 10.0**d


def lattice_scale(vals: list[float]) -> int | None:
    """Smallest s in 0..9 such that every v*10^s is integral (rel tol 1e-12)
    — i.e. the values are reconstructed from 10^-s-quantized integers. None
    if no such s exists (generic continuous values).

    Hazard rule: a display round(x, d) over a column lattice-valued at
    s > d is the exact shape that went driver-red in round 4 — lattice
    points land at arbitrary offsets inside the d-decimal grid, so a
    one-quantum cross-engine disagreement (a libm ln off by ~1e-12 in a
    different engine build flipping one quantized contribution) moves the
    rounded output a full 1e-d step. Lattice at s <= d is safe: the points
    sit ON the output grid, maximally far from every boundary.
    """
    for s in range(0, 10):
        scale = 10.0**s
        if all(
            abs(v * scale - round(v * scale)) <= 1e-12 * max(1.0, abs(v * scale))
            for v in vals
        ):
            return s
    return None


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    threshold = 1e-7
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    if argv and argv[0] == "--threshold":
        threshold = float(argv[1])
        argv = argv[2:]
    sf = argv[0] if argv else DEFAULT_SF
    only = set(argv[1:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    report: dict[str, dict] = {}
    flagged: list[str] = []
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        if q.sql is None:
            continue
        stripped, aliases = strip_display_rounds(q.sql)
        if not aliases:
            continue
        try:
            res = con.execute(stripped)
            cols = [dsc[0] for dsc in res.description]
            rows = res.fetchall()
        except Exception as e:  # noqa: BLE001 — a stripped oracle that no longer parses is itself a finding
            report[name] = {"error": f"{type(e).__name__}: {e}"}
            flagged.append(name)
            print(f"ERROR {name}: stripped oracle failed: {e}")
            continue
        entry: dict[str, dict] = {}
        for col, d in aliases.items():
            if col not in cols:
                continue
            i = cols.index(col)
            vals = [r[i] for r in rows if r[i] is not None and isinstance(r[i], float)]
            if not vals:
                continue
            margins = [margin(v, d) for v in vals]
            mn = min(margins)
            ls = lattice_scale(vals)
            entry[col] = {
                "decimals": d,
                "n_values": len(vals),
                "min_margin": mn,
                "under_threshold": sum(1 for m in margins if m < threshold),
                "lattice_scale": ls,
                "reconstructed": ls is not None and ls > d,
            }
        if entry:
            worst = min(v["min_margin"] for v in entry.values())
            n_under = sum(v["under_threshold"] for v in entry.values())
            recon = [c for c, v in entry.items() if v["reconstructed"]]
            report[name] = {
                "columns": entry,
                "min_margin": worst,
                "reconstructed_columns": recon,
            }
            mark = " **RECONSTRUCTED**" if recon else ""
            if recon:
                flagged.append(name)
            print(
                f"{name}: min_margin={worst:.3e} under_{threshold:g}={n_under}"
                f" lattice={ {c: v['lattice_scale'] for c, v in entry.items()} }{mark}"
            )

    print(f"\n{len(flagged)} entries with reconstructed rounded columns: {sorted(flagged)}")
    if json_out:
        json.dump(
            {"sf_dir": sf, "threshold": threshold, "flagged": sorted(flagged),
             "entries": report},
            open(json_out, "w"), indent=1, sort_keys=True,
        )
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    main()
