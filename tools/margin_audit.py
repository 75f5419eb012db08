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
3. Report the minimum margin per (entry, column). The GATING signal (the
   ``flagged`` list, zero-tolerance in tests/test_margin_audit.py) is
   RECONSTRUCTED (lattice-valued) rounded columns and stripped-oracle
   errors only — for those, no margin is safe (see the flip physics in
   tests/test_margin_audit.py). Continuous columns with margins under
   ``--threshold`` (default 1e-7) are REPORTED separately in the
   ``near_boundary`` list: a near-boundary continuous value can only flip
   on a rounding-MODE divergence at an exact tie (pinned cross-engine by
   test_round_tie_mode_agreement), so it is surfaced for review, not
   auto-failed.

PRE-SUM CONTRIBUTION AUDIT (round-5 verdict #6): the r4 audit above only
sees the FINAL rounded columns; round 5 proved that gives false confidence
(MARGINS_r05 was "zero hazards" while a red row stood — for an unrelated
type reason, but the blind spot is real). Entries that int64-quantize
TRANSCENDENTAL per-item contributions before an exact integer sum
(``sum(CAST(round(<ln/exp chain> * 10^s) AS BIGINT))`` — the
term_drift_by_source / bigram_lm_nll / dsir_importance_weights /
token_entropy shape) can hash-flip if any single contribution sits within
libm skew of its .5 rounding boundary: one quantum moves the exact sum.
For every one-arg ``round(EXPR)`` whose EXPR contains ln/log/exp, this
tool mechanically rebuilds a probe query over the SAME row source (the
enclosing SELECT's FROM/WHERE, all CTEs in scope) and measures each
item's |frac(|EXPR|) - 0.5| distance in quantization units, gating at
``--presum-threshold`` (default 1e-6 units; libm cross-build skew on a
~1e3-magnitude product is ~1e-9). Under-gate items land in
``presum_hazards`` and DO fail.

A flagged entry is one driver-environment library version away from a hash
flip and should be reshaped to emit the exact integer (see
term_drift_by_source / zipf_fit / bigram_lm_nll / dsir_importance_weights
for the pattern) — NOT "fixed" by chasing libm.

Usage: python tools/margin_audit.py [--json OUT.json] [--threshold 1e-7]
                                    [--presum-threshold 1e-6]
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


import re as _re

_TRANSCENDENTAL = _re.compile(r"\b(ln|log|log2|log10|exp)\s*\(", _re.IGNORECASE)
_CUT_KEYWORDS = ("GROUP BY", "HAVING", "QUALIFY", "ORDER BY", "LIMIT", "WINDOW")


def _depth0_spans(s: str):
    """Yield (index, char) for characters at paren depth 0, skipping string
    literals — the keyword-scanning primitive shared by the probe builder."""
    depth, in_str = 0, None
    for i, c in enumerate(s):
        if in_str:
            if c == in_str:
                in_str = None
            continue
        if c in ("'", '"'):
            in_str = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            yield i, c


def _depth0_find(s: str, word: str, start: int = 0, last: bool = False) -> int:
    """Index of a depth-0, word-boundary occurrence of ``word`` (case-insens),
    or -1. ``last`` returns the final occurrence instead of the first."""
    target = word.upper()
    up = s.upper()
    hit = -1
    for i, _ in _depth0_spans(s):
        if i < start or not up.startswith(target, i):
            continue
        before_ok = i == 0 or not (up[i - 1].isalnum() or up[i - 1] == "_")
        j = i + len(target)
        after_ok = j >= len(up) or not (up[j].isalnum() or up[j] == "_")
        if before_ok and after_ok:
            if not last:
                return i
            hit = i
    return hit


def _enclosing_select_body(sql: str, idx: int) -> str:
    """Body of the innermost SELECT containing position ``idx``: the content
    of the tightest enclosing paren pair that opens with SELECT, else the
    final top-level SELECT of the statement."""
    stack: list[int] = []
    at_idx: list[int] = []
    in_str = None
    for i, c in enumerate(sql):
        if i == idx:
            at_idx = list(stack)
        if in_str:
            if c == in_str:
                in_str = None
            continue
        if c in ("'", '"'):
            in_str = c
        elif c == "(":
            stack.append(i)
        elif c == ")":
            if stack:
                stack.pop()
    for open_idx in reversed(at_idx):
        body = sql[open_idx + 1 : _match_paren(sql, open_idx)]
        if body.lstrip().upper().startswith("SELECT"):
            return body
    final = _depth0_find(sql, "SELECT", last=True)
    return sql[final:]


def presum_probes(sql: str, gate: float) -> list[tuple[str, str]]:
    """(expr_snippet, probe_sql) for every one-arg ``round(EXPR)`` whose
    EXPR contains a transcendental. The probe re-runs EXPR over the
    enclosing SELECT's own FROM/WHERE row source (every CTE stays in
    scope; GROUP BY is dropped so the min runs over ALL contributions) and
    emits (n_items, min_margin, n_under) in quantization units. Distance
    uses |EXPR| so round-half-AWAY boundaries land at frac = .5 for both
    signs."""
    probes: list[tuple[str, str]] = []
    final_sel = _depth0_find(sql, "SELECT", last=True)
    with_prefix = sql[:final_sel] if final_sel > 0 else ""
    for cand in _re.finditer(r"\bround\s*\(", sql, flags=_re.IGNORECASE):
        open_idx = sql.index("(", cand.start())
        close_idx = _match_paren(sql, open_idx)
        args = _split_top_level(sql[open_idx + 1 : close_idx])
        if len(args) != 1 or not _TRANSCENDENTAL.search(args[0]):
            continue
        expr = args[0].strip()
        body = _enclosing_select_body(sql, cand.start())
        from_idx = _depth0_find(body, "FROM")
        if from_idx < 0:
            continue
        tail = body[from_idx:]
        cut = len(tail)
        for kw in _CUT_KEYWORDS:
            k = _depth0_find(tail, kw)
            if 0 <= k < cut:
                cut = k
        source = tail[:cut]
        dist = f"abs(abs(({expr})) - floor(abs(({expr}))) - 0.5)"
        probes.append((
            " ".join(expr.split())[:80],
            f"{with_prefix}\nSELECT count(*) AS n_items,\n"
            f"       min({dist}) AS min_margin,\n"
            f"       CAST(sum(CASE WHEN {dist} < {gate} THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS n_under\n{source}",
        ))
    return probes


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
    presum_threshold = 1e-6
    if argv and argv[0] == "--presum-threshold":
        presum_threshold = float(argv[1])
        argv = argv[2:]
    sf = argv[0] if argv else DEFAULT_SF
    only = set(argv[1:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    report: dict[str, dict] = {}
    flagged: list[str] = []
    near_boundary: list[str] = []
    presum_hazards: list[str] = []
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        if q.sql is None:
            continue
        # pre-sum contribution audit (independent of display rounds)
        probes = presum_probes(q.sql, presum_threshold)
        if probes:
            pres: list[dict] = []
            for snippet, probe_sql in probes:
                try:
                    n_items, mn, n_under = con.execute(probe_sql).fetchone()
                except Exception as e:  # noqa: BLE001 — an unparsable probe is a finding
                    pres.append({"expr": snippet,
                                 "error": f"{type(e).__name__}: {e}"})
                    if name not in presum_hazards:
                        presum_hazards.append(name)
                    print(f"ERROR {name}: presum probe failed: {e}")
                    continue
                pres.append({"expr": snippet, "n_items": n_items,
                             "min_margin_units": mn, "n_under": n_under})
                if n_under and name not in presum_hazards:
                    presum_hazards.append(name)
                print(
                    f"{name} [presum]: n={n_items} min_margin="
                    f"{mn if mn is not None else float('nan'):.3e} units "
                    f"under_{presum_threshold:g}={n_under}  ({snippet[:60]})"
                )
            report.setdefault(name, {})["presum"] = pres
        stripped, aliases = strip_display_rounds(q.sql)
        if not aliases:
            continue
        try:
            res = con.execute(stripped)
            cols = [dsc[0] for dsc in res.description]
            rows = res.fetchall()
        except Exception as e:  # noqa: BLE001 — a stripped oracle that no longer parses is itself a finding
            report.setdefault(name, {})["error"] = f"{type(e).__name__}: {e}"
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
            report.setdefault(name, {}).update(
                columns=entry, min_margin=worst, reconstructed_columns=recon
            )
            mark = " **RECONSTRUCTED**" if recon else ""
            if recon:
                flagged.append(name)
            if n_under and not recon:
                near_boundary.append(name)
            print(
                f"{name}: min_margin={worst:.3e} under_{threshold:g}={n_under}"
                f" lattice={ {c: v['lattice_scale'] for c, v in entry.items()} }{mark}"
            )

    print(f"\n{len(flagged)} entries with reconstructed rounded columns: {sorted(flagged)}")
    print(f"{len(near_boundary)} continuous columns within {threshold:g} of a "
          f"display boundary (reported, not gated): {sorted(near_boundary)}")
    print(f"{len(presum_hazards)} entries with pre-sum contribution margins "
          f"under {presum_threshold:g} units (GATED): {sorted(presum_hazards)}")
    if json_out:
        json.dump(
            {"sf_dir": sf, "threshold": threshold,
             "presum_threshold": presum_threshold,
             "flagged": sorted(flagged),
             "near_boundary": sorted(near_boundary),
             "presum_hazards": sorted(presum_hazards),
             "entries": report},
            open(json_out, "w"), indent=1, sort_keys=True,
        )
        print(f"wrote {json_out}")
    return 0 if not (flagged or presum_hazards) else 1


if __name__ == "__main__":
    sys.exit(main())
