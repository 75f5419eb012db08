"""Propose the next driver-attestation window (see parity._ATTEST_WINDOW).

The driver's correctness gate samples the FIRST 50 ``queries()`` entries
per round. This tool reads every CORRECTNESS_r*.json in the repo root,
collects the names that already have a fully-green driver row
(rows+schema+hash all true), and prints the next 50-entry window:

    a few kept-green sentinels  +  oracle-paired entries never yet attested

Paste the output over parity._ATTEST_WINDOW at the start of a round, run
`python tools/check_parity.py /root/testdata/sf0.01 <window names>` to
pre-verify, and the round's CORRECTNESS file attests 45+ fresh entries.

Usage: python tools/next_window.py [--sentinels q1_pricing_summary,...]
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, "/root/repo")

from auto_vectordb_spark.plans.parity import REGISTRY  # noqa: E402

DEFAULT_SENTINELS = ["q1_pricing_summary", "hybrid_search", "dedup_minhash_lsh_pairs"]
WINDOW = 50


def main() -> None:
    sentinels = DEFAULT_SENTINELS
    if len(sys.argv) > 2 and sys.argv[1] == "--sentinels":
        sentinels = sys.argv[2].split(",")

    attested: set[str] = set()
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                attested.add(name)

    fresh = [
        n
        for n, q in REGISTRY.items()
        if q.sql is not None and n not in attested and n not in sentinels
    ]
    window = sentinels + fresh[: WINDOW - len(sentinels)]
    backlog = fresh[WINDOW - len(sentinels):]

    print(f"# attested so far: {len(attested)}; oracle-paired never attested: {len(fresh)}")
    print(f"# next window ({len(window)}):")
    print("_ATTEST_WINDOW = [")
    for n in window:
        print(f'    "{n}",')
    print("]")
    if backlog:
        print(f"# backlog for the round after ({len(backlog)}): {backlog}")


if __name__ == "__main__":
    main()
