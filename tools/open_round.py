"""Open a round in one command (round-10 verdict #1: the ledger-commit +
window-emit ritual cost a verdict bullet four rounds in a row).

    python tools/open_round.py <round-number>

Does, in order:

1. **Ledger commit** — if any ``CORRECTNESS_r*.json`` / ``BENCH_r*.json`` /
   ``MARGINS_r*.json`` / ``PARITY_LOCAL_r*.json`` in the repo root is
   untracked or modified, stage EXACTLY those artifacts and commit them as
   an artifact-only commit (so ``next_window.py``'s graded-tree derivation
   stays sound — it refuses to run over an uncommitted ledger, and its
   ``_graded_commit`` aborts on mixed commits).
2. **Window emit** — run ``tools/next_window.py`` and write its verbatim
   stdout to ``tools/window_r<N>.out`` (the artifact
   ``tests/test_entry_contract.py`` asserts against).
3. **Window paste** — replace the ``_ATTEST_WINDOW = [...]`` block in
   ``plans/parity.py`` with the freshly generated list, byte-for-byte the
   tool's output (round-5 verdict #5: no hand curation).

Idempotent: re-running with the same round number after registering new
entries regenerates the window (new never-attested entries displace
oldest-green padding) and rewrites both the artifact and the paste — run
it again at round close so the driver's sample covers the new surface.

The commit itself is left to the caller (`git add tools/window_r<N>.out
auto_vectordb_spark/plans/parity.py && git commit`), keeping code commits
reviewable and the artifact commit artifact-only.
"""

from __future__ import annotations

import re
import subprocess
import sys

REPO = "/root/repo"
PARITY = f"{REPO}/auto_vectordb_spark/plans/parity.py"
# Exact ledger shapes only (r11 ADVICE #3): the loose _?r?\d* form also
# matched strays like 'BENCHr3.json' / 'MARGINS.json' / 'BENCH_AB_r9.json',
# which would be silently swept into the artifact-only commit.
ARTIFACT_RE = re.compile(
    r"^(?:(?:CORRECTNESS|BENCH|MARGINS|PARITY_LOCAL)_r\d+|BENCH_(?:AB|DETAIL))\.json$"
)


def _run(*args: str, capture: bool = True) -> str:
    r = subprocess.run(args, cwd=REPO, capture_output=capture, text=True)
    if r.returncode != 0:
        raise SystemExit(f"{' '.join(args)} failed:\n{r.stderr or r.stdout}")
    return r.stdout


def commit_ledger() -> None:
    status = _run("git", "status", "--porcelain")
    pending = []
    for line in status.splitlines():
        path = line[3:].strip()
        if "/" not in path and ARTIFACT_RE.match(path):
            pending.append(path)
    if not pending:
        print("# ledger: already committed (nothing to do)")
        return
    _run("git", "add", *pending)
    _run(
        "git", "commit", "-m",
        f"Record round ledger artifacts: {', '.join(sorted(pending))}",
    )
    print(f"# ledger: committed {sorted(pending)}")


def emit_window(round_no: int) -> str:
    out = _run(sys.executable, "tools/next_window.py")
    art = f"{REPO}/tools/window_r{round_no:02d}.out"
    with open(art, "w") as f:
        f.write(out)
    print(f"# window artifact: {art}")
    return out


def paste_window(tool_out: str) -> None:
    m = re.search(r"_ATTEST_WINDOW = \[\n(?:    \"[^\"]+\",\n)+\]", tool_out)
    if not m:
        raise SystemExit("next_window.py output contains no window block")
    src = open(PARITY).read()
    new_src, n = re.subn(
        r"_ATTEST_WINDOW = \[\n(?:    \"[^\"]+\",\n)+\]", m.group(0), src, count=1
    )
    if n != 1:
        raise SystemExit("could not locate _ATTEST_WINDOW block in parity.py")
    if new_src != src:
        open(PARITY, "w").write(new_src)
        print("# parity.py: _ATTEST_WINDOW updated")
    else:
        print("# parity.py: _ATTEST_WINDOW unchanged")


def main() -> None:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        raise SystemExit("usage: python tools/open_round.py <round-number>")
    round_no = int(sys.argv[1])
    commit_ledger()
    paste_window(emit_window(round_no))


if __name__ == "__main__":
    main()
