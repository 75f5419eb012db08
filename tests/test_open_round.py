"""tools/open_round.py — the one-command round-open ritual.

The ledger-commit half is exercised for the no-op path only (a dirty-repo
commit inside the test suite would mutate real git state); the
window-paste half is exercised against synthetic files — a corrupted
generator output or a parity file without a window block must abort
loudly, never half-paste.
"""

import re
import sys

sys.path.insert(0, "/root/repo/tools")

import open_round as OR  # noqa: E402
import pytest  # noqa: E402


def test_artifact_regex_matches_ledger_files_only():
    yes = [
        "CORRECTNESS_r11.json",
        "BENCH_r11.json",
        "MARGINS_r11.json",
        "PARITY_LOCAL_r11.json",
        "BENCH_AB.json",
        "BENCH_DETAIL.json",
    ]
    no = [
        "bench.py",
        "auto_vectordb_spark/plans/parity.json",
        "CORRECTNESS_r11.json.bak",
        "notes_CORRECTNESS_r11.json",
        # r11 ADVICE #3: strays the loose pre-r12 regex wrongly matched
        "BENCHr3.json",
        "MARGINS.json",
        "BENCH_AB_r9.json",
        "CORRECTNESS_r.json",
    ]
    for f in yes:
        assert OR.ARTIFACT_RE.match(f), f
    for f in no:
        assert not OR.ARTIFACT_RE.match(f), f


def test_paste_window_replaces_block_verbatim(monkeypatch, tmp_path):
    parity = tmp_path / "parity.py"
    parity.write_text(
        "x = 1\n_ATTEST_WINDOW = [\n    \"old_a\",\n    \"old_b\",\n]\ny = 2\n"
    )
    monkeypatch.setattr(OR, "PARITY", str(parity))
    tool_out = (
        "# attested-green ever: 1; never attested (oracle-paired): 0; "
        "stale attestations needing re-verify: 0\n"
        "_ATTEST_WINDOW = [\n    \"new_a\",\n    \"new_b\",\n    \"new_c\",\n]\n"
    )
    OR.paste_window(tool_out)
    src = parity.read_text()
    assert '"new_c"' in src and '"old_a"' not in src
    assert src.startswith("x = 1\n") and src.endswith("y = 2\n")
    # the pasted block is the generator's verbatim output
    m = re.search(r"_ATTEST_WINDOW = \[\n(?:    \"[^\"]+\",\n)+\]", src)
    assert m and m.group(0).count('"new_') == 3


def test_paste_window_aborts_on_malformed_tool_output(monkeypatch, tmp_path):
    parity = tmp_path / "parity.py"
    parity.write_text("_ATTEST_WINDOW = [\n    \"a\",\n]\n")
    monkeypatch.setattr(OR, "PARITY", str(parity))
    with pytest.raises(SystemExit, match="no window block"):
        OR.paste_window("next_window crashed before printing anything\n")
    assert parity.read_text() == "_ATTEST_WINDOW = [\n    \"a\",\n]\n"


def test_paste_window_aborts_when_parity_has_no_block(monkeypatch, tmp_path):
    parity = tmp_path / "parity.py"
    parity.write_text("nothing to see here\n")
    monkeypatch.setattr(OR, "PARITY", str(parity))
    with pytest.raises(SystemExit, match="could not locate"):
        OR.paste_window('_ATTEST_WINDOW = [\n    "a",\n]\n')


def test_commit_ledger_noop_on_clean_tree(capsys):
    """On the committed tree the ledger step must be a no-op (idempotent
    round-open: running it twice never creates an empty commit)."""
    import subprocess

    dirty = [
        line
        for line in subprocess.run(
            ["git", "-C", "/root/repo", "status", "--porcelain"],
            capture_output=True,
            text=True,
        ).stdout.splitlines()
        if OR.ARTIFACT_RE.match(line[3:].strip())
    ]
    if dirty:
        pytest.skip("ledger artifacts pending in the working tree")
    OR.commit_ledger()
    assert "nothing to do" in capsys.readouterr().out
