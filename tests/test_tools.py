"""Guards on the repo tooling itself (driver-window rotation)."""

from __future__ import annotations

import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "rotate_names",
    os.path.join(os.path.dirname(__file__), "..", "tools", "rotate_names.py"),
)
rotate_names = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(rotate_names)


def test_rotation_rejects_cascading_mapping():
    """ADVICE r06: a combined mapping where one rule's output is another
    rule's key (q50a→qz50a then qz50a→q50a) must be rejected — applied
    sequentially it would cascade; applied in one pass it would be
    order-ambiguous."""
    with pytest.raises(SystemExit, match="collides"):
        rotate_names.apply(
            {"q50a_exact_dedup": "qz50a_exact_dedup",
             "qz50a_exact_dedup": "q50a_exact_dedup"}
        )


def test_rotation_single_pass_no_cascade_no_prefix_bleed(tmp_path, monkeypatch):
    """One regex pass with identifier boundaries: a fresh rename's output
    must never be re-matched by a later rule, and a name that prefixes a
    longer identifier must be left alone. Fixture names use a q9xx range
    that is NOT in the live registry, so real window rotations sweeping
    this repo's files can never rewrite the fixtures themselves (a round-
    10 rotation corrupted the previous q10x-based fixture into a
    self-contradiction)."""
    f = tmp_path / "sample.py"
    f.write_text(
        "a = q90_join_chain\n"
        "b = q901_nightly_rollup\n"    # q90... prefix of a different name
        "c = q902_pq_ann_ok\n"
    )
    monkeypatch.setattr(rotate_names, "REPO", str(tmp_path))
    rotate_names.apply(
        {"q90_join_chain": "qz90_join_chain",
         "q902_pq_ann_ok": "qz902_pq_ann_ok"}
    )
    out = f.read_text()
    assert "qz90_join_chain" in out
    assert "q901_nightly_rollup" in out       # untouched despite q90 prefix
    assert "qz902_pq_ann_ok" in out
    assert "q902_pq_ann_ok" not in out


def test_oracle_check_rejects_unknown_names():
    """VERDICT r13 'What's wrong' #3: a sweep invoked with misspelled
    query names used to silently check nothing and print '0 failures'.
    Unknown names must be a hard error (exit code 2, names listed on
    stderr) BEFORE any Spark session spins up."""
    import subprocess
    import sys as _sys

    proc = subprocess.run(
        [
            _sys.executable,
            os.path.join(
                os.path.dirname(__file__), "..", "tools", "oracle_check.py"
            ),
            "/root/testdata/sf0.001",
            "q999_does_not_exist",
            "qz998_typo",
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 2, (proc.returncode, proc.stdout, proc.stderr)
    assert "q999_does_not_exist" in proc.stderr
    assert "qz998_typo" in proc.stderr
    assert "0 failures" not in proc.stdout
