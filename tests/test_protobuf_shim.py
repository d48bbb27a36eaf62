"""Unit tests for the protobuf shim builder's concurrency hardening (r15).

A bench session and a test session building the same shim used to race in
the remove→symlink window of _build_shim: the loser observed a missing
``google/protobuf`` link, failed its import probe, and cached a false
"no protobuf" process verdict (seen once as a spurious failure of the
typed-state plan sweep under a concurrent full-registry check). The link
swap is now atomic (unique temp symlink + os.replace), so a reader never
observes an absent link.
"""

from __future__ import annotations

import os


def _bundle_candidate() -> str | None:
    from slr207_mapreduce_spark.internal import protobuf_compat as pc

    override = os.environ.get(pc._ENV_OVERRIDE)
    for d in ([override] if override else []) + list(pc._CANDIDATE_DIRS):
        if d and os.path.isfile(os.path.join(d, "google", "protobuf", "__init__.py")):
            return d
    return None


def test_build_shim_replaces_stale_link_atomically(tmp_path, monkeypatch):
    """Rebuilding over a STALE link must swap it in place (no window where
    the path is absent) and leave a link to the real runtime."""
    import pytest

    from slr207_mapreduce_spark.internal import protobuf_compat as pc

    candidate = _bundle_candidate()
    if candidate is None:
        pytest.skip("no bundled protobuf runtime in this container")
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))

    shim = pc._build_shim(candidate)
    assert shim is not None
    link = os.path.join(shim, "google", "protobuf")
    assert os.path.islink(link) and os.path.isfile(os.path.join(link, "__init__.py"))

    # Point the link somewhere stale, then rebuild: the builder must
    # restore it via the atomic-replace path (no remove-first step).
    stale_target = str(tmp_path / "stale")
    os.makedirs(stale_target)
    tmp_link = link + ".swap"
    os.symlink(stale_target, tmp_link)
    os.replace(tmp_link, link)
    assert os.path.realpath(link) == os.path.realpath(stale_target)

    shim2 = pc._build_shim(candidate)
    assert shim2 == shim
    assert os.path.realpath(link) == os.path.realpath(
        os.path.join(candidate, "google", "protobuf")
    )
    # No temp debris left behind.
    assert [p for p in os.listdir(os.path.dirname(link)) if ".tmp." in p] == []
