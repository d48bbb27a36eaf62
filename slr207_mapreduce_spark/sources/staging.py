"""Staging stores for build-once/query-many operators (r13 ADVICE).

The materialized operators (crossmodal edge store, IVF-PQ index store)
write a parquet layout once and run their query stage over the store.
This module owns WHERE those stores live and HOW a build replaces one:

- **Location**: ``<repo>/.sfgen/stage/<kind>_<md5(sf_dir)[:12]>`` —
  inside the repo's generated-fixture cache (gitignored, bounded to this
  checkout) instead of a fresh ``/tmp`` directory per PROCESS, which
  leaked one abandoned store per run (r13 ADVICE item 1: the pid key
  made 'bounded disk' hold only per-process).
- **Versioned publish under a lock** (r14 review): each build writes a
  fresh ``<final>.v<nonce>`` directory and atomically repoints the
  ``<final>`` symlink at it (symlink-replace is atomic on POSIX), so a
  reader that captured the OLD version's file listing keeps reading
  intact files while a concurrent builder publishes — the mid-read
  safety the old pid-keyed paths provided, without their leak. The
  fcntl lock serializes publishers; readers never need it.
- **Bounded disk**: after publishing, all version directories except
  the two newest are removed, as is any ``.stage-*`` remnant of an
  interrupted build older than a day.
"""

from __future__ import annotations

import contextlib
import hashlib
import os
import shutil
import time


# Version retention grace (r14 ADVICE item 1): the keep-two-newest sweep
# is publish-count-based, so two quick successive builds could delete a
# version a long-lived reader (a lazy plan that captured the old file
# listing) is still consuming. Versions younger than this are never
# swept, whatever their publish rank — a reader gets at least this long
# between resolving the symlink and its files disappearing.
RETENTION_GRACE_SEC = 30 * 60


def _checkout_ok(root: str) -> bool:
    """True when ``root`` looks like the writable git checkout staging
    assumes (r14 ADVICE item 4): an installed copy (site-packages /
    wheel) must not write stores into its own install tree."""
    return os.path.isdir(os.path.join(root, ".git")) and os.access(
        root, os.W_OK
    )


def _repo_root() -> str:
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if _checkout_ok(root):
        return root
    cache = os.environ.get(
        "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
    )
    return os.path.join(cache, "slr207_mapreduce_spark")


def staging_path(kind: str, sf_dir: str) -> str:
    """The published store path for (kind, sf_dir) — a symlink to the
    current version directory, deterministic per checkout + scale
    factor, NOT per process, so re-runs publish into one bounded
    location."""
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(_repo_root(), ".sfgen", "stage", f"{kind}_{key}")


@contextlib.contextmanager
def staged_write(final_path: str):
    """Yield a unique staging path to write a parquet store into; on
    exit, publish it as a new VERSION of ``final_path`` (rename the
    staging dir to ``<final>.v<nonce>``, then atomically replace the
    ``<final>`` symlink) under an fcntl lock. Concurrent builders
    serialize; concurrent readers of the previous version keep their
    intact files until the version ages out (all but the two newest
    versions are swept after each publish, plus day-old ``.stage-*``
    remnants of interrupted builds)."""
    import fcntl

    parent = os.path.dirname(final_path)
    os.makedirs(parent, exist_ok=True)
    base = os.path.basename(final_path)
    now = time.time()
    for entry in os.listdir(parent):
        if entry.startswith(f"{base}.stage-"):
            p = os.path.join(parent, entry)
            try:
                if now - os.path.getmtime(p) > 86_400:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass
    stage = f"{final_path}.stage-{os.getpid()}-{time.time_ns()}"
    shutil.rmtree(stage, ignore_errors=True)
    try:
        yield stage
        version = f"{final_path}.v{time.time_ns()}-{os.getpid()}"
        lock_path = f"{final_path}.lock"
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                os.rename(stage, version)
                # atomic pointer swap: symlink to a temp name, then
                # replace — readers see either the old or the new
                # version, never a missing/partial store
                tmp_link = f"{final_path}.lnk-{os.getpid()}"
                if os.path.exists(tmp_link) or os.path.islink(tmp_link):
                    os.unlink(tmp_link)
                os.symlink(os.path.basename(version), tmp_link)
                if os.path.isdir(final_path) and not os.path.islink(final_path):
                    # pre-r14 layout: the store was a plain directory —
                    # clear it once so the symlink can take its place
                    shutil.rmtree(final_path, ignore_errors=True)
                os.replace(tmp_link, final_path)
                # bounded disk: keep the two newest versions; older ones
                # are swept only past the retention grace (r14 ADVICE —
                # a long-lived reader of a just-replaced version keeps
                # its files for at least RETENTION_GRACE_SEC)
                versions = sorted(
                    e for e in os.listdir(parent)
                    if e.startswith(f"{base}.v")
                )
                sweep_now = time.time()
                for old in versions[:-2]:
                    p = os.path.join(parent, old)
                    try:
                        if sweep_now - os.path.getmtime(p) < RETENTION_GRACE_SEC:
                            continue
                    except OSError:
                        pass
                    shutil.rmtree(p, ignore_errors=True)
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
