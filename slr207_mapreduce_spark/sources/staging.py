"""Staging stores for build-once/query-many operators (r13 ADVICE).

The materialized operators (crossmodal edge store, IVF-PQ index store)
write a parquet layout once and run their query stage over the store.
This module owns WHERE those stores live and HOW a build replaces one:

- **Location**: ``<repo>/.sfgen/stage/<kind>_<md5(sf_dir)[:12]>`` —
  inside the repo's generated-fixture cache (gitignored, bounded to this
  checkout) instead of a fresh ``/tmp`` directory per PROCESS, which
  leaked one abandoned store per run (r13 ADVICE item 1: the pid key
  made 'bounded disk' hold only per-process).
- **Atomic swap under a lock**: the build writes to a pid-unique
  ``.stage-*`` sibling, then swaps it into place (remove old + rename)
  while holding an fcntl lock on ``<final>.lock``, so two processes
  building the same store serialize instead of interleaving files under
  one path. Rename is atomic on one filesystem; the reader is the
  process that just built (the registered queries read their own swap).
- **Stale-build sweep**: any ``.stage-*`` sibling older than a day (an
  interrupted build) is removed before writing a new one.
"""

from __future__ import annotations

import contextlib
import hashlib
import os
import shutil
import time


def _repo_root() -> str:
    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def staging_path(kind: str, sf_dir: str) -> str:
    """The final store path for (kind, sf_dir) — deterministic per
    checkout + scale factor, NOT per process, so re-runs overwrite one
    bounded location."""
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(_repo_root(), ".sfgen", "stage", f"{kind}_{key}")


@contextlib.contextmanager
def staged_write(final_path: str):
    """Yield a pid-unique staging path to write a parquet store into;
    on exit, atomically swap it into ``final_path`` under an fcntl lock
    (concurrent builders serialize; a crashed builder leaves only a
    ``.stage-*`` sibling that the next build sweeps)."""
    import fcntl

    parent = os.path.dirname(final_path)
    os.makedirs(parent, exist_ok=True)
    base = os.path.basename(final_path)
    # sweep stale interrupted builds (> 1 day old)
    now = time.time()
    for entry in os.listdir(parent):
        if entry.startswith(f"{base}.stage-"):
            p = os.path.join(parent, entry)
            try:
                if now - os.path.getmtime(p) > 86_400:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass
    stage = f"{final_path}.stage-{os.getpid()}"
    shutil.rmtree(stage, ignore_errors=True)
    try:
        yield stage
        lock_path = f"{final_path}.lock"
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                shutil.rmtree(final_path, ignore_errors=True)
                os.rename(stage, final_path)
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
