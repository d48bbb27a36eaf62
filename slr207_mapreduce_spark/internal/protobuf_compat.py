"""Runtime discovery of an already-present pure-Python ``google.protobuf``.

The Spark-4 typed-state operator (``transformWithStateInPandas``) talks to
its JVM state server through protobuf messages
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``), so the Python
workers need the public ``google.protobuf`` runtime. This container has no
pip-installed protobuf, but several common developer images ship a
pure-Python copy bundled inside other public tooling (e.g. the Google
Cloud SDK's App Engine platform directory carries the BSD-licensed
protobuf runtime). Nothing is downloaded or installed here: we only probe
a short list of well-known on-disk locations, and only if ``import
google.protobuf`` fails outright.

Safety properties (r07 ADVICE items 1-2):

- What gets exported to child processes is never the bundle directory
  itself (whose *sibling* packages — including its own ``google`` — would
  precede site-packages on a worker's ``sys.path`` and shadow installed
  ones). Instead we build a private **shim directory** containing only
  ``google/protobuf`` (a symlink into the bundle) whose ``google/
  __init__.py`` is a ``pkgutil.extend_path`` namespace stub, so any other
  installed ``google.*`` distribution keeps resolving even when the shim
  sorts first.
- ``os.environ`` is mutated only AFTER ``import google.protobuf`` has
  succeeded through the shim; a candidate that looks right on disk but
  fails to import leaves no trace (no leaked PYTHONPATH entry, no leaked
  ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``).
- PYTHONPATH values are merged (appended), never overwritten — both the
  driver-process variable and the ``spark.executorEnv.PYTHONPATH`` entry
  built by :func:`worker_env`.
- ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` is protobuf's own escape
  hatch (``google/protobuf/runtime_version.py``) for a gencode version one
  minor ahead of the runtime; it is set only when a bundled runtime is in
  use — never for a properly installed one.

Both the path and the env var must reach the *worker* Python processes.
In local mode workers inherit the driver JVM's environment, so
:func:`ensure_protobuf` must run **before** the ``SparkSession`` is built
(``session.get_session`` does this; set ``SPARK_GRAFT_TYPED_STATE=0`` to
skip the wiring entirely when typed state is not wanted); for cluster
deployments :func:`worker_env` returns the ``spark.executorEnv.*``
entries to add.
"""

from __future__ import annotations

import os
import sys
import tempfile

# Well-known public locations of a bundled pure-Python protobuf runtime.
# Override/extend with $SPARK_GRAFT_PROTOBUF_PATH (a single directory that
# directly contains ``google/protobuf/``).
_CANDIDATE_DIRS: tuple[str, ...] = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
    "/usr/lib64/google-cloud-sdk/platform/google_appengine",
    "/opt/google-cloud-sdk/platform/google_appengine",
    "/usr/local/google-cloud-sdk/platform/google_appengine",
)
_ENV_OVERRIDE = "SPARK_GRAFT_PROTOBUF_PATH"
_VERSION_CHECK_ENV = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"

# pkgutil-style namespace stub: lets site-packages' other google.*
# subpackages keep importing even if the shim dir sorts earlier on a
# worker's sys.path.
_NS_INIT = (
    "__path__ = __import__('pkgutil').extend_path(__path__, __name__)\n"
)

_verdict: bool | None = None
_bundled_dir: str | None = None  # the exported dir (the shim, normally)


def _importable() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _verified_private_dir(path: str) -> bool:
    """True iff ``path`` is a real directory (not a symlink) owned by the
    current uid with no group/other permission bits — the precondition for
    trusting anything found inside it. Anything else (pre-created by a
    co-resident user on a shared box, symlinked away, group-writable) is
    rejected and the caller falls back to a fresh ``mkdtemp``."""
    import stat

    try:
        st = os.lstat(path)
    except OSError:
        return False
    return (
        stat.S_ISDIR(st.st_mode)
        and st.st_uid == os.getuid()
        and (st.st_mode & 0o077) == 0
    )


def _make_private_dir(path: str) -> bool:
    try:
        os.makedirs(path, mode=0o700, exist_ok=True)
    except OSError:
        return False
    return _verified_private_dir(path)


def _build_shim(candidate: str) -> str | None:
    """Create (or reuse) a private directory exposing ONLY
    ``google/protobuf`` from ``candidate`` — the unit that is safe to put
    on child-process PYTHONPATHs. Deterministic per candidate path so
    repeated sessions reuse one shim instead of accumulating dirs.
    Returns the shim dir, or None if it cannot be built (no symlink
    support, read-only filesystem): the caller then skips the candidate
    rather than exporting the whole bundle.

    The shim lives under the per-user cache dir ($XDG_CACHE_HOME or
    ~/.cache), NOT the world-writable tempdir — a predictable /tmp path
    could be pre-created by a co-resident local user with a poisoned
    ``google/__init__.py`` that the driver (and, via the exported
    PYTHONPATH, every worker) would then execute. Every directory level we
    reuse must verify as a non-symlink dir owned by this uid with mode
    0o700; on any mismatch we fall back to a fresh ``tempfile.mkdtemp``
    (guaranteed 0o700 and owned by us), trading reuse for safety."""
    import hashlib

    src = os.path.join(candidate, "google", "protobuf")
    # hashlib, not hash(): the builtin is salted per process
    # (PYTHONHASHSEED), which would mint a fresh shim dir every session
    # instead of reusing one deterministic shim per candidate path.
    digest = hashlib.md5(os.path.abspath(candidate).encode()).hexdigest()[:8]
    cache_root = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    shim = os.path.join(cache_root, "slr207_protobuf_shims", f"shim_{digest}")
    levels = (os.path.dirname(shim), shim, os.path.join(shim, "google"))
    if not all(_make_private_dir(lvl) for lvl in levels):
        try:
            shim = tempfile.mkdtemp(prefix="slr207_protobuf_shim_")
            os.makedirs(os.path.join(shim, "google"), mode=0o700)
        except OSError:
            return None
    link = os.path.join(shim, "google", "protobuf")
    init = os.path.join(shim, "google", "__init__.py")
    try:
        if not (os.path.islink(link) and os.path.realpath(link) == os.path.realpath(src)):
            # Atomic replace via a unique temp symlink + os.replace: two
            # concurrent sessions (e.g. a bench and a test run) used to
            # race in the remove→symlink window, one of them observing a
            # missing link, failing its import probe, and CACHING a false
            # "no protobuf" verdict for its whole process (seen once as a
            # spurious test failure under a concurrent full-registry
            # check; r15). os.replace over a symlink is atomic on POSIX.
            tmp_link = f"{link}.tmp.{os.getpid()}"
            try:
                os.symlink(src, tmp_link)
                os.replace(tmp_link, link)
            except OSError:
                # e.g. `link` exists as a real directory: fall back to the
                # non-atomic path (single-session case), cleaning the temp.
                if os.path.islink(tmp_link):
                    os.remove(tmp_link)
                if os.path.islink(link) or os.path.exists(link):
                    os.remove(link)
                os.symlink(src, link)
        # Verify CONTENT, not existence: under a verified-private dir only
        # this uid could have written it, but rewriting on any mismatch
        # costs nothing and keeps the invariant explicit.
        try:
            with open(init) as f:
                have = f.read()
        except OSError:
            have = None
        if have != _NS_INIT:
            with open(init, "w") as f:
                f.write(_NS_INIT)
        return shim
    except OSError:
        return None


def _append_env_path(name: str, entry: str) -> None:
    existing = os.environ.get(name, "")
    if entry not in existing.split(os.pathsep):
        os.environ[name] = existing + os.pathsep + entry if existing else entry


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable if at all possible; return
    whether it is. Idempotent and cached (the verdict is path-probing, not
    session state, so a process-global cache is correct here). Environment
    mutations happen only after a successful import through the shim."""
    global _verdict, _bundled_dir
    if _verdict is not None:
        return _verdict
    if _importable():
        _verdict = True
        return True
    candidates = []
    override = os.environ.get(_ENV_OVERRIDE)
    if override:
        candidates.append(override)
    candidates.extend(_CANDIDATE_DIRS)
    for d in candidates:
        if not os.path.isfile(os.path.join(d, "google", "protobuf", "__init__.py")):
            continue
        shim = _build_shim(d)
        if shim is None:
            continue
        sys.path.append(shim)
        if not _importable():
            # Roll back completely: nothing was exported yet.
            sys.path.remove(shim)
            continue
        # Success — only now export to child processes (local-mode Python
        # workers inherit the driver JVM's env, which inherits ours if set
        # pre-launch). Merge, never overwrite.
        _append_env_path("PYTHONPATH", shim)
        os.environ.setdefault(_VERSION_CHECK_ENV, "true")
        _verdict = True
        _bundled_dir = shim
        return True
    _verdict = False
    return False


def bundled_dir() -> str | None:
    """The shim directory a bundled runtime is exported through, or None
    when protobuf was properly installed (or absent)."""
    ensure_protobuf()
    return _bundled_dir


def worker_env(existing_pythonpath: str | None = None) -> dict[str, str]:
    """``spark.executorEnv.*`` entries needed so *remote* executors' Python
    workers can import the same bundled runtime (no-op for an installed
    protobuf — then the workers' own site-packages serve it). The shim is
    APPENDED to ``existing_pythonpath`` (defaults to the caller's
    pre-existing value, if any) so a user-supplied executor PYTHONPATH is
    extended, never replaced."""
    ensure_protobuf()
    if _bundled_dir is None:
        return {}
    parts = [p for p in (existing_pythonpath or "").split(os.pathsep) if p]
    if _bundled_dir not in parts:
        parts.append(_bundled_dir)
    return {
        "spark.executorEnv.PYTHONPATH": os.pathsep.join(parts),
        f"spark.executorEnv.{_VERSION_CHECK_ENV}": "true",
    }
