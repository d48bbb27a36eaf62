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

Two details make the bundled runtime usable:

- The directory is **appended** (not prepended) to ``sys.path``, so a real
  installed protobuf always wins and the bundle's sibling packages can
  never shadow anything already importable.
- PySpark's generated ``StateMessage_pb2`` may carry a gencode version one
  minor ahead of the bundled runtime; protobuf's own escape hatch for
  exactly this situation is the ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``
  environment variable (``google/protobuf/runtime_version.py``), which we
  set only when falling back to a bundled runtime — never for a properly
  installed one.

Both the path and the env var must reach the *worker* Python processes.
In local mode workers inherit the driver JVM's environment, so
:func:`ensure_protobuf` must run **before** the ``SparkSession`` is built
(``session.get_session`` does this); for cluster deployments
``worker_env()`` returns the ``spark.executorEnv.*`` entries to add.
"""

from __future__ import annotations

import os
import sys

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

_verdict: bool | None = None
_bundled_dir: str | None = None


def _importable() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable if at all possible; return
    whether it is. Idempotent and cached (the verdict is path-probing, not
    session state, so a process-global cache is correct here)."""
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
        sys.path.append(d)
        os.environ.setdefault(_VERSION_CHECK_ENV, "true")
        # Export to child processes (local-mode Python workers inherit the
        # driver JVM's env, which inherits ours if set pre-launch).
        existing = os.environ.get("PYTHONPATH", "")
        if d not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                existing + os.pathsep + d if existing else d
            )
        if _importable():
            _verdict = True
            _bundled_dir = d
            return True
        sys.path.remove(d)
    _verdict = False
    return False


def bundled_dir() -> str | None:
    """The directory a bundled runtime was loaded from, or None when
    protobuf was properly installed (or absent)."""
    ensure_protobuf()
    return _bundled_dir


def worker_env() -> dict[str, str]:
    """``spark.executorEnv.*`` entries needed so *remote* executors' Python
    workers can import the same bundled runtime (no-op for an installed
    protobuf — then the workers' own site-packages serve it)."""
    ensure_protobuf()
    if _bundled_dir is None:
        return {}
    return {
        "spark.executorEnv.PYTHONPATH": _bundled_dir,
        f"spark.executorEnv.{_VERSION_CHECK_ENV}": "true",
    }
