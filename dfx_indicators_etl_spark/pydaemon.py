"""PySpark worker daemon with the engine's heavyweight Python
libraries pre-imported — guide §4.5 ("initialise heavyweight state
once per task, not per row") moved one level further up: once per
DAEMON process, inherited by every forked worker for free.

Why this exists (measured, r15): Spark's ``PythonWorkerFactory``
reaps pooled idle Python workers after a HARDCODED 60 s
(``IDLE_WORKER_TIMEOUT_NS``; the idle-timeout confs govern a
different, opt-in path). In a session that interleaves JVM-only and
Python stages — this engine's bench, oracle sweep and any real mixed
pipeline — every Python stage arriving >60 s after the previous one
pays a fresh fork AND a fresh ``numpy``/``pandas``/``pyarrow`` import
in every worker: ~1.7 s CPU each (high-sys-time filesystem imports on
the measured host), × up to one worker per core. Observed: the same
``applyInPandas`` key ran 1.8 s with warm workers and 8–16 s after the
pool was reaped.

The daemon, however, lives for the whole application, and workers are
``fork()``-ed from it: anything imported here is inherited
copy-on-write — zero per-worker import cost and SHARED page memory
instead of per-worker copies. ``pyspark.daemon`` already pre-imports
``pyspark.worker``; this module extends the same idea to the numeric
stack the engine's Arrow/pandas operators use, then delegates to the
stock daemon loop.

Failure containment: every import is individually best-effort — an
environment without one of these libraries runs exactly as before
(workers import lazily on first use). Enabled by
``session.get_spark`` only when the package is importable by a bare
``python -m`` in the environment the executor inherits (see
``_daemon_preload_conf``); disable with
``SPARK_GRAFT_DAEMON_PRELOAD=0``.
"""

from __future__ import annotations

import importlib

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    # the serializer stack every Arrow exchange touches first
    "pyspark.sql.pandas.serializers",
    "pyspark.sql.pandas.types",
):
    try:
        importlib.import_module(_mod)
    except Exception:  # noqa: BLE001 — absent lib: workers lazy-import as before
        pass


if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
