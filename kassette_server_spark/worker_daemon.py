"""Python worker daemon with the engine's heavy imports preloaded.

Spark forks every Python worker from a single long-lived daemon
process (``spark.python.daemon.module``, default ``pyspark.daemon``).
A forked child inherits the parent's loaded modules copy-on-write, so
anything imported HERE — before the fork loop starts — is free in
every worker, forever.

Why this matters (guide §4.5, taken to the process level): the stock
daemon imports only pyspark, so the FIRST task of every freshly forked
worker pays the numpy + pandas + pyarrow import chain (~0.6 s serial,
multi-second wall-clock when 32 workers fork at once under a busy
CPU).  Worker forks are not a one-time cost: PySpark kills a worker
instead of pooling it whenever its task stream ends early (limit/take/
bounded collects — common in this engine's seeding passes), so a long
session keeps re-forking, and whichever mapInPandas spec runs next
absorbs a multi-second import storm.  Measured on the r16 bench box:
the first Python exchange of a session cost 5.4 s with the stock
daemon; spec readings like q84's 6–18 s first run against a 1.2 s
steady state were exactly these storms.

Every import is guarded: a missing optional library must degrade to
the stock daemon's behavior (workers import lazily), never break
worker startup.
"""

from __future__ import annotations

# Heavy third-party stack first: these dominate the per-fork import
# cost and are used by every Arrow-batched kernel in the package.
try:  # pragma: no cover - trivial import guards
    import numpy  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:  # pragma: no cover
    import pandas  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:  # pragma: no cover
    import pyarrow  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:  # pragma: no cover
    # pyspark's worker-side serializers (Arrow stream plumbing) — the
    # worker imports these on its first task otherwise.
    import pyspark.sql.pandas.serializers  # noqa: F401
    import pyspark.worker  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:  # pragma: no cover
    # the engine's own kernel modules, heaviest first: multimodal's
    # codec tables, the pq/similarity numpy kernels.  Import of the
    # package is what q84-class first runs were paying per worker.
    from kassette_server_spark.operators import multimodal  # noqa: F401
    from kassette_server_spark.operators import pq  # noqa: F401
    from kassette_server_spark.operators import similarity  # noqa: F401
except Exception:  # pragma: no cover
    pass

try:  # pragma: no cover
    # Every worker task runs importlib.invalidate_caches() (pyspark
    # worker.py setup_spark_files), and since Python 3.10
    # zipimporter.invalidate_caches() RE-PARSES the archive's entire
    # central directory instead of checking whether the file changed.
    # The worker sys.path carries pyspark.zip (+ py4j zip) with ~14
    # cached zipimporter instances (one per probed package prefix), so
    # every Python-stage task burned ~0.15 s of CPU re-reading a zip
    # that never changes mid-session — measured as the whole gap
    # between the ~0.07 s JVM job floor and the ~0.25 s Python-exchange
    # job floor on this box (guide §4: the boundary's fixed costs).
    # Guard the re-read behind an (mtime, size) stat: unchanged archive
    # -> no-op; changed/replaced archive -> exact upstream behavior.
    import os as _os
    import zipimport as _zipimport

    _orig_invalidate = _zipimport.zipimporter.invalidate_caches

    def _invalidate_if_changed(self):
        try:
            st = _os.stat(self.archive)
            key = (st.st_mtime_ns, st.st_size)
        except OSError:
            return _orig_invalidate(self)
        if getattr(self, "_kss_zip_stat", None) == key:
            return None
        # read first, stamp after: a failed read keeps retrying
        out = _orig_invalidate(self)
        self._kss_zip_stat = key
        return out

    _zipimport.zipimporter.invalidate_caches = _invalidate_if_changed
except Exception:  # pragma: no cover
    pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
