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

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
