"""PySpark worker daemon with heavyweight imports preloaded.

The guide's §4.5 rule — construct heavyweight state once per task, not
per row — applied one level up, to the worker PROCESS: the daemon
imports numpy/pandas/pyarrow before it starts forking workers, so every
forked worker inherits the fully-initialized modules through fork
copy-on-write and a fresh worker's first Arrow/pandas task skips the
C-extension import entirely.

Why this matters here: on the harness sandbox a cold ``import pandas``
measures 6-9 s (almost all SYS time — the sandboxed kernel makes the
hundreds of mmap/page-fault syscalls of a C-extension load expensive,
and it does NOT amortize across processes: the second `python -c
"import pandas"` costs the same). PySpark re-forks workers routinely —
any task that ends without draining its Arrow stream (limit/take over
a mapInPandas, AQE dropping a branch) kills its worker — so a
381-entry bench run pays that import dozens of times. Preloading in
the daemon converts all of those to copy-on-write page shares.

Wiring: ``session.get_spark`` sets ``spark.python.daemon.module`` to
this module (the standard Spark hook for customizing the daemon —
``org.apache.spark.api.python.PythonWorkerFactory``) and exports the
repo root on the executors' PYTHONPATH so the daemon can import it.
The preload is best-effort: a worker whose environment lacks one of
the libraries still works, importing lazily as before.

``pyspark.daemon`` reads the worker module from ``sys.argv[1]`` at
import time, and Spark passes it unchanged when launching a custom
daemon module, so importing ``manager`` below preserves the stock
worker wiring exactly.
"""

for _m in ("numpy", "pandas", "pyarrow", "pyarrow.compute"):
    try:
        __import__(_m)
    except Exception:  # pragma: no cover — preload is best-effort
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
