"""PySpark worker daemon with the scientific stack PRE-IMPORTED.

Every pandas/Arrow UDF worker needs numpy + pandas + pyarrow; with the
stock daemon each forked worker imports them on first use (~1-2 s of
CPU each, and the first UDF stage forks one worker per core, so a
32-slot local session pays ~32 contending imports inside the first
timed UDF stage — round-6 measured this as the dominant cost of the
first Python query in a session). Importing the stack HERE, before
``pyspark.daemon``'s fork loop starts, lets every forked worker
inherit the loaded modules via copy-on-write: fork cost drops to
milliseconds and the import is paid once per executor process, not
once per worker. This is the guide's "heavyweight init once per task"
rule applied one level higher — once per machine.

Failures are deliberately non-fatal: a worker without numpy still
imports it lazily exactly as before.

Wired via ``spark.python.daemon.module`` in session.get_spark.
"""

import importlib

for _m in ("numpy", "pandas", "pyarrow", "pyspark.serializers",
           "pyspark.sql.pandas.serializers", "pyspark.worker"):
    try:
        importlib.import_module(_m)
    except Exception:
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
