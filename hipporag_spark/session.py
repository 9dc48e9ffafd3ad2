"""SparkSession construction tuned for the link-graph workload.

Local mode stands in for a multi-executor cluster in this sandbox; all
partitioning decisions below are made as if each of the N threads were a
separate executor (no reliance on shared driver memory beyond broadcast
variables, no ``collect()`` of large data).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


# RAM-backed shuffle dirs are only safe while tmpfs has real headroom: a
# large shuffle landing in a nearly-full /dev/shm fails jobs with ENOSPC
# instead of spilling to disk. Below this much free space, fall back to disk.
_SHM_MIN_FREE_BYTES = 8 << 30


def _local_dir() -> str:
    override = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if override:
        return override
    if os.path.isdir("/dev/shm"):
        st = os.statvfs("/dev/shm")
        if st.f_bavail * st.f_frsize >= _SHM_MIN_FREE_BYTES:
            # per-pid subdir: concurrent sessions must not share (or
            # cross-delete) shuffle dirs; dead owners' dirs are swept like
            # the numpy spill dirs (atexit never runs on SIGKILL)
            from .nputil import _register_spill_dir, _sweep_orphans

            _sweep_orphans("/dev/shm", "spark_local_")
            path = f"/dev/shm/spark_local_{os.getpid()}_0"
            os.makedirs(path, exist_ok=True)
            _register_spill_dir(path)  # atexit removal on clean shutdown
            return path
    return tempfile.gettempdir()


def get_spark(
    parallelism: int | None = None,
    app_name: str = "hipporag_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession on ``local[parallelism]``.

    ``shuffle_partitions`` defaults to the parallelism level: at 100 TB
    scale the equivalent knob is #executors × cores × 2-3; here we keep
    partition count == core count so local benchmarking reflects
    per-core throughput honestly.
    """
    p = parallelism or default_parallelism()
    sp = shuffle_partitions or p
    builder = (
        SparkSession.builder.master(f"local[{p}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(p))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # small inputs arrive as one file = one partition; without a lower
        # split size every compute-heavy map stage runs on ONE core
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        # shuffle/spill local dirs: on a real cluster these are
        # executor-local NVMe; this sandbox's /tmp sits on one shared
        # virtual disk whose bandwidth serializes every core's shuffle
        # writes, so RAM-backed dirs are the representative stand-in
        .config("spark.local.dir", _local_dir())
    )
    # NOTE (negative result, measured): -Xms$MEM -XX:+AlwaysPreTouch was
    # tried here to absorb this host's intermittent 10-100× first-touch
    # stalls at session startup. It made things WORSE: every pre-touch run
    # (12g/24g/48g) degraded the first ~4 minutes of queries 3-9×
    # (graph_build 19s → 139-178s) while a same-window control without it
    # was clean — consistent with the hypervisor KSM-merging the freshly
    # zeroed heap and re-breaking the pages under load. Don't re-add it.
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
