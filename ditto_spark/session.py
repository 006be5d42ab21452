"""SparkSession factory with scale-oriented defaults.

Local sandbox runs on local[N]; on a real cluster the same builder flags apply
via spark-submit --conf. AQE + skew-join splitting are on because LSH blocking
produces skewed band buckets by construction (hot templates → hot bands), and
the adaptive planner re-splits those at runtime (SURVEY.md §4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_dir(min_free_bytes: int = 8 << 30) -> str:
    """Shuffle/scratch dir (`spark.local.dir`). `DITTO_SPARK_LOCAL_DIR`
    overrides; the default prefers tmpfs (/dev/shm) when it has headroom —
    RAM-disk shuffle avoids this host's slow disk for bench-sized jobs —
    BUT tmpfs pages count against the same physical RAM as the JVM heap
    and survive a killed JVM. A single-box run whose shuffle volume
    approaches system memory MUST point this at real disk (measured: a
    100x stress run accumulated 74 GB of shuffle blocks in /dev/shm,
    leaving the kernel no reclaimable memory and drawing the global OOM
    killer on the JVM — twice, because the orphaned tmpfs blocks of the
    first kill starved the retry). The 8 GB static headroom check below
    cannot predict a job's shuffle volume; it only rules out an
    already-full tmpfs. On a real cluster this knob maps to
    SPARK_LOCAL_DIRS, which is always container-local disk."""
    override = os.environ.get("DITTO_SPARK_LOCAL_DIR")
    if override:
        os.makedirs(override, exist_ok=True)
        return override
    if os.path.isdir("/dev/shm"):
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= min_free_bytes:
                return "/dev/shm/spark-local"
        except OSError:
            pass
    return "/tmp"


def get_spark(
    app_name: str = "ditto_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the linkage pipeline.

    cores: local parallelism (default: $SPARK_GRAFT_CPUS or all cores).
    shuffle_partitions: default 2x cores locally; a real 1000-executor run
    would set this to ~2-3x total cores (AQE coalesces the excess).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)

    # Make the package importable in executor Python workers regardless of the
    # driver's cwd. Local mode: workers inherit the JVM env, so prepend to
    # PYTHONPATH before the session starts. On a real cluster the same is done
    # with `spark-submit --py-files ditto_spark.zip` (north_rule).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Pin wall-clock interpretation: NTZ->instant casts (sessionize's
        # microsecond arithmetic) must not depend on host tz or DST.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size bounds pair-scorer UDF memory (reference batches
        # 1024 pairs/batch, matcher.py:120); 2048 keeps batches model-sized.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # local mode runs everything in the driver JVM; a 16g heap left 32
        # concurrent tasks GC-bound (blocking stage 2x slower). The sandbox
        # has 128 GiB; on a real cluster this maps to executor memory.
        .config("spark.driver.memory", os.environ.get("DITTO_SPARK_DRIVER_MEM", "64g"))
        # Heap-commit policy. This VM's host zeroes fresh pages at only
        # ~130-300 MB/s, so the FIRST full-size job in each JVM pays tens of
        # GB of lazy page-fault/zeroing (measured: first flagship run
        # 181-265 s vs 38 s for the identical second run, loadavg ~4 on 16
        # cores — a non-CPU stall invisible to the scheduler). -Xms=-Xmx +
        # AlwaysPreTouch moves that cost to JVM startup, but at this host's
        # zeroing rate that is ~8.5 min for 64 GB (measured 506 s even with
        # -XX:+UseTransparentHugePages; THP madvise did not speed the host
        # up) — far too slow for tests and interactive sessions, so
        # pre-touch is opt-in via DITTO_SPARK_PRETOUCH=1. The benchmark
        # harness instead runs one untimed warm-up pass per JVM (bench.py),
        # which pays the commit cost inside the JVM where it overlaps real
        # work, and times only steady-state runs. On a real cluster,
        # long-lived executors amortize this exactly the same way.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "DITTO_SPARK_DRIVER_JAVA_OPTS",
                (
                    "-Xms" + os.environ.get("DITTO_SPARK_DRIVER_MEM", "64g")
                    + " -XX:+AlwaysPreTouch -XX:+UseTransparentHugePages"
                )
                if os.environ.get("DITTO_SPARK_PRETOUCH")
                else "",
            ),
        )
        # Spark's default 10MB: a larger threshold made the planner broadcast
        # the ~1M-row LSH band table in the self-join, serializing blocking
        # through the driver (measured: local[32] slower than local[8]).
        # Small dims that SHOULD broadcast carry explicit broadcast() hints.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        # shuffle/spill files on tmpfs when available: the sandbox's /tmp is
        # disk-backed and shuffle-file IO showed up as ~90% system time,
        # flattening core-count scaling. A real cluster would use local NVMe.
        # Falls back to /tmp when tmpfs has <8 GiB free — correctness must
        # not depend on /dev/shm being free (shuffle spill would ENOSPC).
        .config("spark.local.dir", _local_dir())
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
