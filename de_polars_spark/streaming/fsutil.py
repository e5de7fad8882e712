"""Path-agnostic filesystem ops via the Hadoop FileSystem API.

The foreachBatch sinks' commit protocol (stage → rename, replay-skip on
an existing commit dir) and the ingest sinks' restart-state detection
previously walked the driver's LOCAL filesystem (``os.listdir`` /
``os.rename``), which silently reports "no state" for an ``hdfs://`` or
``s3a://`` directory — on restart a quota sink would reset its lifetime
counters and over-admit. Routing the same four operations through
``Path.getFileSystem(hadoopConf)`` keeps local behavior identical
(RawLocalFileSystem.rename is the same atomic posix rename) and makes
the protocol honest on any scheme Spark itself can write to.

Atomicity note, stated rather than hidden: ``rename`` is atomic on
posix and HDFS, which is what the exactly-once argument relies on. On
object stores (s3a://) rename is a non-atomic copy+delete — a reader
racing the commit can observe a partial ``batch_id=`` directory there;
production S3 deployments should put a cloud-committer or a manifest
marker in front. The restart-safety property (a replayed batch sees
committed state only) holds on every scheme either way, because state
reads list only ``batch_id=`` names that finished their rename.
"""

from __future__ import annotations


def _fs_path(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def exists(spark, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def child_names(spark, path: str) -> list[str]:
    """Names of the direct children of ``path`` ([] if it is missing)."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def delete(spark, path: str) -> None:
    fs, p = _fs_path(spark, path)
    fs.delete(p, True)


def rename(spark, src: str, dst: str) -> None:
    fs, ps = _fs_path(spark, src)
    pd = fs.makeQualified(_fs_path(spark, dst)[1])
    if not fs.rename(ps, pd):
        raise OSError(f"rename failed: {src} -> {dst}")
