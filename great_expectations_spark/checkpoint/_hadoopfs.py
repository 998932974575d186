"""Shared Hadoop-FileSystem plumbing for the store backends.

One definition of the per-store configuration overlay so the result
store and the sketch store cannot drift (they previously duplicated
it): with ``hadoop_conf`` overrides the store gets its OWN uncached
``FileSystem.newInstance`` — the process-wide FS cache is keyed by
(scheme, authority, ugi) only, so a cached instance would ignore
per-store credentials.  An uncached instance is the CALLER'S to close
(it holds thread/connection pools); :func:`filesystem_for` reports
ownership so stores can expose ``close()``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple


def filesystem_for(
    spark,
    path: str,
    hadoop_conf: Optional[Dict[str, str]] = None,
) -> Tuple[object, object, bool]:
    """Return ``(fs, conf, owns_fs)`` for ``path``.

    Without overrides: the session's shared (cached) FileSystem —
    ``owns_fs`` False, never close it.  With overrides: a Configuration
    copy with the overlay applied and an uncached
    ``FileSystem.newInstance`` — ``owns_fs`` True; the store should
    close it when done (see ``close_quietly``)."""
    jvm = spark._jvm
    base = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    if not hadoop_conf:
        return jpath.getFileSystem(base), base, False
    conf = jvm.org.apache.hadoop.conf.Configuration(base)
    for k, v in hadoop_conf.items():
        conf.set(str(k), str(v))
    fs = jvm.org.apache.hadoop.fs.FileSystem.newInstance(
        jpath.toUri(), conf
    )
    return fs, conf, True


def close_quietly(fs, owns_fs: bool) -> None:
    """Close an OWNED (uncached) FileSystem; cached instances are shared
    process-wide and must never be closed from here."""
    if not owns_fs or fs is None:
        return
    try:
        fs.close()
    except Exception:  # noqa: BLE001 — close is best-effort cleanup
        pass
