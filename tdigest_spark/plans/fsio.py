"""Filesystem abstraction for durable sketch state (checkpoints, streaming
state tables).

Round 1 wrote through ``pathlib.Path`` on executors, which silently assumes
every node shares one POSIX filesystem. All durable I/O now routes through
``pyarrow.fs``: plain paths keep using the local filesystem (the sandbox /
single-node case, and any cluster with a shared mount), while URIs
(``hdfs://``, ``s3://``, ``gs://``, ``file://``) resolve to the matching
pyarrow FileSystem — so the same checkpoint dir string works on a real
multi-executor cluster backed by an object store.

Atomicity note: the tmp-write + move pattern is atomic on POSIX and HDFS.
On S3-style stores, move is copy+delete (not atomic), but the protocol
stays safe: readers filter on the final-name prefix (tmp names start with
'.'), and a torn/unreadable file is treated as an in-flight batch and
redone (checkpoint.completed's try/except).
"""

from __future__ import annotations

import posixpath

from pyarrow import fs as pafs

__all__ = [
    "fs_and_path",
    "join",
    "mkdirs",
    "exists",
    "list_files",
    "read_table",
    "write_table_atomic",
]


def fs_and_path(path) -> tuple[pafs.FileSystem, str]:
    """Resolve a path-or-URI to (FileSystem, fs-native path). Plain paths
    (no scheme) map to LocalFileSystem, preserving round-1 behavior."""
    s = str(path)
    if "://" in s:
        return pafs.FileSystem.from_uri(s)
    return pafs.LocalFileSystem(), s


def join(base: str, *parts: str) -> str:
    """Path join for fs-native paths (pyarrow FS paths are /-separated)."""
    return posixpath.join(base, *parts)


def mkdirs(fs: pafs.FileSystem, path: str) -> None:
    fs.create_dir(path, recursive=True)


def exists(fs: pafs.FileSystem, path: str) -> bool:
    return fs.get_file_info(path).type != pafs.FileType.NotFound


def list_files(fs: pafs.FileSystem, dir_path: str) -> list[str]:
    """Non-recursive file listing (full fs-native paths), sorted by name;
    empty list if the directory doesn't exist."""
    sel = pafs.FileSelector(dir_path, recursive=False, allow_not_found=True)
    infos = fs.get_file_info(sel)
    return sorted(
        fi.path for fi in infos if fi.type == pafs.FileType.File
    )


def read_table(fs: pafs.FileSystem, path: str):
    import pyarrow.parquet as pq

    return pq.read_table(path, filesystem=fs)


def write_table_atomic(
    table, fs: pafs.FileSystem, dir_path: str, name: str
) -> str:
    """Write ``table`` as parquet to ``dir_path/name`` via a dot-prefixed
    temp name + move, so list-based readers never pick up torn files."""
    import pyarrow.parquet as pq

    tmp = join(dir_path, f".{name}.tmp")
    final = join(dir_path, name)
    pq.write_table(table, tmp, filesystem=fs, compression="zstd")
    fs.move(tmp, final)
    return final
