"""Storage debug dump — the reference's ``DumpIndex``
(/root/reference/dump.go:219-318) walks the spanfile's physical layout
and prints every span: live records (magic/sequence/record-id/streams/
checksum) and free (dead) space.

This engine's physical layout is the per-bucket parquet file set under
the manifest (collection.py module docstring), so the analog walks the
data directory and reports, per file: bucket, commit version (the
``v{N}-`` prefix ≙ the spanfile sequence number), byte size, row count
and row-group count (read from the parquet FOOTER via pyarrow — no
Spark job, like the reference's raw file read), and liveness — a file
on disk but absent from the manifest is dead space awaiting
``vacuum()``, exactly the reference's free span.

``dump_storage`` returns the machine-readable structure;
``format_dump`` renders the reference-style human-readable lines.
"""

from __future__ import annotations

import os

from syzgydb_spark.collection import Collection


def dump_storage(coll: Collection) -> dict:
    """Walk the collection's physical storage. Driver-side footer
    reads only — cost is O(#files), independent of row count."""
    import pyarrow.parquet as pq

    manifest = coll._manifest()
    # liveness must agree with vacuum(): with retain_history the
    # retained snapshots' manifests also pin files — counting those as
    # DEAD would contradict vacuum's return and mislead an operator
    live = coll._referenced_files()
    files = []
    data = coll._data_dir()
    for entry in sorted(os.listdir(data)):
        if not entry.startswith("bucket="):
            continue
        b = entry.split("=", 1)[1]
        for fname in sorted(os.listdir(os.path.join(data, entry))):
            if not fname.endswith(".parquet"):
                continue
            path = os.path.join(data, entry, fname)
            version = None
            if fname.startswith("v"):
                head = fname[1:].split("-", 1)[0]
                if head.isdigit():
                    version = int(head)
            try:
                meta = pq.ParquetFile(path).metadata
                num_rows, num_row_groups = meta.num_rows, meta.num_row_groups
            except Exception:
                num_rows = num_row_groups = None  # unreadable footer
            files.append(
                {
                    "bucket": int(b),
                    "file": fname,
                    "version": version,
                    "size_bytes": os.path.getsize(path),
                    "num_rows": num_rows,
                    "num_row_groups": num_row_groups,
                    "live": (b, fname) in live,
                }
            )
    live_files = [f for f in files if f["live"]]
    dead_files = [f for f in files if not f["live"]]
    return {
        "manifest_version": manifest["version"],
        "n_buckets": len(manifest["buckets"]),
        "files": files,
        "live_rows": sum(f["num_rows"] or 0 for f in live_files),
        "live_bytes": sum(f["size_bytes"] for f in live_files),
        "dead_files": len(dead_files),
        "dead_bytes": sum(f["size_bytes"] for f in dead_files),
    }


def format_dump(dump: dict) -> str:
    """Human-readable rendering in the reference's per-span style."""
    lines = [
        f"Manifest version: {dump['manifest_version']}",
        f"Buckets: {dump['n_buckets']}",
    ]
    for f in dump["files"]:
        state = "LIVE" if f["live"] else "DEAD (vacuum)"
        lines.append(
            f"[bucket={f['bucket']:04d}] {f['file']}: {state}, "
            f"version {f['version']}, {f['size_bytes']} bytes, "
            f"{f['num_rows']} rows in {f['num_row_groups']} row groups"
        )
    lines.append(
        f"Live: {dump['live_rows']} rows / {dump['live_bytes']} bytes; "
        f"dead: {dump['dead_files']} files / {dump['dead_bytes']} bytes"
    )
    return "\n".join(lines)
