"""Delta compaction for the incremental stores — read-amplification
maintenance.

Every incremental store in this engine follows the same write pattern:
the build creates a base, each ingest wave appends a small IMMUTABLE
delta, and readers fold all deltas at probe time (``read_bloom_store``
OR-folds word rows; ``read_mg_store`` merges bounded summaries;
``line_dedup_against_store`` sums per-hash delta counts). That pattern
is what makes updates cheap, replay-safe and concurrent-writer-safe —
but it accumulates: after 10,000 crawl waves a probe lists and folds
10,000 delta directories. The fold itself stays small (each delta is
bounded), yet file listing, parquet footer reads and task scheduling
grow linearly with history — the classic LSM read-amplification
problem, and on an object store each listing round-trip is a real
network call.

This module folds history back to O(1) directories WITHOUT breaking
the read-side contract, each family under the strongest crash-safety
its fold algebra allows:

- **Bloom** (:func:`compact_bloom_store`): OR is associative AND
  idempotent, so compaction needs no coordination at all — write the
  folded bitmap as a new delta (rename-commit), then delete the
  folded sources best-effort. A crash at ANY point leaves a store
  whose OR-fold is bit-identical: duplicated deltas OR to the same
  bitmap. This is the same property that makes the store's replayed
  updates free.
- **Misra-Gries** (:func:`compact_mg_store`): summary addition is NOT
  idempotent — a delta folded twice double-counts. The compacted
  delta therefore carries a ``_sources.json`` manifest naming every
  token it superseded (transitively: folding a previous compaction
  inherits its manifest), and the reader excludes superseded tokens
  before folding. Deleting superseded directories is thereby garbage
  collection, not a correctness step — a crash between the rename
  commit and the deletes leaves extra dirs the reader provably
  ignores. This also upgrades REPLAY handling: a streaming batch
  whose stable token was already compacted rewrites its delta dir,
  and the reader correctly ignores it (its counts already live in the
  compacted summary).
- **Bucketed fingerprint / line tables** (:func:`compact_fingerprint_store`,
  :func:`compact_line_store`): ``update_*_store`` appends one file per
  bucket per batch (and, for the line store, per-batch delta ROWS that
  readers re-sum per probe). Compaction rewrites the table through the
  same bucket spec — distinct fingerprints / summed line counts, one
  compact file set — and swaps it in via DROP + ALTER TABLE RENAME.
  The swap is the one protocol here with a reader-visible window, so
  it is guarded by entry-time recovery (a crash between drop and
  rename is healed by the next call) and documented as a maintenance
  operation to run while no probes are active — the same
  single-maintenance-owner contract as the stores' folding writers.

Commit points are directory/table RENAMES (atomic on local
filesystems and HDFS; on S3-class stores run compaction from a single
maintenance owner, same caveat as ``compact_near_dedup_state``).
Concurrent UPDATERS remain safe during Bloom/MG compaction: only
directories listed before the fold are superseded/deleted, so a delta
that lands mid-compaction is untouched and stays live.

Reference scope note: the reference engine (smhanov/syzgydb) compacts
its record spanfiles in place (spanfile.go); these functions are the
analytic-store analog for the 100 TB pipeline extension surface.
"""

from __future__ import annotations

import json as _json
import posixpath as _pp
import uuid as _uuid

from pyspark.sql import functions as F


# ---------------------------------------------------------------- fs helpers


def _hfs(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _list_batch_tokens(spark, path: str) -> list[str]:
    fs, jvm = _hfs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch="):
            out.append(name.split("=", 1)[1])
    return sorted(out)


def _write_text(spark, path: str, text: str) -> None:
    fs, jvm = _hfs(spark, path)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(path), True)
    try:
        out.write(bytearray(text.encode()))
    finally:
        out.close()


def _read_text(spark, path: str) -> str | None:
    fs, jvm = _hfs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        buf = bytearray()
        while True:
            b = stream.read()
            if b < 0:
                break
            buf.append(b)
        return bytes(buf).decode()
    finally:
        stream.close()


def _rename(spark, src: str, dst: str) -> None:
    fs, jvm = _hfs(spark, src)
    ok = fs.rename(
        jvm.org.apache.hadoop.fs.Path(src), jvm.org.apache.hadoop.fs.Path(dst)
    )
    if not ok:
        raise OSError(f"rename {src} -> {dst} failed")


def _delete(spark, path: str) -> None:
    fs, jvm = _hfs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    if fs.exists(p):
        fs.delete(p, True)


def write_store_meta(spark, store_path: str, meta: dict) -> None:
    """Write a store's parameter sidecar as a single driver-side text
    file (``_meta.json``). The pre-r9 layout wrote it as a Spark JSON
    *directory*, which cost a full Spark job (listing + schema
    inference + collect) on EVERY build/update/compact/read — ~90% of
    a store lifecycle's wall at sf0.1 was fixed job overhead (r8
    verdict 4). The sidecar is a few bytes of driver state; Hadoop
    FS text IO is the right tool."""
    _write_text(spark, _pp.join(store_path, "_meta.json"),
                _json.dumps(meta))


def read_store_meta(spark, store_path: str) -> dict | None:
    """Read the parameter sidecar; falls back to the legacy Spark-JSON
    ``_meta`` directory so pre-r9 stores reopen unchanged. Returns
    None if neither exists."""
    txt = _read_text(spark, _pp.join(store_path, "_meta.json"))
    if txt is not None:
        return _json.loads(txt)
    legacy = _pp.join(store_path, "_meta")
    fs, jvm = _hfs(spark, legacy)
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(legacy)):
        return None
    row = spark.read.json(legacy).collect()[0]
    return _json.loads(row["meta"])


class CompactionInProgressError(RuntimeError):
    """Another compactor holds the store's advisory lock."""


class _compaction_lock:
    """Advisory single-compactor lock for the delta stores.

    Two compactors folding the SAME live set would each write a
    compacted delta whose manifest supersedes the sources — both
    compacted deltas stay live and every count doubles (manifests
    exclude sources, not sibling compactions). The protocol therefore
    requires one compactor per store; this lock turns a violation
    into a loud :class:`CompactionInProgressError` instead of silent
    double-counting.

    Mechanics: ``FileSystem.createNewFile`` on ``<store>/_compact.lock``
    is the atomic acquire (works on local FS and HDFS; on S3-class
    stores without atomic create it degrades to best-effort advisory,
    which still catches the common operational mistake), after which
    the holder writes its OWNER TOKEN into its own lock file. A
    crashed compactor leaves the file behind, so a lock older than
    ``stale_seconds`` (default 1 h — compactions are store-sized,
    minutes at most) is broken and re-acquired.

    Stale-break protocol (r8 advice: the old delete-then-create pair
    was a TOCTOU — two breakers could interleave so B deletes A's
    FRESHLY re-created lock and both acquire): the breaker (1) reads
    the stale lock's owner token, (2) RENAMES it aside to a
    uniquely-named tomb — rename is atomic, so exactly one breaker
    wins; the loser's rename fails and it backs off — (3) verifies the
    tomb still carries the token it observed (if a fresh lock slipped
    in between read and rename, the tomb is renamed BACK and the
    breaker backs off), then (4) acquires normally via createNewFile.

    Release is token-guarded: ``__exit__`` deletes the lock only if
    the file still holds THIS compactor's token — a compaction that
    outlives ``stale_seconds`` and gets broken must not delete its
    successor's lock (the second half of the r8 advice)."""

    STALE_SECONDS = 3600.0

    def __init__(self, spark, store_path: str,
                 stale_seconds: float | None = None):
        self._spark = spark
        self._path = _pp.join(store_path, "_compact.lock")
        self._stale = stale_seconds or self.STALE_SECONDS
        self._token = f"compactor-{_uuid.uuid4().hex}"

    def _acquire(self, fs, p) -> bool:
        """Atomic create + stamp our owner token. The token write
        overwrites OUR OWN file (exclusivity came from createNewFile);
        a breaker observing the brief empty window treats the lock as
        UNBREAKABLE and backs off (see __enter__), so the two-step
        acquire can never have its fresh lock stolen mid-stamp."""
        if not fs.createNewFile(p):
            return False
        _write_text(self._spark, self._path, self._token)
        return True

    def __enter__(self):
        import time

        fs, jvm = _hfs(self._spark, self._path)
        p = jvm.org.apache.hadoop.fs.Path(self._path)
        parent = p.getParent()
        if not fs.exists(parent):
            fs.mkdirs(parent)
        for _ in range(3):
            if self._acquire(fs, p):
                return self
            try:
                age = (time.time()
                       - fs.getFileStatus(p).getModificationTime() / 1000.0)
            except Exception:
                # the holder released between our failed createNewFile
                # and the stat — the lock is simply free now, retry the
                # acquire instead of surfacing a raw Py4J
                # FileNotFoundException to the caller
                if fs.exists(p):
                    raise
                continue
            break
        else:
            raise CompactionInProgressError(
                f"lock at {self._path} kept vanishing and reappearing "
                "across 3 acquire attempts (heavy compactor churn); "
                "backing off")
        if age < self._stale:
            raise CompactionInProgressError(
                f"another compaction of {_pp.dirname(self._path)} is in "
                f"progress (lock age {age:.0f}s); the store protocol "
                "allows ONE compactor per store — concurrent compactors "
                "would double-count every source they both fold. If the "
                "previous compactor crashed, the lock breaks on its own "
                f"after {self._stale:.0f}s, or delete _compact.lock."
            )
        # stale: previous compactor died — break via atomic rename so
        # at most one breaker wins, and verify we renamed the lock we
        # observed (not a fresh one that slipped in)
        observed = _read_text(self._spark, self._path)
        if not observed:
            # An EMPTY token is indistinguishable from a concurrent
            # fresh acquire caught between createNewFile and its token
            # stamp — the tomb-verify below would compare empty==empty
            # and could steal the fresh lock. Treat empty-token locks
            # as unbreakable and back off (the stamp window is
            # milliseconds; a lock genuinely orphaned inside it needs
            # a manual `delete _compact.lock`).
            raise CompactionInProgressError(
                f"stale lock at {self._path} has an empty owner token "
                "(holder crashed mid-acquire, or a fresh acquire is "
                "mid-stamp right now — the two are indistinguishable); "
                "refusing to break it. If it persists, delete "
                "_compact.lock manually.")
        tomb = self._path + f".tomb.{_uuid.uuid4().hex[:12]}"
        tomb_p = jvm.org.apache.hadoop.fs.Path(tomb)
        try:
            _rename(self._spark, self._path, tomb)
        except OSError:
            raise CompactionInProgressError(
                f"lost the race breaking a stale lock at {self._path} "
                "(another compactor broke it first)") from None
        if _read_text(self._spark, tomb) != observed:
            # we displaced a FRESH lock created between our read and
            # our rename — restore it and back off
            try:
                _rename(self._spark, tomb, self._path)
            except OSError:
                # its slot was re-taken meanwhile; the displaced
                # owner's release is token-guarded, so nothing deletes
                # the new holder's lock — drop the tomb
                fs.delete(tomb_p, False)
            raise CompactionInProgressError(
                f"another compaction of {_pp.dirname(self._path)} started "
                "while breaking a stale lock; backing off")
        fs.delete(tomb_p, False)
        if not self._acquire(fs, p):
            raise CompactionInProgressError(
                f"lost the race re-acquiring a stale lock at {self._path}")
        return self

    def still_held(self) -> bool:
        """True iff the lock file still carries THIS compactor's
        token. A compactor paused past ``stale_seconds`` whose lock a
        successor broke must check this at its COMMIT POINT (just
        before renaming its compacted delta into place) and abort —
        otherwise zombie and successor each publish a compacted delta
        folding the same sources and every count doubles."""
        return _read_text(self._spark, self._path) == self._token

    def __exit__(self, *exc):
        fs, jvm = _hfs(self._spark, self._path)
        # token-guarded release: only delete a lock we still own — if
        # this compaction ran past stale_seconds and a successor broke
        # the lock, the file (if any) is the SUCCESSOR's
        if self.still_held():
            fs.delete(jvm.org.apache.hadoop.fs.Path(self._path), False)
        return False


def publish_parquet_atomically(df, dest: str) -> None:
    """Publish a one-file parquet directory with a rename commit:
    write to an underscore-prefixed tmp sibling — invisible to
    ``_list_batch_tokens`` and to Spark's partition discovery — then
    DELETE any previous version and RENAME into place.

    Spark's native ``write.parquet(dest)`` creates ``dest`` the moment
    the job starts and fills it file-by-file, so a concurrent store
    reader or compactor listing ``batch=`` dirs can fold a
    HALF-WRITTEN delta (and a compactor would then manifest the token,
    silently dropping the rest of the batch when the writer finishes —
    the storm-test race). With the rename commit, concurrent listers
    see the old delta, no delta, or the complete new one — never a
    partial directory. Local FS / HDFS renames are atomic; the
    delete+rename pair is only non-atomic for STABLE-token replays,
    where the single-writer-per-token contract already excludes a
    concurrent writer of the same token."""
    spark = df.sparkSession
    parent = _pp.dirname(dest.rstrip("/"))
    tmp = _pp.join(parent, f"_tmp_delta_{_uuid.uuid4().hex[:12]}")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        _delete(spark, dest)
        _rename(spark, tmp, dest)
    except BaseException:
        # a failed write's tmp dir is invisible to readers but nothing
        # else ever collects it — clean up on the way out
        _delete(spark, tmp)
        raise


# ------------------------------------------------------------------- Bloom


def compact_bloom_store(spark, path: str) -> int:
    """Fold all of a Bloom store's delta directories into one.

    Returns the number of directories folded away (0 when the store
    already has ≤ 1 delta). The probe/read contract is unchanged —
    ``read_bloom_store`` keeps OR-folding whatever ``batch=`` dirs
    exist; after compaction that is one dir instead of one per wave.

    Crash-safe WITHOUT a manifest because OR is idempotent: the
    folded delta is committed by directory rename, and until the
    folded sources are deleted the store briefly holds both — whose
    OR-fold is bit-identical to the compacted bitmap. Updates that
    land mid-compaction are untouched (only pre-listed dirs are
    deleted) and simply remain as live deltas for the next run.
    """
    with _compaction_lock(spark, path):
        tokens = _list_batch_tokens(spark, path)
        if len(tokens) <= 1:
            return 0
        dirs = [_pp.join(path, f"batch={t}") for t in tokens]
        folded = (
            spark.read.option("basePath", path)
            .parquet(*dirs)
            .groupBy("word_idx")
            .agg(F.bit_or("word").alias("word"))
        )
        tmp = _pp.join(path, f"_tmp_compact_{_uuid.uuid4().hex[:12]}")
        folded.write.mode("overwrite").parquet(tmp)
        # commit point: after this rename the compacted bitmap is live;
        # the source deletes below are pure cleanup (OR idempotence)
        _rename(spark, tmp,
                _pp.join(path, f"batch=compact-{_uuid.uuid4().hex[:12]}"))
        for d in dirs:
            _delete(spark, d)
        return len(tokens)


# -------------------------------------------------------------- Misra-Gries

_SOURCES = "_sources.json"


def superseded_mg_tokens(spark, path: str) -> set[str]:
    """Union of every compacted delta's ``_sources.json`` manifest —
    the tokens whose counts already live inside a compacted summary.
    Manifests are transitive (a compaction folding a previous
    compaction inherits its manifest), so a token stays excluded even
    after the intermediate compacted dir is garbage-collected."""
    out: set[str] = set()
    for t in _list_batch_tokens(spark, path):
        txt = _read_text(spark, _pp.join(path, f"batch={t}", _SOURCES))
        if txt is not None:
            out.update(_json.loads(txt))
    return out


def live_mg_tokens(spark, path: str,
                   with_garbage: bool = False) -> list[str] | tuple:
    """Delta tokens the read fold must include: all ``batch=`` dirs
    minus the superseded set. A superseded token whose directory was
    REWRITTEN (a streaming replay of an already-compacted batch) is
    still excluded — its counts are in the compacted summary, so
    excluding the rewrite is exactly the replay-idempotence the
    stable-token contract promises.

    With ``with_garbage=True`` returns ``(live, garbage)`` where
    ``garbage`` is every on-disk token excluded from the fold —
    lingering superseded dirs (a compactor crashed after its rename
    commit, before cleanup) plus zombie compact deltas dropped by the
    subset-healing below. Every read provably ignores these, so the
    compactors delete them post-publish; without the sweep a healed
    zombie dir would persist forever and every read would pay its
    ``_sources.json`` fetch plus the healing pass."""
    sup = superseded_mg_tokens(spark, path)
    on_disk = _list_batch_tokens(spark, path)
    live = [t for t in on_disk if t not in sup]
    # Zombie-compactor healing: a compactor paused past the lock's
    # staleness horizon whose successor re-compacted the same sources
    # can — in the microsecond window the commit-point still_held()
    # guard cannot close — leave TWO live compacted deltas folding the
    # same tokens; folding both doubles every count. Among live deltas,
    # drop any whose manifest is a SUBSET of the kept ones' union
    # (largest manifest first, ties lexicographic): the survivor
    # carries every dropped token's counts exactly once. The protocol
    # only produces equal or nested manifests among simultaneously-live
    # compacted deltas, so subset-drop heals every reachable race and
    # never drops counts.
    manifests = {}
    for t in live:
        txt = _read_text(spark, _pp.join(path, f"batch={t}", _SOURCES))
        if txt is not None:
            manifests[t] = set(_json.loads(txt))
    if len(manifests) > 1:
        covered: set[str] = set()
        drop: set[str] = set()
        for t in sorted(manifests, key=lambda t: (-len(manifests[t]), t)):
            if manifests[t] <= covered:
                drop.add(t)
            else:
                covered |= manifests[t]
        if drop:
            live = [t for t in live if t not in drop]
    if with_garbage:
        return live, sorted(set(on_disk) - set(live))
    return live


def compact_mg_store(spark, path: str) -> int:
    """Fold all live Misra-Gries deltas into one compacted delta.

    Summary addition is not idempotent, so unlike the Bloom compactor
    this one records WHAT it folded: the compacted directory carries a
    ``_sources.json`` manifest (the folded tokens plus everything they
    had already superseded), and :func:`live_mg_tokens` — which
    ``read_mg_store`` consults — excludes manifested tokens before
    folding. Consequences:

    - Crash after the rename commit, before the source deletes: the
      superseded dirs linger but are provably ignored. Deletion is
      garbage collection, re-attempted by any later compaction.
    - Crash before the rename: the ``_tmp_`` dir is invisible to
      readers (underscore-prefixed); nothing changed.
    - A concurrent update landing mid-compaction is not in the
      manifest and stays live.

    The compacted delta preserves the store's error accounting
    exactly: its real-term rows carry the folded estimates and its
    NULL-term carrier row carries the folded ``err_bound`` (total
    decrements + merge cut), so a read of [compacted] reports the
    same estimates AND the same err_bound as a read of the original
    deltas — compaction never silently tightens or loosens the
    guarantee. Returns the number of deltas folded (0 if ≤ 1 live).
    """
    from syzgydb_spark.operators.sketch import _mg_fold, _read_mg_meta

    with _compaction_lock(spark, path) as lk:
        live, garbage = live_mg_tokens(spark, path, with_garbage=True)
        if len(live) <= 1:
            # still vacuum read-ignored dirs so they don't tax every
            # read with a _sources.json fetch forever
            for t in garbage:
                _delete(spark, _pp.join(path, f"batch={t}"))
            return 0
        cap = _read_mg_meta(spark, path)["capacity"]
        sup = superseded_mg_tokens(spark, path)
        dirs = [_pp.join(path, f"batch={t}") for t in live]
        deltas = spark.read.parquet(*dirs).select(
            "term",
            F.when(F.col("term").isNotNull(), F.col("est_count"))
            .otherwise(F.lit(0)).alias("est"),
            F.when(F.col("term").isNull(), F.col("err_bound"))
            .otherwise(F.lit(0)).alias("dec"),
        )
        # the carrier bound comes from the fold's dec_total + cut SCALARS,
        # which exist even when every merged estimate falls at or below the
        # cut and the folded relation is empty — aggregating max(err_bound)
        # over the (possibly empty) folded rows would record bound 0 there,
        # violating est ≤ true ≤ est + err_bound after compaction
        folded, bound = _mg_fold(deltas, cap, with_bound=True)
        carrier = bound.select(
            F.lit(None).cast("string").alias("term"),
            F.lit(0).cast("long").alias("est_count"),
            F.col("err_bound"),
        )
        tmp = _pp.join(path, f"_tmp_compact_{_uuid.uuid4().hex[:12]}")
        folded.unionByName(carrier).coalesce(1).write.mode("overwrite").parquet(tmp)
        # manifest inside the dir BEFORE the rename: the rename is the
        # commit point for data + manifest together
        manifest = sorted(set(live) | sup)
        _write_text(spark, _pp.join(tmp, _SOURCES), _json.dumps(manifest))
        # commit-point guard: a fold paused past the lock's staleness
        # horizon may resume AFTER a successor broke the lock and
        # re-compacted the same sources — publishing ours too would
        # double every count. Abort unless we still own the lock.
        if not lk.still_held():
            _delete(spark, tmp)
            raise CompactionInProgressError(
                f"lock on {path} was broken (stale) while this compaction "
                "was folding; a successor owns the store now — aborting "
                "before the commit point, nothing was published")
        _rename(spark, tmp, _pp.join(path, f"batch=compact-{_uuid.uuid4().hex[:12]}"))
        for t in live + garbage:
            _delete(spark, _pp.join(path, f"batch={t}"))
        return len(live)


# -------------------------------------------------- bucketed table rebuilds


def _table_type_and_buckets(spark, table: str) -> tuple[str, int]:
    ttype, n_buckets = "", None
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if r["col_name"] == "Type":
            ttype = r["data_type"]
        elif r["col_name"] == "Num Buckets":
            n_buckets = int(r["data_type"])
    if n_buckets is None:
        raise ValueError(f"table {table!r} is not bucketed")
    return ttype, n_buckets


def _swap_in_compacted(spark, table: str) -> None:
    """DROP the live table, RENAME ``<table>__compact`` into its name.
    The rename moves the managed directory with it, so probes resume
    on the compacted files under the original table name (bucket spec
    travels in the catalog metadata — the no-Exchange probe plan is
    preserved, plan-asserted in tests)."""
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {table}__compact RENAME TO {table}")


def _recover_bucketed_swap(spark, table: str) -> bool:
    """Entry-time healing for the one crash window the swap has: after
    DROP, before RENAME. If the live name is gone but the compacted
    table exists, finish the rename. Returns True when recovery ran."""
    if not spark.catalog.tableExists(table) and spark.catalog.tableExists(
        f"{table}__compact"
    ):
        spark.sql(f"ALTER TABLE {table}__compact RENAME TO {table}")
        return True
    return False


def _compact_bucketed(spark, table: str, rebuild) -> int:
    """Shared rebuild-and-swap: ``rebuild(df) -> df`` re-aggregates the
    store's content; the result is written through the SAME bucket
    spec to ``<table>__compact`` and swapped in. Returns the file-count
    reduction (files before - files after); 0 means already compact."""
    from syzgydb_spark.sources.bucketed import read_bucketed

    _recover_bucketed_swap(spark, table)
    ttype, n_buckets = _table_type_and_buckets(spark, table)
    if "EXTERNAL" in ttype.upper():
        raise ValueError(
            f"table {table!r} is external — compact by rebuilding at a new "
            "path (build_*_store(..., path=...)) and repointing readers; "
            "in-place swap is for managed tables"
        )

    def n_files(t: str) -> int:
        return len(spark.table(t).inputFiles())

    before = n_files(table)
    compact = f"{table}__compact"
    spark.sql(f"DROP TABLE IF EXISTS {compact}")
    # a crashed previous run can leave the orphan managed dir behind
    from syzgydb_spark.sources.bucketed import clear_stale_location

    clear_stale_location(spark, compact)
    df = rebuild(read_bucketed(spark, table))
    key = df.columns[0]
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(compact)
    )
    _swap_in_compacted(spark, table)
    return before - n_files(table)


def compact_fingerprint_store(spark, table: str) -> int:
    """Rewrite a fingerprint store (``build_fingerprint_store``) into
    one compact file set per bucket. ``update_fingerprint_store``
    already keeps rows distinct under its single-folding-writer
    contract, but every append adds a file per bucket per batch — the
    probe's no-Exchange scan pays one parquet footer per file per
    probe. Rebuilds through ``distinct()`` (also healing any redundant
    rows a concurrent-writer misuse left behind) and swaps the result
    in under the original name. Run while no probes are active (the
    DROP/RENAME window is healed on the next maintenance call, not
    invisible to concurrent readers). Returns files-removed."""
    return _compact_bucketed(spark, table, lambda df: df.select("fp").distinct())


def compact_line_store(spark, table: str) -> int:
    """Rewrite a line-frequency store (``build_line_store``) summing
    its per-batch delta rows: after N crawl waves a hot line hash has
    up to N ``(h, n)`` rows that every probe re-sums; compaction folds
    them to one row per hash AND one file set per bucket. Same swap
    protocol + contract as :func:`compact_fingerprint_store`. Returns
    files-removed."""
    return _compact_bucketed(
        spark,
        table,
        lambda df: df.groupBy("h").agg(F.sum("n").alias("n")),
    )


# ---------------------------------------------------- ANN index maintenance
#
# The IVF serve path (operators/ivf.py + the persisted cells table)
# degrades in two measurable ways as crawl waves land: cells go
# SKEWED (a hot cell makes every probe of it scan-heavy — the same
# skew problem the dedup operators salt away) and centers go STALE
# (the live distribution drifts from the fitted sample, so vectors sit
# farther from their assigned centers and per-probe recall decays).
# Both are detectable with one bounded aggregation, and the skew case
# is repairable WITHOUT a corpus-sized rebuild: split the hot cell's
# center into sub-centers fitted on that cell alone and re-encode only
# its rows — work proportional to the hot cell, never the table.


def ivf_cell_stats(cells_df, cell_col: str = "ivf_cell"):
    """Per-cell row counts of an encoded relation — ``(cell, n)``.
    One narrow aggregation on an INT key; feed the hot cells into
    :func:`split_ivf_cell`."""
    return (
        cells_df.groupBy(F.col(cell_col).alias("cell"))
        .agg(F.count("*").alias("n"))
    )


def ivf_imbalance(cells_df, n_cells: int, cell_col: str = "ivf_cell"):
    """One-row skew summary over the DECLARED cell count (empty cells
    count — they are wasted probe granularity): ``(n_cells, n_used,
    max_n, avg_n, imbalance)`` where ``imbalance = max_n / avg_n`` and
    ``avg_n`` divides by ``n_cells``, not just the used ones. A
    balanced index sits near 1; a hot cell at 10 means a probe of it
    costs ~10 average cells — split it."""
    return ivf_cell_stats(cells_df, cell_col).agg(
        F.lit(n_cells).alias("n_cells"),
        F.count("*").alias("n_used"),
        F.max("n").alias("max_n"),
        (F.sum("n") / F.lit(n_cells)).alias("avg_n"),
        (F.max("n") / (F.sum("n") / F.lit(n_cells))).alias("imbalance"),
    )


def quantization_error(
    index,
    df,
    vec_col: str = "vector",
    *,
    sample_fraction: float | None = None,
    max_sample: int = 100_000,
    seed: int = 42,
) -> float:
    """Mean distance from each vector to its assigned center — the
    monitor for center STALENESS. Record it at build time; when the
    live ratio grows past the operator's threshold (1.3-1.5x is a
    reasonable default), the coarse quantizer no longer describes the
    data and a refit is due. Bounded like ``IvfIndex.fit``: computed
    on a capped sample, so the monitor is constant-cost at any table
    size (one vectorized assignment pass + one aggregation)."""
    total = df.count()
    if total == 0:
        raise ValueError("cannot measure quantization error of an empty relation")
    if sample_fraction is None:
        sample_fraction = min(1.0, max_sample / max(total, 1))
    sample = df.select(vec_col)
    if sample_fraction < 1.0:
        sample = sample.sample(sample_fraction, seed=seed)
    scored = index.with_cell_distances(sample, vec_col)
    return float(
        scored.agg(F.avg("center_distance").alias("qerr")).collect()[0]["qerr"]
    )


def split_ivf_cell(
    index,
    cells_df,
    cell_id: int,
    *,
    k: int = 4,
    vec_col: str = "vector",
    cell_col: str = "ivf_cell",
    seed: int = 42,
    max_iter: int = 20,
    max_sample: int = 100_000,
):
    """Refine a HOT cell in place: fit ``k`` sub-centers on the cell's
    own rows (driver-side Lloyd on a bounded, order-independent
    sample — the ``IvfIndex.fit`` fallback's exact recipe), replace
    the cell's center with sub-center 0 and append the rest, and
    re-encode ONLY the split cell's rows against the new geometry.
    Returns ``(new_index, reassigned_rows)`` — the caller overwrites
    the hot cell's slice of the persisted cells table with
    ``reassigned_rows`` (at scale: one partition overwrite when the
    table is partitioned by cell, the layout ivf.py recommends).

    Cost is proportional to the HOT CELL, never the table: no other
    row is read, moved, or re-encoded. Other cells' stored assignments
    are kept as-is — after the split a borderline vector in a
    NEIGHBORING cell might be nearer to a new sub-center than to its
    stored center, a bounded staleness every incremental IVF accepts
    (probing is by the query's nearest cells, and the recall gate in
    the tests holds across the split); a periodic full re-encode heals
    it. Center ids of untouched cells are STABLE (sub-centers append),
    so stored ``ivf_cell`` columns and partition layouts stay valid.
    """
    import numpy as np

    if not 0 <= cell_id < len(index.centers):
        raise ValueError(f"cell_id {cell_id} out of range (0..{len(index.centers) - 1})")
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 is a no-op)")
    rows = cells_df.where(F.col(cell_col) == cell_id)
    n_rows = rows.count()
    if n_rows == 0:
        raise ValueError(f"cell {cell_id} is empty — nothing to split")
    sample = rows.select(vec_col)
    frac = min(1.0, max_sample / max(n_rows, 1))
    if frac < 1.0:
        sample = sample.sample(frac, seed=seed)
    mat = np.array([list(r[0]) for r in sample.collect()], dtype=np.float64)
    if index.method in ("cosine", "angular"):
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        mat = mat / nrm
    # sort so the seeded init is independent of partition order (the
    # determinism fix IvfIndex.fit / PqIndex.fit both carry)
    mat = mat[np.lexsort(mat.T[::-1])]
    rng = np.random.default_rng(seed)
    # seed from the UNIQUE-row matrix (the same array k_eff was derived
    # from): sampling raw rows can draw duplicate-valued seeds, which
    # never separate under argmin tie-breaking and leave a permanently
    # dead sub-center that ivf_imbalance then counts against the index
    uniq = np.unique(mat, axis=0)
    k_eff = min(k, len(uniq))
    sub = uniq[rng.choice(len(uniq), size=k_eff, replace=False)]
    for _ in range(max_iter):
        d = ((mat[:, None, :] - sub[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(sub)):
            pts = mat[assign == c]
            if len(pts):
                sub[c] = pts.mean(axis=0)

    new_centers = np.vstack(
        [index.centers[:cell_id], sub[:1], index.centers[cell_id + 1:], sub[1:]]
    )
    new_index = type(index)(new_centers, index.method)
    reassigned = new_index.with_cells(rows.drop(cell_col), vec_col)
    return new_index, reassigned


def pq_reconstruction_error(
    index,
    df,
    vec_col: str = "vector",
    *,
    sample_fraction: float | None = None,
    max_sample: int = 100_000,
    seed: int = 42,
) -> float:
    """Mean PQ quantization distortion — the :func:`quantization_error`
    analog for the product-quantized tier (operators/pq.py): encode
    each vector with the codebooks, reconstruct it from its codewords,
    and report the mean distance between original and reconstruction
    (euclidean: L2; cosine: the engine's angular distance, zero-vector
    → 1.0). This is the standard codebook-quality metric: record it at
    fit time, and when the live ratio grows the codebooks no longer
    describe the data — ADC distances degrade SILENTLY (queries still
    return k results, just worse ones), so this monitor is the only
    cheap signal. Bounded like the fit: a capped sample, one
    vectorized Arrow pass, one aggregation."""
    import numpy as np

    total = df.count()
    if total == 0:
        raise ValueError("cannot measure reconstruction error of an empty relation")
    if sample_fraction is None:
        sample_fraction = min(1.0, max_sample / max(total, 1))
    sample = df.select(vec_col)
    if sample_fraction < 1.0:
        sample = sample.sample(sample_fraction, seed=seed)

    books = index.codebooks
    normalize = index.method == "cosine"
    msub = index.dsub

    # self-contained Arrow closure (the executor contract: ships by
    # value, executors never import this package)
    @F.pandas_udf("double")
    def recon_err(vecs):
        import numpy as _np
        import pandas as pd

        if len(vecs) == 0:
            return pd.Series([], dtype=float)
        mat = _np.array([list(v) for v in vecs], dtype=_np.float64)
        if normalize:
            norms = _np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mat = mat / norms
        recon = _np.empty_like(mat)
        for mi in range(books.shape[0]):
            sub = mat[:, mi * msub:(mi + 1) * msub]
            cb = books[mi]
            d2 = ((sub * sub).sum(axis=1)[:, None]
                  + (cb * cb).sum(axis=1)[None, :] - 2.0 * (sub @ cb.T))
            recon[:, mi * msub:(mi + 1) * msub] = cb[d2.argmin(axis=1)]
        if normalize:
            dot = (mat * recon).sum(axis=1)
            na = _np.linalg.norm(mat, axis=1)
            nb = _np.linalg.norm(recon, axis=1)
            out = _np.ones(len(mat))
            ok = (na != 0) & (nb != 0)
            out[ok] = _np.arccos(
                _np.clip(dot[ok] / (na[ok] * nb[ok]), -1.0, 1.0)) / _np.pi
            return pd.Series(out)
        return pd.Series(_np.linalg.norm(mat - recon, axis=1))

    col = F.col(vec_col).cast("array<double>")
    return float(
        sample.select(recon_err(col).alias("e"))
        .agg(F.avg("e").alias("e")).collect()[0]["e"]
    )
