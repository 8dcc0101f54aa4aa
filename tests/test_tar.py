"""TAR shard source + WebDataset grouping (sources/tar.py). One
archive is hand-assembled straight from the POSIX ustar layout
(octal sizes, space-blanked checksum) so the parse path is checked
against spec bytes, not only against stdlib tarfile's own writer."""

from __future__ import annotations

import gzip
import io
import tarfile

from pyspark.sql import functions as F

from remote_storage_adapter_spark.sources import tar as TA


def _mktar(files, gz=False) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in files:
            if data is None:                 # a directory entry
                info = tarfile.TarInfo(name)
                info.type = tarfile.DIRTYPE
                tf.addfile(info)
                continue
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    return gzip.compress(raw) if gz else raw


def _ustar_member(name: bytes, data: bytes) -> bytes:
    """Spec-built ustar member: 512-byte header (name, octal mode/
    uid/gid/size/mtime, checksum over the header with the chksum
    field blanked to spaces, typeflag '0', magic 'ustar\\x00') +
    512-padded data."""
    hdr = bytearray(512)
    hdr[0:len(name)] = name
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = ("%011o" % len(data)).encode() + b"\x00"
    hdr[136:148] = b"00000000000\x00"
    hdr[148:156] = b" " * 8
    hdr[156] = ord("0")
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    chk = sum(hdr)
    hdr[148:156] = ("%06o" % chk).encode() + b"\x00 "
    pad = (512 - len(data) % 512) % 512
    return bytes(hdr) + data + b"\x00" * pad


def _df(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "src_id long, payload binary")


_SHARD = [
    ("00001.jpg", b"jpeg-bytes-1"),
    ("00001.txt", b"a caption"),
    ("00001.json", b'{"w":1}'),
    ("imgs/", None),
    ("00002.jpg", b"jpeg-bytes-2"),
    ("00002.txt", b"another caption"),
]


def test_tar_members_plain_and_gzip(spark):
    for gz in (False, True):
        rows = sorted(
            (r["name"], r["size"], bytes(r["payload"]))
            for r in TA.tar_members(
                _df(spark, [_mktar(_SHARD, gz=gz)])).collect())
        assert rows == sorted(
            (n, len(d), d) for n, d in _SHARD if d is not None)


def test_tar_spec_built_ustar_archive(spark):
    raw = (_ustar_member(b"k.txt", b"hello spec")
           + _ustar_member(b"k.bin", bytes(700))
           + b"\x00" * 1024)
    rows = {r["name"]: (r["size"], bytes(r["payload"]))
            for r in TA.tar_members(_df(spark, [raw])).collect()}
    assert rows == {"k.txt": (10, b"hello spec"),
                    "k.bin": (700, bytes(700))}


def test_tar_quarantine_and_caps(spark):
    many = _mktar([(f"m{i}.txt", b"x") for i in range(5)])
    big = _mktar([("big.bin", bytes(4096))])
    small = _mktar(_SHARD[:3])               # 3 files = at the cap
    rows = TA.tar_members(
        _df(spark, [small, b"not a tar", many, big]),
        max_member_bytes=1024, max_members=3).collect()
    errs = {r["src_id"]: r["err"] for r in rows
            if r["err"] is not None}
    assert set(errs) == {1, 2, 3}
    assert "count exceeds cap" in errs[2]
    assert "size exceeds cap" in errs[3]
    assert sum(1 for r in rows if r["err"] is None) == 3


def test_webdataset_sample_grouping(spark):
    shard = [
        ("a/00001.jpg", b"J1"), ("a/00001.txt", b"T1"),
        ("a/00001.seg.png", b"S1"),          # multi-extension member
        ("b/00001.jpg", b"J2"),              # other dir: own sample
        ("a.b/c.txt", b"DOT"),               # dotted dir, key keeps it
        ("LICENSE", b"L"),                   # extension-less
        (".hidden", b"H"),                   # dot-leading basename
        ("dup.txt", b"old"), ("dup.txt", b"new"),  # replace-on-extract
    ]
    members = TA.tar_members(_df(spark, [_mktar(shard)]))
    got = {r["key"]: dict(r["parts"])
           for r in TA.webdataset_samples(members).collect()}
    assert {k: {e: bytes(v) for e, v in m.items()}
            for k, m in got.items()} == {
        "a/00001": {"jpg": b"J1", "txt": b"T1", "seg.png": b"S1"},
        "b/00001": {"jpg": b"J2"},
        "a.b/c": {"txt": b"DOT"},
        "LICENSE": {"": b"L"},
        ".hidden": {"": b"H"},
        "dup": {"txt": b"new"},
    }


def test_webdataset_archive_local_equals_default(spark):
    """The r12 archive-local grouping (no payload shuffle) must
    produce byte-identical samples to the repartition+agg path on the
    tricky-name shard, across MULTIPLE archives in one partition and
    archives split across Arrow batches, and its plan must hold ZERO
    Exchanges."""
    shard = [
        ("a/00001.jpg", b"J1"), ("a/00001.txt", b"T1"),
        ("a/00001.seg.png", b"S1"),
        ("b/00001.jpg", b"J2"),
        ("a.b/c.txt", b"DOT"),
        ("LICENSE", b"L"),
        (".hidden", b"H"),
        ("dup.txt", b"old"), ("dup.txt", b"new"),
    ]
    shard2 = [("a/00001.jpg", b"OTHER"), ("x.txt", b"X2")]
    # one partition holding BOTH archives: the flush-on-src_id-change
    # boundary inside a task is exercised, not just task boundaries
    df = _df(spark, [_mktar(shard), _mktar(shard2)]).coalesce(1)
    members = TA.tar_members(df)

    def canon(rows):
        return sorted(
            (r["src_id"], r["key"],
             tuple(sorted((e, bytes(v))
                          for e, v in dict(r["parts"]).items())))
            for r in rows)

    base = canon(TA.webdataset_samples(members).collect())
    local_df = TA.webdataset_samples(members, archive_local=True)
    assert canon(local_df.collect()) == base
    # map key ORDER also matches (sorted-by-ext on both paths)
    order_base = sorted(
        (r["src_id"], r["key"], list(dict(r["parts"]).keys()))
        for r in TA.webdataset_samples(members).collect())
    order_local = sorted(
        (r["src_id"], r["key"], list(dict(r["parts"]).keys()))
        for r in local_df.collect())
    assert order_local == order_base
    plan = local_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # a quarantined archive yields no samples on either path
    bad = _df(spark, [b"not a tar at all"])
    badm = TA.tar_members(bad)
    assert TA.webdataset_samples(badm, archive_local=True).count() == 0
    assert TA.webdataset_samples(badm).count() == 0


def test_webdataset_archive_local_name_fuzz(spark):
    """Parse-parity fuzz for the archive-local path: the key/ext
    split happens JVM-side in BOTH paths, but the local path's
    grouping/dedup/sort is reimplemented in Python — lock it against
    a seeded corpus of adversarial member names (multi-dot, dotted
    dirs, dot-leading, unicode, spaces, duplicates, extension-less,
    deep paths) across many archives in few partitions."""
    import random

    rng = random.Random(48271)
    frags = ["a", "b.c", ".hidden", "x y", "ünïcode", "UPPER", "0",
             "tar", "..", "d.e.f"]
    exts = ["", ".jpg", ".txt", ".seg.png", ".a.b.c", ".J"]

    def name():
        depth = rng.randrange(3)
        dirs = "".join(rng.choice(frags) + "/" for _ in range(depth))
        return dirs + rng.choice(frags) + rng.choice(exts)

    archives = []
    for i in range(40):
        members = [(name(), f"payload-{i}-{j}".encode())
                   for j in range(rng.randrange(1, 7))]
        if rng.random() < 0.5 and members:  # force a duplicate name
            members.append((members[0][0], f"dup-{i}".encode()))
        archives.append(_mktar(members))
    df = _df(spark, archives).repartition(3)
    members = TA.tar_members(df)

    def canon(rows):
        return sorted(
            (r["src_id"], r["key"],
             tuple(sorted((e, bytes(v))
                          for e, v in dict(r["parts"]).items())))
            for r in rows)

    got = canon(TA.webdataset_samples(
        members, archive_local=True).collect())
    want = canon(TA.webdataset_samples(members).collect())
    assert got == want
    assert got  # the fuzz corpus produced real samples


def _member_df(spark, rows):
    """Hand-built member frame (bypasses tar_members) for contract
    tests: rows are (src_id, name, payload)."""
    return spark.createDataFrame(
        [(sid, i, name, len(p), bytearray(p), None)
         for i, (sid, name, p) in enumerate(rows)],
        "src_id long, idx int, name string, size long, "
        "payload binary, err string")


def test_webdataset_archive_local_noncontiguous_raises(spark):
    """r13 tripwire (VERDICT r12 next #7 / ADVICE): a member frame
    where one archive's rows are interleaved with another's inside a
    task violates the archive-local contract — it must RAISE, not
    silently emit duplicate sample rows."""
    import pytest

    bad = _member_df(spark, [
        (1, "a.txt", b"A1"),
        (2, "b.txt", b"B"),
        (1, "c.txt", b"A2"),      # src_id 1 recurs after its run
    ]).coalesce(1)
    with pytest.raises(Exception, match="recurs|contiguous"):
        TA.webdataset_samples(bad, archive_local=True).collect()
    # the same frame is fine on the default shuffle path
    assert TA.webdataset_samples(bad).count() == 3


def test_webdataset_archive_local_null_src_id_raises(spark):
    """r14 (ADVICE r13, superseding the r13 silent filter): a null
    src_id has no well-defined sample group on the archive-local
    path, and the default path keeps it as a SQL GROUP BY key — a
    silent exclusion made the two paths diverge on the same input.
    Fail-loud instead (the contiguity tripwire's philosophy)."""
    import pytest

    m = spark.createDataFrame(
        [(None, 0, "x.txt", 1, bytearray(b"X"), None),
         (7, 0, "y.txt", 1, bytearray(b"Y"), None)],
        "src_id long, idx int, name string, size long, "
        "payload binary, err string").coalesce(1)
    with pytest.raises(Exception, match="null src_id"):
        TA.webdataset_samples(m, archive_local=True).collect()
    # the default path keeps the null group per SQL semantics
    rows = TA.webdataset_samples(m).collect()
    assert sorted(((r["src_id"], r["key"]) for r in rows),
                  key=str) == [(7, "y"), (None, "x")]


def test_webdataset_archive_local_audit_catches_cross_task_split(
        spark):
    """r14 (VERDICT r13 next #5): an archive split across TASKS is
    invisible to the per-task contiguity tripwire (both halves look
    clean); audit=True reconciles sample rows against member rows
    per archive and raises."""
    import pytest

    # src_id 1's members land in two partitions (repartitionByRange
    # on idx splits the archive); each partition is internally
    # contiguous so the tripwire stays silent — and the split pair
    # SHARES key "a", so the un-audited output emits duplicate
    # sample rows for it
    m = spark.createDataFrame(
        [(1, 0, "a.jpg", 2, bytearray(b"J"), None),
         (1, 1, "a.txt", 2, bytearray(b"T"), None)],
        "src_id long, idx int, name string, size long, "
        "payload binary, err string").repartitionByRange(2, "idx")
    dup = TA.webdataset_samples(m, archive_local=True).collect()
    assert len(dup) == 2  # the silent-duplicate failure mode, live
    with pytest.raises(ValueError, match="reconcile|split across"):
        TA.webdataset_samples(m, archive_local=True, audit=True)
    # a contract-shaped frame passes the audit unchanged
    ok = spark.createDataFrame(
        [(1, 0, "a.jpg", 2, bytearray(b"J"), None),
         (1, 1, "a.txt", 2, bytearray(b"T"), None),
         (2, 0, "b.jpg", 2, bytearray(b"K"), None)],
        "src_id long, idx int, name string, size long, "
        "payload binary, err string").coalesce(1)
    rows = TA.webdataset_samples(ok, archive_local=True,
                                 audit=True).collect()
    assert sorted((r["src_id"], r["key"]) for r in rows) \
        == [(1, "a"), (2, "b")]
    # audit without archive_local is a contract error, not a no-op
    with pytest.raises(ValueError, match="audit"):
        TA.webdataset_samples(ok, audit=True)


def test_webdataset_archive_local_cross_batch_continuation(spark):
    """ADVICE r12: one archive's rows spanning MULTIPLE Arrow
    batches (cur_sid/acc persisting across the `for pdf in batches`
    boundary) — forced by a 2-row Arrow batch cap so every archive
    straddles batches — must still merge into single samples,
    byte-identical to the shuffle path."""
    shards = []
    for i in range(5):
        shards.append(_mktar(
            [(f"d/{j:05d}.jpg", f"J{i}-{j}".encode())
             for j in range(4)]
            + [(f"d/{j:05d}.txt", f"T{i}-{j}".encode())
               for j in range(4)]
            + [("dup.txt", b"old"), ("dup.txt", b"new")]))
    df = _df(spark, shards).coalesce(2)
    members = TA.tar_members(df)

    def canon(rows):
        return sorted(
            (r["src_id"], r["key"],
             tuple(sorted((e, bytes(v))
                          for e, v in dict(r["parts"]).items())))
            for r in rows)

    want = canon(TA.webdataset_samples(members).collect())
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "2")
    try:
        got = canon(TA.webdataset_samples(
            members, archive_local=True).collect())
    finally:
        spark.conf.set(key, old)
    assert got == want
    # every archive contributed (5 archives × (4 samples + dup))
    assert len(got) == 25


def test_tar_archive_byte_and_entry_caps(spark):
    """The TOTAL decompressed-bytes cap trips even when every member
    is individually under the per-member cap (the gzip-bomb shape),
    and directory entries count toward the entry cap (tarfile keeps
    a TarInfo per entry — a directory bomb must not walk forever)."""
    many_bytes = _mktar([(f"b{i}.bin", bytes(600)) for i in range(4)])
    dirs = _mktar([(f"d{i}/", None) for i in range(10)]
                  + [("f.txt", b"x")])
    rows = TA.tar_members(
        _df(spark, [many_bytes, dirs]),
        max_member_bytes=1024, max_archive_bytes=2000,
        max_members=5).collect()
    errs = {r["src_id"]: r["err"] for r in rows
            if r["err"] is not None}
    assert "archive bytes exceed cap" in errs[0]
    assert "member count exceeds cap" in errs[1]
    assert all(r["err"] is not None for r in rows)


def test_tar_member_ordinals(spark):
    rows = {r["name"]: r["idx"]
            for r in TA.tar_members(
                _df(spark, [_mktar(_SHARD)])).collect()}
    # directories consume no ordinal
    assert rows == {"00001.jpg": 0, "00001.txt": 1, "00001.json": 2,
                    "00002.jpg": 3, "00002.txt": 4}


def test_webdataset_single_exchange_plan(spark):
    """Payload bytes must shuffle exactly once: the explicit
    (src_id, key) repartition satisfies both downstream aggs'
    clustering (hash on a key subset co-locates the superset), so
    the plan holds exactly ONE Exchange past the source."""
    members = TA.tar_members(_df(spark, [_mktar(_SHARD)]))
    plan = TA.webdataset_samples(members) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_tar_bz2_and_xz_archives(spark):
    """mode='r:*' auto-detects whole-archive bz2/xz too (stdlib) —
    lock it so a tarfile-open refactor can't silently drop the
    formats."""
    import bz2
    import lzma

    raw = _mktar(_SHARD)
    for comp in (bz2.compress, lzma.compress):
        rows = TA.tar_members(_df(spark, [comp(raw)])).collect()
        assert sorted(r["name"] for r in rows if r["err"] is None) \
            == sorted(n for n, d in _SHARD if d is not None)


def test_min_tasks_parallelism_floor(spark):
    """File-layout-bound Python sources accept a parallelism floor:
    a 1-partition input fans out to min_tasks partitions before the
    mapInPandas walk; None respects the layout; results identical."""
    import tarfile
    import io

    from remote_storage_adapter_spark.operators.skew import (
        ensure_min_tasks,
    )

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        ti = tarfile.TarInfo("a.txt")
        ti.size = 2
        tf.addfile(ti, io.BytesIO(b"hi"))
    shard = buf.getvalue()
    df = spark.createDataFrame(
        [(i, bytearray(shard)) for i in range(8)],
        "src_id long, payload binary").coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    floored = TA.tar_members(df, min_tasks=8)
    assert floored.rdd.getNumPartitions() == 8
    kept = TA.tar_members(df)
    assert kept.rdd.getNumPartitions() == 1
    assert sorted(map(tuple, floored.collect())) == \
        sorted(map(tuple, kept.collect()))
    # already-wide input: floor below current width is a no-op plan
    wide = df.repartition(8)
    assert TA.tar_members(wide, min_tasks=4).rdd.getNumPartitions() == 8
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ensure_min_tasks(df, 0)


def test_ensure_min_tasks_volume_aware(spark):
    """r11: when a payload column is named, the fan-out scales with
    task VOLUME — per-task bytes (128 MB ceiling) and per-task rows
    (50k ceiling) — because long Python tasks degrade superlinearly
    (BENCH_SF10 r11: sf100 tar walk 188 s at 32 tasks vs 54 s at
    128). Critically, the volume target is computed BEFORE the
    already-wide early return: the first r11 attempt checked
    ``cur >= min_tasks`` first, so a 32-partition sf100 scan skipped
    the volume fan-out entirely and tar_shards stayed superlinear
    (219 s measured with that "fix" in the tree)."""
    from remote_storage_adapter_spark.operators.skew import (
        MAX_TASK_PYTHON_ROWS,
        ensure_min_tasks,
    )

    n = 2 * MAX_TASK_PYTHON_ROWS + 1  # rows ceiling → 3 tasks min
    df = (spark.range(n)
          .select(F.col("id").alias("src_id"),
                  F.encode(F.col("id").cast("string"), "UTF-8")
                  .alias("payload"))
          .coalesce(1))
    # rows bound dominates: ceil(100001/50000) = 3 > min_tasks=2
    out = ensure_min_tasks(df, 2, payload_col="payload")
    assert out.rdd.getNumPartitions() == 3
    # floor still wins when volume is small
    tiny = df.limit(10).coalesce(1)
    out2 = ensure_min_tasks(tiny, 4, payload_col="payload")
    assert out2.rdd.getNumPartitions() == 4
    # already-wide input whose width exceeds the volume target: no-op
    wide = df.repartition(8)
    assert ensure_min_tasks(
        wide, 2, payload_col="payload").rdd.getNumPartitions() == 8
    # the sf100 regression: input ALREADY at min_tasks width but
    # over-volumed per task — the volume target must still engage
    at_floor = df.repartition(2)
    assert ensure_min_tasks(
        at_floor, 2, payload_col="payload").rdd.getNumPartitions() == 3
    # without payload_col the plain floor keeps the old semantics
    assert ensure_min_tasks(
        at_floor, 2).rdd.getNumPartitions() == 2
    # byte ceiling: 3 rows × ~1 MB at a 2 MB ceiling via monkeypatched
    # constant is overkill — instead check the arithmetic directly
    import math

    from remote_storage_adapter_spark.operators import skew as SK
    total = 300 << 20  # 300 MB
    assert max(2, math.ceil(total / SK.MAX_TASK_PAYLOAD_BYTES)) == 3
    # r12 (ADVICE r11): the payload-size sample is SPREAD across
    # partitions, not limit(1024) off one partition's head — a
    # size-sorted layout whose first partition holds only tiny
    # payloads must not collapse the byte estimate. Two partitions:
    # 40k × 8 B then 40k × ~4 KB (avg ~2 KB ⇒ ~160 MB total ⇒ byte
    # target 2); a head-of-first-partition sample would see 8 B/row
    # (~0.6 MB total) and fall back to the rows target of 2 as well,
    # so ALSO check the estimate itself via a layout where only the
    # spread sample pushes the target past the rows bound: 3 × 50k
    # rows → rows target 3, but spread-sampled bytes ≈ 2.7 KB/row ×
    # 150k ≈ 400 MB → byte target 4.
    # 12 KiB big rows: range-partition boundaries are sample-estimated
    # and shuffle-fetch order is nondeterministic, so partition 2's
    # head MAY be small rows — but partition 3 (ids ≥ 2/3·n) is big
    # by construction, and its 32 sampled rows alone push the byte
    # estimate past the rows bound: worst case avg ≥ 32×12,288/96 =
    # 4,096 B ⇒ ~615 MB ⇒ byte target 5 > rows target 3.
    big = F.encode(F.rpad(F.col("id").cast("string"), 12288, "x"),
                   "UTF-8")
    small = F.encode(F.col("id").cast("string"), "UTF-8")
    skewed = (spark.range(3 * MAX_TASK_PYTHON_ROWS)
              .select(F.col("id").alias("src_id"),
                      F.when(F.col("id") < MAX_TASK_PYTHON_ROWS,
                             small).otherwise(big).alias("payload"))
              .repartitionByRange(3, "src_id"))
    out3 = ensure_min_tasks(skewed, 2, payload_col="payload")
    # head-of-one-partition sampling would see the 8 B rows only and
    # return the rows target (3); the spread sample must see the big
    # partitions and widen further
    assert out3.rdd.getNumPartitions() > 3


def test_planted_shard_builders_pre_inflation_fanout(spark):
    """r11: the planted-shard builders fan out the NARROW id frame
    BEFORE the 3,072 B/row payload concat (closed-form inflation ×
    a metadata-cheap count), so bounding task volume never
    round-robins built archives (measured 20 s warm / 108 s cold for
    the 15.4 GB exchange at sf100). Small inputs keep their layout;
    a corpus whose built bytes exceed the per-task ceiling widens to
    the closed-form width; shard bytes match the constant."""
    import math

    from remote_storage_adapter_spark import queries as Q
    from remote_storage_adapter_spark.operators import skew as SK

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("some text").alias("text")).coalesce(1)
    shards = Q.tar_planted_shards(docs)
    # 100 docs × 3,072 B ≪ 128 MB: layout preserved, no widening
    assert shards.rdd.getNumPartitions() == 1
    row = shards.limit(1).select(
        F.octet_length("payload").alias("b")).first()
    assert row["b"] == Q._PLANTED_SHARD_BYTES
    # the closed-form width matches what sf100 measured (115 tasks)
    assert math.ceil(
        5_000_000 * Q._PLANTED_SHARD_BYTES
        / SK.MAX_TASK_PAYLOAD_BYTES) == 115
    # widening engages when built bytes exceed one task's ceiling:
    # shrink the ceiling instead of building 128 MB of shards
    orig = SK.MAX_TASK_PAYLOAD_BYTES
    try:
        SK.MAX_TASK_PAYLOAD_BYTES = 100 * Q._PLANTED_SHARD_BYTES
        Q_target = math.ceil(
            1000 * Q._PLANTED_SHARD_BYTES / SK.MAX_TASK_PAYLOAD_BYTES)
        wide_docs = spark.range(1000).select(
            F.col("id").alias("doc_id"),
            F.lit("t").alias("text")).coalesce(1)
        # builders read the ceiling through the module attr at call
        # time, so the monkeypatched value must drive the width
        assert Q.tar_planted_shards(
            wide_docs).rdd.getNumPartitions() == Q_target == 10
    finally:
        SK.MAX_TASK_PAYLOAD_BYTES = orig


def test_plan_bytes_tasks_estimate(spark, tmp_path):
    """r13 (VERDICT r12 next #5): the zero-action Catalyst-estimate
    task target — scales with file bytes for file-backed frames,
    caps at max_tasks, and returns None on unknown-size (RDD-backed)
    inputs where the stats sentinel would otherwise force a
    pathological fan-out."""
    import glob
    import math
    import os

    from remote_storage_adapter_spark.operators import skew as SK

    p = str(tmp_path / "pbt")
    spark.range(20_000).selectExpr(
        "id", "uuid() as t").coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    nbytes = sum(os.path.getsize(f)
                 for f in glob.glob(p + "/*.parquet"))
    tgt = SK.plan_bytes_tasks(df, bytes_per_task=64 << 10)
    assert tgt is not None
    # order-of-magnitude contract: within 4x of the file-byte target
    want = math.ceil(nbytes / (64 << 10))
    assert want / 4 <= tgt <= want * 4
    # a huge per-task budget collapses to one task
    assert SK.plan_bytes_tasks(df, bytes_per_task=1 << 40) == 1
    # the cap holds
    assert SK.plan_bytes_tasks(
        df, bytes_per_task=1, max_tasks=64) == 64
    # RDD-backed frame: size unknown (defaultSizeInBytes sentinel)
    rdf = spark.createDataFrame(
        spark.sparkContext.parallelize([(1, "a")]),
        "id long, t string")
    assert SK.plan_bytes_tasks(rdf, bytes_per_task=1024) is None


def test_plan_bytes_tasks_session_derived_cap(spark):
    """r14 (VERDICT r13 wrong #3 / next #3): the runaway backstop
    derives from the session instead of a silent hard 4096 — on a
    wide cluster the cap widens with defaultParallelism, and when it
    does bind the caller hears about it (no-silent-caps rule)."""
    import pytest

    from remote_storage_adapter_spark.operators import skew as SK

    # pure decision: default cap = max(4096, parallelism x 64)
    assert SK._bounded_tasks(10**7, None, 32) == (4096, True)
    assert SK._bounded_tasks(10**7, None, 1024) == (65536, True)
    assert SK._bounded_tasks(100, None, 32) == (100, False)
    assert SK._bounded_tasks(5000, None, 32) == (4096, True)
    assert SK._bounded_tasks(5000, None, 128) == (5000, False)
    # an explicit cap still wins over the session derivation
    assert SK._bounded_tasks(10**7, 64, 10**6) == (64, True)
    # end to end: a plan-stats estimate past the cap WARNS — Range
    # carries an 8 B/row Catalyst estimate with zero data behind it
    big = spark.range(1 << 33).toDF("id")  # ~64 GiB estimate
    with pytest.warns(RuntimeWarning, match="binds"):
        got = SK.plan_bytes_tasks(big, bytes_per_task=2 << 20)
    assert got == max(4096,
                      spark.sparkContext.defaultParallelism * 64)
    # under the cap: no warning, raw target returned
    import warnings as W

    small = spark.range(1 << 20).toDF("id")  # 8 MiB estimate
    with W.catch_warnings():
        W.simplefilter("error")
        assert SK.plan_bytes_tasks(small, bytes_per_task=2 << 20) == 4
