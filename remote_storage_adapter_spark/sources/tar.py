"""TAR shard source + WebDataset-style sample grouping — the
standard container for multimodal training data: corpora ship as TAR
shards whose members are grouped by basename stem into samples
(``00042.jpg`` + ``00042.txt`` + ``00042.json`` = one sample), read
sequentially for throughput (the WebDataset convention).

:func:`tar_members` explodes a binary column of TAR archives (plain
or gzip — ``tarfile`` stdlib handles ustar/pax/GNU) into member rows
via Arrow-batched ``mapInPandas``: partition-preserving, per-ARCHIVE
``err`` quarantine, member-count and per-member-size caps so a
hostile archive (10⁶ empty members, or one 100 GB member) cannot OOM
a worker. :func:`webdataset_samples` regroups members into one row
per sample with an ``ext → payload`` map column.

Reference parity: the reference engine has no shard surface
(``main.go`` is a metrics adapter); this is the task brief's
training-data-pipeline extension — the ingestion twin of
``sources/warc.py`` for the multimodal side.
"""

from __future__ import annotations

import io
import tarfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: per-member decompressed size cap (a TAR of media clips holds
#: members in the MBs; one multi-GB member is hostile or misrouted).
MAX_MEMBER_BYTES = 1 << 28
#: member-count cap per archive (WebDataset shards hold ~10k samples).
MAX_MEMBERS = 1 << 20

TAR_SCHEMA = T.StructType(
    [
        T.StructField("src_id", T.LongType(), True),
        T.StructField("idx", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("err", T.StringType(), True),
    ]
)


def tar_members(df: DataFrame, *, id_col: str = "src_id",
                payload_col: str = "payload",
                max_member_bytes: int = MAX_MEMBER_BYTES,
                max_members: int = MAX_MEMBERS) -> DataFrame:
    """Explode TAR archives into (src_id, idx, name, size, payload,
    err) member rows — ``idx`` is the member's archive ordinal;
    regular files only (directories/links carry no training
    payload). One quarantine row per unreadable archive;
    a member over ``max_member_bytes`` or an archive over
    ``max_members`` quarantines the ARCHIVE (caps are contracts, not
    truncations — silent partial reads would look complete)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["src_id", "idx", "name", "size", "payload", "err"]
        for pdf in batches:
            rows = []
            for sid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    sid = int(sid)
                except (TypeError, ValueError):
                    sid = None
                try:
                    if p is None:
                        raise ValueError("NULL payload")
                    # buffer per archive: an error mid-walk must
                    # quarantine the WHOLE archive, not leave the
                    # members read so far looking complete
                    mine = []
                    with tarfile.open(
                            fileobj=io.BytesIO(bytes(p)),
                            mode="r:*") as tf:
                        n = 0
                        for m in tf:
                            if not m.isfile():
                                continue
                            n += 1
                            if n > max_members:
                                raise ValueError(
                                    "TAR: member count exceeds cap")
                            if m.size > max_member_bytes:
                                raise ValueError(
                                    "TAR: member size exceeds cap")
                            data = tf.extractfile(m).read()
                            mine.append((sid, n - 1, m.name,
                                         len(data), data, None))
                    rows.extend(mine)
                except Exception as e:  # noqa: BLE001 — quarantine
                    # is the contract (same argument as decode_media)
                    rows.append((sid, None, None, None, None,
                                 f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(
        F.col(id_col).alias("src_id"), F.col(payload_col)
    ).mapInPandas(run, schema=TAR_SCHEMA)


def webdataset_samples(members: DataFrame) -> DataFrame:
    """Group TAR member rows into WebDataset samples: the key is the
    member name minus its LAST extension (directories kept — the
    WebDataset convention, so ``a/b.jpg`` and ``a/b.txt`` pair while
    ``c/b.jpg`` stays separate), the payloads land in an
    ``ext → payload`` map. Returns (src_id, key, parts). One hash
    aggregation keyed on (src_id, key); payload bytes shuffle once —
    unavoidable, grouping IS the operation — and samples are small
    by construction (a few media clips).

    Extension-less members get ext ``''``. Duplicate (key, ext)
    pairs within an archive resolve to the LAST member in archive
    order (a per-ext max on the member ordinal BEFORE the map
    build — Spark's map_from_entries rejects duplicate keys under
    the default dedup policy), matching tar replace-on-extract
    semantics."""
    name = F.col("name")
    has_ext = name.rlike(r"[^/]\.[^./]*$")
    key = F.when(has_ext,
                 F.regexp_replace(name, r"\.[^./]*$", "")
                 ).otherwise(name)
    ext = F.when(has_ext,
                 F.regexp_extract(name, r"\.([^./]*)$", 1)
                 ).otherwise(F.lit(""))
    per_ext = (members.filter(F.col("err").isNull())
               .select("src_id", key.alias("key"), ext.alias("ext"),
                       "idx", "payload")
               .groupBy("src_id", "key", "ext")
               .agg(F.max(F.struct("idx", "payload")).alias("_m")))
    return (per_ext.groupBy("src_id", "key")
            .agg(F.map_from_entries(F.array_sort(F.collect_list(
                F.struct("ext", F.col("_m.payload").alias("payload"))
            ))).alias("parts")))
