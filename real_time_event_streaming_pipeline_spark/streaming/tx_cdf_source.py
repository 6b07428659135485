"""Streaming change-data-feed SOURCE over the transactional table —
the read-side completion of tx_table's write path: downstream
consumers subscribe to the table's commit log as a Structured
Streaming source instead of re-scanning snapshots.

Built on the Spark 4 Python DataSource API (same pattern as
sources/pydatasource.py): the offset cursor is the COMMIT VERSION, so
`latestOffset` just lists the `_log/` directory, `partitions(start,
end)` yields one input partition per committed version, and `read`
reconstructs that version's change rows — insert / update_preimage /
update_postimage / delete, exactly tx_table.read_changes' contract —
executor-side with pyarrow+pandas (a DataSource reader runs as plain
Python on executors; no SparkSession exists there, so the manifest
diff is recomputed file-locally instead of delegating to the
DataFrame implementation; parity between the two is pinned in
tests/test_tx_cdf_stream.py).

Replayability: versions are immutable once committed and their data
files are retained until vacuum, so any [start, end) offset range
re-reads identical rows — the Kafka-offset contract checkpoint
recovery needs. Vacuum interplay: keep_versions must cover the
consumer's lag (the same rule as tx_table.read_changes).

    spark.dataSource.register(TxChangeFeedDataSource)
    spark.readStream.format("txcdf").option("table_dir", path).load()

Schema: the table's manifest schema (resolved at plan time,
driver-side) plus `_change_type string` and `_commit_version long`.
A commit that EVOLVED the schema after the stream was planned fails
the batch loudly (restart the stream to subscribe under the new
schema) instead of silently dropping the added columns.

Rate control: `max_versions_per_trigger` bounds each micro-batch to
that many commit versions (Kafka's maxOffsetsPerTrigger analogue), so
a consumer restarted after long downtime drains its backlog in many
small batches instead of one giant one. Requires `stream_id` (unique
per query+checkpoint, stable across restarts): the Python DataSource
API's latestOffset receives neither the start offset nor a ReadLimit,
so the reader persists its own planning cursor at
`<table>/_log/.cdf_cursor_<stream_id>` — written atomically at plan
time and on commit; an overshoot only makes one batch larger, never
a backward offset. Caveat: `Trigger.AvailableNow` snapshots ONE
latestOffset before planning, so with the cap it drains at most
max_versions_per_trigger versions per run — use the default
processing-time trigger (or repeated availableNow runs) to drain a
backlog under the cap.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from . import tx_table


class _VersionPartition(InputPartition):
    def __init__(self, table_dir: str, version: int):
        self.table_dir = table_dir
        self.version = version


def _read_dv_positions(table_dir: str, dv_rel: str, file_rel: str) -> set[int]:
    """The deleted row positions a DV sidecar holds for one data file
    (the sidecar is a Spark-written parquet dir: read its part files)."""
    import pyarrow.parquet as pq

    dv_abs = os.path.join(table_dir, "data", dv_rel)
    out: set[int] = set()
    for name in sorted(os.listdir(dv_abs)):
        if not name.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(dv_abs, name), columns=["_file", "_pos"])
        df = t.to_pandas()
        out |= set(df.loc[df["_file"] == file_rel, "_pos"].astype(int))
    return out


def _load_entries(table_dir: str, entries: list[dict], field_names: list[str]):
    """Concatenate manifest entries into one pandas frame aligned to
    the manifest schema (files from before an additive evolution are
    missing columns: reindex fills them with None). Entries carrying a
    deletion vector get it applied positionally — the same
    merge-on-read semantics as tx_table._read_entries."""
    import pandas as pd
    import pyarrow.parquet as pq

    if not entries:
        return pd.DataFrame(columns=field_names)
    frames = []
    for e in entries:
        t = pq.read_table(os.path.join(table_dir, "data", e["path"]))
        df = t.to_pandas()
        if e.get("dv"):
            dead = _read_dv_positions(table_dir, e["dv"], e["path"])
            if dead:
                df = df.iloc[[i for i in range(len(df)) if i not in dead]]
        frames.append(df)
    df = pd.concat(frames, ignore_index=True)
    for c in field_names:
        if c not in df.columns:
            df[c] = None
    df = df[field_names]
    # NaN/NaT -> None in object dtype: the update_where/restore
    # branches diff rows as Counter multisets of tuples, and NaN
    # tuples never hash/compare equal (hash(nan) is identity-based on
    # py3.10+), so null-bearing carried-verbatim rows (e.g. rows
    # predating an additive schema evolution) would fail to cancel
    # and surface as spurious update images. tx_table.read_changes
    # uses Spark's null-safe exceptAll; this keeps the twin identical.
    return df.astype(object).where(df.notna(), None)


def _changes_for_version(table_dir: str, version: int, field_names: list[str]):
    """Pure-Python twin of tx_table.read_changes for one version:
    (change_type, row) pandas frame. Must stay semantically identical
    — the parity test drives both over the same history."""
    import pandas as pd

    m_v = tx_table.read_manifest(table_dir, version)
    if m_v["op"] == "compact":
        return pd.DataFrame(columns=[*field_names, "_change_type"])
    key_cols = m_v["key_cols"]
    dv_changed: list[tuple[dict, dict]] = []
    if version > 0:
        m_prev = tx_table.read_manifest(table_dir, version - 1)
        prev_map = {f["path"]: f for f in m_prev["files"]}
        cur_paths = {f["path"] for f in m_v["files"]}
        new_entries = [f for f in m_v["files"] if f["path"] not in prev_map]
        prev_files = [f for f in m_prev["files"] if f["path"] not in cur_paths]
        dv_changed = [
            (prev_map[f["path"]], f)
            for f in m_v["files"]
            if f["path"] in prev_map
            and prev_map[f["path"]].get("dv") != f.get("dv")
        ]
    else:
        new_entries, prev_files = m_v["files"], []
    cur = _load_entries(table_dir, new_entries, field_names)
    prev = _load_entries(table_dir, prev_files, field_names)

    if m_v["op"] == "update_where":
        # tuple-level multiset diff (keys unchanged — see
        # tx_table.read_changes): removed = left-files rows + newly
        # DV-dead rows; added = entered-files rows
        from collections import Counter

        removed_rows = [tuple(r) for r in prev.itertuples(index=False)]
        for p_ent, c_ent in dv_changed:
            cur_dead = (
                _read_dv_positions(table_dir, c_ent["dv"], c_ent["path"])
                if c_ent.get("dv") else set()
            )
            prev_dead = (
                _read_dv_positions(table_dir, p_ent["dv"], p_ent["path"])
                if p_ent.get("dv") else set()
            )
            newly = sorted(cur_dead - prev_dead)
            if newly:
                raw = _load_entries(table_dir, [dict(c_ent, dv=None)], field_names)
                removed_rows += [tuple(r) for r in raw.iloc[newly].itertuples(index=False)]
        added_rows = [tuple(r) for r in cur.itertuples(index=False)]
        rc, ac = Counter(removed_rows), Counter(added_rows)
        pre = list((rc - ac).elements())
        post = list((ac - rc).elements())
        frames = []
        if pre:
            frames.append(
                pd.DataFrame(pre, columns=field_names).assign(_change_type="update_preimage")
            )
        if post:
            frames.append(
                pd.DataFrame(post, columns=field_names).assign(_change_type="update_postimage")
            )
        if not frames:
            return pd.DataFrame(columns=[*field_names, "_change_type"])
        return pd.concat(frames, ignore_index=True)

    def _dv_dead_frame(p_ent, c_ent):
        """Raw rows at (cur DV minus prev DV) positions, or None."""
        cur_dead = (
            _read_dv_positions(table_dir, c_ent["dv"], c_ent["path"])
            if c_ent.get("dv") else set()
        )
        prev_dead = (
            _read_dv_positions(table_dir, p_ent["dv"], p_ent["path"])
            if p_ent.get("dv") else set()
        )
        newly = sorted(cur_dead - prev_dead)
        if not newly:
            return None
        raw = _load_entries(table_dir, [dict(c_ent, dv=None)], field_names)
        return raw.iloc[newly]

    if m_v["op"] in ("upsert", "merge", "restore") and dv_changed:
        # dv-mode merge: fold DV-killed rows into the prev side so the
        # key-based classification below covers update images and
        # matched deletes; a restore additionally REVIVES
        # prev-DV-minus-cur-DV rows on the post side (mirrors
        # tx_table.read_changes)
        dead = [f for f in (_dv_dead_frame(p, c) for p, c in dv_changed) if f is not None]
        if dead:
            prev = pd.concat([prev, *dead], ignore_index=True)
        if m_v["op"] == "restore":
            revived = [
                f for f in (_dv_dead_frame(c, p) for p, c in dv_changed)
                if f is not None
            ]
            if revived:
                cur = pd.concat([cur, *revived], ignore_index=True)
        dv_changed = []

    if m_v["op"] == "restore":
        # tuple-level diff, then key attribution — mirrors
        # tx_table.read_changes' restore branch
        from collections import Counter

        rem_c = Counter(tuple(r) for r in prev.itertuples(index=False))
        add_c = Counter(tuple(r) for r in cur.itertuples(index=False))
        removed = list((rem_c - add_c).elements())
        added = list((add_c - rem_c).elements())
        key_idx = [field_names.index(k) for k in key_cols]

        def keyof(t):
            return tuple(t[i] for i in key_idx)

        rk = {keyof(t) for t in removed}
        ak = {keyof(t) for t in added}
        frames = []
        for rows, ct in (
            ([t for t in removed if keyof(t) in ak], "update_preimage"),
            ([t for t in removed if keyof(t) not in ak], "delete"),
            ([t for t in added if keyof(t) in rk], "update_postimage"),
            ([t for t in added if keyof(t) not in rk], "insert"),
        ):
            if rows:
                frames.append(
                    pd.DataFrame(rows, columns=field_names).assign(_change_type=ct)
                )
        if not frames:
            return pd.DataFrame(columns=[*field_names, "_change_type"])
        return pd.concat(frames, ignore_index=True)

    eff = tx_table._commit_eff_epoch(m_v)
    if m_v["op"] in ("upsert", "merge"):
        post = cur[cur["_epoch"] == eff]
    else:
        post = cur.iloc[0:0]

    def keyed(df):
        return df[key_cols].drop_duplicates()

    out = []
    if len(post) and len(prev):
        post_keys = keyed(post)
        pre = prev.merge(post_keys, on=key_cols, how="inner")
        updated = keyed(pre)
        out.append(pre.assign(_change_type="update_preimage"))
        upd_post = post.merge(updated, on=key_cols, how="inner")
        out.append(upd_post.assign(_change_type="update_postimage"))
        ins = post.merge(updated, on=key_cols, how="left", indicator=True)
        ins = ins[ins["_merge"] == "left_only"].drop(columns="_merge")
        out.append(ins.assign(_change_type="insert"))
    elif len(post):
        out.append(post.assign(_change_type="insert"))
    if len(prev):
        cur_keys = keyed(cur) if len(cur) else cur[key_cols]
        dele = prev.merge(cur_keys, on=key_cols, how="left", indicator=True)
        dele = dele[dele["_merge"] == "left_only"].drop(columns="_merge")
        if len(dele):
            out.append(dele.assign(_change_type="delete"))
    for p_ent, c_ent in dv_changed:
        # merge-on-read delete: the newly-dead positions (cur DV minus
        # prev DV) of an unchanged file are this commit's delete rows
        import pyarrow.parquet as pq

        cur_dead = (
            _read_dv_positions(table_dir, c_ent["dv"], c_ent["path"])
            if c_ent.get("dv") else set()
        )
        prev_dead = (
            _read_dv_positions(table_dir, p_ent["dv"], p_ent["path"])
            if p_ent.get("dv") else set()
        )
        newly = sorted(cur_dead - prev_dead)
        if not newly:
            continue
        raw = pq.read_table(
            os.path.join(table_dir, "data", c_ent["path"])
        ).to_pandas()
        rows = raw.iloc[newly]
        for c in field_names:
            if c not in rows.columns:
                rows[c] = None
        out.append(rows[field_names].assign(_change_type="delete"))
    if not out:
        return pd.DataFrame(columns=[*field_names, "_change_type"])
    return pd.concat(out, ignore_index=True)


class _TxChangeFeedStreamReader(DataSourceStreamReader):
    def __init__(self, options, fields):
        self.table_dir = options["table_dir"]
        if "start_timestamp" in options:
            if "start_version" in options:
                raise ValueError("pass start_version or start_timestamp, not both")
            # TIMESTAMP AS OF subscription: start AFTER the newest
            # commit at or before the instant (its state is the
            # baseline; later commits are the changes), from the
            # first retained commit when the instant predates history
            v = tx_table.version_as_of(
                self.table_dir, float(options["start_timestamp"])
            )
            self.start_version = 0 if v is None else v + 1
        else:
            self.start_version = int(options.get("start_version", 0))
        self.fields = fields  # [(name, typeName), ...] minus the CDF columns
        mvpt = options.get("max_versions_per_trigger")
        self.max_versions = int(mvpt) if mvpt is not None else None
        if self.max_versions is not None and self.max_versions < 1:
            raise ValueError("max_versions_per_trigger must be >= 1")
        self.stream_id = options.get("stream_id")
        if self.max_versions is not None and not self.stream_id:
            # the planning cursor must survive restarts NEXT TO the
            # engine's checkpoint position or a post-downtime restart
            # would plan the whole backlog in one batch (the exact bug
            # the option exists to fix) — and it must be per-stream,
            # since many streams can subscribe to one table
            raise ValueError(
                "max_versions_per_trigger needs a stream_id option "
                "(unique per streaming query+checkpoint; keep it stable "
                "across restarts, reset it with the checkpoint)"
            )
        # in-memory planning cursor: the newest END offset handed to
        # the engine this process lifetime. Rate limiting only —
        # correctness rests on the checkpointed [start, end) ranges.
        self._cursor: int | None = None

    # ------------------------------------------------ planning cursor

    def _cursor_path(self) -> str:
        return os.path.join(self.table_dir, "_log", f".cdf_cursor_{self.stream_id}")

    def _load_cursor(self) -> int | None:
        """max(in-memory, persisted) planned end. The persisted value
        is written at plan time and on commit, so after a restart the
        cap resumes from the checkpointed position instead of handing
        the engine the entire backlog; an overshoot (cursor ahead of
        the engine's true position) only makes one batch larger —
        never a backward offset, never a replay."""
        best = self._cursor
        try:
            with open(self._cursor_path()) as fh:
                v = int(fh.read().strip())
            best = v if best is None else max(best, v)
        except (FileNotFoundError, ValueError):
            pass
        return best

    def _save_cursor(self, version: int) -> None:
        self._cursor = max(self._cursor or 0, int(version))
        if self.stream_id is None:
            return
        path = self._cursor_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as fh:
            # persist the max()ed cursor, not the raw version: a
            # smaller end (re-seeded latestOffset after cursor-file
            # loss, or two queries sharing a stream_id) must never
            # move the planning cursor backward and re-enlarge caps
            fh.write(str(int(self._cursor)))
        os.replace(tmp, path)  # atomic: readers see old or new, never torn

    def initialOffset(self):
        self._cursor = max(self._cursor or 0, self.start_version)
        return {"version": self.start_version}

    def latestOffset(self):
        latest = tx_table.latest_version(self.table_dir)
        true_end = (latest + 1) if latest is not None else self.start_version
        if self.max_versions is None:
            return {"version": true_end}
        cursor = self._load_cursor()
        if cursor is None:
            # brand-new stream (no cursor persisted yet): the engine's
            # start will be start_version, so cap from there. The
            # engine calls latestOffset before initialOffset, hence
            # the seed here rather than a None passthrough.
            cursor = self.start_version
        return {"version": max(min(true_end, cursor + self.max_versions), cursor)}

    def partitions(self, start: dict, end: dict):
        self._save_cursor(int(end["version"]))
        return [
            _VersionPartition(self.table_dir, v)
            for v in range(start["version"], end["version"])
        ]

    def read(self, partition: _VersionPartition):
        import pandas as pd

        names = [n for n, _ in self.fields]
        # schema-evolution gate (ADVICE r4): the stream schema was
        # resolved at plan time; a commit that carries columns absent
        # from it must fail loudly instead of silently dropping them —
        # the consumer restarts the stream to pick up the new schema
        m_v = tx_table.read_manifest(partition.table_dir, partition.version)
        if m_v.get("schema") is not None:
            commit_cols = [
                f["name"] for f in json.loads(m_v["schema"])["fields"]
            ]
            extra = [c for c in commit_cols if c not in names]
            if extra:
                raise ValueError(
                    f"txcdf: commit v{partition.version} evolved the table "
                    f"schema with column(s) {extra} absent from this stream's "
                    "plan-time schema; restart the stream to subscribe under "
                    "the evolved schema"
                )
        df = _changes_for_version(partition.table_dir, partition.version, names)
        integer = {n for n, t in self.fields if t in ("long", "integer", "short", "byte")}
        for rec in df.to_dict("records"):
            vals = []
            for name, _t in self.fields:
                v = rec[name]
                if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
                    vals.append(None)
                elif name in integer:
                    # pandas widens int columns holding NaN to float;
                    # restore the declared integer type
                    vals.append(int(v))
                else:
                    vals.append(v)
            yield (*vals, rec["_change_type"], int(partition.version))

    def commit(self, end: dict) -> None:
        # log versions are immutable — nothing to release; re-persist
        # the planning cursor as cheap insurance for the rate cap
        self._save_cursor(int(end["version"]))


class TxChangeFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "txcdf"

    def _table_struct(self):
        from pyspark.sql.types import StructType

        snap = tx_table.snapshot(self.options["table_dir"])
        if snap is None or snap[1].get("schema") is None:
            raise ValueError("txcdf needs an existing table with a manifest schema")
        return StructType.fromJson(json.loads(snap[1]["schema"]))

    def schema(self):
        from pyspark.sql.types import LongType, StringType, StructType

        st = StructType(list(self._table_struct().fields))
        return st.add("_change_type", StringType()).add("_commit_version", LongType())

    def streamReader(self, schema):
        fields = [(f.name, f.dataType.typeName()) for f in self._table_struct().fields]
        return _TxChangeFeedStreamReader(self.options, fields)
