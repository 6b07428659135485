"""Parity pins for the query rows retired from the registry in r7
(VERDICT r6 #4) and r8 (VERDICT r7 #2) capacity consolidations.
Retiring a ROW must not retire the SEMANTICS: each face below stays
verified, either against its original DuckDB twin or by equivalence
to the registered query that absorbed it.

Retired → absorbed by (r7):
  fn_posexplode            → fn_array (generator + array battery, one face)
  fn_bitwise               → fn_math (same seven surfaces over lineitem keys)
  rel_rollup_returns       → rel_grouping_sets (lattice superset)
  llm_dedup_ngram_survivors→ anti-join mode of llm_dedup_ngram_jaccard
  llm_dedup_exact_hash     → column-reorder of llm_dedup_exact

Retired → absorbed by (r8):
  fn_try_arith               → fn_conditional (try_* battery over orders)
  llm_multimodal_meta        → llm_multimodal_frames (doc-level meta
                               columns on every frame row, same
                               attach_binary lineage)
  llm_dedup_minhash_survivors→ anti-join mode of llm_dedup_minhash_lsh
                               (batch_minhash_survivors)
"""

from __future__ import annotations

import duckdb

from tests.conftest import SF_SMALL

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _con(sf_dir: str = SF_SMALL) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _multiset(rows):
    return sorted(tuple(str(v) for v in r) for r in rows)


def test_rollup_equals_grouping_sets_expansion(spark):
    """The .rollup() API face: ROLLUP(f, s) must equal its GROUPING
    SETS expansion {(f,s),(f),()} — the subset relation that justifies
    retiring the rollup row in favor of the extended grouping-sets row
    (which adds (s) on top)."""
    from real_time_event_streaming_pipeline_spark.plans.relational import (
        q_grouping_sets,
        q_rollup_returns,
    )

    rollup = {tuple(r) for r in q_rollup_returns(spark, SF_SMALL).collect()}
    gs = {
        (r["l_returnflag"], r["l_linestatus"], r["sum_qty"], r["n"])
        for r in q_grouping_sets(spark, SF_SMALL).collect()
    }
    # rollup's lattice is a strict subset: everything but the
    # by-status-alone slice, which has flag='(all)' with a concrete
    # status
    by_status_only = {
        t for t in gs if t[0] == "(all)" and t[1] != "(all)"
    }
    assert rollup == gs - by_status_only
    assert by_status_only, "grouping sets lost the (status) slice"


def test_fn_bitwise_retired_face_oracle(spark):
    """The events-side bitwise battery keeps its original DuckDB twin
    even though the registered face moved to fn_math/lineitem."""
    from real_time_event_streaming_pipeline_spark.plans.windowing import (
        _FN_BITWISE_SQL,
        q_fn_bitwise,
    )

    srows = q_fn_bitwise(spark, SF_SMALL).collect()
    con = _con()  # hold the ref: a temporary is GC'd before fetchall
    orows = con.sql(_FN_BITWISE_SQL).fetchall()
    assert _multiset(srows) == _multiset(orows)


def test_fn_math_carries_bitwise_columns(spark):
    """The absorbed face: fn_math's bitwise columns agree with direct
    recomputation from the keys (guards the merge itself)."""
    from real_time_event_streaming_pipeline_spark.plans.scalar import q_fn_math

    rows = q_fn_math(spark, SF_SMALL).limit(500).collect()
    assert rows
    for r in rows:
        ok = r["l_orderkey"]
        assert r["b_and"] == ok & 255
        assert r["b_not"] == ~ok
        assert r["shl3"] == ok << 3
        assert r["popcount"] == bin(ok).count("1")


def test_ngram_survivors_retired_face_oracle(spark):
    """The survivor anti-join mode keeps its original bitwise DuckDB
    twin after retirement from the registry."""
    from real_time_event_streaming_pipeline_spark.plans.llmdata import (
        _NGRAM_SURVIVORS_SQL,
        q_ngram_survivors,
    )

    srows = q_ngram_survivors(spark, SF_SMALL).collect()
    con = _con()
    orows = con.sql(_NGRAM_SURVIVORS_SQL).fetchall()
    assert _multiset(srows) == _multiset(orows)


def test_exact_hash_equals_exact(spark):
    """exact_dedup_by_hash (group key = 16-byte md5, the 100 TB path)
    must produce exactly exact_dedup's rows modulo column order — the
    equivalence that justified retiring the duplicate row."""
    from real_time_event_streaming_pipeline_spark.plans.llmdata import (
        q_dedup_exact,
        q_dedup_exact_hash,
    )

    a = {
        (r["doc_id"], r["n_copies"], r["content_md5"])
        for r in q_dedup_exact(spark, SF_SMALL).collect()
    }
    b = {
        (r["doc_id"], r["n_copies"], r["content_md5"])
        for r in q_dedup_exact_hash(spark, SF_SMALL).collect()
    }
    assert a == b and a


def test_fn_try_arith_retired_face_oracle(spark):
    """The events-side try_* battery keeps its original DuckDB twin
    even though the registered face moved to fn_conditional/orders."""
    from real_time_event_streaming_pipeline_spark.plans.scalar import (
        _FN_TRY_ARITH_SQL,
        q_fn_try_arith,
    )

    srows = q_fn_try_arith(spark, SF_SMALL).collect()
    con = _con()
    orows = con.sql(_FN_TRY_ARITH_SQL).fetchall()
    assert _multiset(srows) == _multiset(orows)


def test_fn_conditional_carries_try_arith_columns(spark):
    """The absorbed face: fn_conditional's try_* columns agree with
    direct recomputation from the order keys (guards the merge)."""
    from real_time_event_streaming_pipeline_spark.plans.scalar import q_fn_conditional

    rows = q_fn_conditional(spark, SF_SMALL).limit(500).collect()
    assert rows
    for r in rows:
        ok = r["o_orderkey"]
        assert r["bad_cast"] is None
        assert r["good_cast"] == ok
        assert r["bad_ts"] is None
        if r["safe_div"] is not None:
            assert r["safe_div"] > 0


def test_minhash_survivors_retired_face_oracle(spark):
    """The survivor anti-join mode of the MinHash band pipeline keeps
    its original bitwise DuckDB twin after retirement."""
    from real_time_event_streaming_pipeline_spark.plans.llmdata import (
        _minhash_survivors_sql,
        q_minhash_survivors,
    )

    srows = q_minhash_survivors(spark, SF_SMALL).collect()
    con = _con()
    orows = con.sql(_minhash_survivors_sql()).fetchall()
    assert _multiset(srows) == _multiset(orows)


def test_multimodal_meta_retired_face_oracle(spark):
    """The doc-level metadata face keeps its original DuckDB twin."""
    from real_time_event_streaming_pipeline_spark.plans.llmdata import (
        _MULTIMODAL_META_SQL,
        q_multimodal_meta,
    )

    srows = q_multimodal_meta(spark, SF_SMALL).collect()
    con = _con()
    orows = con.sql(_MULTIMODAL_META_SQL).fetchall()
    assert _multiset(srows) == _multiset(orows)


def test_frames_carries_meta_face(spark):
    """The absorbed face: the distinct doc-level projection of the
    merged llm_multimodal_frames face must reproduce the retired
    llm_multimodal_meta output exactly (guards the merge join)."""
    from real_time_event_streaming_pipeline_spark.plans.llmdata import (
        q_multimodal_frames,
        q_multimodal_meta,
    )

    merged = {
        tuple(r)
        for r in q_multimodal_frames(spark, SF_SMALL)
        .select("doc_id", "doc_bytes", "mime", "origin", "content_md5")
        .distinct()
        .collect()
    }
    meta = {
        (r["doc_id"], r["n_bytes"], r["mime"], r["origin"], r["content_md5"])
        for r in q_multimodal_meta(spark, SF_SMALL).collect()
    }
    assert merged == meta and merged


def test_fn_array_carries_posexplode_face(spark):
    """The merged fn_array: projecting (doc_id, pos, tok) out of it
    must reproduce the retired fn_posexplode output exactly."""
    from pyspark.sql import functions as F

    from real_time_event_streaming_pipeline_spark.catalog import load
    from real_time_event_streaming_pipeline_spark.plans.scalar import q_fn_array

    merged = {
        (r["doc_id"], r["pos"], r["tok"])
        for r in q_fn_array(spark, SF_SMALL).select("doc_id", "pos", "tok").collect()
    }
    docs = load(spark, SF_SMALL, "documents").filter(F.col("doc_id") < 100)
    old = {
        (r["doc_id"], r["pos"], r["tok"])
        for r in docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
        ).collect()
    }
    assert merged == old and merged
