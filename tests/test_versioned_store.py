"""Snapshot-versioned store (operators/versioned.py): append/overwrite/
delete commits, time travel, vacuum reachability, crash invisibility."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.operators.versioned import VersionedStore


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "id bigint, val string")


def test_append_and_time_travel(spark, tmp_path):
    st = VersionedStore(spark, str(tmp_path / "s"))
    v1 = st.append(_df(spark, [(1, "a"), (2, "b")]))
    v2 = st.append(_df(spark, [(3, "c")]))
    assert (v1, v2) == (1, 2)
    assert _rows(st.read()) == [(1, "a"), (2, "b"), (3, "c")]
    assert _rows(st.read(1)) == [(1, "a"), (2, "b")]  # time travel


def test_overwrite_keeps_history(spark, tmp_path):
    st = VersionedStore(spark, str(tmp_path / "s"))
    st.append(_df(spark, [(1, "a")]))
    st.overwrite(_df(spark, [(9, "z")]))
    assert _rows(st.read()) == [(9, "z")]
    assert _rows(st.read(1)) == [(1, "a")]


def test_copy_on_write_delete(spark, tmp_path):
    st = VersionedStore(spark, str(tmp_path / "s"))
    st.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    v = st.delete_where(F.col("id") == 2)
    assert _rows(st.read(v)) == [(1, "a"), (3, "c")]
    assert _rows(st.read(1)) == [(1, "a"), (2, "b"), (3, "c")]  # untouched


def test_vacuum_reclaims_only_unreachable(spark, tmp_path):
    st = VersionedStore(spark, str(tmp_path / "s"))
    st.append(_df(spark, [(1, "a")]))
    st.append(_df(spark, [(2, "b")]))
    st.overwrite(_df(spark, [(3, "c")]))
    deleted = st.vacuum(keep_last=1)
    # v3 references only c3; c1 and c2 reclaimed
    assert [os.path.basename(d) for d in deleted] == ["c1", "c2"]
    assert _rows(st.read()) == [(3, "c")]
    with pytest.raises(ValueError):
        st.read(1)


def test_vacuum_keeps_shared_dirs_of_retained_versions(spark, tmp_path):
    st = VersionedStore(spark, str(tmp_path / "s"))
    st.append(_df(spark, [(1, "a")]))  # c1
    st.append(_df(spark, [(2, "b")]))  # v2 = c1+c2
    st.append(_df(spark, [(3, "c")]))  # v3 = c1+c2+c3
    deleted = st.vacuum(keep_last=2)
    assert deleted == []  # v2 and v3 together reference every dir
    assert _rows(st.read(2)) == [(1, "a"), (2, "b")]


def test_crashed_commit_is_invisible_and_swept(spark, tmp_path):
    st = VersionedStore(spark, str(tmp_path / "s"))
    st.append(_df(spark, [(1, "a")]))
    # simulate a crash after the data write but before manifest publish
    _df(spark, [(9, "x")]).write.parquet(str(tmp_path / "s" / "data" / "c2"))
    assert st.current_version() == 1
    assert _rows(st.read()) == [(1, "a")]  # orphan dir invisible
    deleted = st.vacuum(keep_last=1)
    assert [os.path.basename(d) for d in deleted] == ["c2"]  # swept
    # a half-written manifest tmp is also invisible
    with open(str(tmp_path / "s" / "manifests" / "v2.json.tmp999"), "w") as f:
        f.write("{not json")
    assert st.current_version() == 1


def test_manifest_records_lineage(spark, tmp_path):
    st = VersionedStore(spark, str(tmp_path / "s"))
    st.append(_df(spark, [(1, "a")]))
    st.delete_where(F.col("id") == 1)
    m = json.load(open(str(tmp_path / "s" / "manifests" / "v2.json")))
    assert m["op"] == "delete" and m["parent"] == 1 and m["n_rows"] == 0


def test_read_as_of_timestamp(spark, tmp_path):
    import json
    import os

    st = VersionedStore(spark, str(tmp_path / "s"))
    st.append(_df(spark, [(1, "a")]))
    st.append(_df(spark, [(2, "b")]))
    # pin commit times deterministically (the publish stamps wall time)
    for v, t in ((1, 100.0), (2, 200.0)):
        mp = str(tmp_path / "s" / "manifests" / f"v{v}.json")
        m = json.load(open(mp))
        m["committed_at"] = t
        json.dump(m, open(mp, "w"))
    assert _rows(st.read_as_of(150.0)) == [(1, "a")]
    assert _rows(st.read_as_of(200.0)) == [(1, "a"), (2, "b")]
    with pytest.raises(ValueError):
        st.read_as_of(50.0)


def test_rollback_restores_by_reference(spark, tmp_path):
    st = VersionedStore(spark, str(tmp_path / "s"))
    st.append(_df(spark, [(1, "a")]))
    v2 = st.append(_df(spark, [(2, "b")]))
    st.delete_where(F.col("id") == 1)  # v3 drops row 1
    v4 = st.rollback(v2)
    assert v4 == 4
    assert _rows(st.read()) == _rows(st.read(v2)) == [(1, "a"), (2, "b")]
    # no data was copied: v4's manifest references v2's directories
    m = json.load(open(str(tmp_path / "s" / "manifests" / "v4.json")))
    m2 = json.load(open(str(tmp_path / "s" / "manifests" / "v2.json")))
    assert m["data_dirs"] == m2["data_dirs"]
    assert m["op"] == "rollback:2"


def test_rollback_survives_vacuum(spark, tmp_path):
    st = VersionedStore(spark, str(tmp_path / "s"))
    st.append(_df(spark, [(1, "a")]))
    v2 = st.append(_df(spark, [(2, "b")]))
    st.delete_where(F.col("id") == 1)
    st.rollback(v2)
    st.vacuum(keep_last=1)  # only v4 retained
    # the rolled-back snapshot's data dirs are reachable from v4, so
    # vacuum must keep them; the delete commit's rewrite dir is swept
    assert _rows(st.read()) == [(1, "a"), (2, "b")]
    assert not os.path.isdir(str(tmp_path / "s" / "data" / "c3"))


def test_rollback_to_vacuumed_version_raises(spark, tmp_path):
    st = VersionedStore(spark, str(tmp_path / "s"))
    st.append(_df(spark, [(1, "a")]))
    st.overwrite(_df(spark, [(2, "b")]))
    st.vacuum(keep_last=1)
    with pytest.raises(ValueError):
        st.rollback(1)
