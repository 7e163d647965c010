"""Integrity verification (io/fsck.verify_table): footer-truth
comparison against manifest records, error vs informational
findings, deep scan mode."""

from __future__ import annotations

import json
import os

from esg_decarbonization_data_integration_and_data_pipline_spark.io.fsck import verify_table
from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    _MANIFEST,
    _data_files,
    append_version,
    compact_table,
    delete_keys_version,
)


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k bigint, amt double")


def _build(spark, tmp_path):
    td = str(tmp_path / "t")
    append_version(_kv(spark, [(1, 1.0), (2, 2.0)]).coalesce(1), td,
                   stats_columns=["k"])
    append_version(_kv(spark, [(3, 3.0)]).coalesce(1), td)
    delete_keys_version(spark, td,
                        spark.createDataFrame([(2,)], "k bigint"), "k")
    return td


def _edit_manifest(td, n, fn):
    p = os.path.join(td, f"v_{n:08d}", _MANIFEST)
    with open(p, encoding="ascii") as fh:
        lines = fh.read().splitlines()
    lines = [fn(ln) for ln in lines]
    with open(p, "w", encoding="ascii") as fh:
        fh.write("\n".join(lines) + "\n")


def test_healthy_table_verifies_clean(spark, tmp_path):
    td = _build(spark, tmp_path)
    rep = verify_table(spark, td, deep=True)
    assert rep["ok"], rep
    assert sorted(rep["versions"]) == [1, 2, 3]
    assert rep["unreferenced_files"] == []
    for vr in rep["versions"].values():
        assert vr["external_refs"] == 0 and vr["n_files"] >= 1


def test_missing_file_is_an_error(spark, tmp_path):
    td = _build(spark, tmp_path)
    victim = _data_files(td, 1)[0]
    os.remove(os.path.join(td, victim))
    rep = verify_table(spark, td)
    assert not rep["ok"]
    assert victim in rep["versions"][1]["missing_files"]
    # inherited into v2 as well: both versions report it
    assert victim in rep["versions"][2]["missing_files"]


def test_tampered_rowcount_is_caught(spark, tmp_path):
    td = _build(spark, tmp_path)

    def bump(ln):
        if ln.startswith("#rows "):
            rec = json.loads(ln[len("#rows "):])
            rec["n"] += 5
            return "#rows " + json.dumps(rec)
        return ln

    _edit_manifest(td, 1, bump)
    rep = verify_table(spark, td, n=1)
    assert not rep["ok"]
    assert rep["versions"][1]["rowcount_mismatch"]


def test_narrowed_stats_are_caught_wide_stats_pass(spark, tmp_path):
    td = _build(spark, tmp_path)

    def narrow(ln):
        if ln.startswith("#stats "):
            rec = json.loads(ln[len("#stats "):])
            if rec["c"] == "k":
                rec["lo"], rec["hi"] = rec["lo"] + 1, rec["hi"]
            return "#stats " + json.dumps(rec)
        return ln

    _edit_manifest(td, 1, narrow)
    rep = verify_table(spark, td, n=1)
    assert not rep["ok"]
    assert rep["versions"][1]["stats_too_narrow"]

    td2 = _build(spark, tmp_path / "w")

    def widen(ln):
        if ln.startswith("#stats "):
            rec = json.loads(ln[len("#stats "):])
            rec["lo"], rec["hi"] = rec["lo"] - 100, rec["hi"] + 100
            return "#stats " + json.dumps(rec)
        return ln

    _edit_manifest(td2, 1, widen)
    # conservatively WIDE stats are valid (post-purge re-candidacy
    # depends on exactly this)
    assert verify_table(spark, td2, n=1)["ok"]


def test_shallow_clone_external_refs_are_informational(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.clone import shallow_clone

    src = _build(spark, tmp_path)
    dst = str(tmp_path / "clone")
    shallow_clone(spark, src, dst)
    rep = verify_table(spark, dst)
    assert rep["ok"]
    assert rep["versions"][1]["external_refs"] == \
        rep["versions"][1]["n_files"] > 0


def test_unreferenced_file_reported_not_fatal(spark, tmp_path):
    td = _build(spark, tmp_path)
    stray = os.path.join(td, "v_00000001", "stray.parquet")
    with open(stray, "wb") as fh:
        fh.write(b"not parquet")
    rep = verify_table(spark, td)
    assert rep["ok"]
    assert rep["unreferenced_files"] == ["v_00000001/stray.parquet"]


def test_corrupt_file_body_caught_by_deep_only(spark, tmp_path):
    """Clobbering the leading magic leaves the FOOTER intact, so the
    metadata pass stays green -- deep mode's body read is what
    catches it (exactly the corruption class deep exists for)."""
    td = _build(spark, tmp_path)
    compact_table(spark, td)
    victim = _data_files(td, 4)[0]
    with open(os.path.join(td, victim), "r+b") as fh:
        fh.write(b"\x00" * 8)  # clobber the magic/header
    assert verify_table(spark, td, n=4)["ok"]
    rep = verify_table(spark, td, n=4, deep=True)
    assert not rep["ok"]
    assert rep["versions"][4]["unreadable_files"]


def test_repair_restores_tampered_metadata(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.fsck import repair_table

    td = _build(spark, tmp_path)

    def tamper(ln):
        if ln.startswith("#rows "):
            rec = json.loads(ln[len("#rows "):])
            rec["n"] += 7
            return "#rows " + json.dumps(rec)
        if ln.startswith("#stats "):
            rec = json.loads(ln[len("#stats "):])
            rec["lo"] = rec["lo"] + 1
            return "#stats " + json.dumps(rec)
        return ln

    _edit_manifest(td, 1, tamper)
    assert not verify_table(spark, td)["ok"]
    rep = repair_table(spark, td)
    assert rep["unrepairable"] == []
    assert rep["files_refreshed"] >= 1
    after = verify_table(spark, td, deep=True)
    assert after["ok"], after
    # repaired metadata answers metadata queries correctly again
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import table_rowcount
    assert table_rowcount(td, 1) == 2


def test_repair_is_idempotent_on_healthy_tables(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.fsck import repair_table
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import read_current

    td = _build(spark, tmp_path)
    before = sorted((r.k, r.amt) for r in read_current(spark, td).collect())
    repair_table(spark, td)
    repair_table(spark, td)
    assert verify_table(spark, td)["ok"]
    assert sorted((r.k, r.amt)
                  for r in read_current(spark, td).collect()) == before


def test_repair_reports_missing_files_as_unrepairable(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.fsck import repair_table

    td = _build(spark, tmp_path)
    victim = _data_files(td, 1)[0]
    os.remove(os.path.join(td, victim))
    rep = repair_table(spark, td)
    assert victim in rep["unrepairable"]
    assert not verify_table(spark, td)["ok"]  # honesty: not fixed


def test_corrupt_constraints_sidecar_is_an_error(spark, tmp_path):
    """An unparseable _CONSTRAINTS.json would fail every constrained
    write with a raw decode error -- fsck must surface it as a table
    finding (absent sidecar = healthy, unconstrained)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.constraints import _FILE

    td = _build(spark, tmp_path)
    assert verify_table(spark, td)["constraints_ok"]
    with open(os.path.join(td, _FILE), "w") as fh:
        fh.write("{not json")
    rep = verify_table(spark, td)
    assert not rep["ok"] and not rep["constraints_ok"]
    assert "JSONDecodeError" in rep["constraints_error"]
