import json

import pyarrow as pa

from crawlkit.state.catalog import CatalogStore
from crawlkit.state.checkpoint import RunCheckpoint


def _reg(name, version, domain, fields):
    return {"schema_name": name, "schema_version": version, "domain": domain, "fields": fields}


def test_catalog_last_wins(tmp_path):
    """Reference semantics: schemas[key] = e.Schema is last-writer-wins
    (otodom/orchestrator/handler.go:114); across runs the newest
    registration for a key shadows older ones."""
    c = CatalogStore(str(tmp_path / "cat"))
    c.register_run([_reg("flat", "v1", "d0", {"a": 1})], run_ts="2026-01-01T00:00:00")
    c.register_run([_reg("flat", "v1", "d0", {"a": 2}), _reg("office", "v1", "d0", {"b": 1})],
                   run_ts="2026-01-02T00:00:00")
    latest = c.latest().to_pylist()
    by_key = {(r["schema_name"], r["schema_version"]): r for r in latest}
    assert len(latest) == 2
    assert json.loads(by_key[("flat", "v1")]["schema_json"]) == {"a": 2}
    assert by_key[("flat", "v1")]["created"] == "2026-01-02T00:00:00"


def test_catalog_idempotent_rerun(tmp_path):
    c = CatalogStore(str(tmp_path / "cat"))
    v1 = c.register_run([_reg("flat", "v1", "d0", {})], run_ts="t1")
    v2 = c.register_run([_reg("flat", "v1", "d0", {})], run_ts="t1")  # same run replayed
    assert v1 == v2
    assert c.read_all().num_rows == 1


def test_checkpoint_round_lifecycle(tmp_path):
    ck = RunCheckpoint(str(tmp_path / "run"))
    assert ck.latest_complete_round() is None
    f = pa.table({"url": ["a"], "host": ["h"]})
    ck.save_round(0, f, None, {"round": 0, "issued": 1})
    ck.save_round(1, f, None, {"round": 1, "issued": 2})
    assert ck.latest_complete_round() == 1
    assert ck.load_frontier(1).num_rows == 1
    assert [m["issued"] for m in ck.all_metrics()] == [1, 2]
