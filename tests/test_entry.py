"""Driver-window invariants for __spark_entry__ (r4 VERDICT item 5: a
stale gate-count comment is how gates silently fall out of the driver's
50-entry CORRECTNESS window)."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry

DRIVER_WINDOW = 50


def test_queries_fit_driver_window():
    qs = entry.queries()
    assert len(qs) <= DRIVER_WINDOW, (
        f"{len(qs)} queries() entries exceed the driver's {DRIVER_WINDOW}-entry "
        "CORRECTNESS window — gates past the cap are never verified"
    )
    # pin the exact count so adding a gate forces a conscious decision
    # about which entry to consolidate/fold
    assert len(qs) == 50


def test_every_oracle_key_is_a_query():
    qs = set(entry.queries())
    orphans = set(entry.oracle_sql()) - qs
    assert not orphans, f"oracle_sql keys with no queries() entry: {sorted(orphans)}"


def test_bench_queries_superset_of_gates():
    # the bench must be able to time every gated query (it re-expands
    # consolidated gates into per-variant plans, never drops one)
    missing = set(entry.queries()) - set(entry.bench_queries())
    assert not missing, f"gated queries missing from bench_queries: {sorted(missing)}"


def test_bench_tail_line_always_fits():
    """The driver records only a ~2000-char stdout tail; the final bench
    line must fit under any realistic (or absurd) query-name inflation —
    BENCH parsed:null shipped twice because this wasn't pinned."""
    import json

    import bench

    payload = {
        "metric": "pages_joined_per_sec", "value": 1234567.8, "unit": "rows/sec",
        "trials": 3, "sf": 0.1, "cpus": 32, "joined_rows": 4490608,
        "steal_pct": {"flagship": 0.5},
    }
    timings = {f"extremely_long_query_name_padding_{i:04d}": float(i) for i in range(200)}
    line = bench.compact_tail_line(payload, timings)
    assert len(line) < 1900
    parsed = json.loads(line)
    assert parsed["value"] == 1234567.8 and "slowest" in parsed
    # and with an empty suite it still emits valid JSON
    assert json.loads(bench.compact_tail_line(payload, {}))["metric"]


def test_bench_tail_line_missing_scaling_is_null_not_absent(capsys):
    """An unreadable scaling_latest.json must yield eff_2to8_recorded:
    null in the official record (plus a stderr warning), never a silently
    absent key — the north-rule number vanishing without a trace is how
    record defects hide (r5 VERDICT item 6)."""
    import json

    import bench

    payload = {
        "metric": "m", "value": 1.0, "unit": "rows/sec", "trials": 1,
        "sf": 0.1, "cpus": 8, "joined_rows": 1, "steal_pct": {"flagship": 0.0},
    }
    line = bench.compact_tail_line(payload, {}, scaling_path="/nonexistent/s.json")
    parsed = json.loads(line)
    assert "eff_2to8_recorded" in parsed and parsed["eff_2to8_recorded"] is None
    assert "scaling_latest" in capsys.readouterr().err
    # and with a readable file the recorded value flows through
    ok = json.loads(bench.compact_tail_line(payload, {}))
    assert isinstance(ok["eff_2to8_recorded"], float)


def test_bench_name_list_resolves():
    # bench.py's run_suite silently SKIPS names missing from
    # bench_queries(), which would drop a query from the record with no
    # signal — pin every listed name to a real callable
    import bench

    unresolved = set(bench.BENCH_QUERY_NAMES) - set(entry.bench_queries())
    assert not unresolved, f"bench names with no query fn: {sorted(unresolved)}"
