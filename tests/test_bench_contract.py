"""The driver parses exactly ONE stdout line from bench.py and keeps
only the last ~2000 chars — these tests pin the line contract that
already cost two rounds' bench artifacts (r2 parsed:null, r5 lost)."""

import json
import sys


def _payload(n_queries: int, name_len: int = 28):
    queries = {
        f"q{'x' * name_len}{i:04d}": 0.1 + (i % 37) / 10
        for i in range(n_queries)
    }
    return {
        "metric": "catalog_total_runtime",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "query_reps": {k: [v, v] for k, v in queries.items()},
        "parser_rows_per_sec": 226030,
        "parser_rows_per_sec_by_shape": {"glb": 226030, "nginx": 1,
                                         "fxaauth": 2},
        "sf": 0.1,
    }


def _line(payload, budget=1900):
    sys.path.insert(0, "/root/repo")
    from bench import compact_stdout_line

    return compact_stdout_line(payload, budget=budget)


def test_line_fits_budget_and_parses_at_catalog_scale():
    for n in (10, 92, 231, 500):
        line = _line(_payload(n))
        assert len(line) <= 1900, (n, len(line))
        d = json.loads(line)
        assert d["metric"] == "catalog_total_runtime"
        assert "query_reps" not in d
        assert d["value"] > 0 and d["sf"] == 0.1


def test_omitted_tail_is_accounted():
    p = _payload(231)
    d = json.loads(_line(p))
    if "queries_omitted_n" in d:
        assert d["queries_omitted_n"] + len(d["queries"]) == \
            d["queries_total_n"] == 231
        total = sum(p["queries"].values())
        kept = sum(p["queries"][k] for k in d["queries"])
        assert abs(kept + d["queries_omitted_sec"] - total) < 0.5
        # kept entries are the costliest ones
        cut = min(d["queries"].values())
        omitted_max = max(
            v for k, v in p["queries"].items() if k not in d["queries"]
        )
        assert omitted_max <= cut + 1e-9


def test_small_payload_keeps_every_query():
    d = json.loads(_line(_payload(12)))
    assert len(d["queries"]) == 12
    assert "queries_omitted_n" not in d
