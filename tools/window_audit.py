"""WindowExec input-size audit: run queries and report the ACTUAL row
count flowing through every Window operator, from the SQL metrics
store (Window is 1:1 input:output, so a Window node's own "number of
output rows" metric IS its input size).

Why: 57 registry queries deliberately window over bounded CENSUS
relations (value levels, months, buckets, segments) with no partition
key. That is the accepted posture ONLY while the census stays small —
this tool turns the "it's bounded" claim into a measured number per
query, and tests/test_plan_quality.py pins declared bounds so a
regression that silently grows a census relation fails loudly
(VERDICT r07 item 5).

Usage: python tools/window_audit.py [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)
Prints one line per query: name, max Window input rows, per-node list.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ocean_data_pipeline_spark.queries import load_all  # noqa: E402
from ocean_data_pipeline_spark.session import get_spark  # noqa: E402


#: row metrics, in preference order, that witness a node's output size
_ROW_METRICS = ("number of output rows", "records read", "shuffle records written")


def window_input_rows(spark, df) -> list[int]:
    """Back-compat wrapper: measure a pre-built DataFrame. Misses any
    window that already EXECUTED while the query was being constructed
    (eager localCheckpoint subrelations) — prefer
    `window_input_rows_thunk`, which snapshots the store before
    construction."""
    return window_input_rows_thunk(spark, lambda: df)


def window_input_rows_thunk(spark, make_df) -> list[int]:
    """Call make_df() and execute the result (noop sink); return, for
    every partition-less Window node in ALL new executions — including
    jobs the construction itself ran (eager localCheckpoints, scalar
    probes) — the rows that flowed INTO it. WindowExec itself emits
    only a spill metric in Spark 4, so the input size is read from the
    nearest row-metric-bearing descendant (Sort / Project /
    AQEShuffleRead are metric-less pass-throughs; the Exchange or
    HashAggregate below them reports rows)."""
    import time as _time

    store = spark._jsparkSession.sharedState().statusStore()
    before = {e.executionId() for e in _jlist(store.executionsList())}
    make_df().write.format("noop").mode("overwrite").save()
    rows: list[int] = []
    for e in _jlist(store.executionsList()):
        eid = e.executionId()
        if eid in before:
            continue
        # the status listener finalizes metrics asynchronously — poll
        jmap = None
        for _ in range(50):
            jmap = store.execution(eid).get().metricValues()
            if jmap is not None:
                break
            _time.sleep(0.1)
        if jmap is None:
            continue
        # scala Map[Long, String]: iterate (py4j can't box python ints
        # into the scala Long key for .get)
        vals: dict[int, str] = {}
        it = jmap.iterator()
        while it.hasNext():
            kv = it.next()
            vals[int(kv._1())] = str(kv._2())
        graph = store.planGraph(eid)
        nodes = {n.id(): n for n in _jseq(graph.allNodes())}
        children: dict[int, list[int]] = {}
        for ed in _jseq(graph.edges()):
            children.setdefault(ed.toId(), []).append(ed.fromId())

        def node_rows(nid: int) -> int | None:
            metrics = {
                m.name(): vals.get(int(m.accumulatorId()))
                for m in _jseq(nodes[nid].metrics())
            }
            for name in _ROW_METRICS:
                if metrics.get(name) is not None:
                    return _parse_metric(metrics[name])
            return None

        def input_rows(nid: int) -> int:
            total, frontier, seen = 0, list(children.get(nid, [])), set()
            while frontier:
                c = frontier.pop()
                if c in seen:
                    continue
                seen.add(c)
                r = node_rows(c)
                if r is not None:
                    total += r
                else:
                    frontier.extend(children.get(c, []))
            return total

        for nid, node in nodes.items():
            if node.name().startswith("Window") and _is_global_window(
                node.desc()
            ):
                rows.append(input_rows(nid))
    return rows


def _is_global_window(desc: str) -> bool:
    """True when the node description contains a windowspecdefinition
    with NO partition columns (the single-partition-sort shape this
    audit bounds). With partition keys the spec renders as
    windowspecdefinition(p1, p2, ord ASC NULLS FIRST, frame...); with
    none, the first argument is already the order clause."""
    s = str(desc)
    i = s.find("windowspecdefinition(")
    while i != -1:
        arg1_end = _first_top_level_comma(s, i + len("windowspecdefinition("))
        arg1 = s[i + len("windowspecdefinition(") : arg1_end]
        if " ASC" in arg1 or " DESC" in arg1 or arg1.startswith("specifiedwindowframe"):
            return True
        i = s.find("windowspecdefinition(", i + 1)
    return False


def _first_top_level_comma(s: str, start: int) -> int:
    depth = 0
    for j in range(start, len(s)):
        ch = s[j]
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                return j
            depth -= 1
        elif ch == "," and depth == 0:
            return j
    return len(s)


def _jlist(jl):
    return _jseq(jl)


def _jseq(js):
    """Materialize a Scala Seq (or java List) through py4j."""
    try:
        return [js.apply(i) for i in range(js.size())]
    except Exception:  # noqa: BLE001 — java.util.List fallback
        return [js.get(i) for i in range(js.size())]


def _parse_metric(s: str) -> int:
    # metric strings render like "1,234" or "total (min, med, max)..."
    head = str(s).split("(")[0]
    digits = "".join(ch for ch in head if ch.isdigit())
    return int(digits) if digits else 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    registry = load_all()
    names = sys.argv[1:] or sorted(registry)
    spark = get_spark("window-audit")
    out = []
    for name in names:
        if name not in registry:
            print(f"SKIP {name}: not registered")
            continue
        try:
            rows = window_input_rows_thunk(
                spark, lambda: registry[name].fn(spark, sf_dir)
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            continue
        mx = max(rows) if rows else 0
        out.append((mx, name, rows))
        print(f"{name}: max_window_input={mx} all={rows}")
    out.sort(reverse=True)
    print("\n== worst 15 ==")
    for mx, name, _ in out[:15]:
        print(f"{mx:>12,}  {name}")




def plan_has_global_window(df) -> bool:
    """Plan-only witness (no execution): True when the query's physical
    plan contains a Window/WindowGroupLimit node whose spec has no
    partition columns. Used by tests/test_window_bounds.py to pin that
    BOUNDS covers EVERY global-window query in the registry."""
    qe = df._jdf.queryExecution()
    return _is_global_window(qe.executedPlan().toString())


def scan_main() -> None:
    """List every registered query whose plan carries a global window."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    registry = load_all()
    spark = get_spark("window-scan")
    flagged = []
    for name, rq in registry.items():
        try:
            if plan_has_global_window(rq.fn(spark, sf_dir)):
                flagged.append(name)
                print("GLOBAL", name, flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
    print("\n== flagged", len(flagged), "==")
    for n in sorted(flagged):
        print(n)


if __name__ == "__main__":
    if "--scan" in sys.argv:
        scan_main()
    else:
        main()
