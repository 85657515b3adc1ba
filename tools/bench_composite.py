#!/usr/bin/env python3
"""Fold N bench sittings into one composite-min artifact with per-query
provenance.

Usage: python3 tools/bench_composite.py OUT.json SITTING1.json [SITTING2.json ...]

Each sitting is a full graft.Bench record (the first stdout line, or the
SPARK_GRAFT_BENCH_OUT file) — it must carry the per-query "queries" map.
The composite records, for every query, the minimum across sittings AND
which sitting it came from, plus each sitting's own headline figures
(total, load window, runs), so the min is auditable per query instead of
a bare number in prose. Queries that failed (-1) in a sitting are
ignored for that sitting; a query missing from every sitting is an
error.
"""
import sys, json, os


def main(out, files):
    sittings = []
    for f in files:
        with open(f) as fh:
            # tolerate a file holding both lines: take the first line
            # that has a queries map
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if "queries" in rec:
                    sittings.append((os.path.basename(f), rec))
                    break
            else:
                raise SystemExit(f"{f}: no record with a queries map")
    names = set()
    for _, rec in sittings:
        names.update(k for k, v in rec["queries"].items() if v >= 0)
    comp, prov = {}, {}
    for q in sorted(names):
        best = None
        for fname, rec in sittings:
            v = rec["queries"].get(q, -1)
            if v >= 0 and (best is None or v < best[0]):
                best = (v, fname)
        comp[q], prov[q] = best
    total = sum(comp.values())
    record = {
        "metric": "composite_min",
        "value": round(total, 3),
        "unit": "sec",
        "n_queries": len(comp),
        "n_sittings": len(sittings),
        "queries": {q: round(v, 4) for q, v in comp.items()},
        "provenance": prov,
        "sittings": [
            {
                "file": fname,
                "total": rec.get("value"),
                "runs": rec.get("runs"),
                "load_avg_start": rec.get("load_avg_start"),
                "load_avg_end": rec.get("load_avg_end"),
                "load_flagged": rec.get("load_flagged"),
                "failed": rec.get("failed", []),
            }
            for fname, rec in sittings
        ],
    }
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"{out}: composite min {total:.1f} s over {len(comp)} queries "
          f"from {len(sittings)} sittings")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2:])
