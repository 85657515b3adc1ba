#!/usr/bin/env python3
"""Fold N bench sittings into one composite-min artifact with per-query
provenance.

Usage: python3 tools/bench_composite.py [--load-slack N] OUT.json
       SITTING1.json [SITTING2.json ...]
(--load-slack may appear anywhere; default 3.0)

Each sitting is a full graft.Bench record (the first stdout line, or the
SPARK_GRAFT_BENCH_OUT file) — it must carry the per-query "queries" map.
The composite records, for every query, the minimum across sittings AND
which sitting it came from, plus each sitting's own headline figures
(total, load window, runs), so the min is auditable per query instead of
a bare number in prose. Queries that failed (-1) in a sitting are
ignored for that sitting; a query missing from every sitting is an
error.

Mid-run pollution (round-17): graft.Bench gates and flags on
load_avg_start only — a sitting that goes noisy MID-run self-reports
only through median >> min. The composite is made robust to that by
construction: the quietest sitting's load_avg_end approximates the
bench's own steady-state self-load (the bench is the only heavy process
on a quiet host), and any sitting whose load_avg_end exceeds that
baseline by more than --load-slack (default 3.0) is marked "polluted"
and its per-query values are EXCLUDED from the composite min — unless a
query has values only in polluted sittings, in which case the polluted
value is used and the provenance entry says so. The min-end sitting
itself can never be polluted (zero excess), so the composite never
degenerates to empty.
"""
import sys, json, os

LOAD_SLACK = 3.0


def main(out, files, load_slack=LOAD_SLACK):
    sittings = []
    for f in files:
        with open(f) as fh:
            # tolerate a file holding both lines: take the first line
            # that has a queries map. Keyed by the FULL path (basename
            # alone would collide for same-named files in different
            # dirs and cross-wire their pollution flags); the basename
            # is display-only where unambiguous.
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if "queries" in rec:
                    sittings.append((f, rec))
                    break
            else:
                raise SystemExit(f"{f}: no record with a queries map")
    bases = [os.path.basename(f) for f, _ in sittings]
    def label(f):
        bn = os.path.basename(f)
        return bn if bases.count(bn) == 1 else f
    # mid-run pollution mark: excess of a sitting's observed load over
    # the quietest sitting's (~ the bench's own self-load). Prefer the
    # between-queries max (load_avg_mid_max, recorded since r17 — a
    # burst that decays before the end sample is still caught); fall
    # back to load_avg_end for older records. The baseline and each
    # sitting's value use the SAME field, so the excess is calibrated.
    def load_of(rec):
        v = rec.get("load_avg_mid_max")
        if not isinstance(v, (int, float)):
            v = rec.get("load_avg_end")
        return v if isinstance(v, (int, float)) else None
    loads = [load_of(rec) for _, rec in sittings
             if load_of(rec) is not None]
    base_load = min(loads) if loads else None
    polluted = {}
    for fname, rec in sittings:
        e = load_of(rec)
        polluted[fname] = (base_load is not None and e is not None and
                           e - base_load > load_slack)
    names = set()
    for _, rec in sittings:
        names.update(k for k, v in rec["queries"].items() if v >= 0)
    comp, prov = {}, {}
    for q in sorted(names):
        best, best_any = None, None
        for fname, rec in sittings:
            v = rec["queries"].get(q, -1)
            if v < 0:
                continue
            if best_any is None or v < best_any[0]:
                best_any = (v, fname)
            if not polluted[fname] and (best is None or v < best[0]):
                best = (v, fname)
        if best is None:  # only polluted sittings carry this query
            best = (best_any[0], label(best_any[1]) + " (polluted)")
        else:
            best = (best[0], label(best[1]))
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
                "file": label(fname),
                "total": rec.get("value"),
                "runs": rec.get("runs"),
                "load_avg_start": rec.get("load_avg_start"),
                "load_avg_end": rec.get("load_avg_end"),
                "load_avg_mid_max": rec.get("load_avg_mid_max"),
                "load_flagged": rec.get("load_flagged"),
                "polluted_mid_run": polluted[fname],
                "failed": rec.get("failed", []),
            }
            for fname, rec in sittings
        ],
        "load_slack": load_slack,
    }
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"{out}: composite min {total:.1f} s over {len(comp)} queries "
          f"from {len(sittings)} sittings")


if __name__ == "__main__":
    args = sys.argv[1:]
    slack = LOAD_SLACK
    if "--load-slack" in args:
        i = args.index("--load-slack")
        if i + 1 >= len(args):
            raise SystemExit(__doc__)
        slack = float(args[i + 1])
        args = args[:i] + args[i + 2:]
    if len(args) < 2:
        raise SystemExit(__doc__)
    main(args[0], args[1:], slack)
