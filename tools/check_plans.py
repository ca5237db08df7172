#!/usr/bin/env python3
"""Canonical-plan completeness gate (VERDICT r14 #5).

Every head in a BENCH_LOCAL_*.json must have a COMMITTED canonical
plan file `bench_plans/<head>-<sha>.txt` whose sha matches the bench
artifact's recorded plan_sha — otherwise a plan-drift claim ("alias
only", "sha identical") is not diffable by a reviewer from the repo
alone (r14's mor_sql_rename nit). Run after any bench:

    python3 tools/check_plans.py BENCH_LOCAL_rNN.json

Exit 0 when complete; exit 1 listing every head whose canonical file
is missing or whose committed sha disagrees with the artifact.
"""
import json
import os
import sys


def main() -> int:
    art = sys.argv[1] if len(sys.argv) > 1 else None
    if art is None:
        cands = sorted(p for p in os.listdir(".")
                       if p.startswith("BENCH_LOCAL_r") and p.endswith(".json"))
        if not cands:
            print("no BENCH_LOCAL_*.json artifact found", file=sys.stderr)
            return 2
        art = cands[-1]
    with open(art) as f:
        bench = json.load(f)
    shas = bench.get("plan_sha") or {}
    heads = sorted(set(bench.get("queries", {})) | set(shas))
    if not heads:
        print(f"{art}: no heads recorded", file=sys.stderr)
        return 2
    committed = {}
    for name in os.listdir("bench_plans"):
        if name.endswith(".txt") and "-" in name:
            head, sha = name[:-4].rsplit("-", 1)
            committed[head] = sha
    missing, stale = [], []
    for h in heads:
        want = shas.get(h)
        have = committed.get(h)
        if have is None:
            missing.append(h)
        elif want is not None and have != want:
            stale.append((h, have, want))
    for h in missing:
        print(f"MISSING  {h}: no committed bench_plans/{h}-*.txt")
    for h, have, want in stale:
        print(f"STALE    {h}: committed {have} != artifact {want}")
    ok = len(heads) - len(missing) - len(stale)
    print(f"{ok}/{len(heads)} heads have a matching committed canonical plan "
          f"({art})")
    return 1 if (missing or stale) else 0


if __name__ == "__main__":
    sys.exit(main())
