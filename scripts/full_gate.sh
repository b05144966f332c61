#!/bin/sh
# Standing end-of-round gate (round-5 verdict task 7): the FULL oracle
# sweep at BOTH scale factors, logged to a committed artifact. The
# driver's CORRECTNESS_r{N}.json samples ~50 queries; this runs every
# queries() entry against its DuckDB oracle at sf0.01 AND sf0.1 so a
# round can never close with an unexercised query.
#
# Usage: sh scripts/full_gate.sh r05   (writes BENCH/gate_r05_*.json)
set -e
TAG="${1:-adhoc}"
cd "$(dirname "$0")/.."
mkdir -p BENCH
python scripts/check_oracles.py /root/testdata/sf0.01 --out "BENCH/gate_${TAG}_sf001.json"
python scripts/check_oracles.py /root/testdata/sf0.1  --out "BENCH/gate_${TAG}_sf01.json"
python - "$TAG" <<'PY'
import json, sys
tag = sys.argv[1]
for sf in ("sf001", "sf01"):
    d = json.load(open(f"BENCH/gate_{tag}_{sf}.json"))
    s = d["summary"]
    print(f"{sf}: {s['n_queries']} queries, {s['n_red']} red, "
          f"{s['n_no_oracle']} rows-only")
    assert s["n_red"] == 0, f"{sf} has red rows"
print("FULL GATE GREEN at both scale factors")
PY
