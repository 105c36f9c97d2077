#!/usr/bin/env python3
"""Fixture-schema fingerprint: fail the gate LOUDLY when the driver
regenerates the test parquet with different column types (the round-7
breakage was silent until the driver's bench — events.ts flipped from
TIMESTAMP(NANOS)-as-INT64 to timestamp[us]).

Usage: schema_fingerprint.py <sfDir> [recordedFile]

Prints one `table.column:type` line per column. With a recorded file
(scripts/fixture_schema.txt), exits 1 on any drift, printing a diff;
to accept a new fixture generation, rerun with the engine adapted and
refresh the file:  scripts/schema_fingerprint.py <sfDir> > scripts/fixture_schema.txt
"""
import sys
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def fingerprint(sf_dir: str) -> list[str]:
    lines = []
    for t in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        for field in schema:
            lines.append(f"{t}.{field.name}:{field.type}")
    return lines


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    sf_dir = sys.argv[1]
    lines = fingerprint(sf_dir)
    if len(sys.argv) < 3:
        print("\n".join(lines))
        return 0
    recorded = [l for l in open(sys.argv[2]).read().splitlines() if l]
    if lines == recorded:
        print(f"[schema] fingerprint OK ({len(lines)} columns)")
        return 0
    cur, rec = set(lines), set(recorded)
    print("[schema] FIXTURE SCHEMA DRIFT — the driver regenerated the test")
    print("[schema] parquet with different types. Adapt the engine, then")
    print("[schema] refresh scripts/fixture_schema.txt (see this script's")
    print("[schema] docstring). Diff vs recorded:")
    if cur == rec:
        # same name:type set, different ORDER — a set diff would print
        # nothing and leave the failure unexplained
        print("[schema]   (column ORDER changed; name:type set identical)")
        for i, (a, b) in enumerate(zip(recorded, lines)):
            if a != b:
                print(f"[schema]   line {i}: recorded '{a}' vs current '{b}'")
    for l in sorted(rec - cur):
        print(f"[schema]   - {l}")
    for l in sorted(cur - rec):
        print(f"[schema]   + {l}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
