#!/usr/bin/env python3
"""Convert a tools/check.py evidence file into the driver-format
CORRECTNESS record (rows/schema/hash booleans per query).
Usage: stamp_correctness.py <check_evidence.txt> <out.json> <note>
"""
import json, re, sys

def main(src, out, note):
    rec = {}
    for ln in open(src):
        m = re.match(r"^(\w+)\s+(.*)$", ln.strip())
        if not m or ln.startswith("=="):
            continue
        name, verdict = m.groups()
        if verdict.startswith("OK rows="):
            n = int(re.search(r"rows=(\d+)", verdict).group(1))
            rec[name] = {"rows_match": True, "schema_match": True,
                         "hash_match": True, "spark_rows": n,
                         "oracle_rows": n, "err": None}
            # check.py passes a dtype-only divergence (values equal as
            # strings) but flags it — carry the flag, don't erase it
            if "DTYPE_DIFF" in verdict:
                rec[name]["dtype_diff"] = verdict.split("DTYPE_DIFF=", 1)[1]
        elif verdict.startswith("ROWS_ONLY rows"):
            n = int(re.search(r"rows=(\d+)", verdict).group(1))
            rec[name] = {"rows_match": True, "schema_match": None,
                         "hash_match": None, "spark_rows": n,
                         "oracle_rows": None, "err": None}
        else:
            rec[name] = {"rows_match": False, "schema_match": False,
                         "hash_match": False, "spark_rows": None,
                         "oracle_rows": None, "err": verdict[:200]}
    rec["_provenance"] = {"note": note}
    json.dump(rec, open(out, "w"), indent=2)
    ok = sum(1 for k, v in rec.items()
             if k != "_provenance" and v["rows_match"])
    print(f"stamped {out}: {ok}/{len(rec)-1} pass")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
