#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify
output against the DuckDB oracle and compare per-query (rows, schema,
values). Usage: tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # array/list columns are unhashable for sort_values -> stringify
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     hasattr(v, "__len__") and not isinstance(v, (str, bytes))).any():
            try:
                df[c] = df[c].map(lambda v: str(list(v)) if v is not None and
                                  not isinstance(v, (str, bytes, float, int)) else v)
            except Exception:
                pass
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            results[name] = (f"ROWS_ONLY rows={len(got)}" if len(got) > 0
                             else "ROWS_ONLY_EMPTY rows=0")
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {str(e)[:200]}"
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            results[name] = f"SCHEMA_MISMATCH got={list(g.columns)} want={list(w.columns)}"
            continue
        dt = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
              if str(g[c].dtype) != str(w[c].dtype)]
        if len(g) != len(w):
            results[name] = f"ROWCOUNT_MISMATCH got={len(g)} want={len(w)}"
            continue
        bad = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    eq = ((a.isna() & b.isna()) | (a == b)).all()
                else:
                    eq = a.astype(str).equals(b.astype(str))
            except Exception as e:
                eq = False
            if not eq:
                bad.append(c)
        suffix = f" DTYPE_DIFF={dt}" if dt else ""
        results[name] = ("OK rows=%d" % len(g)) + suffix if not bad \
            else f"VALUE_MISMATCH cols={bad}"
    n_ok = sum(1 for v in results.values()
               if v.startswith("OK") or v.startswith("ROWS_ONLY rows"))
    # self-identifying evidence: provenance header FIRST, so a saved
    # check_*.txt proves which HEAD and when it was cut from the
    # artifact itself (never from mtimes). Starts with '#' so
    # stamp_correctness.py's per-query line regex skips it.
    import subprocess, datetime
    try:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        head = subprocess.run(["git", "-C", repo, "rev-parse", "HEAD"],
                              capture_output=True, text=True).stdout.strip() \
               or "unknown"
        # "dirty" means SOURCE drift: evidence/ artifacts (which a gate
        # run itself rewrites, including possibly this very file) and
        # untracked files don't count — only tracked non-evidence paths
        porcelain = subprocess.run(["git", "-C", repo, "status",
                                    "--porcelain", "-uno"],
                                   capture_output=True, text=True).stdout
        dirty = "\n".join(l for l in porcelain.splitlines()
                          if l[3:] and not l[3:].startswith("evidence/"))
    except Exception:
        head, dirty = "unknown", ""
    utc = datetime.datetime.now(datetime.timezone.utc).isoformat()
    print(f"# head={head}{'+dirty' if dirty else ''} utc={utc} "
          f"sfdir={sf_dir} queries={len(results)}")
    for k, v in sorted(results.items()):
        print(f"{k:26s} {v}")
    print(f"== {n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
