#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate:
run each oracle SQL in DuckDB over the testdata parquet tables and
compare row-count / schema / sorted-value-hash against the Spark result
parquet written by graft.Verify.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # driver sorts columns by name; we also sort rows for a stable hash
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def hash_df(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            vals = col.astype(str).to_numpy()
        elif np.issubdtype(col.dtype, np.floating):
            vals = np.round(col.to_numpy(dtype=np.float64), 9)
            vals = np.where(vals == -0.0, 0.0, vals).astype(str)
        else:
            vals = col.astype(str).to_numpy()
        h.update(("\x00".join(vals) + "|" + c).encode())
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # pin threads: 32 threads x heavy vector SQL intermittently dies with
    # "Resource temporarily unavailable" (thread alloc), not real OOM
    con.execute("SET threads=8")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        entry = {}
        try:
            files = glob.glob(os.path.join(spark_path, "*.parquet"))
            sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
                if files else None
            if sdf is None:
                # empty result dirs have no part files; treat as 0 rows w/ unknown schema
                sdf = pd.DataFrame()
        except Exception as e:
            entry["spark_error"] = str(e)
            sdf = None
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            entry["oracle_error"] = str(e)
            odf = None
        if sdf is not None and odf is not None:
            entry["rows"] = [len(sdf), len(odf)]
            if len(sdf) == 0 and len(odf) == 0:
                entry["match"] = True
            else:
                sc, oc = canon(sdf), canon(odf)
                entry["cols"] = [list(sc.columns), list(oc.columns)]
                if list(sc.columns) != list(oc.columns):
                    entry["match"] = False
                    entry["why"] = "columns"
                elif len(sc) != len(oc):
                    entry["match"] = False
                    entry["why"] = "rows"
                else:
                    hs, ho = hash_df(sc), hash_df(oc)
                    entry["match"] = hs == ho
                    if hs != ho:
                        entry["why"] = "hash"
                        # find first differing cell for debugging
                        for c in sc.columns:
                            a, b = sc[c].to_numpy(), oc[c].to_numpy()
                            if sc[c].dtype != oc[c].dtype:
                                entry.setdefault("dtype_diffs", []).append(
                                    [c, str(sc[c].dtype), str(oc[c].dtype)])
                            try:
                                if np.issubdtype(sc[c].dtype, np.floating):
                                    bad = ~(np.isclose(a.astype(float), b.astype(float),
                                                       rtol=0, atol=1e-9, equal_nan=True))
                                else:
                                    bad = ~((pd.isna(a) & pd.isna(b)) | (a == b))
                                if bad.any():
                                    i = int(np.argmax(bad))
                                    entry.setdefault("diffs", []).append(
                                        [c, i, str(a[i]), str(b[i])])
                            except Exception as e:
                                entry.setdefault("diffs", []).append([c, "cmp_err", str(e)])
        else:
            entry["match"] = False
        results[name] = entry
        status = "OK " if entry.get("match") else "FAIL"
        print(f"{status} {name} rows={entry.get('rows')} "
              f"{entry.get('why','')} {entry.get('spark_error','')[:120]}"
              f"{entry.get('oracle_error','')[:200]}"
              f"{(' diffs=' + str(entry.get('diffs')[:2])) if entry.get('diffs') else ''}"
              f"{(' dtypes=' + str(entry.get('dtype_diffs')[:3])) if entry.get('dtype_diffs') else ''}")
    n_ok = sum(1 for e in results.values() if e.get("match"))
    print(f"\n{n_ok}/{len(results)} match")
    json.dump(results, open("/tmp/oracle_check.json", "w"), indent=1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
