#!/usr/bin/env python3
"""Driver-LIKE correctness gate: reproduces the environment that killed 20
oracle rows in CORRECTNESS_r07.json (oracle-side DuckDB OutOfMemoryException
on KB-scale inputs) so the fix can be proven locally before the driver runs.

Differences from check_oracle.py (the friendly local gate):
  * the process address space is hard-capped (RLIMIT_AS, default 4 GiB) to
    emulate the driver container's memory ceiling — malloc failures surface
    exactly like the driver's "failed to allocate block of ... (bad
    allocation)";
  * NO threads pin and NO memory_limit are set on the connection — DuckDB
    starts with its defaults (threads = nproc, memory_limit ~ 80% of HOST
    RAM, far above the cap), exactly as an unconfigured checker would.
    Only what the oracle SQL itself carries (the OraclePin prefix) tames it;
  * all statements run sequentially on ONE connection in sorted(name) order
    (the driver's iteration order — r07's failures clustered at the tail);
  * per-query process RSS and DuckDB memory_usage are recorded so the next
    oracle-environment regression is diagnosable from the report.

The cap default (6 GiB) is calibrated: the checker PROCESS itself (python +
numpy/pandas/pyarrow imports + per-query parquet reads) creeps ~2 GiB of
VA over a 151-query run with the oracle side pinned to ~250 MiB RSS — a
4 GiB cap kills the run on checker-side arena growth alone, while the r7
driver demonstrably ran 131 greens at 32 DuckDB threads (impossible under
4 GiB). 151/151 green at 6 GiB with peak vsz 4.7 GiB, r8 measurement.

Usage: check_oracle_driverlike.py <sfDir> <verifyOutDir> [capGiB=6]
Writes /tmp/oracle_check_driverlike.json; exits non-zero on any mismatch.
"""
import sys, json, glob, os, resource

CAP_GIB = float(sys.argv[3]) if len(sys.argv) > 3 else 6.0
resource.setrlimit(resource.RLIMIT_AS,
                   (int(CAP_GIB * (1 << 30)), int(CAP_GIB * (1 << 30))))

import duckdb           # noqa: E402  (import under the cap, like the driver)
import pandas as pd     # noqa: E402
import numpy as np      # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def vm_mib(field="VmRSS"):
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith(field + ":"):
                return int(line.split()[1]) // 1024
    return -1


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def hash_df(df):
    import hashlib
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if np.issubdtype(col.dtype, np.floating):
            vals = np.round(col.to_numpy(dtype=np.float64), 9)
            vals = np.where(vals == -0.0, 0.0, vals).astype(str)
        else:
            vals = col.astype(str).to_numpy()
        h.update(("\x00".join(vals) + "|" + c).encode())
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()   # defaults: unpinned threads, host-RAM limit
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results, n_ok = {}, 0
    for name, sql in sorted(oracle.items()):
        entry = {"rss_before_mib": vm_mib()}
        try:
            files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
            sdf = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True) if files else pd.DataFrame()
        except Exception as e:
            entry["spark_error"] = str(e)[:300]
            sdf = None
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            entry["oracle_error"] = str(e)[:300]
            odf = None
        entry["rss_after_mib"] = vm_mib()
        entry["vsz_after_mib"] = vm_mib("VmSize")
        try:
            entry["duckdb_mem_mib"] = int(con.execute(
                "SELECT coalesce(sum(memory_usage_bytes), 0) "
                "FROM duckdb_memory()").fetchone()[0]) // (1 << 20)
        except Exception:
            pass
        if sdf is not None and odf is not None:
            entry["rows"] = [len(sdf), len(odf)]
            if len(sdf) == 0 and len(odf) == 0:
                entry["match"] = True
            else:
                sc, oc = canon(sdf), canon(odf)
                if list(sc.columns) != list(oc.columns):
                    entry["match"], entry["why"] = False, "columns"
                    entry["cols"] = [list(sc.columns), list(oc.columns)]
                elif len(sc) != len(oc):
                    entry["match"], entry["why"] = False, "rows"
                else:
                    entry["match"] = hash_df(sc) == hash_df(oc)
                    if not entry["match"]:
                        entry["why"] = "hash"
        else:
            entry["match"] = False
        results[name] = entry
        n_ok += 1 if entry.get("match") else 0
        print(f"{'OK ' if entry.get('match') else 'FAIL'} {name} "
              f"rows={entry.get('rows')} rss={entry['rss_after_mib']}MiB "
              f"vsz={entry['vsz_after_mib']}MiB "
              f"{entry.get('why', '')} {entry.get('oracle_error', '')[:160]}",
              flush=True)
    print(f"\n{n_ok}/{len(results)} match  final_rss={vm_mib()}MiB "
          f"final_vsz={vm_mib('VmSize')}MiB cap={CAP_GIB}GiB")
    json.dump(results, open("/tmp/oracle_check_driverlike.json", "w"),
              indent=1)
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
