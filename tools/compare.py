#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir tables;
sorts columns by name, sorts rows, compares values exactly.
"""
import json, math, os, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    # Render through pandas dtypes, not raw Python values: DuckDB's
    # SUM(BIGINT) -> HUGEINT materializes as float64 in a dataframe
    # ("99111.0"), which is how the driver sees it — fetchall()'s Python
    # ints masked exactly that mismatch in round 2 (q28).
    cols = sorted(df.columns)
    out = []
    # itertuples, NOT iterrows: iterrows upcasts mixed int64/float64 rows
    # to float64, which would corrupt large ints on both sides and mask
    # the very dtype mismatches this comparator exists to catch
    for r in df[cols].itertuples(index=False, name=None):
        vals = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        # a typo'd name must not silently produce "0 pass / 0 fail" success
        unknown = sorted(set(only) - set(oracles))
        if unknown:
            print(f"ERROR: no such oracle query: {unknown}")
            return 2
        oracles = {k: v for k, v in oracles.items() if k in set(only)}
    # Verify writes a manifest of the queries it ATTEMPTED: an attempted
    # query with no output dir is a Verify failure, not a filtered-out
    # query, and must FAIL here even in an unfiltered standalone run
    # (previously only Verify's own exit code caught this). A stale
    # outDir from a pre-manifest Verify conservatively treats every
    # oracle as attempted.
    manifest_path = f"{out_dir}/manifest.json"
    attempted = (set(json.load(open(manifest_path)))
                 if os.path.exists(manifest_path) else set(oracles))
    n_pass = n_fail = n_skip = 0
    # with an explicit `only` list, honor ITS order — lets a caller put
    # cheap oracles first when watching an expensive SF incrementally
    ordered = ([(n, oracles[n]) for n in only if n in oracles]
               if only else sorted(oracles.items()))
    for name, sql in ordered:
        if not os.path.isdir(f"{out_dir}/{name}"):
            if name in attempted or name in set(only):
                print(f"FAIL {name}: no output dir (Verify did not produce it)")
                n_fail += 1
            else:
                n_skip += 1
            continue
        try:
            s_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            d_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sorted(s_df.columns) != sorted(d_df.columns):
            print(f"FAIL {name}: cols spark={sorted(s_df.columns)} duck={sorted(d_df.columns)}")
            n_fail += 1
            continue
        cs, cd = canon(s_df), canon(d_df)
        if cs == cd:
            print(f"PASS {name} ({len(cs)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
            print(f"FAIL {name}: {len(cs)} vs {len(cd)} rows; first diffs:")
            for a, b in diff:
                print(f"  spark={a}\n  duck ={b}")
            only_s = [r for r in cs if r not in set(cd)][:2]
            only_d = [r for r in cd if r not in set(cs)][:2]
            if only_s: print(f"  only-spark: {only_s}")
            if only_d: print(f"  only-duck : {only_d}")
    skip = f" / {n_skip} skipped (no output dir)" if n_skip else ""
    print(f"== {n_pass} pass / {n_fail} fail{skip} ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
