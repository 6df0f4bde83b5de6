#!/usr/bin/env python3
"""Local oracle-parity harness, mimicking the driver's DuckDB compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [nameFilter...]

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir tables,
sorts columns by name, and compares cell values. Reports per-query status.

TYPE-STRICT (round 10): the driver's gate hash-compares *typed* values, so
this harness must reject type drift the way the driver does:
  * the DuckDB result column types must map to the Spark parquet schema
    types exactly (BIGINT<->int64, DOUBLE<->float64, ...). An uncast
    integer sum() in an oracle comes back HUGEINT and is flagged as an
    error even when every cell value matches -- that is precisely the
    class that shipped 14 driver-gate failures in round 9.
  * doubles compare bit-exactly (struct.pack), so -0.0 != 0.0 and no
    float()-coercion can mask an int-vs-decimal drift.
"""
import hashlib, json, sys, math, os, re, struct
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# ---- type strictness -------------------------------------------------------

def canon_duck_type(t: str) -> str:
    """DuckDB type name -> canonical tag ('!...' never matches anything)."""
    t = t.upper()
    if t in ("BIGINT", "INT64", "LONG"):
        return "int64"
    if t in ("INTEGER", "INT", "INT32"):
        return "int32"
    if t in ("SMALLINT", "INT16"):
        return "int16"
    if t in ("TINYINT", "INT8"):
        return "int8"
    if t in ("DOUBLE", "FLOAT8"):
        return "float64"
    if t in ("FLOAT", "REAL", "FLOAT4"):
        return "float32"
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "string"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "HUGEINT":
        return "!HUGEINT"          # never matches: the round-9 bug class
    m = re.match(r"DECIMAL\((\d+),(\d+)\)", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    if t.endswith("[]"):
        return "list<" + canon_duck_type(t[:-2]) + ">"
    if t.startswith("STRUCT"):
        return "struct"
    return "!" + t

def canon_arrow_type(t) -> str:
    """pyarrow DataType -> the same canonical tags."""
    import pyarrow as pa
    if pa.types.is_int64(t):
        return "int64"
    if pa.types.is_int32(t):
        return "int32"
    if pa.types.is_int16(t):
        return "int16"
    if pa.types.is_int8(t):
        return "int8"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + canon_arrow_type(t.value_type) + ">"
    if pa.types.is_struct(t):
        return "struct"
    return "!" + str(t)

def schema_mismatches(spark_dir: str, duck_tags) -> list:
    """Columns whose DuckDB result type doesn't match the Spark parquet type.

    duck_tags: [(column, canonical_type_tag)] — derived from a live DuckDB
    relation or replayed from the oracle cache."""
    parts = [f for f in sorted(os.listdir(spark_dir)) if f.endswith(".parquet")]
    if not parts:
        # explicit: a bare next() would raise StopIteration, which the
        # caller's except-block misreports as an oracle SQL error
        raise RuntimeError(f"no parquet part files in {spark_dir} "
                           "(partial/cleaned Spark result?)")
    arrow_schema = pq.read_schema(os.path.join(spark_dir, parts[0]))
    spark_types = {f.name: canon_arrow_type(f.type) for f in arrow_schema}
    bad = []
    for col, dtag in duck_tags:
        stag = spark_types.get(col)
        if stag is None:
            bad.append((col, dtag, "<absent in spark result>"))
        elif dtag != stag:
            bad.append((col, dtag, stag))
    return bad

# ---- oracle result cache (opt-in) ------------------------------------------
# GRAFT_ORACLE_CACHE=<dir> caches each oracle's (normalized df, duck type
# tags) pickled under md5(name | sql | corpus fingerprint). Two sf1 oracles
# (graph_adamic_adar 24 min, dedup_cc_incremental 45 min in DuckDB) made the
# standing 10x sweep hostile as a per-round gate; the fingerprint (per-table
# file size+mtime) invalidates on any fixture regen and the SQL hash on any
# oracle edit, so a hit can only replay a result that the same engine would
# recompute bit-identically. Driver behavior is unchanged (env unset).

def _file_md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def corpus_fingerprint(sf_dir: str) -> str:
    # CONTENT-hashed, not mtime-stamped: mtime misses the cache on a
    # touched/copied corpus whose bytes are unchanged (the common case
    # when a corpus dir survives across sessions). Note the limit,
    # measured r13: a REGENERATED soak corpus is value-identical but NOT
    # byte-identical (parquet part names and footers embed the write
    # job's UUID), so regeneration re-keys the cache either way — warm
    # hits require the corpus FILES to survive, not just the generator
    # params. Full-file md5 keeps the gate's integrity (any byte change
    # re-keys) at a few seconds per sweep.
    parts = []
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # os.walk, not listdir: a partitioned write nests part files
            # under key=value subdirs, and _file_md5(open) on a directory
            # entry raises IsADirectoryError (r13 ADVICE).
            for root, _dirs, files in sorted(os.walk(p)):
                rel = os.path.relpath(root, p)
                pre = f"{t}/{rel}" if rel != "." else t  # keep flat-dir keys stable
                for f in sorted(files):
                    fp = os.path.join(root, f)
                    parts.append(f"{pre}/{f}:{os.path.getsize(fp)}:{_file_md5(fp)}")
        elif os.path.exists(p):
            parts.append(f"{t}:{os.path.getsize(p)}:{_file_md5(p)}")
    return "|".join(parts)

# ---- value strictness ------------------------------------------------------

def bits(x: float) -> bytes:
    return struct.pack("<d", x)

def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        na, nb = pd.isna(a), pd.isna(b)
        if isinstance(na, bool) and isinstance(nb, bool):
            if na and nb:
                return True
            if na != nb:
                return False
    except (TypeError, ValueError):
        pass
    # bit-exact doubles: -0.0 != 0.0, NaN == NaN, and no float() coercion
    # that would mask an int-vs-decimal drift (types are already gated
    # above, this is belt-and-braces at the value layer)
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return bits(a) == bits(b)
    if isinstance(a, float) != isinstance(b, float):
        return False
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        import numpy as np
        if isinstance(a, np.ndarray):
            a = a.tolist()
        if isinstance(b, np.ndarray):
            b = b.tolist()
        if not isinstance(a, (list, tuple)) or not isinstance(b, (list, tuple)):
            return False
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    import numpy as np
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return cells_equal(
            a.tolist() if isinstance(a, np.ndarray) else a,
            b.tolist() if isinstance(b, np.ndarray) else b)
    return str(a) == str(b)

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

# ---- main ------------------------------------------------------------------

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):       # Spark-written table = directory of parts
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    cache_dir = os.environ.get("GRAFT_ORACLE_CACHE")
    fp = corpus_fingerprint(sf_dir) if cache_dir else ""
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    if only:
        names = [n for n in names if n in only]
    n_pass = n_fail = 0
    for name in names:
        spark_dir = os.path.join(out_dir, name)
        try:
            got = norm(pd.read_parquet(spark_dir))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            continue
        try:
            import hashlib
            ck = (os.path.join(cache_dir, hashlib.md5(
                f"{name}|{oracle[name]}|{fp}".encode()).hexdigest() + ".pkl")
                if cache_dir else None)
            if ck and os.path.exists(ck):
                exp, tags = pd.read_pickle(ck)
            else:
                rel = con.sql(oracle[name])
                tags = [(c, canon_duck_type(str(t)))
                        for c, t in zip(rel.columns, rel.types)]
                exp = norm(rel.df())
                if ck:
                    pd.to_pickle((exp, tags), ck)
            type_bad = schema_mismatches(spark_dir, tags)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if type_bad:
            for col, dtag, stag in type_bad:
                print(f"FAIL {name}: TYPE col={col} duckdb={dtag} spark={stag}"
                      + ("  <-- uncast integer aggregate? add CAST(... AS BIGINT)"
                         if dtag == "!HUGEINT" else ""))
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for col in got.columns:
            gv, ev = got[col].tolist(), exp[col].tolist()
            for i, (g, e) in enumerate(zip(gv, ev)):
                if not cells_equal(g, e):
                    bad = (col, i, g, e)
                    break
            if bad:
                break
        if bad:
            col, i, g, e = bad
            print(f"FAIL {name}: col={col} row={i} spark={g!r} duckdb={e!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
