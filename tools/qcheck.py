"""Result-equivalence harness for optimization rounds.

Computes an order-independent fingerprint (row count + sum of
xxhash64 over all columns) for every declared query at a given sf dir,
entirely inside Spark (no driver collect of data rows). Usage:

    python tools/qcheck.py /root/testdata/sf0.01 /tmp/snap_before.json
    # ... make changes ...
    python tools/qcheck.py /root/testdata/sf0.01 /tmp/snap_after.json --compare /tmp/snap_before.json

A changed fingerprint means the optimization changed WHAT the query
computes — revert or prove the difference is a false positive before
proceeding. Optionally restrict to a comma-separated --only list.
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    compare = None
    only = None
    if "--compare" in sys.argv:
        compare = sys.argv[sys.argv.index("--compare") + 1]
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    from pyspark.sql import functions as F

    from cor_asv_ann_spark.session import build_session

    spark = build_session(app="qcheck", extra={"spark.ui.showConsoleProgress": "false"})
    import __spark_entry__ as entrymod

    qdefs = entrymod.queries()
    snap: dict[str, dict] = {}
    for name, fn in qdefs.items():
        if only is not None and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            schema = str([(f.name, f.dataType.simpleString()) for f in df.schema.fields])
            agg = df.select(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.xxhash64(*[F.col(f.name) for f in df.schema.fields]).cast(
                        "decimal(38,0)"
                    )
                ).alias("h"),
            ).collect()[0]
            snap[name] = {"schema": schema, "n": agg.n, "h": str(agg.h)}
        except Exception as e:  # noqa: BLE001
            snap[name] = {"error": f"{type(e).__name__}: {e}"}
        snap[name]["sec"] = round(time.time() - t0, 2)
        entrymod.OBSERVATIONS.pop(name, None)
        print(f"{name}: {snap[name]}", flush=True)
    with open(out_path, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    if compare:
        with open(compare) as f:
            ref = json.load(f)
        bad = []
        for name, cur in snap.items():
            r = ref.get(name)
            if r is None:
                continue
            for k in ("schema", "n", "h"):
                if cur.get(k) != r.get(k) or "error" in cur:
                    bad.append((name, k, r.get(k), cur.get(k)))
        if bad:
            print("MISMATCH:")
            for b in bad:
                print("  ", b)
            sys.exit(1)
        print(f"OK: {len(snap)} queries match {compare}")
    spark.stop()


if __name__ == "__main__":
    main()
