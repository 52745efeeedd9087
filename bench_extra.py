"""Focused per-query timing (guide §1.4 noop-sink isolation).

    python bench_extra.py <sf_dir> <query>[,<query>...] [n_passes]

Times each named declared query with the noop sink inside one session,
labeling jobs (guide §1.5). Not part of the driver contract — bench.py
stays the frozen measurement harness; numbers from here are for
optimization iteration and are cited in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from cor_asv_ann_spark.session import build_session

    spark = build_session(app="bench_extra",
                          extra={"spark.ui.showConsoleProgress": "false"})
    import __spark_entry__ as entrymod

    qdefs = entrymod.queries()
    for name in names:
        walls = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.time()
            df = qdefs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
            entrymod.OBSERVATIONS.pop(name, None)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: best={min(walls):.3f} all={[round(w,3) for w in walls]}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
