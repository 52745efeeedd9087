"""Build the --py-files artifact for cluster submission (north rule:
"ships via spark-submit --py-files to multi-executor clusters").

    python tools/package.py [--out dist/cor_asv_ann_spark.zip]
    spark-submit --py-files dist/cor_asv_ann_spark.zip jobs/run_correction.py ...

The zip contains only the package sources (no tests/fixtures); executors
import `cor_asv_ann_spark` from it. Deterministic output: entries are
sorted and timestamps zeroed so re-builds are byte-identical (useful for
cache-keyed cluster deploys)."""

from __future__ import annotations

import argparse
import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> list[str]:
    pkg = os.path.join(ROOT, "cor_asv_ann_spark")
    names = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                names.append(os.path.relpath(full, ROOT))
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for rel in names:
            info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(os.path.join(ROOT, rel), "rb") as f:
                z.writestr(info, f.read(), zipfile.ZIP_DEFLATED)
    return names


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "dist", "cor_asv_ann_spark.zip"))
    args = ap.parse_args()
    names = build(args.out)
    print(f"{args.out}: {len(names)} modules")


if __name__ == "__main__":
    main()
