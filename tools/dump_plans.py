"""Dump `.explain("formatted")` output for named queries to
plans/<round>/<query>_<tag>.txt — the before/after plan evidence the
optimization rounds commit alongside the code.

Usage: python tools/dump_plans.py <round> <tag> <query> [query ...]
   e.g. python tools/dump_plans.py r14 after wow_revenue_growth
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ccgp_data_wrangling_spark.queries import all_queries
from ccgp_data_wrangling_spark.session import get_spark


def main() -> None:
    rnd, tag, *names = sys.argv[1:]
    outdir = Path(__file__).resolve().parent.parent / "plans" / rnd
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    qs = all_queries()
    sf_dir = "/root/testdata/sf0.1"
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (outdir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{tag}.txt ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
