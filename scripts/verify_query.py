#!/usr/bin/env python
"""Drive the driver contract for named queries at sf0.01 (the /verify
fresh-process check, parameterized): usage
``python scripts/verify_query.py q_a q_b ...``."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as m  # noqa: E402
from data_engineering_project_spotify_app_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402

SF = "/root/testdata/sf0.01"


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(app_name="verify_query")
    print("entry rows:", m.entry(spark).count())
    qs, oracles = m.queries(), m.oracle_sql()
    bad = []
    for name in names:
        try:
            if name in oracles:
                compare(spark, SF, name, qs[name], oracles[name])
                print(name, "oracle match: True")
            else:
                print(name, "rows_only:", qs[name](spark, SF).count())
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(name, "FAIL:", str(exc)[:300])
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
