"""A/B attribution for the round-7 BENCH semdedup_prune regression
(round-8 judge item 1): fixed k=8 (the round-6 registration) vs the
round-7 corpus-derived k = greatest(8, ceil(n/256)).

Key fact the A/B pins down: at sf0.1 the corpus is 2,000 vectors, so
the DERIVED k equals the old fixed floor (ceil(2000/256) = 8 -> k = 8)
— the round-7 change adds exactly ONE cheap count(*) pre-pass
(extensions.km_k_for) and changes nothing else in the plan at this
scale. If the two arms time within noise of each other, the 6.2->8.4 s
BENCH_r07 swing cannot be the k-derivation and is host contention
(BENCH_r07's own env block violates the repo's loadavg>2 discard rule).

CLI: python tools/semdedup_ab.py [sf_dir] [n_runs]
Prints one JSON line per arm: best/median of n_runs wall seconds.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dissertation_iceberg_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("semdedup-ab")
    from dissertation_iceberg_spark.queries import extensions as ext
    from dissertation_iceberg_spark.queries.registry import (
        REGISTRY,
        _ensure_loaded,
    )

    _ensure_loaded()
    fn = REGISTRY["semdedup_prune"].fn
    derived_km_k_for = ext.km_k_for

    def run_arm(name: str, k_fn) -> None:
        ext.km_k_for = k_fn
        try:
            walls = []
            for i in range(n_runs + 1):  # first run = warm-up
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                if i > 0:
                    walls.append(time.time() - t0)
            print(
                json.dumps(
                    {
                        "arm": name,
                        "sf_dir": sf_dir,
                        "n": n_runs,
                        "best_sec": round(min(walls), 3),
                        "median_sec": round(statistics.median(walls), 3),
                        "all_sec": [round(w, 3) for w in walls],
                    }
                ),
                flush=True,
            )
        finally:
            ext.km_k_for = derived_km_k_for

    run_arm("fixed_k8", lambda base: 8)
    run_arm("derived_k", derived_km_k_for)


if __name__ == "__main__":
    main()
